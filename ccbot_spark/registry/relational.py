"""TPC-H-shaped relational kit: aggregations (SURVEY
§2.4), joins (§2.3), scalar/string/date functions, windows / sorts /
limits (§2.5) and set ops (§2.6)."""
# Split from __spark_entry__.py (round 5): driver-facing surface
# (entry/queries/oracle_sql/clear_caches) unchanged; this module
# contributes its domain's entries via register()/register_sql().
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ccbot_spark.functions import (  # noqa: F401
    dedup,
    eventops,
    linkrank,
    multimodal,
    sampling,
    similarity,
    textkit,
)
from ccbot_spark.operators import urlops  # noqa: F401
from ccbot_spark.registry.common import (  # noqa: F401
    _ACTIVE_CACHES,
    _COS,
    _DOC_URLS,
    _EMB_D,
    _MIXED_URLS,
    _SHINGLES,
    _STOP_SQL,
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _sql_hmod,
    _t,
    q_a_metrics,
)


def register(q):

    # ---------------- aggregations (§2.4)
    q["a_metrics"] = q_a_metrics

    def a_distinct_urls(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return o.groupBy("o_orderstatus").agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count("*").alias("n_orders"),
        )
    q["a_distinct_urls"] = a_distinct_urls

    def a_host_budget(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return (
            o.groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
            .filter(F.col("n_orders") >= 20)
        )
    q["a_host_budget"] = a_host_budget

    def a_rollup_metrics(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return d.rollup("lang", "source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    q["a_rollup_metrics"] = a_rollup_metrics

    def a_topk_hosts(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return (
            o.groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
            .orderBy(F.col("n_orders").desc(), F.col("o_custkey").asc())
            .limit(10)
        )
    q["a_topk_hosts"] = a_topk_hosts

    # ---------------- joins (§2.3)
    def j_robots_bcast(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        c = _t(spark, sf_dir, "customer")
        return (
            o.join(
                F.broadcast(c),
                o.o_custkey == c.c_custkey,
                "left",
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice"))).alias("sum_total_cents"),
            )
        )
    q["j_robots_bcast"] = j_robots_bcast

    def j_seen_anti(spark, sf_dir):
        # right side restricted to 'F' orders so the anti-join has
        # non-trivial survivors at every SF (a vacuous 0-row result
        # would let filter(false) pass the gate)
        c = _t(spark, sf_dir, "customer")
        o = (
            _t(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select(F.col("o_custkey").alias("c_custkey"))
        )
        return c.select("c_custkey", "c_mktsegment").join(o, "c_custkey", "left_anti")
    q["j_seen_anti"] = j_seen_anti

    def j_seen_semi(spark, sf_dir):
        c = _t(spark, sf_dir, "customer")
        o = _t(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("c_custkey")
        )
        return c.select("c_custkey", "c_nationkey").join(o, "c_custkey", "left_semi")
    q["j_seen_semi"] = j_seen_semi

    def j_host_skew(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        li = _t(spark, sf_dir, "lineitem")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            )
        )
    q["j_host_skew"] = j_host_skew

    def j_edges_pages(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        p = _t(spark, sf_dir, "part")
        return (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            )
        )
    q["j_edges_pages"] = j_edges_pages

    def f_filter_scheme(spark, sf_dir):
        urls = _mixed_scheme_urls(_t(spark, sf_dir, "events"))
        return urlops.filter_scheme(urls, "url").select("event_id", "url")
    q["f_filter_scheme"] = f_filter_scheme

    def f_dedup_batch(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return d.select("lang", "source").dropDuplicates(["lang", "source"])
    q["f_dedup_batch"] = f_dedup_batch

    def f_json_props(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        k = F.get_json_object(F.col("props"), "$.k").cast("long")
        return e.groupBy("event_type").agg(
            F.sum(k).alias("sum_k"),
            F.count(k).alias("n_k"),
        )
    q["f_json_props"] = f_json_props

    def u_priority(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        pri = F.greatest(
            F.lit(1000) - F.floor(F.col("o_totalprice") / 1000).cast("long") * 10,
            F.lit(0),
        )
        return o.select("o_orderkey", pri.alias("priority"))
    q["u_priority"] = u_priority

    def f_string_kit(spark, sf_dir):
        p = _t(spark, sf_dir, "part")
        return p.select(
            "p_partkey",
            F.lower(F.col("p_brand")).alias("brand_lower"),
            F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.length(F.trim(F.col("p_name"))).cast("long").alias("name_len"),
            F.size(F.split(F.col("p_name"), " ")).cast("long").alias("name_words"),
        )
    q["f_string_kit"] = f_string_kit

    def f_date_kit(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return (
            o.groupBy(
                F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("order_month")
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice"))).alias("sum_total_cents"),
            )
        )
    q["f_date_kit"] = f_date_kit

    def a_cube(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return o.cube("o_orderstatus", "o_orderpriority").agg(
            F.count("*").alias("n_orders")
        )
    q["a_cube"] = a_cube

    def q_subquery_decorrelate(spark, sf_dir):
        """Correlated-subquery shape (Catalyst decorrelates to a join):
        customers whose account balance exceeds their nation's average."""
        c = _t(spark, sf_dir, "customer")
        c.createOrReplaceTempView("customer_v")
        return spark.sql(
            """
            SELECT c_custkey, c_nationkey FROM customer_v c
            WHERE c_acctbal > (
              SELECT AVG(c2.c_acctbal) FROM customer_v c2
              WHERE c2.c_nationkey = c.c_nationkey
            )
            """
        )
    q["q_subquery_decorrelate"] = q_subquery_decorrelate

    # ---------------- windows / sorts / limits (§2.5)
    def w_generate_topk(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        return (
            o.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("o_custkey", "o_orderkey", F.col("rank").cast("int").alias("rank"))
        )
    q["w_generate_topk"] = w_generate_topk

    def w_schedule(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        # ts is TIMESTAMP_NTZ; timestampdiff is pure wall-clock (no
        # session-timezone dependence — matches DuckDB date_diff)
        return (
            e.select(
                "user_id",
                "event_id",
                "ts",
                (F.row_number().over(w) - 1).cast("int").alias("slot"),
                F.lag("ts").over(w).alias("prev_ts"),
            )
            .select(
                "user_id",
                "event_id",
                "slot",
                F.coalesce(
                    F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"), F.lit(-1)
                ).alias("gap_us"),
            )
        )
    q["w_schedule"] = w_schedule

    def w_running_sum(spark, sf_dir):
        """Explicit window frame (rows unbounded preceding → current):
        per-customer running spend in exact integer cents."""
        o = _t(spark, sf_dir, "orders")
        w = (
            Window.partitionBy("o_custkey")
            .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(_cents(F.col("o_totalprice"))).over(w).alias("run_cents"),
        )
    q["w_running_sum"] = w_running_sum

    def w_global_order(spark, sf_dir):
        # scalable form: two-phase numbering (operators/sequencing) —
        # same seq a global Window.orderBy assigns, but no
        # single-partition exchange (the engine's trace sequencing
        # uses the identical operator)
        from ccbot_spark.operators import sequencing

        o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
        numbered, _n, cache = sequencing.global_sequence(
            o,
            keys=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
            num_partitions=16,
        )
        # the operator's contract: the cache must outlive the returned
        # plan (offsets were counted from the cached partition layout;
        # re-running repartitionByRange could re-sample boundaries).
        # Registered for clear_caches(), mirroring functions/dedup.
        _ACTIVE_CACHES.append(cache)
        return numbered.select("o_orderkey", "seq")
    q["w_global_order"] = w_global_order

    def w_global_runsum(spark, sf_dir):
        # global running total without a single-partition exchange:
        # the two-phase sequencing operator generalized from counts to
        # sums (per-partition partials + broadcast prefix offsets).
        # Same number SUM() OVER (ORDER BY ...) assigns — the WDS shard
        # planner (ccbot_spark/wds.py) cuts shard boundaries from it.
        from ccbot_spark.operators import sequencing

        o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
        run, _total, cache = sequencing.global_running_total(
            o.select("o_orderkey", _cents(F.col("o_totalprice")).alias("cents")),
            ["o_orderkey"],
            "cents",
            num_partitions=16,
        )
        _ACTIVE_CACHES.append(cache)
        return run.select("o_orderkey", F.col("run_total").alias("run_cents"))
    q["w_global_runsum"] = w_global_runsum

    def s_zorder_layout(spark, sf_dir):
        # Z-order (Morton) file-layout plan over events: bucket
        # user_id and minute-of-epoch to 8 bits each, interleave to a
        # 16-bit curve key (pure JVM shift/mask sum), rank along the
        # curve with the two-phase global_sequence, cut files every
        # 500 rows, and emit per-FILE min/max stats — the data-skipping
        # manifest both a user_id predicate AND a time predicate can
        # prune against.
        from ccbot_spark.functions import eventops
        from ccbot_spark.plans import layout

        ev = _t(spark, sf_dir, "events")
        plan, cache = layout.plan_zorder_files(
            ev,
            a=F.col("user_id") % 256,
            b=(
                F.floor(eventops.epoch_us(F.col("ts")) / F.lit(60_000_000))
                % 256
            ),
            tiebreak="event_id",
            rows_per_file=500,
            bits=8,
            num_partitions=16,
        )
        _ACTIVE_CACHES.append(cache)
        return plan
    q["s_zorder_layout"] = s_zorder_layout

    def s_column_stats(spark, sf_dir):
        # Iceberg-manifest-style stats collection over orders: one
        # scan, exact ndv/min/max/null-count per column + the
        # dictionary-encoding recommendation; the money double rides
        # as exact integer cents so min/max stringify identically in
        # any engine.
        from ccbot_spark.plans import layout

        o = _t(spark, sf_dir, "orders")
        return layout.column_stats(
            o,
            [
                ("o_orderkey", F.col("o_orderkey")),
                ("o_custkey", F.col("o_custkey")),
                ("o_orderstatus", F.col("o_orderstatus")),
                ("o_orderpriority", F.col("o_orderpriority")),
                ("o_totalprice_cents", _cents(F.col("o_totalprice"))),
            ],
        )
    q["s_column_stats"] = s_column_stats

    def a_exact_quantiles(spark, sf_dir):
        # EXACT p50/p90/p99/p99.9 (percentile_disc semantics — value
        # at 1-based position ⌈p·n⌉) over lineitem price cents via the
        # two-phase global rank: no percentile_approx sketch, no
        # single-partition sort. Oracle = DuckDB's NATIVE
        # quantile_disc, so the semantics claim is checked against an
        # independent implementation, not our own construction.
        from ccbot_spark.operators import sequencing

        li = _t(spark, sf_dir, "lineitem")
        vals = li.select(_cents(F.col("l_extendedprice")).alias("cents"))
        out, cache = sequencing.exact_quantiles(
            vals, "cents", num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return out
    q["a_exact_quantiles"] = a_exact_quantiles

    def s_limit(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        return (
            o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(50)
            .select("o_orderkey", "o_custkey")
        )
    q["s_limit"] = s_limit

    # ---------------- set ops (§2.6)
    def set_union_links(spark, sf_dir):
        c = _t(spark, sf_dir, "customer")
        s = _t(spark, sf_dir, "supplier")
        return (
            c.select(F.col("c_nationkey").alias("nationkey"))
            .unionByName(s.select(F.col("s_nationkey").alias("nationkey")))
            .groupBy("nationkey")
            .agg(F.count("*").alias("n_parties"))
        )
    q["set_union_links"] = set_union_links

    def set_except_seen(spark, sf_dir):
        # supplier side restricted by acctbal so the EXCEPT survives
        # with rows at every SF (de-vacuation, see j_seen_anti)
        c = _t(spark, sf_dir, "customer")
        s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
        return c.select(F.col("c_nationkey").alias("nationkey")).distinct().subtract(
            s.select(F.col("s_nationkey").alias("nationkey")).distinct()
        )
    q["set_except_seen"] = set_except_seen

    def set_intersect(spark, sf_dir):
        c = _t(spark, sf_dir, "customer")
        s = _t(spark, sf_dir, "supplier")
        return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
            s.select(F.col("s_nationkey").alias("nationkey"))
        )
    q["set_intersect"] = set_intersect


def register_sql(o):

    o["a_metrics"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                   - CAST(ROUND(l_discount * 100 * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_expr_cents,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """

    o["a_distinct_urls"] = """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """

    o["a_host_budget"] = """
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
    """

    o["a_rollup_metrics"] = """
        SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP (lang, source)
    """

    o["a_topk_hosts"] = """
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
        ORDER BY n_orders DESC, o_custkey ASC LIMIT 10
    """

    o["j_robots_bcast"] = """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_total_cents
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """

    o["j_seen_anti"] = """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
    """

    o["j_seen_semi"] = """
        SELECT c_custkey, c_nationkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """

    o["j_host_skew"] = """
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """

    o["j_edges_pages"] = """
        SELECT p_brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """

    o["f_filter_scheme"] = f"""
        SELECT event_id, url FROM ({_MIXED_URLS})
        WHERE regexp_matches(url, '^https?://')
    """

    o["f_dedup_batch"] = "SELECT DISTINCT lang, source FROM documents"

    o["f_json_props"] = """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(json_extract_string(props, '$.k')) AS n_k
        FROM events GROUP BY event_type
    """

    o["u_priority"] = """
        SELECT o_orderkey,
               GREATEST(1000 - CAST(FLOOR(o_totalprice / 1000) AS BIGINT) * 10,
                        0) AS priority
        FROM orders
    """

    o["f_string_kit"] = r"""
        SELECT p_partkey,
               lower(p_brand) AS brand_lower,
               regexp_extract(p_type, '^(\w+)', 1) AS type_head,
               p_brand || '|' || p_type AS brand_type,
               CAST(length(trim(p_name)) AS BIGINT) AS name_len,
               CAST(len(string_split(p_name, ' ')) AS BIGINT) AS name_words
        FROM part
    """

    o["f_date_kit"] = """
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_total_cents
        FROM orders GROUP BY 1
    """

    o["a_cube"] = """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """

    o["q_subquery_decorrelate"] = """
        SELECT c_custkey, c_nationkey FROM customer c
        WHERE c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
    """

    o["w_generate_topk"] = """
        SELECT o_custkey, o_orderkey, CAST(rank AS INTEGER) AS rank FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          FROM orders
        ) WHERE rank <= 3
    """

    o["w_schedule"] = """
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w - 1 AS INTEGER) AS slot,
               COALESCE(date_diff('microsecond', LAG(ts) OVER w, ts), -1) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """

    o["w_running_sum"] = """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_cents
        FROM orders
    """

    # --- a_exact_quantiles: DuckDB's NATIVE quantile_disc (checked
    # to be value-at-⌈p·n⌉) against the two-phase global-rank
    # construction — an independent implementation of the semantics.
    o["a_exact_quantiles"] = """
        WITH c AS (
          SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
          FROM lineitem
        )
        SELECT CAST(5000 AS BIGINT) AS p_bp,
               CAST(quantile_disc(cents, 0.5) AS BIGINT) AS value,
               CAST(COUNT(*) AS BIGINT) AS n_rows FROM c
        UNION ALL
        SELECT 9000, CAST(quantile_disc(cents, 0.9) AS BIGINT),
               COUNT(*) FROM c
        UNION ALL
        SELECT 9900, CAST(quantile_disc(cents, 0.99) AS BIGINT),
               COUNT(*) FROM c
        UNION ALL
        SELECT 9990, CAST(quantile_disc(cents, 0.999) AS BIGINT),
               COUNT(*) FROM c
    """

    # --- w_global_runsum: the two-phase global running total must
    # equal the single-window formulation exactly (integer cents).
    o["w_global_runsum"] = """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
                 ORDER BY o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_cents
        FROM orders WHERE o_totalprice > 400000
    """

    o["w_global_order"] = """
        SELECT o_orderkey,
               CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
                    - 1 AS BIGINT) AS seq
        FROM orders WHERE o_totalprice > 400000
    """

    # --- s_zorder_layout: the same Morton interleave as a BIGINT
    # bit-expression fold; exact rank via ROW_NUMBER (DuckDB side may
    # funnel — the Spark side is the two-phase plan under test).
    o["s_zorder_layout"] = """
        WITH z AS (
          SELECT event_id,
                 CAST(user_id % 256 AS BIGINT) AS a,
                 CAST((epoch_us(ts) // 60000000) % 256 AS BIGINT) AS b
          FROM events
        ),
        zk AS (
          SELECT event_id, a, b,
                 CAST(list_sum(list_transform(range(0, 8),
                   i -> (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1))
                 )) AS BIGINT) AS zval
          FROM z
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY zval, event_id) - 1 AS seq
          FROM zk
        )
        SELECT CAST(seq // 500 AS BIGINT) AS file_id,
               COUNT(*) AS n_rows,
               MIN(zval) AS zmin, MAX(zval) AS zmax,
               MIN(a) AS amin, MAX(a) AS amax,
               MIN(b) AS bmin, MAX(b) AS bmax
        FROM r GROUP BY file_id
    """

    # --- s_column_stats: per-column UNION ALL of the same aggregates;
    # min/max in native order, stringified after.
    _cs_col = """
        SELECT '{name}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {x} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {x}) AS BIGINT) AS ndv,
               CAST(MIN({x}) AS VARCHAR) AS min_val,
               CAST(MAX({x}) AS VARCHAR) AS max_val,
               CASE WHEN COUNT(DISTINCT {x}) * 10 <= COUNT(*)
                    THEN 'dict' ELSE 'plain' END AS encoding
        FROM orders
    """
    o["s_column_stats"] = "\nUNION ALL\n".join(
        _cs_col.format(name=n, x=x)
        for n, x in [
            ("o_orderkey", "o_orderkey"),
            ("o_custkey", "o_custkey"),
            ("o_orderstatus", "o_orderstatus"),
            ("o_orderpriority", "o_orderpriority"),
            (
                "o_totalprice_cents",
                "CAST(round(o_totalprice * 100, 0) AS BIGINT)",
            ),
        ]
    )

    o["s_limit"] = """
        SELECT o_orderkey, o_custkey FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """

    o["set_union_links"] = """
        SELECT nationkey, COUNT(*) AS n_parties FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier
        ) GROUP BY nationkey
    """

    o["set_except_seen"] = """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """

    o["set_intersect"] = """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """
