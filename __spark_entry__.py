"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Design discipline for oracle-matched queries:
  * integer-first outputs — money as cents (round(x*100) → bigint),
    timestamps as epoch millis, ratios as (numerator, denominator)
    pairs — so no float-representation or fp-summation-order hazard
    can break the value hash between Spark and DuckDB;
  * every computed column aliased identically on both sides;
  * thresholds as integer cross-multiplications (10*inter >= t*union).

Entries without an oracle (rows-only check) are the genuinely
non-SQL-expressible ops: xxhash64-keyed url hash/salt (xxhash64 is
Spark-only; the ENGINE keeps it — it is the right hash at scale — so
the demo queries stay rows-only rather than misrepresenting the
operator), python-urlkit URL normalization, and the binary image
decode pipeline (img_pipeline). Each of those has a stronger dedicated
check in tests/ (property tests vs pure-Python references; see
SURVEY.md §5). The md5-seeded ops (MinHash, SimHash, fingerprint,
embedding-LSH near-dup, ANN LSH, img_phash_near's banded Hamming
join) ARE oracled: both engines derive the hash from md5 hex with
explicit integer arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ccbot_spark.functions import (
    dedup,
    eventops,
    linkrank,
    multimodal,
    sampling,
    similarity,
    textkit,
)
from ccbot_spark.operators import urlops
from ccbot_spark.sources.tables import src_parquet


# Caches created inside queries() plans that must stay alive until the
# returned DataFrame is consumed. sequencing.global_sequence computes
# per-partition offsets from its cached materialization; if the cache
# were released at plan-construction time, a re-executed
# repartitionByRange could sample different range boundaries (its
# sampling seed depends on the fresh RDD id) and the recomputed layout
# would silently shift every seq. Callers running many queries in one
# session call clear_caches() between batches (tools/verify_oracle.py
# and bench.py do); the driver gate runs each query once.
_ACTIVE_CACHES: list[DataFrame] = []


def clear_caches() -> None:
    """Release plan caches registered by queries() entries (safe once no
    returned DataFrame is still in use); also clears the dedup and
    linkrank modules' — including their localCheckpoint blocks, which
    plain unpersist cannot free (ccbot_spark.storagekit)."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()
    dedup.clear_caches()
    linkrank.clear_caches()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # make ccbot_spark importable on executor Python workers (several
    # queries carry pandas-UDF closures referencing the package) no
    # matter what cwd/PYTHONPATH the driver session was built with
    from ccbot_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    return src_parquet(spark, sf_dir, name)


def _cents(col):
    """Exact integer cents from a double money column — deterministic
    across engines (double arithmetic is identical; the sum is then an
    order-independent integer sum)."""
    return F.round(col * 100, 0).cast("long")


def _doc_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL column synthesized from `documents` (the
    driver tables carry no URLs; both sides build the same strings)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


def _mixed_scheme_urls(events: DataFrame) -> DataFrame:
    """URL list with non-fetchable schemes mixed in (from `events`)."""
    scheme = (
        F.when(F.col("event_id") % 4 == 0, F.lit("mailto:u@example.com"))
        .when(F.col("event_id") % 4 == 1, F.lit("javascript:void(0)"))
        .otherwise(
            F.concat(
                F.lit("https://h"), (F.col("event_id") % 7).cast("string"),
                F.lit(".test/p/"), F.col("event_id").cast("string"),
            )
        )
    )
    return events.select("event_id", scheme.alias("url"))


# --------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------

def q_a_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation (the a_metrics shape: partial+final
    hash aggregate, one shuffle on the two grouping keys)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            F.sum(
                _cents(F.col("l_extendedprice")) - _cents(F.col("l_discount") * 100)
            ).alias("sum_disc_expr_cents"),
            F.count("*").alias("n_rows"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_a_metrics(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------
# queries
# --------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

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

    def a_domain_budget(spark, sf_dir):
        # registered-domain (eTLD+1) budget cap — the subdomain-spam
        # defense the engine runs pre-slotting (domain_budget flag,
        # trace-equality in tests/test_domain_budget.py). Hosts are
        # synthesized subdomained (h{k}.d{g}.test); Spark derives the
        # domain FROM THE HOST STRING with the pure-JVM
        # urlops.registered_domain, DuckDB re-derives it from the
        # encoding arithmetic — a green row proves the split/slice
        # expression groups exactly as encoded. Top-7 per domain by
        # (priority DESC, url ASC), the generate window's shape.
        e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
        k = (F.col("event_id") % 24).cast("string")
        g = (F.col("event_id") % 24 % 5).cast("string")
        host = F.concat(F.lit("h"), k, F.lit(".d"), g, F.lit(".test"))
        c = e.select(
            urlops.registered_domain(host).alias("domain"),
            F.concat(
                F.lit("http://"), host, F.lit("/p/"),
                F.col("event_id").cast("string"),
            ).alias("url"),
            (F.col("event_id") * 37 % 101).cast("long").alias("priority"),
        )
        w = Window.partitionBy("domain").orderBy(
            F.col("priority").desc(), F.col("url").asc()
        )
        return (
            c.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= 7)
        )
    q["a_domain_budget"] = a_domain_budget

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

    def j_phash_dedup(spark, sf_dir):
        # quantity filter on the right side → non-empty anti-join
        # survivors (same de-vacuation rationale as j_seen_anti)
        p = _t(spark, sf_dir, "part")
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") > 45)
            .select(F.col("l_partkey").alias("p_partkey"))
        )
        return p.select("p_partkey", "p_brand").join(li, "p_partkey", "left_anti")
    q["j_phash_dedup"] = j_phash_dedup

    def j_phash_near(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        h = (F.col("n_chars") * 1103515245 + 12345).alias("h")
        docs = d.select(F.col("doc_id"), h)
        bands = docs.select(
            "doc_id",
            "h",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("h"), b * 16).bitwiseAND(
                            F.lit(0xFFFF)
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band_id", "band_val"),
        )
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .filter(F.col("hamming") <= 4)
        )
    q["j_phash_near"] = j_phash_near

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

    # ---------------- URL / scalar functions (§2.2)
    def f_host(spark, sf_dir):
        urls = _doc_urls(_t(spark, sf_dir, "documents"))
        return (
            urls.select(F.parse_url(F.col("url"), F.lit("HOST")).alias("host"))
            .groupBy("host")
            .agg(F.count("*").alias("n_urls"))
        )
    q["f_host"] = f_host

    def f_surt(spark, sf_dir):
        # SURT canonical keys (web-archive CDX key), JVM-side
        # (urlops.surt_key). URLs synthesized to exercise every rule:
        # www-strip, host-label reversal, explicit port, sorted
        # multi-param query, no-query/empty-path forms, fragments with
        # embedded '?' (never a query — r3 ADVICE fix), and non-URL
        # strings (NULL key on both sides).
        d = _t(spark, sf_dir, "documents")
        url = F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".example.com"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(":8080")).otherwise(
                F.lit("")
            ),
            F.lit("/d/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
                F.concat(
                    F.lit("?z="),
                    F.col("n_chars").cast("string"),
                    F.lit("&a="),
                    F.col("lang"),
                )
            ),
            F.when(F.col("doc_id") % 3 == 0, F.lit("#f?x=1")).otherwise(
                F.lit("")
            ),
        )
        url = F.when(F.col("doc_id") % 11 == 0, F.lit("not a url")).otherwise(
            url
        )
        return d.select("doc_id", urlops.surt_key(url).alias("surt"))
    q["f_surt"] = f_surt

    def cdx_index(spark, sf_dir):
        # CDX-style capture index: one row per captured URL with its
        # SURT key, capture timestamp, content digest, and size,
        # numbered in (surt, ts) order via the two-phase global
        # sequence — at 10^10 captures the index build never collapses
        # to a single-partition exchange, and range partitioning on
        # surt keeps each domain's captures contiguous.
        from ccbot_spark.operators import sequencing

        d = _t(spark, sf_dir, "documents")
        rows = _doc_urls(d).join(d, "doc_id").select(
            urlops.surt_key(F.col("url")).alias("surt"),
            (F.lit(20260101000000) + F.col("doc_id").cast("long")).alias(
                "ts"
            ),
            F.md5(F.col("text")).alias("digest"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        )
        numbered, _n, cache = sequencing.global_sequence(
            rows, keys=["surt", "ts"], num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return numbered.select("seq", "surt", "ts", "digest", "n_bytes")
    q["cdx_index"] = cdx_index

    def g_hostgraph(spark, sf_dir):
        # Host-level webgraph rollup: page→page link edges aggregated
        # to (src_host, dst_host) with edge counts and distinct source
        # pages — the standard crawler export for seed ranking and
        # domain-budget planning. Edges synthesized deterministically
        # (doc i links to docs 2i+1 and 3i+2 mod n, host = source
        # shard), aggregation is one hash-shuffle on the host pair.
        d = _t(spark, sf_dir, "documents")
        n = F.lit(500)  # sf0.01 documents row count is immaterial: mod
        # by a fixed constant keeps the edge set deterministic per row
        dst1 = (F.col("doc_id") * 2 + 1) % n
        dst2 = (F.col("doc_id") * 3 + 2) % n
        edges = (
            d.select(
                F.col("source").alias("src_host"),
                F.col("doc_id").alias("src_page"),
                F.explode(F.array(dst1, dst2)).alias("dst_page"),
            )
            .join(
                d.select(
                    F.col("doc_id").alias("dst_page"),
                    F.col("source").alias("dst_host"),
                ),
                "dst_page",
            )
        )
        return edges.groupBy("src_host", "dst_host").agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("src_page").alias("n_src_pages"),
        )
    q["g_hostgraph"] = g_hostgraph

    def text_wet_extract(spark, sf_dir):
        # WET-style conversion (textkit.wet_text — JVM regexp chain):
        # markup synthesized around each document's text, then stripped
        # back out; script/style drop, tag removal, entity decode, and
        # whitespace collapse all exercised on every row.
        d = _t(spark, sf_dir, "documents")
        html = F.concat(
            F.lit("<html><head><title>"),
            F.col("source"),
            F.lit(
                "</title><style>p{margin:0}</style></head><body>"
                "<script>var n=1;</script><h1>"
            ),
            F.col("lang"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit("</p><p>&amp; &lt;tail&gt;</p></body></html>"),
        )
        return d.select("doc_id", textkit.wet_text(html).alias("wet_text"))
    q["text_wet_extract"] = text_wet_extract

    def recrawl_schedule(spark, sf_dir):
        # the adaptive revisit-interval fold (engine adaptive_recrawl /
        # oracle ADAPT_MIN/MAX) as a pure relational query: per entity,
        # fold the visit history in (ts, event_id) order — changed
        # visit halves the interval (floor 1), unchanged doubles it
        # (cap 64). JVM-side ordered fold via sort_array + F.aggregate
        # with shift arithmetic (whole-stage codegen, no Python); the
        # oracle folds the same list with DuckDB list_reduce.
        e = _t(spark, sf_dir, "events")
        chg = (F.col("event_id") % 3 == 0).cast("long")
        per = e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), chg.alias("chg")
            ).alias("v"),
        )
        agg = per.groupBy("user_id").agg(
            F.sort_array(F.collect_list("v")).alias("vs")
        )
        flags = F.transform(F.col("vs"), lambda v: v.getField("chg"))
        folded = F.aggregate(
            flags,
            F.lit(4).cast("long"),
            lambda acc, x: F.when(
                x == 1, F.greatest(F.shiftright(acc, 1), F.lit(1).cast("long"))
            ).otherwise(F.least(F.shiftleft(acc, 1), F.lit(64).cast("long"))),
        )
        return agg.select(
            "user_id",
            F.size("vs").cast("long").alias("n_visits"),
            folded.cast("long").alias("next_interval"),
        )
    q["recrawl_schedule"] = recrawl_schedule

    def w_rate_limit(spark, sf_dir):
        # the HTTP 429 politeness plan (synthweb.rate_limit_of + the
        # fetch-stage verdict) as a pure relational query: md5-selected
        # hosts (60%) enforce a per-cycle cap of 2 + h%4 slots with
        # Retry-After 1 + h%2 cycles; a request's verdict is a pure
        # function of (host, slot) — exactly the property that lets the
        # engine's salted fetch workers decide 429s with no shared
        # state. Slots come from the politeness window (w_schedule
        # shape); the md5 bucket construction is sampling.key_hash_mod,
        # mirrored by the oracle's Horner fold.
        from ccbot_spark.functions.sampling import key_hash_mod

        e = _t(spark, sf_dir, "events")
        host = F.concat(
            F.lit("h"), (F.col("user_id") % 40).cast("string"), F.lit(".test")
        )
        w = Window.partitionBy("host").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        d = e.select("event_id", host.alias("host"), "ts").withColumn(
            "slot", (F.row_number().over(w) - 1).cast("int")
        )
        limiting = key_hash_mod(F.concat(F.lit("sel:"), F.col("host")), 100) < 60
        cap = F.lit(2) + key_hash_mod(F.concat(F.lit("rl:"), F.col("host")), 4)
        ra = F.lit(1) + key_hash_mod(F.concat(F.lit("ra:"), F.col("host")), 2)
        lim = limiting & (F.col("slot") >= cap)
        return d.select(
            "event_id",
            "host",
            "slot",
            lim.alias("rate_limited"),
            F.when(lim, F.lit(1) + ra)
            .otherwise(F.lit(0))
            .cast("int")
            .alias("not_before"),
        )
    q["w_rate_limit"] = w_rate_limit

    def w_ip_schedule(spark, sf_dir):
        # IP-level politeness schedule (politeness.generate ip_pool) as
        # a pure relational query: hosts hash into 7 server addresses
        # (urlops.ip_key — md5/conv/pmod, whole-stage codegen) with a
        # deterministic per-host crawl delay; each request's sched_ms
        # is the cumulative sum of the PRECEDING requests' delays
        # within its IP — after touching a server, wait that vhost's
        # delay before the next request to the SAME server, whichever
        # vhost it targets. One window over the candidate order; its
        # partitions are bounded by the budgeted fetch set at engine
        # scale, never the frontier.
        from ccbot_spark.functions.sampling import key_hash_mod

        e = _t(spark, sf_dir, "events")
        host = F.concat(
            F.lit("h"), (F.col("user_id") % 40).cast("string"), F.lit(".test")
        )
        d = e.select("event_id", host.alias("host"), "ts").withColumns(
            {
                "ip": urlops.ip_key(F.col("host"), 7),
                "delay_ms": (
                    F.lit(100)
                    + key_hash_mod(
                        F.concat(F.lit("d:"), F.col("host")), 9
                    )
                    * 50
                ).cast("long"),
            }
        )
        wip = (
            Window.partitionBy("ip")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return d.select(
            "event_id",
            "host",
            "ip",
            "delay_ms",
            F.coalesce(F.sum("delay_ms").over(wip), F.lit(0))
            .cast("long")
            .alias("sched_ms"),
        )
    q["w_ip_schedule"] = w_ip_schedule

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

    def j_asof(spark, sf_dir):
        # as-of join (most-recent-state lookup): each click joins the
        # latest error ≤ its ts per user — union + one key shuffle +
        # last(ignoreNulls) window, never a range explosion. Build
        # side deduped per (user_id, ts) (max_by event_id) so the
        # match is well-defined in both engines.
        e = _t(spark, sf_dir, "events")
        build = (
            e.filter(F.col("event_type") == "error")
            .groupBy("user_id", "ts")
            .agg(F.max_by("value", "event_id").alias("value"))
        )
        probe = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        return eventops.asof_join(probe, build)
    q["j_asof"] = j_asof

    def j_range_bucket(spark, sf_dir):
        # band-range join: clicks inside each error's 10-minute window
        # per user. Time-bucket equi-join (fan-out ≤ 2) + residual
        # filter — the 100 TB shape; a naive ts-inequality join plans
        # as a cartesian theta-join.
        e = _t(spark, sf_dir, "events")
        iv = e.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("iv_id"), "user_id",
            F.col("ts").alias("start_ts"),
        )
        pr = e.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        return eventops.range_join_bucketed(iv, pr, width_s=600)
    q["j_range_bucket"] = j_range_bucket

    def a_sessionize(spark, sf_dir):
        # batch gaps-and-islands sessionization (30-min inactivity
        # gap): lag + running sum + rollup over one user_id shuffle —
        # the batch twin of the streaming session_window agg
        return eventops.sessionize(_t(spark, sf_dir, "events"), gap_s=1800)
    q["a_sessionize"] = a_sessionize

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

    # ---------------- training-data pipeline: dedup
    def dedup_exact(spark, sf_dir):
        return dedup.exact_dedup(_t(spark, sf_dir, "documents"))
    q["dedup_exact"] = dedup_exact

    def dedup_ngram_jaccard(spark, sf_dir):
        return dedup.ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), n=3, t10=1
        )
    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def dedup_edit_distance(spark, sf_dir):
        # fuzzy near-dup: shingle-blocked candidates (never all-pairs)
        # verified by exact Levenshtein — the JVM builtin and DuckDB's
        # levenshtein() implement the identical distance, so the
        # verify stage is value-checked end-to-end.
        return dedup.edit_distance_pairs(
            _t(spark, sf_dir, "documents"), max_dist=60, n=3, t10=1
        )
    q["dedup_edit_distance"] = dedup_edit_distance

    def dedup_ngram_capped(spark, sf_dir):
        return dedup.ngram_jaccard_pairs_capped(
            _t(spark, sf_dir, "documents"), n=3, t10=1, max_df=20
        )
    q["dedup_ngram_capped"] = dedup_ngram_capped

    def text_decontaminate(spark, sf_dir):
        docs = _t(spark, sf_dir, "documents")
        return dedup.contamination_hits(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            n=3,
        )
    q["text_decontaminate"] = text_decontaminate

    def text_dup_spans(spark, sf_dir):
        # Lee-et-al exact-substring dedup signal: per-doc count of
        # tokens covered by a 5-gram occurring more than once in the
        # corpus. Shingle equi-join mechanics (functions/dedup.py
        # dup_span_features); DuckDB replays it with list slicing +
        # interval union.
        d = _t(spark, sf_dir, "documents")
        return dedup.dup_span_features(d, n=5)
    q["text_dup_spans"] = text_dup_spans

    def dedup_embedding(spark, sf_dir):
        return dedup.embedding_near_pairs(_t(spark, sf_dir, "embeddings"), t4=3500)
    q["dedup_embedding"] = dedup_embedding

    def dedup_embedding_lsh(spark, sf_dir):
        return dedup.embedding_lsh_near_pairs(
            _t(spark, sf_dir, "embeddings"), t4=3500
        )
    q["dedup_embedding_lsh"] = dedup_embedding_lsh

    # ---------------- similarity search
    def ann_topk(spark, sf_dir):
        return similarity.ann_bruteforce_topk(
            _t(spark, sf_dir, "embeddings"), n_queries=10, k=5
        )
    q["ann_topk"] = ann_topk

    def ann_ivf(spark, sf_dir):
        return similarity.ivf_topk_int(
            _t(spark, sf_dir, "embeddings"),
            n_centroids=16, nprobe=4, n_queries=10, k=5,
        )
    q["ann_ivf"] = ann_ivf

    # ---------------- text analysis
    def text_quality(spark, sf_dir):
        return textkit.quality_columns(_t(spark, sf_dir, "documents"))
    q["text_quality"] = text_quality

    def text_tokens_bpe(spark, sf_dir):
        """Token counting: whitespace split vs a BPE-ish regex
        (word-pieces + standalone punctuation)."""
        d = _t(spark, sf_dir, "documents")
        return d.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]"))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    q["text_tokens_bpe"] = text_tokens_bpe

    def text_quality_filter(spark, sf_dir):
        """The downstream keep/drop decision, integer threshold tests
        only (ratio tests as cross-multiplications)."""
        qc = textkit.quality_columns(_t(spark, sf_dir, "documents"))
        return qc.filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stopwords") * 100 >= F.col("n_tokens") * 2)
            & (F.col("n_distinct_tokens") * 10 >= F.col("n_tokens") * 3)
        ).select("doc_id")
    q["text_quality_filter"] = text_quality_filter

    def text_langid(spark, sf_dir):
        return textkit.langid(_t(spark, sf_dir, "documents"))
    q["text_langid"] = text_langid

    def text_vocab_topk(spark, sf_dir):
        # tokenizer/BPE-build prerequisite: corpus vocabulary head
        # (one explode + hash-agg + TakeOrdered; textkit.vocab_topk)
        return textkit.vocab_topk(_t(spark, sf_dir, "documents"), k=30)
    q["text_vocab_topk"] = text_vocab_topk

    # ---------------- deterministic sampling / quotas (corpus curation;
    # functions/sampling.py — hash-of-key selection, reproducible by
    # an independent engine, unlike df.sample's partition-seeded RNG)
    def sample_hash(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return sampling.hash_sample(d, "doc_id", pct=10).select(
            "doc_id", "lang", "source", "n_chars"
        )
    q["sample_hash"] = sample_hash

    def sample_split(spark, sf_dir):
        # deterministic train/val/test assignment: stable under corpus
        # growth (depends only on the row's own key hash), zero
        # shuffle, the same md5 bucket construction as sample_hash.
        d = _t(spark, sf_dir, "documents")
        return sampling.hash_split(d, "doc_id").select(
            "doc_id", "split_bucket", "split"
        )
    q["sample_split"] = sample_split

    def sample_stratified(spark, sf_dir):
        # per-language rates; strata absent from the dict (es, fr) are
        # dropped — the downsample-the-head corpus-balancing move
        d = _t(spark, sf_dir, "documents")
        return sampling.stratified_sample(
            d, "lang", "doc_id", rates={"en": 20, "de": 50, "zh": 80}
        ).select("doc_id", "lang", "source")
    q["sample_stratified"] = sample_stratified

    def doc_source_cap(spark, sf_dir):
        # per-source contribution cap (≤ 10 docs per source, by doc_id)
        d = _t(spark, sf_dir, "documents")
        return sampling.group_cap(
            d, "source", order_by=["doc_id"], k=10
        ).select("doc_id", "source")
    q["doc_source_cap"] = doc_source_cap

    # ---------------- rows-only entries (no SQL equivalent; each has a
    # stronger dedicated pytest check — see module docstring)
    def f_url_hash(spark, sf_dir):
        urls = _doc_urls(_t(spark, sf_dir, "documents"))
        return urls.select(
            "doc_id", urlops.url_hash(F.col("url")).alias("url_hash")
        )
    q["f_url_hash"] = f_url_hash

    def f_url_normalize(spark, sf_dir):
        urls = _doc_urls(_t(spark, sf_dir, "documents")).select(
            "doc_id",
            F.concat(
                F.col("url"), F.lit("?utm_source=x&b=2&a=1#frag")
            ).alias("url"),
        )
        return urls.select(
            "doc_id", urlops.normalize_udf(F.col("url")).alias("url_norm")
        )
    q["f_url_normalize"] = f_url_normalize

    def f_host_salt(spark, sf_dir):
        urls = _doc_urls(_t(spark, sf_dir, "documents"))
        host = F.parse_url(F.col("url"), F.lit("HOST"))
        return urls.select(
            "doc_id",
            host.alias("host"),
            F.pmod(F.xxhash64(host), F.lit(32)).cast("int").alias("salt_bucket"),
        )
    q["f_host_salt"] = f_host_salt

    def dedup_minhash_lsh(spark, sf_dir):
        return dedup.minhash_lsh_candidates(_t(spark, sf_dir, "documents"))
    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_simhash(spark, sf_dir):
        return dedup.simhash_near_pairs(
            _t(spark, sf_dir, "documents"), max_ham=16
        )
    q["dedup_simhash"] = dedup_simhash

    def dedup_components(spark, sf_dir):
        # the dedup endgame: pairs → clusters → canonical keeper per
        # cluster (min doc id), via O(log diameter) label propagation
        # with pointer jumping (dedup.connected_components)
        pairs = dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))
        return dedup.connected_components(pairs)
    q["dedup_components"] = dedup_components

    def dedup_keep_best(spark, sf_dir):
        # pairs → clusters → one keeper per cluster (highest n_chars,
        # tie-break lowest doc_id); singletons keep themselves — the
        # complete dedup endgame as a single query
        docs = _t(spark, sf_dir, "documents")
        clusters = dedup.connected_components(dedup.ngram_jaccard_pairs(docs))
        return dedup.keep_best_per_cluster(docs, clusters)
    q["dedup_keep_best"] = dedup_keep_best

    def link_pagerank(spark, sf_dir):
        # frontier-priority recompute: integer-exact PageRank (3
        # rounds, d=0.85) over the order→part bipartite "link graph"
        # (endpoint id spaces disambiguated by parity so they never
        # collide); rank_micro is int64 micro-units — order-free sums,
        # engine-neutral by construction (linkrank.pagerank_int)
        li = _t(spark, sf_dir, "lineitem")
        edges = li.select(
            (F.col("l_orderkey") * 10).cast("long").alias("src"),
            (F.col("l_partkey") * 10 + 1).cast("long").alias("dst"),
        )
        return linkrank.pagerank_int(edges, iterations=3)
    q["link_pagerank"] = link_pagerank

    def ann_lsh(spark, sf_dir):
        return similarity.ann_lsh_topk(
            _t(spark, sf_dir, "embeddings"), n_queries=10, k=5
        )
    q["ann_lsh"] = ann_lsh

    def text_fingerprint(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return d.select(
            "doc_id", textkit.fingerprint_udf(F.col("text")).alias("fp")
        )
    q["text_fingerprint"] = text_fingerprint

    def img_pipeline(spark, sf_dir):
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        return multimodal.decode_features(multimodal.synth_images_from_docs(docs))
    q["img_pipeline"] = img_pipeline

    def img_phash_near(spark, sf_dir):
        # Exercises multimodal.phash_near_pairs (the banded Hamming
        # join) through an ORACLED path: phashes are synthesized
        # JVM-side from md5 so DuckDB reproduces them exactly —
        # doc_id % 150 gives planted near-dup pairs (one flipped bit),
        # bypassing only the binary decode step (which keeps its
        # pixel-exact pytest + the rows-only img_pipeline entry).
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        # two 31-bit halves → base phash < 2^62 (no int64 overflow in
        # either engine); docs ≥150 repeat an earlier base with ONE
        # bit flipped → hamming-1 planted pairs
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        return multimodal.phash_near_pairs(ph, max_ham=6)
    q["img_phash_near"] = img_phash_near

    def img_blocklist(spark, sf_dir):
        # the PhotoDNA-style moderation gate: images whose phash falls
        # within Hamming ≤ 1 of a curated bad-hash list are flagged
        # (and dropped from the kept set). Phash synthesis reuses the
        # img_phash_near md5 idiom (bases 0..149, docs ≥150 repeat a
        # base with ONE flipped bit); the blocklist holds the bases of
        # doc_id % 7 == 0 under 50, so each bad hash flags its exact
        # image (ham 0) AND its planted near-dup (ham 1). The banded
        # prefilter is complete for this radius (pigeonhole ≤ 3).
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        bl = (
            _t(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 50) & (F.col("doc_id") % 7 == 0))
            .select(
                F.col("doc_id").cast("string").alias("_k")
            )
            .select(F.md5(F.concat(F.lit("img:"), F.col("_k"))).alias("_h"))
            .select(
                (
                    (F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("long")
                     % F.lit(2147483648)) * F.lit(2147483648)
                    + F.conv(F.substring(F.col("_h"), 9, 8), 16, 10).cast("long")
                    % F.lit(2147483648)
                ).alias("bad_phash")
            )
        )
        return multimodal.phash_blocklist_filter(ph, bl, max_ham=1)["flagged"]
    q["img_blocklist"] = img_blocklist

    def img_curation(spark, sf_dir):
        # LAION-style image-text curation over the input-hint image
        # table shape (image_id, w, h, caption): dims + captions are
        # synthesized JVM-side from md5/doc_id so DuckDB reproduces
        # them exactly; the gates (multimodal.curation_features) are
        # pure metadata column exprs — resolution floor, integer
        # aspect-ratio cap, caption word band, boilerplate reject.
        d = _t(spark, sf_dir, "documents")
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        h = (F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        cap = F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("IMG_"), F.col("doc_id").cast("string")),
        ).otherwise(F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))"))
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            w.alias("w"),
            h.alias("h"),
            cap.alias("caption"),
        )
        return multimodal.curation_features(meta)
    q["img_curation"] = img_curation

    def img_mm_dedup(spark, sf_dir):
        # multimodal joint dedup: perceptual phash-band near pairs ∪
        # exact-caption star edges → connected components (min-id
        # keeper). Phashes use the img_phash_near md5 synthesis
        # (doc_id % 150 plants hamming-1 pairs); captions collide on
        # doc_id % 120 — the two modalities chain DIFFERENT doc pairs,
        # so clusters only emerge from the joint graph.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        meta = d.select(
            F.col("doc_id").cast("long").alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
            F.concat(F.lit("cap-"), (F.col("doc_id") % 120).cast("string")).alias(
                "caption"
            ),
        )
        edges = multimodal.mm_dedup_edges(meta)
        return dedup.connected_components(edges, "img_a", "img_b")
    q["img_mm_dedup"] = img_mm_dedup

    def img_mm_keeper(spark, sf_dir):
        # the multimodal dedup ENDGAME: joint phash∪caption clusters →
        # one keeper per cluster, highest-resolution member wins
        # (area = w·h from the img_curation md5 dim synthesis),
        # unclustered images kept as singletons
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        dx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w_ = F.conv(F.substring(dx, 1, 8), 16, 10).cast("long") % 481 + 32
        h_ = F.conv(F.substring(dx, 9, 8), 16, 10).cast("long") % 481 + 32
        meta = d.select(
            F.col("doc_id").cast("long").alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
            F.concat(F.lit("cap-"), (F.col("doc_id") % 120).cast("string")).alias(
                "caption"
            ),
            (w_ * h_).cast("long").alias("area"),
        )
        clusters = dedup.connected_components(
            multimodal.mm_dedup_edges(meta), "img_a", "img_b"
        )
        return dedup.keep_best_per_cluster(
            meta.withColumnRenamed("image_id", "doc_id"),
            clusters,
            quality="area",
        )
    q["img_mm_keeper"] = img_mm_keeper

    def img_header_meta(spark, sf_dir):
        # JVM-side binary header parse: container sniffed and dims
        # pulled from the blob's first bytes (PNG IHDR big-endian /
        # PPM ASCII header) with zero Python and zero decode. The
        # synth blobs are a pure function of doc_id (dims =
        # 16 + (doc_id%150)*{7,11} % 97, fmt cycles ppm/png/qpng), so
        # DuckDB re-derives the ENCODED dims arithmetically — a green
        # row proves the binary parse reads back exactly what the
        # codec wrote. qpng is a PNG container, hence 2/3 'png'.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(docs)
        return multimodal.header_meta(imgs).select(
            "image_id", "container", "hdr_w", "hdr_h"
        )
    q["img_header_meta"] = img_header_meta

    def img_bmp_meta(spark, sf_dir):
        # the 4-format cycle adds bmp (24-bit BITMAPINFOHEADER): dims
        # are LITTLE-endian i32 at fixed offsets, parsed by per-byte
        # hex reversal + conv — still zero Python, zero decode. The
        # oracle re-derives container + dims from the doc_id synthesis
        # arithmetic (cycle ppm/png/qpng/bmp; qpng is a PNG container).
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.REAL_FMTS
        )
        return multimodal.header_meta(imgs).select(
            "image_id", "container", "hdr_w", "hdr_h"
        )
    q["img_bmp_meta"] = img_bmp_meta

    def img_jpeg_meta(spark, sf_dir):
        # the 5-format cycle adds jpeg (pure-numpy baseline T.81
        # encoder, round 5): container is sniffed from the FFD8FF
        # magic, but JPEG dims live in the SOF segment at a variable
        # offset — `jpeg_sof_dims` (the bounded JVM marker walk) is an
        # INDEPENDENT parser of this repo's own Huffman encoder output,
        # so a green row proves the encoder writes a spec-valid SOF0
        # that a from-scratch reader extracts exactly. Dims for the
        # fixed-offset containers come from header_meta; the two are
        # coalesced into one (w, h) per image.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.ALL_FMTS
        )
        meta = multimodal.header_meta(imgs)
        jdims = multimodal.jpeg_sof_dims(imgs)
        return (
            meta.join(jdims, "image_id", "left")
            .select(
                "image_id",
                "container",
                F.coalesce(F.col("hdr_w"), F.col("jpg_w")).alias("img_w"),
                F.coalesce(F.col("hdr_h"), F.col("jpg_h")).alias("img_h"),
            )
        )
    q["img_jpeg_meta"] = img_jpeg_meta

    def img_gif_meta(spark, sf_dir):
        # the 6-format cycle adds gif (GIF89a palette + pure-python
        # LZW, round 5 — the last container the sniffer recognized
        # without a decoder). Container is sniffed from the
        # GIF87a/GIF89a magic; dims are the little-endian logical-
        # screen u16s at fixed offsets — zero Python, zero decode.
        # The oracle re-derives container + dims from the synthesis
        # arithmetic; jpeg rows still coalesce in the SOF marker walk.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.ALL_FMTS6
        )
        meta = multimodal.header_meta(imgs)
        jdims = multimodal.jpeg_sof_dims(imgs)
        return (
            meta.join(jdims, "image_id", "left")
            .select(
                "image_id",
                "container",
                F.coalesce(F.col("hdr_w"), F.col("jpg_w")).alias("img_w"),
                F.coalesce(F.col("hdr_h"), F.col("jpg_h")).alias("img_h"),
            )
        )
    q["img_gif_meta"] = img_gif_meta

    def img_letterbox_plan(spark, sf_dir):
        # training-export letterbox geometry: bucket + target shape +
        # aspect-preserving scaled dims + centered pads, ALL pure JVM
        # integer arithmetic chained on the binary header parse (the
        # pixel stage is a dumb executor of these numbers — pytest
        # covers it pixel-exact). DuckDB replays the same integer
        # formulas from the synthesis arithmetic.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(
            multimodal.synth_images_from_docs(docs)
        )
        return multimodal.letterbox_plan(meta, "hdr_w", "hdr_h").select(
            "image_id", "bucket", "out_w", "out_h",
            "scaled_w", "scaled_h", "pad_x", "pad_y",
        )
    q["img_letterbox_plan"] = img_letterbox_plan

    def img_png_scrub(spark, sf_dir):
        # privacy scrub: plant one CRC-correct tEXt chunk (keyword
        # 'Comment', body length doc_id % 23) on every PNG-container
        # row, then strip provenance chunks. The audit counters are
        # pure arithmetic — 12-byte chunk framing + 7+1-byte keyword +
        # body — so DuckDB re-derives exactly how many bytes the scrub
        # must remove per row; ppm rows pass through untouched.
        import pandas as _pd

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(docs)

        def plant(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    b = bytes(r.bytes)
                    d = int(r.image_id.split("-")[1])
                    if r.fmt in ("png", "qpng"):
                        b = multimodal.inject_png_text_chunk(
                            b, b"Comment", b"x" * (d % 23)
                        )
                    rows.append((r.image_id, b, r.fmt))
                yield _pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        planted = imgs.mapInPandas(
            plant, schema="image_id string, bytes binary, fmt string"
        )
        return multimodal.strip_png_metadata(planted).select(
            "image_id", "stripped_chunks", "stripped_bytes"
        )
    q["img_png_scrub"] = img_png_scrub

    def img_hash_family(spark, sf_dir):
        # rows-only by necessity (pixel-derived: DCT/gradient/mean
        # hashes have no SQL form; exactness vs the python reference
        # is pytest-gated in tests/test_phash.py): all three
        # perceptual-hash family members from one decode pass.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        return multimodal.hash_features(
            multimodal.synth_images_from_docs(docs)
        )
    q["img_hash_family"] = img_hash_family

    def img_bucketed_shards(spark, sf_dir):
        # group-pure WebDataset planning: shards never mix aspect
        # buckets (fixed-tensor-shape shards after bucket_resize).
        # Pure relational: two-phase running total over (bucket, key)
        # order + group-cardinality-sized base offsets — DuckDB replays
        # it as per-bucket SQL windows.
        from ccbot_spark import wds

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        s = multimodal.synth_images_from_docs(docs).withColumn(
            "caption",
            F.concat(
                F.lit("caption for image "),
                F.regexp_extract("image_id", r"(\d+)", 1),
            ),
        )
        costed = s.withColumn(
            "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
        ).withColumn("bucket", multimodal.aspect_bucket_col("w", "h"))
        assigned, cache = wds.plan_shards_grouped(
            costed, 96 * 1024, "bucket", num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.min("bucket").alias("bucket"),
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("image_id").alias("key_min"),
            F.max("image_id").alias("key_max"),
        )
    q["img_bucketed_shards"] = img_bucketed_shards

    def img_size_hist(spark, sf_dir):
        # corpus resolution profile chained ON the header parse (one
        # metadata-speed scan + one tiny hash-agg) — class bounds over
        # the max side, pixel totals summed as int64
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(multimodal.synth_images_from_docs(docs))
        return multimodal.size_histogram(meta)
    q["img_size_hist"] = img_size_hist

    def img_aspect_profile(spark, sf_dir):
        # SDXL-style bucketed-batching report: per (container, aspect
        # bucket) counts + pixels over HEADER-PARSED dims. The bucket
        # ladder's cut points are integer thresholds on (1000*w) div h,
        # so DuckDB states the identical CASE; a green row proves the
        # JVM binary parse + integer-div ladder land every image in the
        # encoded bucket.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(multimodal.synth_images_from_docs(docs))
        return multimodal.aspect_profile(meta)
    q["img_aspect_profile"] = img_aspect_profile

    def img_exact_dedup(spark, sf_dir):
        # byte-exact image dedup via JVM md5 over the binary column:
        # blobs reduce to 16-byte digests map-side, the shuffle moves
        # digests, not pixels. Synth images are byte-identical iff
        # doc_id % 150 collides (same pixel seed; fmt cycle period 3
        # divides 150, so the container matches too) — the oracle
        # groups on that arithmetic instead of the digest.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        return multimodal.exact_dup_groups(
            multimodal.synth_images_from_docs(docs)
        )
    q["img_exact_dedup"] = img_exact_dedup

    def img_wds_shards(spark, sf_dir):
        # WebDataset training-export PLAN: size-balanced tar shards cut
        # by a global running total of DECLARED sample cost (tar
        # framing + raw pixel bytes + caption bytes — metadata only,
        # no blob scan), in image_id order. The assignment is a pure
        # relational expression, so DuckDB replays it with the same
        # window formula; write_shards/read_shards byte-determinism and
        # the exact round trip are pytest gates (tests/test_wds.py).
        from ccbot_spark import wds

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        s = multimodal.synth_images_from_docs(docs).withColumn(
            "caption",
            F.concat(
                F.lit("caption for image "),
                F.regexp_extract("image_id", r"(\d+)", 1),
            ),
        )
        costed = s.withColumn(
            "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
        )
        assigned, cache = wds.plan_shards(
            costed, 96 * 1024, num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("image_id").alias("key_min"),
            F.max("image_id").alias("key_max"),
        )
    q["img_wds_shards"] = img_wds_shards

    def f_trap_detect(spark, sf_dir):
        # crawler-trap heuristics over synthesized URLs: every 5th URL
        # is a calendar loop (repeated segments), every 5th+1 a 10-deep
        # mirror path, every 5th+2 an over-long session id; the rest
        # are clean. urlops.trap_features is all JVM array/regexp ops.
        e = _t(spark, sf_dir, "events")
        hostp = F.concat(
            F.lit("https://h"), (F.col("event_id") % 7).cast("string"), F.lit(".test")
        )
        sid = F.col("event_id").cast("string")
        url = (
            F.when(
                F.col("event_id") % 5 == 0,
                F.concat(hostp, F.lit("/cal/2024/cal/2024/cal/"), sid),
            )
            .when(
                F.col("event_id") % 5 == 1,
                F.concat(hostp, F.lit("/a/b/c/d/e/f/g/h/i/"), sid),
            )
            .when(
                F.col("event_id") % 5 == 2,
                F.concat(hostp, F.lit("/p/"), F.repeat(F.lit("x"), 160), sid),
            )
            .otherwise(F.concat(hostp, F.lit("/p/"), sid))
        )
        return urlops.trap_features(e.select("event_id", url.alias("url"))).select(
            "event_id", "depth", "n_repeat", "url_len", "is_trap"
        )
    q["f_trap_detect"] = f_trap_detect

    def text_repetition(spark, sf_dir):
        # Gopher-style within-doc repetition gate (duplicate word
        # 2-gram fraction ≤ 0.2, integer cross-multiplication)
        return textkit.repetition_features(_t(spark, sf_dir, "documents"))
    q["text_repetition"] = text_repetition

    def text_pack(spark, sf_dir):
        # GPT-style sequence packing: per-(source, shard) token-stream
        # concat cut into 512-token windows; shard bounds the window
        # partitions so no source funnels through one task
        return textkit.pack_sequences(
            _t(spark, sf_dir, "documents"), cap=512, n_shards=8
        )
    q["text_pack"] = text_pack

    def text_para_dedup(spark, sf_dir):
        # C4/CCNet paragraph-level exact dedup: first occurrence
        # (lowest doc_id, pos) of each 3-word chunk survives corpus-
        # wide; winner via skew-safe groupBy+min (map-side combine),
        # never a per-paragraph window funnel
        return textkit.paragraph_dedup(
            _t(spark, sf_dir, "documents"), words_per_para=3
        )
    q["text_para_dedup"] = text_para_dedup

    def text_mixture_plan(spark, sf_dir):
        # Pile/DoReMi-static domain-mixture planner: biggest corpus
        # achievable without upsampling, each source a weight-
        # proportional token share, greedy md5-prefix selection.
        # src0's weight makes it the binding source (all kept);
        # src1..4 truncate; src5+ drop (weight 0).
        d = _t(spark, sf_dir, "documents").withColumn(
            "n_tokens", textkit.token_count(F.col("text"))
        )
        return sampling.mixture_plan(
            d, {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
        )
    q["text_mixture_plan"] = text_mixture_plan

    def text_trigram_lm(spark, sf_dir):
        # CCNet-style LM-quality proxy with exact integer semantics:
        # corpus char-trigram counts (the "LM", broadcastable) scored
        # back per doc — big side never shuffles pre-agg
        return textkit.trigram_familiarity(_t(spark, sf_dir, "documents"))
    q["text_trigram_lm"] = text_trigram_lm

    def text_classifier(spark, sf_dir):
        # fastText-style linear quality classifier: hashed-token
        # features × a broadcast integer weight table, threshold on
        # the cross-multiplied average. The demo weight table is a
        # pure function of the bucket id (range × Knuth constant mod
        # 2001, centered), so DuckDB rebuilds the identical "learned"
        # layer and replays the scoring end-to-end.
        docs = _t(spark, sf_dir, "documents")
        weights = spark.range(4096).select(
            F.col("id").alias("bucket"),
            ((F.col("id") * 2654435761) % 2001 - 1000).alias("weight"),
        )
        return textkit.linear_classifier_score(
            docs, weights, n_buckets=4096, threshold_milli=50
        )
    q["text_classifier"] = text_classifier

    def g_host_authority(spark, sf_dir):
        # seed-ranking authority over the g_hostgraph rollup: each
        # source host splits micro-units across its out-edges —
        # integer div contract, broadcast outdeg, two hash-aggs.
        from ccbot_spark.functions import linkrank

        return linkrank.host_authority(g_hostgraph(spark, sf_dir))
    q["g_host_authority"] = g_host_authority

    def text_pii_scrub(spark, sf_dir):
        # PII redaction (emails → IPv4 → phones, chained JVM
        # regexp_replace + regexp_count, one codegen scan). PII is
        # PLANTED arithmetically on doc_id slices so the gate is
        # non-vacuous; DuckDB plants the identical strings and runs
        # the identical RE2-safe patterns — counts AND the full
        # clean_text hash-compare.
        d = F.col("doc_id")
        s = lambda x: x.cast("string")  # noqa: E731
        planted = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    d % 3 == 0,
                    F.concat(F.lit(" contact user"), s(d), F.lit("@ex"),
                             s(d % 7), F.lit(".org")),
                ).otherwise(F.lit("")),
                F.when(
                    d % 4 == 0,
                    F.concat(F.lit(" from 10."), s(d % 256), F.lit(".0."),
                             s(d % 200)),
                ).otherwise(F.lit("")),
                F.when(
                    d % 5 == 0,
                    F.concat(F.lit(" call 040-555-"), s(1000 + d % 9000)),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return textkit.pii_scrub(planted)
    q["text_pii_scrub"] = text_pii_scrub

    def text_curation_pipeline(spark, sf_dir):
        # The end-to-end curation story a training-data user actually
        # runs, composed as ONE declarative plan: quality gate (length /
        # stopword / distinct-token ratios) → Gopher repetition gate →
        # exact-dedup keeper (md5 digest, min doc_id wins) → language
        # tag over the survivors. Catalyst collapses the three gates'
        # column expressions into the same corpus scan; the only
        # shuffles are the digest hash-agg and the keeper semi-join,
        # both over (digest, doc_id) pairs — never the text bytes at
        # width. The oracle chains the proven per-stage CTEs.
        d = _t(spark, sf_dir, "documents")
        ok = textkit.quality_columns(d).filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stopwords") * 100 >= F.col("n_tokens") * 2)
            & (F.col("n_distinct_tokens") * 10 >= F.col("n_tokens") * 3)
        ).select("doc_id", "n_tokens")
        rep = (
            textkit.repetition_features(d)
            .filter(F.col("keep") == 1)
            .select("doc_id")
        )
        survivors = d.join(ok, "doc_id").join(rep, "doc_id")
        keepers = survivors.groupBy(F.md5("text").alias("digest")).agg(
            F.min("doc_id").alias("doc_id")
        )
        kept = survivors.join(keepers.select("doc_id"), "doc_id")
        return textkit.langid(kept).join(
            kept.select("doc_id", "n_tokens"), "doc_id"
        )
    q["text_curation_pipeline"] = text_curation_pipeline

    def text_training_export(spark, sf_dir):
        # The EXPORT half of the text story composed as one plan:
        # duplicate-span gate (corpus-repeated 5-grams cover < 20% of
        # a doc's tokens) → GPT-style sequence packing over the
        # survivors → per-(source, shard, pack) manifest. Packing
        # offsets are computed over the GATED set (the stream a loader
        # actually reads); the oracle chains the dup-span CTE into the
        # same filtered pack window.
        d = _t(spark, sf_dir, "documents")
        spans = dedup.dup_span_features(d, n=5)
        kept_ids = spans.filter(F.col("dup_frac_x1000") < 200).select("doc_id")
        packed = textkit.pack_sequences(
            d.join(kept_ids, "doc_id"), cap=512, n_shards=8
        )
        return packed.groupBy("source", "shard", "pack_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
    q["text_training_export"] = text_training_export

    return q


# --------------------------------------------------------------------
# oracle SQL (DuckDB dialect; same tables pre-registered as views)
# --------------------------------------------------------------------

_STOP_SQL = "('" + "','".join(textkit.STOPWORDS) + "')"

# shared SQL fragments -------------------------------------------------
_DOC_URLS = (
    "SELECT doc_id, 'https://' || source || '.example.com/d/' || "
    "CAST(doc_id AS VARCHAR) AS url FROM documents"
)
_MIXED_URLS = (
    "SELECT event_id, CASE "
    "WHEN event_id % 4 = 0 THEN 'mailto:u@example.com' "
    "WHEN event_id % 4 = 1 THEN 'javascript:void(0)' "
    "ELSE 'https://h' || CAST(event_id % 7 AS VARCHAR) || '.test/p/' || "
    "CAST(event_id AS VARCHAR) END AS url FROM events"
)
# distinct word-3-gram shingles per doc (single-space split), matching
# ccbot_spark.functions.dedup.shingles exactly
_SHINGLES = (
    "SELECT doc_id, unnest(list_distinct(list_transform("
    "generate_series(1, len(string_split(text,' ')) - 2), "
    "i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))) AS shingle "
    "FROM documents WHERE len(string_split(text,' ')) >= 3"
)
def _sql_h64(expr: str) -> str:
    """DuckDB: first 8 bytes of md5(expr) as a HUGEINT in [0, 2^64) —
    Horner fold over the 16 hex chars; mirrors dedup._h64 (Spark
    conv(substr(md5(x),1,16),16,10)) and the python references'
    int.from_bytes(md5(s).digest()[:8], 'big')."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}),1,16), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT)), "
        "(a,b) -> a*16 + b)"
    )


# exact double cosine, same fold order as the Spark side
_COS = (
    "list_sum(list_transform(generate_series(1, len(a.emb)), "
    "i -> a.emb[i] * b.emb[i])) / "
    "(sqrt(list_sum(list_transform(a.emb, x -> x*x))) * "
    "sqrt(list_sum(list_transform(b.emb, x -> x*x))))"
)
_EMB_D = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

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

    # --- a_domain_budget: domain derived arithmetically (the Spark
    # side must read the same grouping back out of the host STRING).
    o["a_domain_budget"] = """
        WITH c AS (
          SELECT 'd' || CAST((event_id % 24) % 5 AS VARCHAR) || '.test' AS domain,
                 'http://h' || CAST(event_id % 24 AS VARCHAR)
                   || '.d' || CAST((event_id % 24) % 5 AS VARCHAR)
                   || '.test/p/' || CAST(event_id AS VARCHAR) AS url,
                 CAST(event_id * 37 % 101 AS BIGINT) AS priority
          FROM events WHERE event_id < 5000
        )
        SELECT domain, url, priority, rnk FROM (
          SELECT domain, url, priority,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY priority DESC, url ASC
                 ) AS BIGINT) AS rnk
          FROM c
        ) WHERE rnk <= 7
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

    o["j_phash_dedup"] = """
        SELECT p_partkey, p_brand FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_quantity > 45)
    """

    o["j_phash_near"] = """
        WITH h AS (
          SELECT doc_id, n_chars * 1103515245 + 12345 AS h FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.h, b.h)) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
          AND (
            (a.h & 65535) = (b.h & 65535)
            OR ((a.h // 65536) & 65535) = ((b.h // 65536) & 65535)
            OR ((a.h // 4294967296) & 65535) = ((b.h // 4294967296) & 65535)
            OR ((a.h // 281474976710656) & 65535) = ((b.h // 281474976710656) & 65535)
          )
        WHERE bit_count(xor(a.h, b.h)) <= 4
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

    o["f_host"] = f"""
        SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
               COUNT(*) AS n_urls
        FROM ({_DOC_URLS}) GROUP BY 1
    """

    # Independent SURT re-derivation: DuckDB string/list functions
    # applying the same textual rules (host-lowered, www-stripped,
    # labels reversed with ',', explicit port kept, empty path → '/',
    # query pairs sorted) — not a transliteration of the Spark plan.
    o["f_surt"] = r"""
        WITH u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0 THEN 'not a url' ELSE
                 'https://www.' || source || '.example.com'
                 || CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
                 || '/d/' || CAST(doc_id AS VARCHAR)
                 || CASE WHEN doc_id % 5 = 0 THEN ''
                         ELSE '?z=' || CAST(n_chars AS VARCHAR)
                              || '&a=' || lang END
                 || CASE WHEN doc_id % 3 = 0 THEN '#f?x=1' ELSE '' END
                 END AS url
          FROM documents
        ), p AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
                 regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS pth,
                 regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+[^?#]*\?([^#]*)',
                       1) AS qry
          FROM u
        ), h AS (
          SELECT doc_id, url,
                 regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                                '^www\.', '') AS host,
                 regexp_extract(hostport, '(:[0-9]+)$', 1) AS port,
                 CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
                 COALESCE(array_to_string(list_sort(list_filter(
                     string_split(qry, '&'), x -> x <> '')), '&'), '') AS sq
          FROM p
        )
        SELECT doc_id,
               CASE WHEN NOT regexp_matches(url,
                        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+') THEN NULL
               ELSE
               array_to_string(list_reverse(string_split(host, '.')), ',')
               || port || ')' || pth
               || CASE WHEN sq = '' THEN '' ELSE '?' || sq END
               END AS surt
        FROM h
    """

    o["cdx_index"] = """
        WITH r AS (
          SELECT array_to_string(list_reverse(string_split(
                     source || '.example.com', '.')), ',')
                 || ')/d/' || CAST(doc_id AS VARCHAR) AS surt,
                 CAST(20260101000000 AS BIGINT) + CAST(doc_id AS BIGINT) AS ts,
                 md5(text) AS digest,
                 CAST(n_chars AS BIGINT) AS n_bytes
          FROM documents
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY surt, ts) - 1 AS BIGINT) AS seq,
               surt, ts, digest, n_bytes
        FROM r
    """

    o["g_hostgraph"] = """
        WITH e AS (
          SELECT d.source AS src_host, d.doc_id AS src_page,
                 dst.dst_page
          FROM documents d,
               LATERAL (VALUES ((d.doc_id * 2 + 1) % 500),
                               ((d.doc_id * 3 + 2) % 500)) AS dst(dst_page)
        )
        SELECT e.src_host, t.source AS dst_host,
               COUNT(*) AS n_edges,
               COUNT(DISTINCT e.src_page) AS n_src_pages
        FROM e JOIN documents t ON t.doc_id = e.dst_page
        GROUP BY 1, 2
    """

    # --- g_host_authority: the hostgraph rollup re-derived, then the
    # same integer endorsement split (div truncation contractual).
    o["g_host_authority"] = """
        WITH e AS (
          SELECT d.source AS src_host, d.doc_id AS src_page,
                 dst.dst_page
          FROM documents d,
               LATERAL (VALUES ((d.doc_id * 2 + 1) % 500),
                               ((d.doc_id * 3 + 2) % 500)) AS dst(dst_page)
        ), hg AS (
          SELECT e.src_host, t.source AS dst_host,
                 COUNT(*) AS n_edges
          FROM e JOIN documents t ON t.doc_id = e.dst_page
          GROUP BY 1, 2
        ), od AS (
          SELECT src_host, SUM(n_edges) AS outdeg FROM hg GROUP BY 1
        )
        SELECT hg.dst_host AS host,
               CAST(SUM((n_edges * 1000000) // outdeg) AS BIGINT)
                 AS authority_micro,
               CAST(COUNT(*) AS BIGINT) AS n_in_hosts
        FROM hg JOIN od USING (src_host)
        GROUP BY hg.dst_host
    """

    o["text_wet_extract"] = r"""
        WITH h AS (
          SELECT doc_id,
                 '<html><head><title>' || source
                 || '</title><style>p{margin:0}</style></head><body>'
                 || '<script>var n=1;</script><h1>' || lang
                 || '</h1><p>' || text
                 || '</p><p>&amp; &lt;tail&gt;</p></body></html>' AS html
          FROM documents
        )
        SELECT doc_id,
               trim(regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(regexp_replace(regexp_replace(html,
                     '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                     '(?s)<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&amp;', '&'),
                 '\s+', ' ', 'g')) AS wet_text
        FROM h
    """

    o["recrawl_schedule"] = """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_visits,
               CAST(list_reduce(
                 list_prepend(CAST(4 AS BIGINT),
                   list(CAST(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END
                             AS BIGINT) ORDER BY ts, event_id)),
                 (acc, x) -> CASE WHEN x = 1 THEN greatest(acc // 2, 1)
                                  ELSE least(acc * 2, 64) END
               ) AS BIGINT) AS next_interval
        FROM events GROUP BY user_id
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

    # --- j_asof: DuckDB's native ASOF JOIN is the independent oracle
    # for the union+window implementation
    o["j_asof"] = """
        WITH build AS (
          SELECT user_id, ts, max_by(value, event_id) AS value
          FROM events WHERE event_type = 'error' GROUP BY user_id, ts
        ),
        probe AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS ts_us,
               CAST(coalesce(epoch_us(b.ts), -1) AS BIGINT) AS asof_ts_us,
               coalesce(b.value, -1.0) AS asof_value
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.ts >= b.ts
    """

    # --- j_range_bucket: plain inequality join at oracle scale; the
    # Spark side buckets time so it never plans a theta-join
    o["j_range_bucket"] = """
        WITH iv AS (
          SELECT event_id AS iv_id, user_id, ts AS start_ts
          FROM events WHERE event_type = 'error'
        ),
        pr AS (
          SELECT user_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'click'
        )
        SELECT iv.iv_id, iv.user_id,
               epoch_us(iv.start_ts) AS start_ts_us,
               CAST(count(pr.ts) AS BIGINT) AS n_probes,
               CAST(coalesce(sum(pr.cents), 0) AS BIGINT) AS sum_cents
        FROM iv LEFT JOIN pr
          ON iv.user_id = pr.user_id
         AND pr.ts >= iv.start_ts
         AND pr.ts < iv.start_ts + INTERVAL 600 SECOND
        GROUP BY iv.iv_id, iv.user_id, iv.start_ts
    """

    # --- a_sessionize: gaps-and-islands with the same strict->gap
    # boundary and (ts, event_id) tiebreak as eventops.sessionize
    o["a_sessionize"] = """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        n AS (
          SELECT user_id, ts, cents,
                 CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_id
          FROM x
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(epoch_us(ts)) AS session_start_us,
               max(epoch_us(ts)) AS session_end_us,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM n GROUP BY user_id, session_id
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

    o["dedup_exact"] = """
        SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
               COUNT(*) AS copies
        FROM documents GROUP BY md5(text)
    """

    o["dedup_ngram_jaccard"] = f"""
        WITH sh AS ({_SHINGLES}),
        sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_sz
        FROM inter
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 10 >= 1 * (sa.sz + sb.sz - inter)
    """

    # --- dedup_edit_distance: the same shingle-blocked candidates,
    # verified by DuckDB's levenshtein() (identical definition to the
    # JVM builtin) + the length columns.
    o["dedup_edit_distance"] = f"""
        WITH sh AS ({_SHINGLES}),
        sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        cand AS (
          SELECT doc_a, doc_b
          FROM inter
          JOIN sz sa ON sa.doc_id = doc_a
          JOIN sz sb ON sb.doc_id = doc_b
          WHERE inter * 10 >= 1 * (sa.sz + sb.sz - inter)
        )
        SELECT doc_a, doc_b,
               CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
               CAST(length(ta.text) AS BIGINT) AS len_a,
               CAST(length(tb.text) AS BIGINT) AS len_b
        FROM cand
        JOIN documents ta ON ta.doc_id = doc_a
        JOIN documents tb ON tb.doc_id = doc_b
        WHERE levenshtein(ta.text, tb.text) <= 60
    """

    # --- decontamination: corpus docs (doc_id%50 != 0) sharing any
    # word 3-gram with the eval split (doc_id%50 = 0); per-doc grams
    # are distinct, so COUNT(*) = distinct contaminated grams.
    # --- text_dup_spans: independent relational formulation — list
    # slicing builds the positional 5-grams, a HAVING>1 gram set joins
    # back, UNNEST(range(5)) expands each hit to its covered token
    # interval, DISTINCT unions the intervals.
    o["text_dup_spans"] = """
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(l[i+1:i+5], ' ') AS gram
          FROM toks, UNNEST(range(len(l) - 4)) AS r(i)
          WHERE len(l) >= 5
        ),
        dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
        cov AS (
          SELECT DISTINCT g.doc_id, g.pos + o.o AS idx
          FROM grams g JOIN dupg USING (gram), UNNEST(range(5)) AS o(o)
        ),
        nt AS (SELECT doc_id, len(l) AS n_tokens FROM toks WHERE len(l) > 0)
        SELECT nt.doc_id,
               CAST(nt.n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS dup_tokens,
               CAST(1000 * COALESCE(c.n, 0) // nt.n_tokens AS BIGINT)
                 AS dup_frac_x1000
        FROM nt LEFT JOIN (
          SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id
        ) c USING (doc_id)
    """

    o["text_decontaminate"] = f"""
        WITH sh AS ({_SHINGLES}),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
        SELECT sh.doc_id, COUNT(*) AS shared_grams
        FROM sh JOIN ev USING (shingle)
        WHERE sh.doc_id % 50 <> 0
        GROUP BY sh.doc_id
    """

    o["dedup_ngram_capped"] = f"""
        WITH sh0 AS ({_SHINGLES}),
        rare AS (
          SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 20
        ),
        sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (shingle)),
        sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_sz
        FROM inter
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 10 >= 1 * (sa.sz + sb.sz - inter)
    """

    o["text_tokens_bpe"] = r"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents
    """

    o["text_quality_filter"] = f"""
        WITH qc AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> t IN {_STOP_SQL})) AS n_stopwords,
                 len(list_distinct(string_split(lower(text), ' ')))
                     AS n_distinct_tokens
          FROM documents
        )
        SELECT doc_id FROM qc
        WHERE n_tokens >= 20
          AND n_stopwords * 100 >= n_tokens * 2
          AND n_distinct_tokens * 10 >= n_tokens * 3
    """

    o["dedup_embedding"] = f"""
        WITH e AS ({_EMB_D})
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 3500 / 10000.0
    """

    # --- Bucketed embedding near-dup: md5-seeded sign planes, integer
    # quantized rerank (10^8·dot² vs t4²·‖a‖²·‖b‖² in int128/decimal38)
    # — fully integer, so both engines agree bit-for-bit.
    _pw = dedup.plane_weights(64)
    planes_vals = ", ".join(
        f"({p},{c + 1},{_pw[p][c]})" for p in range(dedup.EMB_PLANES) for c in range(64)
    )
    pb_vals = ", ".join(
        f"({p},{p // dedup.EMB_BAND_BITS},{1 << (p % dedup.EMB_BAND_BITS)})"
        for p in range(dedup.EMB_PLANES)
    )
    o["dedup_embedding_lsh"] = f"""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(FLOOR(x * 10000) AS BIGINT)) AS q
          FROM embeddings
        ),
        n AS (
          SELECT vec_id, q,
                 list_sum(list_transform(q, x -> x * x)) AS n2
          FROM e
        ),
        planes(p, c, w) AS (VALUES {planes_vals}),
        pb(p, band_id, bitw) AS (VALUES {pb_vals}),
        dots AS (
          SELECT vec_id, p, SUM(q[c] * w) AS dot
          FROM e CROSS JOIN planes GROUP BY vec_id, p
        ),
        bands AS (
          SELECT vec_id, band_id,
                 CAST(SUM(CASE WHEN dot > 0 THEN bitw ELSE 0 END) AS BIGINT)
                     AS band_val
          FROM dots JOIN pb USING (p) GROUP BY vec_id, band_id
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.vec_id < b.vec_id
        ),
        rr AS (
          SELECT c.vec_a, c.vec_b,
                 list_sum(list_transform(generate_series(1, len(na.q)),
                          i -> na.q[i] * nb.q[i])) AS dot,
                 na.n2 AS na2, nb.n2 AS nb2
          FROM cand c
          JOIN n na ON na.vec_id = c.vec_a
          JOIN n nb ON nb.vec_id = c.vec_b
        )
        SELECT vec_a, vec_b FROM rr
        WHERE dot > 0
          AND CAST(100000000 AS HUGEINT) * dot * dot
              >= CAST({3500 * 3500} AS HUGEINT) * na2 * nb2
    """

    o["ann_topk"] = f"""
        WITH e AS ({_EMB_D}),
        q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 10),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 list_sum(list_transform(generate_series(1, len(q.emb)),
                   i -> q.emb[i] * e.emb[i])) /
                 (sqrt(list_sum(list_transform(q.emb, x -> x*x))) *
                  sqrt(list_sum(list_transform(e.emb, x -> x*x)))) AS cos
          FROM q JOIN e ON e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 5
    """

    # --- ANN IVF (integer-exact): mirrors similarity.ivf_topk_int —
    # unit-normalize with the same left-fold norm, quantize to
    # floor(x·2^20), then centroid assignment / probing / rerank are
    # all exact int64 dot products with id tie-breaks.
    o["ann_ivf"] = f"""
        WITH e AS ({_EMB_D}),
        nq AS (
          SELECT vec_id,
                 list_transform(emb, x -> CAST(FLOOR(
                   x / sqrt(list_sum(list_transform(emb, y -> y*y)))
                     * 1048576.0) AS BIGINT)) AS q
          FROM e
        ),
        cents AS (
          SELECT vec_id AS cid, q AS cq FROM nq
          WHERE vec_id % 997 < 31 ORDER BY vec_id LIMIT 16
        ),
        assign AS (
          SELECT vec_id, q, cid FROM (
            SELECT n.vec_id, n.q, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(n.q)),
                       i -> n.q[i] * c.cq[i])) DESC, c.cid ASC) AS rn
            FROM nq n CROSS JOIN cents c
          ) WHERE rn = 1
        ),
        qs AS (SELECT vec_id AS query_id, q AS qq FROM nq WHERE vec_id < 10),
        probes AS (
          SELECT query_id, qq, cid FROM (
            SELECT s.query_id, s.qq, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                     list_sum(list_transform(generate_series(1, len(s.qq)),
                       i -> s.qq[i] * c.cq[i])) DESC, c.cid ASC) AS rn
            FROM qs s CROSS JOIN cents c
          ) WHERE rn <= 4
        ),
        cand AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_sum(list_transform(generate_series(1, len(p.qq)),
                   i -> p.qq[i] * a.q[i])) AS dot
          FROM probes p JOIN assign a
            ON a.cid = p.cid AND a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id ASC) AS rn
          FROM cand
        ) WHERE rn <= 5
    """

    # --- ANN LSH: bucket assignment mirrors similarity._bucket_udf
    # (md5-seeded integer planes over quantized vectors); rerank is the
    # same left-fold cosine as the ann_topk oracle, restricted to the
    # query's bucket.
    _lw = dedup.plane_weights(64, n_planes=6)
    lsh_planes_vals = ", ".join(
        f"({p},{c + 1},{_lw[p][c]})" for p in range(6) for c in range(64)
    )
    o["ann_lsh"] = f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(FLOOR(x * 10000) AS BIGINT)) AS q
          FROM embeddings
        ),
        planes(p, c, w) AS (VALUES {lsh_planes_vals}),
        pb(p, pow2) AS (VALUES (0,1),(1,2),(2,4),(3,8),(4,16),(5,32)),
        dots AS (
          SELECT vec_id, p, SUM(q[c] * w) AS dot
          FROM e CROSS JOIN planes GROUP BY vec_id, p
        ),
        buck AS (
          SELECT vec_id,
                 CAST(SUM(CASE WHEN dot > 0 THEN pow2 ELSE 0 END) AS INTEGER)
                     AS bucket
          FROM dots JOIN pb USING (p) GROUP BY vec_id
        ),
        eb AS (SELECT e.vec_id, e.emb, b.bucket FROM e JOIN buck b USING (vec_id)),
        qs AS (
          SELECT vec_id AS query_id, emb AS q_emb, bucket AS q_bucket
          FROM eb WHERE vec_id < 10
        ),
        scored AS (
          SELECT qs.query_id, c.vec_id AS neighbor_id,
                 list_sum(list_transform(generate_series(1, len(qs.q_emb)),
                   i -> qs.q_emb[i] * c.emb[i])) /
                 (sqrt(list_sum(list_transform(qs.q_emb, x -> x*x))) *
                  sqrt(list_sum(list_transform(c.emb, x -> x*x)))) AS cos
          FROM qs JOIN eb c
            ON c.bucket = qs.q_bucket AND c.vec_id <> qs.query_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 5
    """

    o["text_quality"] = f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_q,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN {_STOP_SQL})) AS BIGINT) AS n_stopwords,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS BIGINT) AS n_distinct_tokens
        FROM documents
    """

    # --- MinHash+LSH: engine-neutral because both sides define the
    # shingle hash as md5-hex-first-16 → uint64 → mod p, and the
    # signature fold is explicit integer arithmetic (dedup.py:
    # minhash_signatures does it with JVM min-aggregates).
    mh_params = ", ".join(
        f"({i}, {int(dedup.MH_A[i])}, {int(dedup.MH_B[i])})"
        for i in range(dedup.MH_K)
    )
    o["dedup_minhash_lsh"] = f"""
        WITH sh AS ({_SHINGLES}),
        hx AS (
          SELECT doc_id, CAST({_sql_h64('shingle')} % 2147483647 AS BIGINT) AS x
          FROM sh
        ),
        params(i, a, b) AS (VALUES {mh_params}),
        sigs0 AS (
          SELECT doc_id, i, MIN((a * x + b) % 2147483647) AS s
          FROM hx CROSS JOIN params GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT d.doc_id, p.i, COALESCE(s0.s, 2147483647) AS s
          FROM (SELECT doc_id FROM documents) d
          CROSS JOIN params p
          LEFT JOIN sigs0 s0 ON s0.doc_id = d.doc_id AND s0.i = p.i
        ),
        bands AS (
          SELECT doc_id, i // 8 AS band_id,
                 md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS band_hash
          FROM sigs GROUP BY doc_id, i // 8
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
        ),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 COUNT(*) FILTER (WHERE sa.s = sb.s) AS matches
          FROM cand c
          JOIN sigs sa ON sa.doc_id = c.doc_a
          JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b,
               CAST(FLOOR(matches * 10.0 / 64) AS BIGINT) AS est10
        FROM est
    """

    # --- SimHash: per-token uint64 hash (same md5 construction), bit
    # votes, sign → bit (weight −2^63 for bit 63), 4×16-bit band join.
    sh_bits = ", ".join(
        f"({j}, CAST({1 << j} AS HUGEINT), "
        f"{(1 << j) if j < 63 else '-9223372036854775807 - 1'})"
        for j in range(64)
    )
    o["dedup_simhash"] = f"""
        WITH toks AS (
          -- COALESCE([NULL]) mirrors Spark's explode_outer: a NULL text
          -- keeps its doc with one NULL token (every vote then falls to
          -- the ELSE -1 branch, sh = 0)
          SELECT doc_id,
                 unnest(COALESCE(string_split(lower(text), ' '),
                                 [CAST(NULL AS VARCHAR)])) AS tok
          FROM documents
        ),
        h AS (SELECT doc_id, {_sql_h64('tok')} AS hu FROM toks),
        bits(j, pow, w) AS (VALUES {sh_bits}),
        votes AS (
          SELECT doc_id, j, w,
                 SUM(CASE WHEN (hu // pow) % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM h CROSS JOIN bits GROUP BY doc_id, j, w
        ),
        sig AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN v > 0 THEN w ELSE 0 END) AS BIGINT) AS sh
          FROM votes GROUP BY doc_id
        ),
        ub AS (
          SELECT doc_id, sh,
                 CASE WHEN sh < 0
                      THEN CAST(sh AS HUGEINT)
                           + CAST(18446744073709551616 AS HUGEINT)
                      ELSE CAST(sh AS HUGEINT) END AS shu
          FROM sig
        ),
        bands AS (
          SELECT doc_id, sh, b AS band_id,
                 CAST((shu // pow16) % 65536 AS BIGINT) AS band_val
          FROM ub CROSS JOIN (VALUES
            (0, CAST(1 AS HUGEINT)), (1, CAST(65536 AS HUGEINT)),
            (2, CAST(4294967296 AS HUGEINT)),
            (3, CAST(281474976710656 AS HUGEINT))) t(b, pow16)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.sh AS sha, b.sh AS shb
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sha, shb)) AS hamming
        FROM pairs WHERE bit_count(xor(sha, shb)) <= 16
    """

    # --- Fingerprint: Horner fold of UTF-8 bytes mod 2^61-1; byte
    # stream recovered engine-neutrally via hex(encode(text)).
    o["text_fingerprint"] = """
        SELECT doc_id,
               CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                 ELSE list_reduce(
                   list_transform(
                     generate_series(1, octet_length(encode(text))),
                     i -> CAST(
                       16 * (strpos('0123456789ABCDEF',
                                    substr(hex(encode(text)), 2*i - 1, 1)) - 1)
                       + strpos('0123456789ABCDEF',
                                substr(hex(encode(text)), 2*i, 1)) - 1
                       AS HUGEINT)),
                   (a, b) -> (a * 257 + b) % 2305843009213693951)
               END AS BIGINT) AS fp
        FROM documents
    """

    o["text_langid"] = f"""
        SELECT doc_id, lang AS lang_tagged,
               CASE WHEN len(list_filter(string_split(lower(text), ' '),
                         t -> t IN {_STOP_SQL})) * 20
                         >= len(string_split(text, ' '))
                    THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents
    """

    # --- dedup_components: min-reachable-label over the ngram-Jaccard
    # pair graph (WITH RECURSIVE; UNION-distinct bounds the state) —
    # the independent fixpoint formulation of the Spark side's
    # pointer-jumping label propagation.
    o["dedup_components"] = f"""
        WITH RECURSIVE pairs AS ({o["dedup_ngram_jaccard"]}),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        )
        SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """

    # --- dedup_keep_best: the components fixpoint extended with the
    # keeper window (highest n_chars, then lowest doc_id; singletons
    # keep themselves)
    o["dedup_keep_best"] = f"""
        WITH RECURSIVE pairs AS ({o["dedup_ngram_jaccard"]}),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        ),
        comp AS (
          SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
          FROM reach GROUP BY node
        ),
        joined AS (
          SELECT d.doc_id,
                 COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
                 d.n_chars
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT doc_id, cluster_id, n_chars FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
          FROM joined
        ) WHERE rn = 1
    """

    # --- deterministic sampling / quotas: the Spark side hashes
    # conv(substr(md5(key),1,15),16,10) % mod (60 bits — BIGINT-safe
    # Horner fold here, no HUGEINT needed)
    def _sql_hmod(expr: str, mod: int) -> str:
        return (
            f"(list_reduce(list_transform(string_split(substr(md5({expr}),1,15), ''), "
            "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
            f"(a,b) -> a*16 + b) % {mod})"
        )

    o["w_rate_limit"] = f"""
        WITH s AS (
          SELECT event_id,
                 'h' || CAST(user_id % 40 AS VARCHAR) || '.test' AS host,
                 ts,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY 'h' || CAST(user_id % 40 AS VARCHAR) || '.test'
                   ORDER BY ts ASC, event_id ASC
                 ) - 1 AS INTEGER) AS slot
          FROM events
        )
        SELECT event_id, host, slot,
               ({_sql_hmod("'sel:' || host", 100)} < 60
                AND slot >= 2 + {_sql_hmod("'rl:' || host", 4)}) AS rate_limited,
               CAST(CASE WHEN {_sql_hmod("'sel:' || host", 100)} < 60
                          AND slot >= 2 + {_sql_hmod("'rl:' || host", 4)}
                    THEN 2 + {_sql_hmod("'ra:' || host", 2)}
                    ELSE 0 END AS INTEGER) AS not_before
        FROM s
    """

    o["w_ip_schedule"] = f"""
        WITH b AS (
          SELECT event_id,
                 'h' || CAST(user_id % 40 AS VARCHAR) || '.test' AS host,
                 ts
          FROM events
        ), c AS (
          SELECT event_id, host, ts,
                 'ip-' || CAST({_sql_hmod("host", 7)} AS VARCHAR) AS ip,
                 CAST(100 + {_sql_hmod("'d:' || host", 9)} * 50 AS BIGINT)
                   AS delay_ms
          FROM b
        )
        SELECT event_id, host, ip, delay_ms,
               CAST(COALESCE(SUM(delay_ms) OVER (
                 PARTITION BY ip ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS sched_ms
        FROM c
    """

    o["sample_hash"] = f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 10
    """

    o["sample_split"] = f"""
        SELECT doc_id,
               {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} AS split_bucket,
               CASE WHEN {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 90
                    THEN 'train'
                    WHEN {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 95
                    THEN 'val' ELSE 'test' END AS split
        FROM documents
    """

    o["sample_stratified"] = f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} <
              CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50
                        WHEN 'zh' THEN 80 ELSE 0 END
    """

    o["doc_source_cap"] = """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn <= 10
    """

    o["text_vocab_topk"] = """
        SELECT tok, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 30
    """

    # --- link_pagerank: the 3 integer-exact rank rounds unrolled as
    # CTEs (one per iteration — DuckDB's independent formulation of
    # the Spark side's checkpointed loop). `//` here and `div` there
    # both truncate, all values non-negative → bit-identical.
    _pr_round = """
        SELECT n.node,
               CAST(150000 + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(p.r // o.outdeg) AS in_sum
            FROM e
            JOIN {prev} p ON p.node = e.src
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst
        ) s ON s.node = n.node
    """
    o["link_pagerank"] = f"""
        WITH e AS (
          SELECT DISTINCT l_orderkey * 10 AS src, l_partkey * 10 + 1 AS dst
          FROM lineitem
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        r1 AS ({_pr_round.format(prev="r0")}),
        r2 AS ({_pr_round.format(prev="r1")}),
        r3 AS ({_pr_round.format(prev="r2")})
        SELECT node, r AS rank_micro FROM r3
    """

    # --- img_phash_near: md5-synthesized phashes (two 31-bit halves →
    # value < 2^62), banded 4×16-bit Hamming join — the same
    # construction as the Spark side's multimodal.phash_near_pairs
    # input, reproduced on HUGEINT then narrowed to BIGINT.
    o["img_phash_near"] = f"""
        WITH ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        pairs AS (
          SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
                 a.phash AS pa, b.phash AS pb
          FROM ph a JOIN ph b ON a.image_id < b.image_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
        )
        SELECT img_a, img_b, bit_count(xor(pa, pb)) AS hamming
        FROM pairs WHERE bit_count(xor(pa, pb)) <= 6
    """

    # --- img_curation: md5-synthesized (w, h) + doc_id-sliced captions,
    # then the LAION-style metadata gates — integer aspect (×10, floor
    # division) keeps the threshold engine-exact.
    o["img_blocklist"] = f"""
        WITH ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        bl AS (
          SELECT CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                   + CAST((h64 % 4294967296) % 2147483648 AS BIGINT) AS bad_phash
          FROM (SELECT {_sql_h64("'img:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 50 AND doc_id % 7 = 0)
        ),
        hits AS (
          SELECT p.image_id, p.phash, b.bad_phash,
                 CAST(bit_count(xor(p.phash, b.bad_phash)) AS INTEGER) AS hamming,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.image_id
                   ORDER BY bit_count(xor(p.phash, b.bad_phash)), b.bad_phash
                 ) AS rn
          FROM ph p JOIN bl b
            ON bit_count(xor(p.phash, b.bad_phash)) <= 1
        )
        SELECT image_id, phash, bad_phash, hamming FROM hits WHERE rn = 1
    """

    o["img_curation"] = f"""
        WITH meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST((h64 // 4294967296) % 481 + 32 AS INTEGER) AS w,
                 CAST((h64 % 4294967296) % 481 + 32 AS INTEGER) AS h,
                 CASE WHEN doc_id % 11 = 0
                      THEN 'IMG_' || CAST(doc_id AS VARCHAR)
                      ELSE substr(text, 1, CAST(doc_id % 120 + 1 AS INT))
                 END AS caption
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents)
        ),
        feat AS (
          SELECT image_id, w, h, caption,
                 CAST((greatest(w, h) * 10) // least(w, h) AS BIGINT) AS aspect_x10,
                 CAST(length(caption) AS BIGINT) AS cap_chars,
                 CAST(len(list_filter(string_split(caption, ' '), t -> t <> ''))
                      AS BIGINT) AS cap_words
          FROM meta
        )
        SELECT image_id, w, h, aspect_x10, cap_chars, cap_words,
               CAST(CASE WHEN least(w, h) >= 64 AND aspect_x10 <= 30
                          AND cap_words BETWEEN 3 AND 64 AND cap_chars <= 256
                          AND NOT regexp_matches(lower(caption),
                               '^(img_[0-9]+|dsc[0-9]+|untitled|no caption)')
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM feat
    """

    # --- img_header_meta: the synth images encode dims that are a pure
    # function of doc_id, so the oracle re-derives WHAT THE CODEC WROTE
    # arithmetically; Spark must read the same numbers back out of the
    # binary headers (PNG IHDR / PPM ASCII) to hash-match.
    o["img_header_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS hdr_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS hdr_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_bmp_meta: 4-format cycle (ppm/png/qpng/bmp) — a green row
    # proves the little-endian BMP branch reads back exactly what
    # encode_bmp wrote, alongside the big-endian PNG and ASCII PPM
    # branches on the same scan.
    o["img_bmp_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 4 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS hdr_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS hdr_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_jpeg_meta: 5-format cycle (ppm/png/qpng/bmp/jpeg). The
    # oracle re-derives container + dims from the synthesis arithmetic;
    # for jpeg rows Spark must pull the SAME dims out of the SOF0
    # marker segment this repo's own T.81 encoder wrote — two
    # independent codepaths (numpy Huffman writer, JVM substring/conv
    # marker walk) agreeing with pure arithmetic.
    o["img_jpeg_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 5 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               WHEN 4 THEN 'jpeg'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS img_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS img_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_gif_meta: 6-format cycle (ppm/png/qpng/bmp/jpeg/gif). A
    # green gif row proves the fixed-offset little-endian logical-
    # screen parse reads back exactly what this repo's own GIF89a/LZW
    # encoder wrote — the container round 5 closed.
    o["img_gif_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 6 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               WHEN 4 THEN 'jpeg'
                               WHEN 5 THEN 'gif'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS img_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS img_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_letterbox_plan: the letterbox geometry restated as SQL —
    # same integer fit rule (w·th ≥ h·tw picks the wide branch), same
    # floor divisions, same centered pads. A green row proves every
    # number the Arrow pixel stage consumes.
    o["img_letterbox_plan"] = """
        WITH dims AS (
          SELECT doc_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        ), b AS (
          SELECT doc_id, w, h,
                 CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                      WHEN (1000 * w) // h < 866 THEN '3:4'
                      WHEN (1000 * w) // h < 1154 THEN '1:1'
                      WHEN (1000 * w) // h < 1539 THEN '4:3'
                      ELSE '16:9' END AS bucket
          FROM dims
        ), t AS (
          SELECT *,
                 CASE bucket WHEN '9:16' THEN 36 WHEN '3:4' THEN 48
                             WHEN '1:1' THEN 64 WHEN '4:3' THEN 64
                             ELSE 64 END AS out_w,
                 CASE bucket WHEN '9:16' THEN 64 WHEN '3:4' THEN 64
                             WHEN '1:1' THEN 64 WHEN '4:3' THEN 48
                             ELSE 36 END AS out_h
          FROM b
        ), s AS (
          SELECT *,
                 CASE WHEN w * out_h >= h * out_w THEN out_w
                      ELSE greatest(1, (w * out_h) // h) END AS scaled_w,
                 CASE WHEN w * out_h >= h * out_w
                      THEN greatest(1, (h * out_w) // w)
                      ELSE out_h END AS scaled_h
          FROM t
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id, bucket,
               CAST(out_w AS BIGINT) AS out_w,
               CAST(out_h AS BIGINT) AS out_h,
               CAST(scaled_w AS BIGINT) AS scaled_w,
               CAST(scaled_h AS BIGINT) AS scaled_h,
               CAST((out_w - scaled_w) // 2 AS BIGINT) AS pad_x,
               CAST((out_h - scaled_h) // 2 AS BIGINT) AS pad_y
        FROM s
    """

    # --- img_png_scrub: the planted tEXt chunk costs 12 (framing) +
    # 8 ('Comment' + NUL) + doc_id % 23 (body) bytes on PNG-container
    # rows; ppm rows scrub nothing. Green = the chunk walk removed
    # exactly the planted metadata, no more, no less.
    o["img_png_scrub"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
                 AS stripped_chunks,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                         ELSE 20 + doc_id % 23 END AS BIGINT)
                 AS stripped_bytes
        FROM documents WHERE doc_id < 450
    """

    # --- img_size_hist: same dim arithmetic folded to the class
    # histogram (sums cast to BIGINT — DuckDB SUM is HUGEINT).
    o["img_size_hist"] = """
        WITH dims AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        )
        SELECT container,
               CASE WHEN greatest(w, h) < 32 THEN 'icon'
                    WHEN greatest(w, h) < 64 THEN 'small'
                    WHEN greatest(w, h) < 96 THEN 'medium'
                    ELSE 'large' END AS size_class,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(w * h) AS BIGINT) AS total_px
        FROM dims GROUP BY 1, 2
    """

    # --- img_aspect_profile: same dim arithmetic through the integer
    # aspect ladder ((1000*w)//h vs the geometric-midpoint cuts).
    o["img_aspect_profile"] = """
        WITH dims AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        )
        SELECT container,
               CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                    WHEN (1000 * w) // h < 866 THEN '3:4'
                    WHEN (1000 * w) // h < 1154 THEN '1:1'
                    WHEN (1000 * w) // h < 1539 THEN '4:3'
                    ELSE '16:9' END AS aspect_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(w * h) AS BIGINT) AS total_px
        FROM dims GROUP BY 1, 2
    """

    # --- img_exact_dedup: byte-identity groups are doc_id % 150
    # classes by construction (same pixel seed, same container);
    # Spark groups on md5(bytes) and must land on the same keepers.
    o["img_exact_dedup"] = """
        WITH g AS (
          SELECT doc_id % 150 AS grp,
                 MIN('doc-' || CAST(doc_id AS VARCHAR)) AS keeper,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM documents WHERE doc_id < 450 GROUP BY 1
        )
        SELECT keeper, n_copies FROM g WHERE n_copies >= 2
    """

    # --- img_wds_shards: the WDS shard plan is a pure relational
    # expression over metadata (dims arithmetic + tar block rounding +
    # one running-total window), so the oracle states the identical
    # formula: cost = 512 + ceil(3wh/512)*512 + 512 +
    # ceil(len(caption)/512)*512; shard = (run_before) // 96KiB.
    o["img_wds_shards"] = """
        WITH s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h,
                 'caption for image ' || CAST(doc_id AS VARCHAR) AS caption
          FROM documents WHERE doc_id < 450
        ), c AS (
          SELECT image_id,
                 CAST(512 + ((3 * w * h + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost
          FROM s
        ), a AS (
          SELECT image_id, plan_cost,
                 CAST((SUM(plan_cost) OVER (
                        ORDER BY image_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) - plan_cost) // 98304 AS BIGINT) AS shard_id
          FROM c
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(image_id) AS key_min,
               MAX(image_id) AS key_max
        FROM a GROUP BY shard_id
    """

    # --- img_bucketed_shards: group-pure planning replayed as SQL —
    # per-bucket running windows, shard counts from the last sample's
    # pre-cost running total (a straddling sample stays in its shard),
    # bases = shards of lexicographically earlier buckets.
    o["img_bucketed_shards"] = """
        WITH s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h,
                 'caption for image ' || CAST(doc_id AS VARCHAR) AS caption
          FROM documents WHERE doc_id < 450
        ), c AS (
          SELECT image_id,
                 CAST(512 + ((3 * w * h + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost,
                 CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                      WHEN (1000 * w) // h < 866 THEN '3:4'
                      WHEN (1000 * w) // h < 1154 THEN '1:1'
                      WHEN (1000 * w) // h < 1539 THEN '4:3'
                      ELSE '16:9' END AS bucket
          FROM s
        ), a AS (
          SELECT image_id, bucket, plan_cost,
                 SUM(plan_cost) OVER (
                   PARTITION BY bucket ORDER BY image_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) - plan_cost AS bef
          FROM c
        ), g AS (
          SELECT bucket, MAX(bef) // 98304 + 1 AS n_shards
          FROM a GROUP BY bucket
        ), b AS (
          SELECT bucket,
                 COALESCE(SUM(n_shards) OVER (
                   ORDER BY bucket ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS base
          FROM g
        ), x AS (
          SELECT a.image_id, a.bucket, a.plan_cost,
                 CAST(b.base + a.bef // 98304 AS BIGINT) AS shard_id
          FROM a JOIN b USING (bucket)
        )
        SELECT shard_id, MIN(bucket) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(image_id) AS key_min,
               MAX(image_id) AS key_max
        FROM x GROUP BY shard_id
    """

    # --- img_mm_dedup: phash-band near pairs (img_phash_near synthesis,
    # numeric ids) ∪ exact-caption star edges, then the min-reachable
    # fixpoint — the independent formulation of
    # multimodal.mm_dedup_edges + dedup.connected_components.
    o["img_mm_dedup"] = f"""
        WITH RECURSIVE ph AS (
          SELECT doc_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash,
                 'cap-' || CAST(doc_id % 120 AS VARCHAR) AS caption
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        ph_pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
          WHERE bit_count(xor(a.phash, b.phash)) <= 6
        ),
        cap_pairs AS (
          SELECT r.a, m.doc_id AS b
          FROM ph m JOIN (SELECT caption, MIN(doc_id) AS a
                          FROM ph GROUP BY caption) r
            ON m.caption = r.caption AND m.doc_id <> r.a
        ),
        edges AS (
          SELECT a, b FROM ph_pairs UNION SELECT a, b FROM cap_pairs
          UNION SELECT b, a FROM ph_pairs UNION SELECT b, a FROM cap_pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(MIN(lab) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """

    # --- img_mm_keeper: the joint-cluster fixpoint extended with the
    # keeper window (largest md5-synthesized area, then lowest id;
    # singletons keep themselves) — mirrors keep_best_per_cluster over
    # mm_dedup_edges clusters.
    o["img_mm_keeper"] = f"""
        WITH RECURSIVE ph AS (
          SELECT doc_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash,
                 'cap-' || CAST(doc_id % 120 AS VARCHAR) AS caption
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        dims AS (
          SELECT doc_id,
                 CAST(((d64 // 4294967296) % 481 + 32)
                      * ((d64 % 4294967296) % 481 + 32) AS BIGINT) AS area
          FROM (SELECT doc_id,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS d64
                FROM documents WHERE doc_id < 200)
        ),
        ph_pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
          WHERE bit_count(xor(a.phash, b.phash)) <= 6
        ),
        cap_pairs AS (
          SELECT r.a, m.doc_id AS b
          FROM ph m JOIN (SELECT caption, MIN(doc_id) AS a
                          FROM ph GROUP BY caption) r
            ON m.caption = r.caption AND m.doc_id <> r.a
        ),
        edges AS (
          SELECT a, b FROM ph_pairs UNION SELECT a, b FROM cap_pairs
          UNION SELECT b, a FROM ph_pairs UNION SELECT b, a FROM cap_pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        ),
        comp AS (
          SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
          FROM reach GROUP BY node
        ),
        joined AS (
          SELECT d.doc_id,
                 COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
                 d.area
          FROM dims d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(cluster_id AS BIGINT) AS cluster_id, area
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster_id ORDER BY area DESC, doc_id) AS rn
          FROM joined
        ) WHERE rn = 1
    """

    # --- f_trap_detect: same synthesized URL mix; repeat detection is
    # multiset-based (depth − distinct segments), no RE backreferences.
    o["f_trap_detect"] = """
        WITH urls AS (
          SELECT event_id,
                 CASE
                   WHEN event_id % 5 = 0 THEN
                     'https://h' || CAST(event_id % 7 AS VARCHAR)
                       || '.test/cal/2024/cal/2024/cal/'
                       || CAST(event_id AS VARCHAR)
                   WHEN event_id % 5 = 1 THEN
                     'https://h' || CAST(event_id % 7 AS VARCHAR)
                       || '.test/a/b/c/d/e/f/g/h/i/'
                       || CAST(event_id AS VARCHAR)
                   WHEN event_id % 5 = 2 THEN
                     'https://h' || CAST(event_id % 7 AS VARCHAR)
                       || '.test/p/' || repeat('x', 160)
                       || CAST(event_id AS VARCHAR)
                   ELSE
                     'https://h' || CAST(event_id % 7 AS VARCHAR)
                       || '.test/p/' || CAST(event_id AS VARCHAR)
                 END AS url
          FROM events
        ),
        segs AS (
          SELECT event_id, url,
                 list_filter(string_split(
                   regexp_replace(url, '^[a-z]+://[^/]+', ''), '/'),
                   s -> s <> '') AS parts
          FROM urls
        ),
        f AS (
          SELECT event_id,
                 CAST(len(parts) AS BIGINT) AS depth,
                 CAST(len(parts) - len(list_distinct(parts)) AS BIGINT)
                   AS n_repeat,
                 CAST(length(url) AS BIGINT) AS url_len
          FROM segs
        )
        SELECT event_id, depth, n_repeat, url_len,
               CAST(CASE WHEN depth > 8 OR n_repeat > 1 OR url_len > 160
                         THEN 1 ELSE 0 END AS BIGINT) AS is_trap
        FROM f
    """

    # --- text_repetition: NON-distinct word 2-grams (total vs distinct
    # counts; the dedup oracles use the distinct form) — the Gopher
    # duplicate-fraction gate as an integer cross-multiplication.
    o["text_repetition"] = """
        WITH g AS (
          SELECT doc_id,
                 CASE WHEN len(string_split(text, ' ')) >= 2
                      THEN list_transform(
                        generate_series(1, len(string_split(text, ' ')) - 1),
                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                      ELSE [] END AS grams
          FROM documents
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
               CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
                 AS n_dup_grams,
               CAST(CASE WHEN (len(grams) - len(list_distinct(grams))) * 20
                              <= len(grams)
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM g
    """

    # --- text_pack: running token-offset per (source, doc_id % 8)
    # shard, cut at 512-token boundaries
    o["text_pack"] = """
        SELECT doc_id, source,
               CAST(doc_id % 8 AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY source, doc_id % 8 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start_offset,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY source, doc_id % 8 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // 512 AS BIGINT) AS pack_id
        FROM documents
    """

    # --- text_para_dedup: corpus-wide first-occurrence paragraph
    # dedup over 3-word chunks; winner = min (doc_id, pos) per chunk
    o["text_para_dedup"] = """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        paras AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(t[((i-1)*3+1):((i-1)*3+3)], ' ') AS para
          FROM toks,
               UNNEST(range(1, CAST(ceil(len(t)/3.0) AS BIGINT) + 1)) AS r(i)
        ),
        winners AS (
          SELECT para, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
          FROM paras GROUP BY para
        ),
        marked AS (
          SELECT p.doc_id, p.pos, p.para,
                 CASE WHEN p.doc_id = w.w.doc_id AND p.pos = w.w.pos
                      THEN 1 ELSE 0 END AS kept
          FROM paras p JOIN winners w USING (para)
        )
        SELECT doc_id,
               count(*) AS n_paras,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               coalesce(
                 string_agg(CASE WHEN kept = 1 THEN para END, ' '
                            ORDER BY pos), '') AS text_dedup
        FROM marked GROUP BY doc_id
    """

    # --- text_mixture_plan: all-integer mixture feasibility + greedy
    # md5-prefix selection; DIV/// keep both engines exact
    o["text_mixture_plan"] = """
        WITH w(source, _w) AS (
          VALUES ('src0', 5), ('src1', 3), ('src2', 2),
                 ('src3', 1), ('src4', 1)
        ),
        base AS (
          SELECT d.source, d.doc_id,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                 w._w
          FROM documents d JOIN w USING (source)
        ),
        avail AS (
          SELECT source, _w, SUM(n_tokens) AS _avail
          FROM base GROUP BY source, _w
        ),
        t AS (SELECT MIN(_avail * 12 // _w) AS _t FROM avail),
        budgets AS (
          SELECT source, _w * _t // 12 AS budget FROM avail CROSS JOIN t
        ),
        sel AS (
          SELECT source, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cum_before
          FROM base
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum_before AS BIGINT) AS cum_before,
               CAST(budget AS BIGINT) AS budget
        FROM sel JOIN budgets USING (source)
        WHERE cum_before < budget
    """

    # --- text_trigram_lm: corpus char-trigram familiarity, exact
    # integer LM proxy (counts join + per-doc sum)
    o["text_trigram_lm"] = """
        WITH tri AS (
          SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tri
          FROM documents, UNNEST(range(1, len(text) - 1)) AS r(i)
          WHERE len(text) >= 3
        ),
        counts AS (SELECT tri, COUNT(*) AS _freq FROM tri GROUP BY tri),
        per_doc AS (
          SELECT doc_id, COUNT(*) AS n_tri, SUM(_freq) AS sum_freq
          FROM tri JOIN counts USING (tri) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri,
               CAST(COALESCE(sum_freq, 0) AS BIGINT) AS sum_freq,
               CAST(CASE WHEN n_tri IS NOT NULL
                    THEN sum_freq * 1000 // n_tri ELSE 0 END
                 AS BIGINT) AS familiarity_x1000
        FROM documents d LEFT JOIN per_doc USING (doc_id)
    """

    # --- text_classifier: rebuild the weight layer from the bucket id,
    # hash tokens with the shared 8-hex-char md5 fold, sum weights per
    # doc, cross-multiplied threshold — the whole classifier replayed.
    o["text_classifier"] = """
        WITH w AS (
          SELECT CAST(range AS BIGINT) AS bucket,
                 CAST((range * 2654435761) % 2001 - 1000 AS BIGINT) AS weight
          FROM range(4096)
        ),
        tok AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        ),
        b AS (
          SELECT doc_id, n_tokens,
                 list_reduce(list_transform(
                   string_split(substr(md5(tok), 1, 8), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) % 4096 AS bucket
          FROM tok
        ),
        s AS (
          SELECT doc_id, n_tokens,
                 SUM(COALESCE(weight, 0)) AS score
          FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id, n_tokens
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(score AS BIGINT) AS score,
               CAST(CASE WHEN 1000 * score >= 50 * n_tokens
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM s
    """

    # --- text_pii_scrub: identical planting arithmetic + identical
    # backreference/lookaround-free patterns under RE2 ('g' flag:
    # DuckDB replaces first-match by default, Spark replaces all).
    o["text_pii_scrub"] = """
        WITH planted AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                    ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                    THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                    ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                    THEN ' call 040-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                    ELSE '' END AS text
          FROM documents
        ), s1 AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                   AS n_emails,
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS t
          FROM planted
        ), s2 AS (
          SELECT doc_id, n_emails,
                 CAST(len(regexp_extract_all(t,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                   AS n_ips,
                 regexp_replace(t,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                   '<IP>', 'g') AS t
          FROM s1
        )
        SELECT doc_id, n_emails, n_ips,
               CAST(len(regexp_extract_all(t,
                 '\\+?[0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}\\b')) AS BIGINT)
                 AS n_phones,
               regexp_replace(t,
                 '\\+?[0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}\\b',
                 '<PHONE>', 'g') AS clean_text
        FROM s2
    """

    # --- text_training_export: dup-span gate chained into the packing
    # window over the SURVIVORS (offsets over the gated stream).
    o["text_training_export"] = """
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(l[i+1:i+5], ' ') AS gram
          FROM toks, UNNEST(range(len(l) - 4)) AS r(i)
          WHERE len(l) >= 5
        ),
        dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
        cov AS (
          SELECT DISTINCT g.doc_id, g.pos + o.o AS idx
          FROM grams g JOIN dupg USING (gram), UNNEST(range(5)) AS o(o)
        ),
        nt AS (SELECT doc_id, len(l) AS n_tokens FROM toks WHERE len(l) > 0),
        kept AS (
          SELECT nt.doc_id FROM nt LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id
          ) c USING (doc_id)
          WHERE 1000 * COALESCE(c.n, 0) // nt.n_tokens < 200
        ),
        packed AS (
          SELECT d.doc_id, d.source,
                 CAST(d.doc_id % 8 AS INTEGER) AS shard,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(COALESCE(SUM(len(string_split(d.text, ' '))) OVER (
                   PARTITION BY d.source, d.doc_id % 8 ORDER BY d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS BIGINT) AS pack_id
          FROM documents d JOIN kept USING (doc_id)
        )
        SELECT source, shard, pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY source, shard, pack_id
    """

    # --- text_curation_pipeline: the composed end-to-end run — the
    # proven per-stage CTEs (quality gate, Gopher repetition gate,
    # md5-digest keeper, stopword lang-ID) chained exactly as the
    # Spark plan chains the operators.
    o["text_curation_pipeline"] = f"""
        WITH qc AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> t IN {_STOP_SQL})) AS n_stopwords,
                 len(list_distinct(string_split(lower(text), ' ')))
                     AS n_distinct_tokens
          FROM documents
        ),
        ok AS (
          SELECT doc_id, n_tokens FROM qc
          WHERE n_tokens >= 20
            AND n_stopwords * 100 >= n_tokens * 2
            AND n_distinct_tokens * 10 >= n_tokens * 3
        ),
        g AS (
          SELECT doc_id,
                 CASE WHEN len(string_split(text, ' ')) >= 2
                      THEN list_transform(
                        generate_series(1, len(string_split(text, ' ')) - 1),
                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                      ELSE [] END AS grams
          FROM documents
        ),
        rep AS (
          SELECT doc_id FROM g
          WHERE (len(grams) - len(list_distinct(grams))) * 20 <= len(grams)
        ),
        surv AS (
          SELECT d.doc_id, d.text, d.lang, ok.n_tokens
          FROM documents d JOIN ok USING (doc_id) JOIN rep USING (doc_id)
        ),
        keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY md5(text)
        )
        SELECT s.doc_id, s.lang AS lang_tagged,
               CASE WHEN len(list_filter(string_split(lower(s.text), ' '),
                         t -> t IN {_STOP_SQL})) * 20
                         >= len(string_split(s.text, ' '))
                    THEN 'en' ELSE 'other' END AS lang_pred,
               s.n_tokens
        FROM surv s JOIN keepers USING (doc_id)
    """

    return o
