"""Physical-plan regression tests: the plans we ship are the plans we
want (SURVEY.md §4) — filters pushed to the parquet scan, scans pruned
to projected columns, small dimensions broadcast, no surprise shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccbot_spark.plans import explainkit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_filter_pushed_to_scan(spark, li):
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    pushed = explainkit.pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_scan_prunes_columns(spark, li):
    df = li.select("l_orderkey", "l_quantity")
    schemas = explainkit.read_schemas(df)
    assert schemas and all(
        "l_extendedprice" not in s and "l_orderkey" in s for s in schemas
    ), schemas


def test_small_dim_broadcasts(spark, li):
    part = spark.read.parquet(f"{SF}/part.parquet")
    df = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    df.collect()  # let AQE finalize
    assert explainkit.has_broadcast_join(df)


def test_agg_single_shuffle(spark, li):
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    # partial+final hash aggregate → exactly one exchange
    assert explainkit.n_exchanges(df) == 1, explainkit.formatted_plan(df)


def test_generate_topk_single_shuffle(spark):
    """The crawl generate step's per-host window needs exactly one
    hash-partitioning exchange (partitionBy host), nothing more."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    df = orders.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    assert explainkit.n_exchanges(df) == 1, explainkit.formatted_plan(df)


def test_global_sequence_matches_naive_window_no_single_partition(spark):
    """Two-phase numbering (sequencing.global_sequence) must assign the
    exact seq a global Window.orderBy would, WITHOUT the
    single-partition exchange that window needs."""
    from pyspark.sql.window import Window

    from ccbot_spark.operators import sequencing

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keys = ["o_totalprice", "o_orderkey"]  # unique per row
    numbered, total, cache = sequencing.global_sequence(
        orders, keys=keys, num_partitions=8, offset=100
    )
    got = {r.o_orderkey: r.seq for r in numbered.collect()}
    w = Window.orderBy(*keys)
    want = {
        r.o_orderkey: r.seq
        for r in orders.withColumn(
            "seq", (F.row_number().over(w) - 1 + 100).cast("long")
        ).collect()
    }
    assert total == len(want)
    assert got == want
    plan = explainkit.formatted_plan(numbered)
    assert "SinglePartition" not in plan, plan
    cache.unpersist()


def test_global_sequence_empty(spark):
    from ccbot_spark.operators import sequencing

    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(F.lit(False))
    numbered, total, cache = sequencing.global_sequence(
        orders.select("o_orderkey"), keys=["o_orderkey"], num_partitions=4
    )
    assert total == 0 and numbered.count() == 0
    cache.unpersist()


def test_minhash_simhash_signatures_are_jvm_only(spark):
    """Round-2 invariant: the signature pipelines contain NO Python
    evaluation nodes — shingle/token hashing and the signature folds
    are whole-stage-codegen JVM (md5/conv/min/sum aggregates)."""
    from ccbot_spark.functions import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (dedup.minhash_signatures(docs), dedup.simhash_signatures(docs)):
        df.collect()  # finalize the AQE plan so codegen spans are visible
        plan = explainkit.formatted_plan(df)
        assert "EvalPython" not in plan and "Python" not in plan, plan
        # '*(n)' prefix in the simple plan marks whole-stage-codegen spans
        assert "*(" in explainkit.simple_plan(df), explainkit.simple_plan(df)


def test_link_image_extraction_regex_is_jvm_side(spark):
    """Round-3 invariant: the href/img-src/figcaption scans run as
    JVM regexp_extract_all (whole-stage codegen over html), with
    exactly ONE Arrow-batched Python node per stage — the urlkit
    URL-resolution hop, the only part with no JVM equivalent."""
    import re as _re

    from ccbot_spark.operators import fetchparse

    df = spark.createDataFrame(
        [("http://h0.test/p/0", "h0.test", 5, 0,
          '<a href="/x">x</a><img src="/i.png" alt="c">')],
        "url_norm string, host string, priority long, sched_time long,"
        " html string",
    )
    for out in (fetchparse.extract_links(df), fetchparse.extract_images(df)):
        plan = explainkit.formatted_plan(out)
        assert "regexp_extract_all" in plan, plan
        # one Python eval node (the resolve UDF), and it is Arrow-batched
        pynodes = _re.findall(r"\(\d+\) ArrowEvalPython", plan)
        assert len(pynodes) == 1, plan
        assert "BatchEvalPython" not in plan, plan  # no row-at-a-time UDF


def test_global_sequence_stable_across_partition_counts(spark):
    """Sequence assignment is a pure function of the key order:
    different num_partitions must give identical seqs."""
    from ccbot_spark.operators import sequencing

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    outs = []
    for np_ in (3, 16):
        numbered, total, cache = sequencing.global_sequence(
            orders, keys=["o_totalprice", "o_orderkey"], num_partitions=np_
        )
        outs.append({r.o_orderkey: r.seq for r in numbered.collect()})
        cache.unpersist()
    assert outs[0] == outs[1]


def test_exact_quantiles_match_numpy_and_stay_multipartition(spark):
    """sequencing.exact_quantiles == the value at 1-based position
    ceil(p*n) of the numpy-sorted data (DuckDB quantile_disc
    semantics), with ties planted, at two partition counts, and the
    plan keeps no single-partition exchange."""
    import math

    import numpy as np

    from ccbot_spark.operators import sequencing

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.randint(0, 500, 3000), np.full(500, 77)]  # heavy tie block
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    s = np.sort(vals)
    n = len(s)
    p_bps = (1, 2500, 5000, 9000, 9990, 10000)
    want = {
        p: int(s[max(1, math.ceil(p * n / 10000)) - 1]) for p in p_bps
    }
    for parts in (4, 13):
        out, cache = sequencing.exact_quantiles(
            df, "x", p_bps=p_bps, num_partitions=parts
        )
        rows = out.collect()
        assert {r.p_bp: r.value for r in rows} == want
        assert all(r.n_rows == n for r in rows)
        plan = explainkit.formatted_plan(out)
        assert "SinglePartition" not in plan, plan
        cache.unpersist()
    # single-row edge: every percentile is that row
    one, cache = sequencing.exact_quantiles(
        spark.createDataFrame([(42,)], "x long"), "x", p_bps=(1, 10000),
        num_partitions=4,
    )
    assert {(r.p_bp, r.value, r.n_rows) for r in one.collect()} == {
        (1, 42, 1), (10000, 42, 1)
    }
    cache.unpersist()


def test_surt_key_jvm_matches_python_and_stays_jvm(spark):
    """The SURT key (urlops.surt_key) is byte-identical to the pure
    python urlkit.surt and contains no Python evaluation node — the
    CDX index build is one codegen scan."""
    from ccbot_spark import urlkit
    from ccbot_spark.operators import urlops

    urls = [
        "https://www.news.example.com/a?z=1&a=2",
        "https://www.x.com:8080/a/b?z=1",
        "http://example.com",
        "https://host.co/p/q/",
        "HTTPS://UP.Example.COM/Path?b=2&a=1",
        "https://example.com/?",
        "https://a.b.c.d.example.org/x/y/z?k=v&k=u&j=",
        "http://h0.test:9999/",
        # fragment-bearing: a '?' after '#' is NOT a query (r3 ADVICE)
        "http://ex.com/path#f?x=1",
        "http://ex.com/p?real=1#frag?fake=2",
        # non-URL strings → NULL on both sides, never ')/'-garbage
        "not a url",
        "",
        "http://",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", urlops.surt_key("url").alias("surt")
    )
    got = {r["url"]: r["surt"] for r in df.collect()}
    for u in urls:
        assert got[u] == urlkit.surt(u), u
    plan = explainkit.formatted_plan(df)
    assert "EvalPython" not in plan, plan


def test_surt_key_jvm_matches_python_grid(spark):
    """Exhaustive component grid (2 schemes x 4 hosts x 3 ports x 4
    paths x 4 queries x 3 fragments = 1152 URLs) — JVM and python SURT
    agree on every combination, not just hand-picked cases. The
    fragment dimension pins the r3 ADVICE fix: '#f?x=1' must never be
    read as a query."""
    import itertools

    from ccbot_spark import urlkit
    from ccbot_spark.operators import urlops

    urls = [
        f"{s}://{h}{p}{path}{q}{frag}"
        for s, h, p, path, q, frag in itertools.product(
            ["http", "HTTPS"],
            ["ex.com", "www.ex.com", "A.B.ex.co.uk", "www.WWW.x.io"],
            ["", ":8080", ":1"],
            ["", "/", "/a/b", "/a%20b/c.d/"],
            ["", "?z=1", "?b=2&a=1&", "?dup=1&dup=0"],
            ["", "#frag", "#f?x=1"],
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", urlops.surt_key("url").alias("surt")
    )
    got = {r["url"]: r["surt"] for r in df.collect()}
    for u in urls:
        assert got[u] == urlkit.surt(u), u


def test_dup_span_and_wds_plans_jvm_only(spark):
    """The duplicate-span gram construction and the WDS shard plan are
    pure-JVM up to their sinks: no row-at-a-time or Arrow Python eval
    anywhere in either plan (the WDS tar WRITER is applyInPandas by
    design — this checks the PLANNING side), and the dup-span scan
    prunes to the two columns it needs."""
    from ccbot_spark import wds
    from ccbot_spark.functions import dedup, multimodal

    # this audits the UNCACHED plan shape: an earlier test in the
    # session may have cached the documents table, and Spark's cache
    # manager would substitute the full-column InMemoryRelation,
    # defeating the scan-pruning assertion below
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = dedup.dup_span_features(docs, n=5)
    plan = explainkit.formatted_plan(spans)
    assert "EvalPython" not in plan, plan
    schemas = explainkit.read_schemas(spans)
    assert schemas and all("text" in s and "lang" not in s for s in schemas)

    meta = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("image_id"),
        (F.col("id") % 97 + 16).cast("int").alias("w"),
        (F.col("id") % 83 + 16).cast("int").alias("h"),
        F.concat(F.lit("c"), F.col("id")).alias("caption"),
    )
    costed = meta.withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    )
    assigned, cache = wds.plan_shards(costed, 1 << 16, num_partitions=4)
    try:
        plan2 = explainkit.formatted_plan(assigned)
        assert "EvalPython" not in plan2, plan2
        assigned.count()
    finally:
        cache.unpersist()


def test_eventops_plans_stay_shuffle_shaped(spark):
    """The event-time operators must never degrade to a theta-join or
    an extra shuffle: range_join_bucketed plans hash equi-joins only
    (no CartesianProduct / BroadcastNestedLoop at any side size), and
    sessionize's session rollup reuses the lag-window's user_id
    partitioning (exactly one exchange)."""
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("start_ts"),
    )
    pr = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    plan = explainkit.formatted_plan(eventops.range_join_bucketed(iv, pr))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    sess = eventops.sessionize(ev)
    assert explainkit.n_exchanges(sess) == 1, explainkit.formatted_plan(sess)

    build = ev.filter(F.col("event_type") == "error").groupBy(
        "user_id", "ts"
    ).agg(F.max_by("value", "event_id").alias("value"))
    probe = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    asof = eventops.asof_join(probe, build)
    # 2 total: one for the build-side (user_id, ts) dedup, ONE for the
    # asof core (union + key window) — the join itself never shuffles
    # beyond the key partitioning
    assert explainkit.n_exchanges(asof) <= 2, explainkit.formatted_plan(asof)


def test_classifier_weights_broadcast_and_one_doc_shuffle(spark):
    # the learned weight layer must broadcast (never shuffle the
    # exploded token stream against it) and the per-doc sum must be a
    # partial-aggregated hash agg, not a window
    from ccbot_spark.functions import textkit

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    weights = spark.range(512).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 2001 - 1000).alias("weight"),
    )
    plan = explainkit.formatted_plan(
        textkit.linear_classifier_score(docs, weights, n_buckets=512)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_letterbox_plan_is_pure_projection(spark, tmp_path):
    # geometry stays a single JVM projection over the scan: no
    # exchange, no Python, whole-stage codegen end to end
    from ccbot_spark.functions import multimodal

    p = str(tmp_path / "dims")
    spark.createDataFrame(
        [(i, 16 + i % 97, 16 + (i * 11) % 97) for i in range(50)],
        "image_id long, w int, h int",
    ).write.parquet(p)
    plan = explainkit.formatted_plan(
        multimodal.letterbox_plan(spark.read.parquet(p))
    )
    assert "Exchange" not in plan, plan
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert pynode not in plan, plan


def test_round5_training_plans_no_single_partition_exchange(spark):
    # the session's training-prep planners must never collapse to one
    # partition: epoch shuffle (two-level windows + broadcast offsets),
    # curriculum (two-phase global rank), caption cap (salted two-phase
    # top-k), anchor postings (same), contrastive batch plan
    # (md5-prefix grouped_rank) — a Window.orderBy() with no partition
    # key anywhere in these would show up as Exchange SinglePartition
    from ccbot_spark.functions import multimodal, sampling
    from ccbot_spark.operators import fetchparse

    df = spark.createDataFrame(
        [(f"s-{i:03d}", i % 5, f"h{i % 7}", f"cap {i % 9}", 100 + i)
         for i in range(300)],
        "image_id string, shard int, host string, caption string, area long",
    )
    plans = {
        "epoch_shuffle": sampling.epoch_shuffle_plan(
            df.select("image_id", "shard"), epochs=2
        ),
        "caption_cap": multimodal.caption_cap(df, k=3),
        "batch_plan": sampling.contrastive_batch_plan(df, n_batches=8),
        "postings": fetchparse.anchor_postings(
            df.select(F.col("image_id").alias("href"),
                      F.col("caption").alias("anchor")), k=3
        ),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, (name, plan)
    # curriculum returns (plan, cache): check and release
    cplan, cache = sampling.curriculum_plan(
        df.select(F.col("image_id").alias("doc_id"),
                  F.col("area").alias("quality")),
        epochs=3, num_partitions=8,
    )
    p = cplan._jdf.queryExecution().executedPlan().toString()
    cache.unpersist()
    assert "Exchange SinglePartition" not in p, p


def test_zorder_key_matches_python_interleave(spark):
    from ccbot_spark.plans import layout

    def morton(a, b, bits):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 123, 255) for b in (0, 2, 77, 200, 255)],
        "a long, b long",
    )
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", layout.zorder_key(F.col("a"), F.col("b"), bits=8)
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == morton(a, b, 8), (a, b)


def test_zorder_layout_plan_shape_and_pruning(spark, sf_dir):
    # two-phase rank: no single-partition exchange anywhere; and the
    # point of the curve — BOTH axis predicates prune a strict subset
    # of files via the emitted min/max stats
    from ccbot_spark.functions import eventops
    from ccbot_spark.plans import layout

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan, cache = layout.plan_zorder_files(
        ev,
        a=F.col("user_id") % 256,
        b=(F.floor(eventops.epoch_us(F.col("ts")) / F.lit(60_000_000)) % 256),
        tiebreak="event_id",
        rows_per_file=500,
        bits=8,
        num_partitions=8,
    )
    p = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in p, p
    files = plan.collect()
    cache.unpersist()
    assert sum(f.n_rows for f in files) == ev.count()
    # file z-ranges are disjoint (global rank along the curve)
    spans = sorted((f.zmin, f.zmax) for f in files)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # data skipping on EACH dimension: a predicate covering 1/4 of an
    # axis must skip a meaningful share of files on min/max stats
    # (against a single-axis sort, the orthogonal predicate prunes 0)
    n = len(files)
    a_hit = sum(1 for f in files if not (f.amax < 64 or f.amin > 127))
    b_hit = sum(1 for f in files if not (f.bmax < 64 or f.bmin > 127))
    assert a_hit < n and b_hit < n, (a_hit, b_hit, n)


def test_column_stats_matches_pandas(spark, sf_dir):
    from ccbot_spark.plans import layout

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.ndv, r.min_val, r.max_val, r.encoding)
        for r in layout.column_stats(
            o,
            [
                ("o_orderkey", F.col("o_orderkey")),
                ("o_orderstatus", F.col("o_orderstatus")),
            ],
        ).collect()
    }
    pdf = o.select("o_orderkey", "o_orderstatus").toPandas()
    n = len(pdf)
    for c in ("o_orderkey", "o_orderstatus"):
        ndv = pdf[c].nunique()
        assert got[c] == (
            n,
            int(pdf[c].isna().sum()),
            ndv,
            str(pdf[c].min()),
            str(pdf[c].max()),
            "dict" if ndv * 10 <= n else "plain",
        )


def test_column_stats_single_scan_counts_nulls(spark):
    from ccbot_spark.plans import layout

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x long, y string"
    )
    got = {
        r.col_name: (r.n_nulls, r.ndv, r.min_val, r.max_val)
        for r in layout.column_stats(
            df, [("x", F.col("x")), ("y", F.col("y"))]
        ).collect()
    }
    assert got["x"] == (1, 2, "1", "2")
    assert got["y"] == (1, 2, "a", "b")
