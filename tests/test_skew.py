"""Hot-host skew handling (SURVEY.md §4; BASELINE.json north_star:
"handles hot-host skew via salting ... at a 10^10-URL frontier scale").

Three layers of evidence:
  * the fetch-stage salt bounds per-task group sizes when one
    pathological host owns 30% of the scheduled URLs;
  * salting never changes the schedule (sched_time is computed
    per-host BEFORE salting — §7.4 item 3);
  * the skew-safe two-phase GENERATE produces the identical crawl
    trace while never putting one host's whole frontier share through
    a single window task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine
from ccbot_spark.operators import politeness, urlops

HOT = "hot.test"
FANOUT = 8


@pytest.fixture(scope="module")
def skewed_fetch(spark):
    """A generate()['fetch']-shaped batch where HOT owns 30% of rows:
    3000 hot URLs + 20 cold hosts x 350."""
    hot = spark.range(3000).select(
        F.concat(F.lit(f"http://{HOT}/p/"), F.col("id")).alias("url_norm"),
        F.lit(HOT).alias("host"),
        F.lit(5).cast("long").alias("priority"),
        F.col("id").cast("int").alias("sched_slot"),
        (F.col("id") * 100).cast("long").alias("sched_time"),
        F.lit(0).cast("int").alias("retries"),
    )
    cold = spark.range(20 * 350).select(
        F.concat(
            F.lit("http://c"), (F.col("id") % 20), F.lit(".test/p/"), F.col("id")
        ).alias("url_norm"),
        F.concat(F.lit("c"), (F.col("id") % 20), F.lit(".test")).alias("host"),
        F.lit(5).cast("long").alias("priority"),
        (F.col("id") / 20).cast("int").alias("sched_slot"),
        ((F.col("id") / 20).cast("long") * 100).alias("sched_time"),
        F.lit(0).cast("int").alias("retries"),
    )
    return hot.unionByName(cold)


def test_salt_bounds_hot_host_group_size(spark, skewed_fetch):
    """Unsalted, HOT is one 3000-row fetch group (one task sleeps out
    the whole host while 31 cores idle). Salted, its groups are
    ~3000/FANOUT each — no task owns more than ~2x the fair share."""
    salted = skewed_fetch.withColumn(
        "salt_key",
        urlops.host_salt(F.col("host"), F.col("url_norm"), [HOT], FANOUT),
    )
    sizes = {
        r.salt_key: r.n
        for r in salted.groupBy("salt_key").agg(F.count("*").alias("n")).collect()
    }
    hot_groups = {k: n for k, n in sizes.items() if k.startswith(HOT + "#")}
    assert len(hot_groups) == FANOUT
    assert HOT not in sizes  # every hot row went to a sub-group
    fair = 3000 / FANOUT
    assert max(hot_groups.values()) <= 2 * fair, hot_groups
    assert min(hot_groups.values()) >= fair / 2, hot_groups
    # cold hosts keep their identity key (no pointless fan-out)
    assert sizes["c0.test"] == 350


def test_salt_preserves_schedule(spark, skewed_fetch):
    """The politeness schedule is a per-host property; salting must
    only change task placement, never (sched_slot, sched_time)."""
    salted = skewed_fetch.withColumn(
        "salt_key",
        urlops.host_salt(F.col("host"), F.col("url_norm"), [HOT], FANOUT),
    )
    before = {(r.url_norm, r.sched_slot, r.sched_time)
              for r in skewed_fetch.collect()}
    after = {(r.url_norm, r.sched_slot, r.sched_time)
             for r in salted.collect()}
    assert before == after


def test_skew_safe_generate_identical_plan_shape(spark, skewed_fetch):
    """Two-phase generate: same fetch set and sched_slots as the
    single-window form, with the first window keyed by input
    partition (no single task holding all of HOT)."""
    pending = skewed_fetch.select(
        "url_norm", "host", "priority",
        F.lit(0).cast("int").alias("dt_cycle"),
        F.lit(0).cast("long").alias("dt_seq"),
        F.lit("pending").alias("status"),
        F.lit(0).cast("int").alias("cycle_added"),
        F.lit(0).cast("int").alias("retries"),
    )
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=10)
    robots = politeness.build_robots_table(
        pending.select("host").distinct(), cfg
    )
    base = politeness.generate(pending, robots, skew_safe=False)
    safe = politeness.generate(pending, robots, skew_safe=True)
    want = {(r.url_norm, r.sched_slot, r.sched_time)
            for r in base["fetch"].collect()}
    got = {(r.url_norm, r.sched_slot, r.sched_time)
           for r in safe["fetch"].collect()}
    assert got == want and want  # identical and non-trivial
    assert {r.url_norm for r in safe["skipped"].collect()} == {
        r.url_norm for r in base["skipped"].collect()
    }
    # plan shape: phase-1 window is keyed by spark_partition_id
    from ccbot_spark.plans import explainkit

    plan = explainkit.formatted_plan(safe["fetch"])
    assert "SPARK_PARTITION_ID" in plan.upper(), plan


def test_auto_skew_defaults_engage_and_match_oracle(spark, tmp_path):
    """VERDICT r3 item 2: a DEFAULT-config engine (skew_safe_generate
    and fetch_partitions unset) must itself detect hot-host skew from
    the pending histogram, flip the two-phase GENERATE + LPT fetch on,
    and still reproduce the oracle trace byte-for-byte — the scale-
    critical knobs are auto-selected, not opt-in."""
    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=60, hot_frac_pct=30)
    seeds = synthweb.seed_urls(cfg, 20)
    want = oracle.crawl(cfg, seeds, cycles=2)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "autoskew"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, record_trace=True,
        hot_host_min=10,  # sandbox-sized web; production default 2000
    )
    out = eng.crawl(seeds, cycles=2)
    # auto detection engaged on at least one cycle (the hot host owns
    # ~30% of discovered links, far above the 20% default threshold)
    assert any(c["skew_safe"] for c in out), out
    assert any(c.get("fetch_partitions", 0) > 4 * 8 for c in out), out
    rows = eng.trace.read().orderBy("seq").collect()
    got = [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
           for r in rows]
    assert got == want.trace


def test_auto_skew_stays_off_on_uniform_web(spark, tmp_path):
    """No host dominates → the default engine keeps the single-window
    GENERATE and hash fetch partitioning (no pointless extra phase)."""
    cfg = synthweb.WebConfig(n_hosts=8, pages_per_host=20, hot_frac_pct=0)
    seeds = synthweb.seed_urls(cfg, 16)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "uniform"), n_buckets=8,
        bloom_min_seen=0, record_trace=False, hot_host_min=10,
    )
    out = eng.crawl(seeds, cycles=1)
    assert not any(c["skew_safe"] for c in out), out
    assert not any("fetch_partitions" in c for c in out), out


def test_skew_safe_engine_trace_identical(spark, tmp_path):
    """Full-engine gate: skew-safe generate + a hot-host web (25% of
    cross-host links on host 0) reproduce the oracle trace exactly."""
    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=60, hot_frac_pct=25)
    seeds = synthweb.seed_urls(cfg, 20)
    want = oracle.crawl(cfg, seeds, cycles=2)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "skewsafe"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, record_trace=True,
        hot_host_min=10, skew_safe_generate=True,
    )
    eng.crawl(seeds, cycles=2)
    rows = eng.trace.read().orderBy("seq").collect()
    got = [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
           for r in rows]
    assert got == want.trace
