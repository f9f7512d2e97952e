"""Frontier eviction (evict_every > 0): terminal rows — statuses the
GENERATE candidate predicate can never select again — move to the
frontier_cold archive table; the hot frontier keeps only live rows, so
a mature 10^10-row frontier's per-cycle pending scan shrinks to the
rows that can still become candidates. Gates:

  * crawl results are UNAFFECTED: trace / seen byte-equal to the
    oracle (which never evicts), non-vacuously (cold is non-empty);
  * hot ∪ cold partitions the unevicted frontier exactly (same
    url → status map as the oracle, no overlap, no loss);
  * with a revisit policy on, fetched rows are NOT terminal and stay
    hot (they are the recrawl clock);
  * resume after eviction restores a consistent (hot, cold) pair —
    the snapshot tags capture both tables together.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

# planted terminality: transient errors (some exhaust retries),
# redirects (terminal), robots-denied paths, traps filtered
CFG = synthweb.WebConfig(n_hosts=5, pages_per_host=40, fail_pct=15, redirect_pct=20)
SEEDS = synthweb.seed_urls(CFG, 15)
CYCLES = 3

TERMINAL = {"denied", "redirect", "canonical"}


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory, oracle_res):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("evict")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        evict_every=1,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_eviction_preserves_results(engine_res, oracle_res):
    assert _trace(engine_res) == oracle_res.trace
    got_seen = {
        r.url_norm for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert got_seen == oracle_res.seen


def test_hot_cold_partition_frontier(engine_res, oracle_res):
    from ccbot_spark.oracle import MAX_RETRIES

    hot = {r.url_norm: r.status for r in engine_res.frontier.read().collect()}
    cold = {
        r.url_norm: r.status
        for r in engine_res.frontier_cold.read().collect()
    }
    assert cold, "fixture evicted nothing — vacuous"
    assert not (hot.keys() & cold.keys()), "hot/cold overlap"
    # hot rows are all still live; cold rows are all terminal
    for u, s in hot.items():
        assert s == "pending" or (s == "error") or s == "fetched", (u, s)
    for u, s in cold.items():
        assert s in TERMINAL or s in ("error", "fetched"), (u, s)
    # no revisit policy: fetched is terminal and must be cold
    assert "fetched" not in hot.values()
    # error rows split by retry budget
    retries_hot = {
        r.url_norm: r.retries
        for r in engine_res.frontier.read().filter("status = 'error'").collect()
    }
    retries_cold = {
        r.url_norm: r.retries
        for r in engine_res.frontier_cold.read().filter("status = 'error'").collect()
    }
    assert all(v < MAX_RETRIES for v in retries_hot.values())
    assert all(v >= MAX_RETRIES for v in retries_cold.values())
    # union reproduces the oracle's frontier exactly
    merged = {**hot, **cold}
    assert merged == {u: e.status for u, e in oracle_res.frontier.items()}


def test_fetched_stays_hot_under_recrawl(spark, tmp_path):
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=25, change_every=2)
    seeds = synthweb.seed_urls(cfg, 12)
    want = oracle.crawl(cfg, seeds, cycles=3, recrawl_every=1)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "rc"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        evict_every=1, recrawl_every=1,
    )
    eng.crawl(seeds, cycles=3)
    assert _trace(eng) == want.trace
    hot_status = {r.status for r in eng.frontier.read().collect()}
    assert "fetched" in hot_status, "revisit clock rows were evicted"


def test_resume_after_eviction(spark, tmp_path, oracle_res):
    wd = str(tmp_path / "resume")
    kw = dict(
        n_buckets=8, record_trace=True, hot_host_min=10, bloom_min_seen=0,
        evict_every=1,
    )
    eng1 = CrawlEngine(spark, CFG, wd, **kw)
    eng1.crawl(SEEDS, cycles=2)  # ... then the process "dies"
    eng2 = CrawlEngine(spark, CFG, wd, **kw)
    assert eng2.resume() == 2
    eng2.run_cycle(3)
    assert _trace(eng2) == oracle_res.trace
    hot = {r.url_norm for r in eng2.frontier.read().collect()}
    cold = {r.url_norm for r in eng2.frontier_cold.read().collect()}
    assert not (hot & cold)
    assert hot | cold == set(oracle_res.frontier)
