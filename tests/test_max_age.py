"""Cache-Control max-age honored as the revisit interval (RFC 9111
freshness): a response declaring its own lifetime pins that URL's
recrawl interval to the DECLARED value (clamped to the adaptive
bounds) at every served response — 200 and 304 alike — while
undeclared pages keep the Cho & Garcia-Molina multiplicative policy.
Gates:

  * engine crawl with honor_max_age on a changing web with a declared
    slice reproduces oracle.crawl exactly (trace / seen / frontier
    incl. per-URL intervals), composed with adaptive recrawl;
  * non-vacuous: declared pages' intervals equal their declaration and
    provably differ from the adaptive twin's; the schedule itself
    diverges (some page is fetched at a cycle the twin skips);
  * honor_max_age=False on the same web (headers still served) is
    byte-identical to the historical behavior.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=4, pages_per_host=30, change_every=2, cache_control_pct=50,
)
SEEDS = synthweb.seed_urls(CFG, 12)
CYCLES = 5


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, recrawl_every=1,
        adaptive_recrawl=True, honor_max_age=True,
    )


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("maxage")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        recrawl_every=1, adaptive_recrawl=True, honor_max_age=True,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_max_age_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_max_age_frontier_intervals_exact(engine_res, oracle_res):
    got = {
        r.url_norm: (r.status, r.last_cycle, r.interval)
        for r in engine_res.frontier.read().collect()
    }
    want = {
        u: (e.status, e.last_cycle, e.interval)
        for u, e in oracle_res.frontier.items()
    }
    assert got == want
    assert {
        r for r in engine_res.seen.read().select("url_norm").collect()
    } is not None
    # non-vacuous: every fetched page WITH a declaration sits exactly
    # at its (clamped) declared lifetime
    declared = 0
    for u, (status, lc, iv) in want.items():
        ma = synthweb.max_age_of(CFG, u)
        if status == "fetched" and lc >= 0 and ma is not None:
            assert iv == min(max(ma, oracle.ADAPT_MIN), oracle.ADAPT_MAX), u
            declared += 1
    assert declared > 0


def test_max_age_changes_the_schedule(oracle_res):
    """The declaration must actually matter: the adaptive-only twin
    produces a different fetch schedule AND different intervals on the
    declared slice."""
    twin = oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, recrawl_every=1, adaptive_recrawl=True,
    )
    assert oracle_res.trace != twin.trace
    diff = [
        u
        for u, e in oracle_res.frontier.items()
        if u in twin.frontier
        and synthweb.max_age_of(CFG, u) is not None
        and e.interval != twin.frontier[u].interval
    ]
    assert diff


def test_max_age_off_is_historical(spark, tmp_path):
    """Headers still served (cache_control_pct on), flag off: engine ==
    oracle with the pure adaptive policy — the default path ignores
    the header entirely."""
    want = oracle.crawl(
        CFG, SEEDS, cycles=3, recrawl_every=1, adaptive_recrawl=True,
    )
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "off"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        recrawl_every=1, adaptive_recrawl=True,
    )
    eng.crawl(SEEDS, cycles=3)
    assert _trace(eng) == want.trace
