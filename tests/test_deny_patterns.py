"""URL deny-list scope rules (Heritrix-style): user-supplied regexes;
a DISCOVERED candidate (link, redirect target, rel=canonical target)
matching any pattern is never enqueued — dropped pre-shuffle next to
the trap gate — while seeds stay exempt. Gates: engine == oracle
trace/seen/frontier with redirects + canonical + trap filter composed;
non-vacuous (the twin without the deny list enqueues the denied URLs);
flag-off run byte-identical to historical."""

from __future__ import annotations

import re

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=4, pages_per_host=30, redirect_pct=20, canonical_pct=20,
)
SEEDS = synthweb.seed_urls(CFG, 12)
DENY = [r"/p/(?:1[0-9])$", r"/p/7$"]  # pages 10-19 and 7
CYCLES = 3


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, trap_filter=True,
        canonical_dedup=True, deny_patterns=DENY,
    )


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("deny")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        trap_filter=True, canonical_dedup=True, deny_patterns=DENY,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_deny_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_deny_seen_and_frontier_exact_and_nonvacuous(engine_res, oracle_res):
    got_seen = {
        r.url_norm for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert got_seen == oracle_res.seen
    got_f = {
        r.url_norm: r.status for r in engine_res.frontier.read().collect()
    }
    assert got_f == {u: e.status for u, e in oracle_res.frontier.items()}
    # no denied URL anywhere in seen or frontier
    deny_re = re.compile("|".join(f"(?:{p})" for p in DENY))
    assert not any(deny_re.search(u) for u in got_seen)
    # twin WITHOUT the deny list does enqueue denied URLs (the rule
    # actually bites on this web)
    twin = oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, trap_filter=True, canonical_dedup=True,
    )
    assert any(deny_re.search(u) for u in twin.seen)


def test_deny_off_is_historical(spark, tmp_path):
    want = oracle.crawl(
        CFG, SEEDS, cycles=2, trap_filter=True, canonical_dedup=True,
    )
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "off"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        trap_filter=True, canonical_dedup=True,
    )
    eng.crawl(SEEDS, cycles=2)
    assert _trace(eng) == want.trace
