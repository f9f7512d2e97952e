"""Shark-search content relevance (content_boost): links discovered on
a page whose extracted TEXT contains focus terms inherit
min(tf, cap)·content_boost extra priority — the page-is-on-topic
signal composing with the per-link anchor boost. Gates: engine ==
oracle on trace/frontier-priorities/seen with the boost on,
non-vacuously (order differs from the anchor-only focused crawl of
the same web; content-boosted frontier rows exist); content_boost=0
stays byte-identical to the anchor-only behavior.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=5, pages_per_host=40, seed=9)
SEEDS = synthweb.seed_urls(CFG, 10)
CYCLES = 3
FOCUS = ["3"]
CBOOST = 7
CCAP = 4


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, focus_terms=FOCUS,
        content_boost=CBOOST, content_cap=CCAP,
    )


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("cfocus")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        focus_terms=FOCUS, content_boost=CBOOST, content_cap=CCAP,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_content_focus_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_content_focus_frontier_and_seen_exact(engine_res, oracle_res):
    got = {
        r.url_norm: r.priority
        for r in engine_res.frontier.read().collect()
    }
    want = {u: e.priority for u, e in oracle_res.frontier.items()}
    assert got == want
    seen = {
        r.url_norm
        for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert seen == oracle_res.seen


def test_content_boost_is_observable(oracle_res):
    """The content term fires beyond the anchor boost: order differs
    from the anchor-only focused crawl and some frontier row exceeds
    its anchor-only twin."""
    anchor_only = oracle.crawl(CFG, SEEDS, cycles=CYCLES, focus_terms=FOCUS)
    got_order = [t[2] for t in oracle_res.trace if t[5] == "fetched"]
    base_order = [t[2] for t in anchor_only.trace if t[5] == "fetched"]
    assert got_order != base_order
    base_pri = {u: e.priority for u, e in anchor_only.frontier.items()}
    boosted = [
        u
        for u, e in oracle_res.frontier.items()
        if u in base_pri and e.priority > base_pri[u]
    ]
    assert boosted, "no frontier row carries content relevance"


def test_zero_content_boost_is_historical(spark, tmp_path):
    """content_boost=0 (the default) keeps the anchor-only engine
    byte-identical on this web."""
    want = oracle.crawl(CFG, SEEDS, cycles=2, focus_terms=FOCUS)
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "plain"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        focus_terms=FOCUS,
    )
    eng.crawl(SEEDS, cycles=2)
    assert _trace(eng) == want.trace
