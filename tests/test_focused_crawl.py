"""Focused (topical) crawling: a discovered link whose anchor text
contains a focus term enters the frontier with a boosted priority, so
the crawl gravitates toward pages the web itself describes as
on-topic — the classic focused-crawler shape. Gates: engine == oracle
on trace/seen/frontier-priorities with focus terms on, non-vacuously
(the fetch order provably differs from the unfocused crawl of the
same web; boosted frontier rows exist); no focus terms stays
byte-identical to the historical behavior.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=5, pages_per_host=40, seed=9)
SEEDS = synthweb.seed_urls(CFG, 10)
CYCLES = 3
# synthetic anchors read "link <i>" — focusing on the token "3" boosts
# exactly the links whose anchor is "link 3"
FOCUS = ["3"]


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, focus_terms=FOCUS)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("focus")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        focus_terms=FOCUS,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_focused_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_focused_frontier_priorities_exact(engine_res, oracle_res):
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


def test_focus_is_observable(oracle_res):
    """The boost fires (frontier rows above the plain decayed band
    exist) and the fetch order provably differs from the unfocused
    crawl of the same web."""
    base = oracle.crawl(CFG, SEEDS, cycles=CYCLES)
    focused_order = [t[2] for t in oracle_res.trace if t[5] == "fetched"]
    base_order = [t[2] for t in base.trace if t[5] == "fetched"]
    assert focused_order != base_order
    # discovered rows sit at SEED_PRIORITY − 10·depth without focus;
    # boosted rows exceed their unfocused twin
    base_pri = {u: e.priority for u, e in base.frontier.items()}
    boosted = [
        u
        for u, e in oracle_res.frontier.items()
        if u in base_pri and e.priority > base_pri[u]
    ]
    assert boosted, "no frontier row was ever boosted"


def test_no_focus_is_historical(spark, tmp_path):
    """focus_terms=None keeps the engine byte-identical on this web."""
    want = oracle.crawl(CFG, SEEDS, cycles=2)
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "plain"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=2)
    assert _trace(eng) == want.trace
