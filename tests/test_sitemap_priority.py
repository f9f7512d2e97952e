"""Sitemap <priority> honoring (sitemaps.org): a urlset's declared
0.0–1.0 priority seeds the frontier priority — the site's own ranking
of its pages, which a crawler with a per-host budget should fetch in
that order. Gates:

  * parsekit.extract_sitemap_entries parses the ×10 integer priority
    (never floats), None when undeclared, first-block-wins dedup;
  * engine sitemap seeding == oracle crawler exactly (trace, frontier
    priorities, seen) on a priority-declaring web, non-vacuously —
    the fetch order provably differs from the undeclared web;
  * priority-less webs stay byte-identical to the historical behavior
    (the default path every existing sitemap test pins).
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, parsekit, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=4, pages_per_host=30, sitemap_priority=True, seed=5
)
FLAT = synthweb.WebConfig(n_hosts=4, pages_per_host=30, seed=5)
SEEDS = synthweb.seed_urls(CFG, 4)
CYCLES = 2


def test_extract_sitemap_entries_parses_priority():
    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url><loc>http://h0.test/p/1</loc><priority>0.8</priority></url>\n"
        "  <url><loc>http://h0.test/p/2</loc></url>\n"  # undeclared
        "  <url><loc>http://h0.test/p/1</loc><priority>0.1</priority></url>\n"
        "  <url><loc>http://h0.test/p/3</loc><priority>1.0</priority></url>\n"
        "  <url><priority>0.5</priority></url>\n"  # no loc: dropped
        "</urlset>"
    )
    got = parsekit.extract_sitemap_entries(xml)
    assert got == [
        ("http://h0.test/p/1", 8),  # first declaration wins
        ("http://h0.test/p/2", None),
        ("http://h0.test/p/3", 10),
    ]
    # the synthetic web declares 1..9 on every urlset row
    sm = synthweb.sitemap_xml(CFG, CFG.host(0))
    entries = parsekit.extract_sitemap_entries(sm)
    assert entries and all(
        p == synthweb.sitemap_priority_of(CFG, u) for u, p in entries
    )
    # and the flat web declares nothing (historical bytes)
    flat_sm = synthweb.sitemap_xml(FLAT, FLAT.host(0))
    assert all(p is None for _, p in parsekit.extract_sitemap_entries(flat_sm))
    assert "<priority>" not in flat_sm


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, sitemap_seeds=True)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("smpri")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=CYCLES, sitemap_seeds=True)
    return eng


def test_sitemap_priority_trace_exact(engine_res, oracle_res):
    rows = engine_res.trace.read().orderBy("seq").collect()
    got = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_sitemap_priority_frontier_priorities(engine_res, oracle_res):
    got = {
        r.url_norm: r.priority
        for r in engine_res.frontier.read().collect()
    }
    want = {u: e.priority for u, e in oracle_res.frontier.items()}
    assert got == want
    # non-vacuous: the seeded priorities actually spread over the
    # declared range (not all SEED_PRIORITY)
    assert len({p for p in want.values() if p <= oracle.SEED_PRIORITY}) > 3


def test_priority_changes_fetch_order(oracle_res):
    """Same web minus the declarations: the crawl order provably
    differs, so honoring <priority> is observable, not cosmetic."""
    base = oracle.crawl(FLAT, SEEDS, cycles=CYCLES, sitemap_seeds=True)
    declared_order = [t[2] for t in oracle_res.trace if t[5] == "fetched"]
    flat_order = [t[2] for t in base.trace if t[5] == "fetched"]
    assert declared_order != flat_order
    # the two webs publish the SAME urlsets (only the declarations
    # differ), so the order change is attributable to <priority> alone
    for k in range(CFG.n_hosts):
        h = CFG.host(k)
        assert synthweb.expand_sitemap_urls(
            CFG, synthweb.sitemap_xml(CFG, h)
        ) == synthweb.expand_sitemap_urls(FLAT, synthweb.sitemap_xml(FLAT, h))
