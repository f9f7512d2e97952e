"""Engine anchors sink (anchor_texts=True): per cycle, occurrence
counts of (resolved target, lowercased term) over every followed
anchor on every parsed page — the search-index signal the crawl loop
can produce for free while it parses. Gates: engine anchors table ==
oracle crawler byte-for-byte on a web with link-level nofollow,
page-level meta-robots, and trap links composed (each must visibly
shape the table); the sink must not perturb the trace/seen results.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, parsekit, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=5, pages_per_host=40, nofollow_pct=15, trap_pct=10,
    meta_robots_pct=30, seed=13,
)
SEEDS = synthweb.seed_urls(CFG, 15)
CYCLES = 2
KNOBS = dict(meta_robots=True, anchor_texts=True)


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, **KNOBS)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("anch")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0, **KNOBS,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_anchor_pairs_twin_on_rendered_pages():
    """parsekit.extract_anchor_pairs resolves/filters exactly like
    extract_links' seam: nofollow dropped, non-fetchable schemes
    dropped, occurrence order kept (no within-page dedup)."""
    url = f"http://{CFG.host(1)}/p/7"
    html = synthweb.fetch(CFG, url)
    pairs = parsekit.extract_anchor_pairs(url, html)
    links = parsekit.extract_links(url, html)
    # every resolved anchor target is a link target (links dedup within
    # the page, anchors keep occurrences)
    assert {t for t, _ in pairs} <= set(links) | set()
    for _, text in pairs:
        assert text.startswith("link ") or text == "calendar"


def test_anchors_table_matches_oracle(engine_res, oracle_res):
    got = sorted(
        (r.cycle, r.target, r.term, r.cnt)
        for r in engine_res.anchors.read().collect()
    )
    want = sorted(oracle_res.anchors)
    assert got == want
    assert got, "anchors sink produced nothing"
    terms = {t for _, _, t, _ in got}
    assert "link" in terms and "calendar" in terms
    # aggregation is real: some (target, term) repeats within a cycle
    assert max(c for _, _, _, c in got) > 1


def test_anchor_sink_does_not_perturb_crawl(engine_res, oracle_res):
    rows = engine_res.trace.read().orderBy("seq").collect()
    got = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]
    assert got == oracle_res.trace
    seen = {
        r.url_norm
        for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert seen == oracle_res.seen
