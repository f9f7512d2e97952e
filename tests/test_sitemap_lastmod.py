"""Sitemap <lastmod> honored as a revisit suppressor (sitemaps.org):
a due revisit of a sitemap-LISTED page is skipped — no politeness
slot, no trace event, not even the conditional GET that would answer
304 — while the urlset's declared lastmod (the content-epoch clock)
says the page hasn't changed since our last fetch. Unlisted pages keep
the ordinary revisit policy. Gates:

  * engine crawl with sitemap_lastmod on a changing web reproduces
    oracle.crawl exactly (trace / seen / frontier incl. per-URL
    intervals), composed with adaptive recrawl + sitemap seeding;
  * non-vacuous: the lastmod-off twin issues strictly more 304s, and
    every suppressed attempt is a listed page inside an unchanged
    epoch; listed pages refetch exactly when the epoch advances;
  * static web: listed pages never revisit at all, unlisted pages
    keep 304-ing;
  * flag-off run on the same web is byte-identical to historical.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=4, pages_per_host=30, change_every=3)
SEEDS = synthweb.seed_urls(CFG, 12)
CYCLES = 7


def _listed(url: str) -> bool:
    parts = url.split("/")
    host = parts[2]
    return (
        len(parts) == 5
        and parts[3] == "p"
        and synthweb._digest(f"map:{CFG.seed}:{host}:{parts[4]}")[0] % 4 == 0
    )


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
        adaptive_recrawl=True, sitemap_seeds=True, sitemap_lastmod=True,
    )


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("smlm")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        recrawl_every=1, adaptive_recrawl=True, sitemap_lastmod=True,
    )
    eng.crawl(SEEDS, cycles=CYCLES, sitemap_seeds=True)
    return eng


def test_lastmod_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_lastmod_frontier_and_seen_exact(engine_res, oracle_res):
    got = {
        r.url_norm: (r.status, r.last_cycle, r.interval)
        for r in engine_res.frontier.read().collect()
    }
    want = {
        u: (e.status, e.last_cycle, e.interval)
        for u, e in oracle_res.frontier.items()
    }
    assert got == want
    got_seen = {
        r.url_norm for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert got_seen == oracle_res.seen


def test_lastmod_saves_conditional_gets_nonvacuous(oracle_res):
    # twin without the flag on the same web: strictly more 304s, and
    # every fetch the twin does that we skip is a LISTED page whose
    # epoch had not advanced since its previous fetch
    twin = oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, recrawl_every=1,
        adaptive_recrawl=True, sitemap_seeds=True,
    )
    n304 = sum(1 for t in oracle_res.trace if t[5] == "not_modified")
    n304_twin = sum(1 for t in twin.trace if t[5] == "not_modified")
    assert n304_twin > n304, (n304_twin, n304)
    # with lastmod honored, NO listed page ever answers 304: its
    # revisits only happen when the epoch advanced (⇒ a changed 200)
    listed_304 = [
        t for t in oracle_res.trace
        if t[5] == "not_modified" and _listed(t[2])
    ]
    assert listed_304 == []
    # listed pages still DO refetch across epoch boundaries (the skip
    # is a deferral, not a permanent drop)
    listed_refetch = {
        t[2] for t in oracle_res.trace
        if t[1] > 1 and t[5] == "fetched" and _listed(t[2])
    }
    assert listed_refetch, "no listed page ever refetched"
    # twin 304s on listed pages exist (that's the saving)
    assert any(_listed(t[2]) for t in twin.trace if t[5] == "not_modified")


def test_lastmod_static_web_listed_never_revisit(spark, tmp_path):
    # change_every=0: declared lastmod never advances, so listed pages
    # are fetched exactly once; unlisted pages keep 304-ing
    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=20, change_every=0)
    seeds = synthweb.seed_urls(cfg, 9)
    want = oracle.crawl(
        cfg, seeds, cycles=4, recrawl_every=1, sitemap_lastmod=True,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "static"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        recrawl_every=1, sitemap_lastmod=True,
    )
    eng.crawl(seeds, cycles=4)
    got = _trace(eng)
    assert got == want.trace

    def listed_cfg(url):
        parts = url.split("/")
        return (
            len(parts) == 5 and parts[3] == "p"
            and synthweb._digest(
                f"map:{cfg.seed}:{parts[2]}:{parts[4]}"
            )[0] % 4 == 0
        )

    per_url: dict[str, int] = {}
    for t in want.trace:
        if t[5] in ("fetched", "not_modified"):
            per_url[t[2]] = per_url.get(t[2], 0) + 1
    listed = {u: n for u, n in per_url.items() if listed_cfg(u)}
    unlisted = {u: n for u, n in per_url.items() if not listed_cfg(u)}
    assert listed and all(n == 1 for n in listed.values()), listed
    assert any(n > 1 for n in unlisted.values())


def test_lastmod_off_is_historical(spark, tmp_path):
    # same web, flag off: engine == oracle without the kwarg (the new
    # code path must be invisible when disabled)
    want = oracle.crawl(
        CFG, SEEDS, cycles=3, recrawl_every=1, adaptive_recrawl=True,
        sitemap_seeds=True,
    )
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "off"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        recrawl_every=1, adaptive_recrawl=True,
    )
    eng.crawl(SEEDS, cycles=3, sitemap_seeds=True)
    assert _trace(eng) == want.trace
