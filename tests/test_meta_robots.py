"""Page-level robots meta gate (REP ``<meta name="robots">``): noindex
keeps a fetched page's content out of the image/caption store, nofollow
keeps its outlinks out of discovery — the page-level directives every
production indexer honors (distinct from robots.txt, which gates the
FETCH; these gate what happens to a page that was legitimately
fetched). Gates:

  * fetchparse.meta_robots_cols (pure JVM regexp_extract) ==
    parsekit.meta_robots (python twin) on rendered pages + edge cases;
  * engine crawl with meta_robots=True on a directive-bearing web
    reproduces the oracle crawler exactly (trace, seen set, frontier,
    stored images, per-host noindexed/nofollowed metrics),
    non-vacuously — both directive kinds fire, and both visibly shrink
    the store / the frontier vs the flag-off run;
  * meta_robots=False (default) ignores the directives entirely and
    stays byte-identical to the historical behavior on the same web.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, parsekit, synthweb
from ccbot_spark.engine import CrawlEngine
from ccbot_spark.operators import fetchparse

CFG = synthweb.WebConfig(
    n_hosts=6, pages_per_host=40, meta_robots_pct=40, seed=7
)
SEEDS = synthweb.seed_urls(CFG, 18)
CYCLES = 2


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]


def test_meta_robots_jvm_python_twin(spark):
    pages = [
        synthweb.fetch(CFG, f"http://{CFG.host(k)}/p/{j}")
        for k in range(4)
        for j in range(25)
    ]
    edge = [
        "",
        "<html><head></head><body>x</body></html>",
        '<meta name="robots" content="noindex">',
        '<meta name="robots" content="NOFOLLOW">',  # lowercased scan
        '<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">',
        '<meta name="robots" content="none at all">',  # no verdict words
        '<meta name="viewport" content="noindex">',  # wrong tag name
        # first tag wins on both engines
        '<meta name="robots" content="noindex">'
        '<meta name="robots" content="nofollow">',
    ]
    rows = [(h,) for h in pages + edge]
    df = spark.createDataFrame(rows, "html string")
    ni, nf = fetchparse.meta_robots_cols("html")
    got = [
        (r["ni"], r["nf"])
        for r in df.select(ni.alias("ni"), nf.alias("nf")).collect()
    ]
    want = [parsekit.meta_robots(h) for h, in rows]
    assert got == want
    # the synthetic slice is non-vacuous: all three directive variants
    # appear in the rendered pages
    verdicts = set(want[: len(pages)])
    assert (True, False) in verdicts
    assert (False, True) in verdicts
    assert (True, True) in verdicts


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, meta_robots=True)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("mrob")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        meta_robots=True,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_meta_robots_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_meta_robots_seen_exact(engine_res, oracle_res):
    got = {
        r.url_norm
        for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert got == oracle_res.seen


def test_meta_robots_stored_images_exact(engine_res, oracle_res):
    got = {
        r.image_id: (r.w, r.h, r.fmt, r.caption, r.phash, bytes(r.bytes))
        for r in engine_res.images.read().collect()
    }
    want = {
        r["image_id"]: (
            r["w"], r["h"], r["fmt"], r["caption"], r["phash"], r["bytes"]
        )
        for r in oracle_res.images
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_meta_robots_metrics_exact_and_nonvacuous(engine_res, oracle_res):
    cols = (
        "fetched", "parsed_links", "stored_images", "dedup_hits",
        "noindexed", "nofollowed",
    )
    got = {
        (r.cycle, r.host): tuple(getattr(r, c) for c in cols)
        for r in engine_res.metrics.read().collect()
    }
    want = {
        (m["cycle"], m["host"]): tuple(m[c] for c in cols)
        for m in oracle_res.metrics
    }
    assert got == want
    assert sum(m["noindexed"] for m in oracle_res.metrics) > 0
    assert sum(m["nofollowed"] for m in oracle_res.metrics) > 0


def test_meta_robots_off_ignores_directives(spark, tmp_path, oracle_res):
    """Default behavior on the SAME directive-bearing web: directives
    are ignored (every page stored + parsed), equality with the
    flag-off oracle holds, and the gate visibly shrank both the store
    and the link stream in the flag-on run."""
    want = oracle.crawl(CFG, SEEDS, cycles=CYCLES, meta_robots=False)
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "off"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    got_imgs = {
        r.image_id for r in eng.images.read().select("image_id").collect()
    }
    assert got_imgs == {r["image_id"] for r in want.images}
    got = _trace(eng)
    assert got == want.trace
    # non-vacuity of the gate itself: flag-on stored strictly fewer
    # images and parsed strictly fewer links than flag-off on this web
    on_links = sum(m["parsed_links"] for m in oracle_res.metrics)
    off_links = sum(m["parsed_links"] for m in want.metrics)
    assert on_links < off_links
    assert len(oracle_res.images) < len(want.images)
    # and the off-run reports zero directive counters
    assert sum(m["noindexed"] for m in want.metrics) == 0
    assert sum(m["nofollowed"] for m in want.metrics) == 0
