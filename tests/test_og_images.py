"""OpenGraph image+caption discovery in the crawl loop: a page's
og:image + og:title is the third image channel next to <img alt> and
<figure>/<figcaption> — the pair every social-shareable page declares.
Gates: engine == oracle on stored images (og-discovered pairs
included, captions from og:title), trace unchanged in shape;
og-channel precedence is lowest (a body reference to the same url
keeps its body caption); og_pct=0 webs stay byte-identical.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, parsekit, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=4, pages_per_host=30, og_pct=40, seed=17)
SEEDS = synthweb.seed_urls(CFG, 10)
CYCLES = 2


def test_og_pair_twin_and_precedence():
    url = f"http://{CFG.host(0)}/p/3"
    found = None
    for j in range(CFG.pages_per_host):
        u = f"http://{CFG.host(0)}/p/{j}"
        html = synthweb.fetch(CFG, u)
        if 'property="og:image"' in html:
            found = (u, html)
            break
    assert found, "fixture never planted an og tag"
    u, html = found
    pair = parsekit.og_image_pair(html)
    assert pair is not None and pair[0].startswith("http://")
    imgs = dict(parsekit.extract_images(u, html))
    assert pair[0] in imgs and imgs[pair[0]] == pair[1]
    # precedence: a body <img> reference to the SAME url keeps its alt
    html2 = (
        f'<html><head><meta property="og:image" content="{pair[0]}">'
        f'<meta property="og:title" content="og cap"></head>'
        f'<body><img src="{pair[0]}" alt="body cap"></body></html>'
    )
    assert dict(parsekit.extract_images(u, html2))[pair[0]] == "body cap"
    # no og:image → None; og:image without title falls back to desc
    assert parsekit.og_image_pair("<html></html>") is None


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("og")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_og_stored_images_exact(engine_res, oracle_res):
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
    # non-vacuous: og-discovered pairs were actually stored, captioned
    og_ids = [i for i in got if "/img/og" in i]
    assert og_ids, "no og image was ever stored"
    for i in og_ids:
        assert got[i][3] == synthweb.caption_of(CFG, i)


def test_og_trace_exact(engine_res, oracle_res):
    rows = engine_res.trace.read().orderBy("seq").collect()
    got = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in rows
    ]
    assert got == oracle_res.trace
