"""Sitemap index files (sitemap_shards > 0): large sites shard their
sitemaps behind a <sitemapindex> (one urlset caps at 50k URLs), and a
crawler must fetch the index, then each child shard — one level only,
the spec forbids nested indexes. Gates:

  * the sharded fixture is faithful: /sitemap.xml is an index, shards
    partition the unsharded page list exactly;
  * expand_sitemap_urls is index-aware and shared by oracle + engine;
  * engine seeding over a sharded web (both sitemap_seeds=True and the
    robots-declared discovery path) reproduces the oracle byte-exactly,
    and expands MORE than the seed-only frontier (non-vacuous).
"""

from __future__ import annotations

from ccbot_spark import oracle, parsekit, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=4, pages_per_host=40, sitemap_shards=3)
SEEDS = synthweb.seed_urls(CFG, 8)


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_sharded_fixture_partitions_unsharded():
    host = CFG.host(0)
    idx = synthweb.sitemap_xml(CFG, host)
    assert parsekit.is_sitemap_index(idx)
    child_urls = parsekit.extract_sitemap_urls(idx)
    assert child_urls == [
        f"http://{host}/sitemap-{i}.xml" for i in range(3)
    ]
    flat = synthweb.WebConfig(n_hosts=4, pages_per_host=40)  # shards=0
    want = set(parsekit.extract_sitemap_urls(synthweb.sitemap_xml(flat, host)))
    got: set[str] = set()
    for sm_url in child_urls:
        body = synthweb.sitemap_body(CFG, sm_url)
        assert body is not None and not parsekit.is_sitemap_index(body)
        shard = set(parsekit.extract_sitemap_urls(body))
        assert not (shard & got), "shards overlap"
        got |= shard
    assert got == want and want, "shards must partition the page list"
    # the shared expansion helper flattens the index to the same set
    assert set(synthweb.expand_sitemap_urls(CFG, idx)) == want
    # flat webs are untouched by the helper
    flat_xml = synthweb.sitemap_xml(flat, host)
    assert synthweb.expand_sitemap_urls(
        flat, flat_xml
    ) == parsekit.extract_sitemap_urls(flat_xml)


def test_sitemap_index_crawl_matches_oracle(spark, tmp_path):
    want = oracle.crawl(CFG, SEEDS, cycles=2, sitemap_seeds=True)
    plain = oracle.crawl(CFG, SEEDS, cycles=2)
    assert len(want.frontier) > len(plain.frontier), "expansion vacuous"
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "smidx"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=2, sitemap_seeds=True)
    assert _trace(eng) == want.trace
    seeded = {
        r.url_norm
        for r in eng.frontier.read().filter("cycle_added = 0").collect()
    }
    assert seeded == {
        u for u, e in want.frontier.items() if e.cycle_added == 0
    }


def test_sitemap_index_robots_discovery_matches_oracle(spark, tmp_path):
    want = oracle.crawl(CFG, SEEDS, cycles=1, sitemap_seeds="robots")
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "smrob"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=1, sitemap_seeds="robots")
    assert _trace(eng) == want.trace
