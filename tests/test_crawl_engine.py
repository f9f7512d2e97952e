"""Trace-equality tests: the Spark engine must reproduce the oracle
crawler exactly — crawl order, seen-set membership, stored image rows,
and per-host metrics (BASELINE.json north_rule; SURVEY.md §5 item 2).
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(n_hosts=5, pages_per_host=60, hot_frac_pct=25)
SEEDS = synthweb.seed_urls(CFG, 20)
CYCLES = 2


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("engine")), n_buckets=8,
        use_bloom=True, record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def _engine_trace(eng) -> list[tuple]:
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_trace_exact_match(engine_res, oracle_res):
    got = _engine_trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_seen_set_exact_match(engine_res, oracle_res):
    got = {r.url_norm for r in engine_res.seen.read().select("url_norm").collect()}
    assert got == oracle_res.seen


def test_stored_images_exact_match(engine_res, oracle_res):
    got = {
        r.image_id: (r.w, r.h, r.fmt, r.caption, r.phash, bytes(r.bytes))
        for r in engine_res.images.read().collect()
    }
    want = {
        r["image_id"]: (r["w"], r["h"], r["fmt"], r["caption"], r["phash"], r["bytes"])
        for r in oracle_res.images
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_metrics_match_per_host(engine_res, oracle_res):
    got = {
        (r.cycle, r.host): (
            r.fetched, r.parsed_links, r.stored_images, r.dedup_hits,
            r.errors, r.bytes, r.redirects,
        )
        for r in engine_res.metrics.read().collect()
    }
    want = {
        (m["cycle"], m["host"]): (
            m["fetched"], m["parsed_links"], m["stored_images"],
            m["dedup_hits"], m["errors"], m["bytes"], m["redirects"],
        )
        for m in oracle_res.metrics
    }
    assert got == want


def test_frontier_statuses_consistent(engine_res, oracle_res):
    rows = engine_res.frontier.read().collect()
    by_status: dict[str, set] = {}
    for r in rows:
        by_status.setdefault(r.status, set()).add(r.url_norm)
    want_status: dict[str, set] = {}
    for e in oracle_res.frontier.values():
        want_status.setdefault(e.status, set()).add(e.url_norm)
    assert {k: v for k, v in by_status.items()} == want_status


def test_resume_reproduces_uninterrupted(spark, tmp_path, engine_res, oracle_res):
    """Kill after cycle 1, resume from checkpoint in a fresh engine
    object, run cycle 2 — final state identical to the uninterrupted
    run (BASELINE.json: 'resumable from Spark checkpoints')."""
    wd = str(tmp_path / "resumed")
    eng1 = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True, bloom_min_seen=0,
                       record_trace=True, hot_host_min=10)
    eng1.crawl(SEEDS, cycles=1)  # ... then the process "dies"

    eng2 = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True, bloom_min_seen=0,
                       record_trace=True, hot_host_min=10)
    assert eng2.resume() == 1
    eng2.run_cycle(2)
    assert _engine_trace(eng2) == oracle_res.trace
    got_seen = {r.url_norm for r in eng2.seen.read().select("url_norm").collect()}
    assert got_seen == oracle_res.seen
    got_imgs = {r.image_id for r in eng2.images.read().select("image_id").collect()}
    assert got_imgs == {r["image_id"] for r in oracle_res.images}


def test_resume_discards_partial_cycle(spark, tmp_path, oracle_res):
    """A crash mid-cycle leaves newer table versions; resume() rolls
    back to the last tagged cycle and the rerun still matches."""
    wd = str(tmp_path / "partial")
    eng = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True, bloom_min_seen=0,
                      record_trace=True, hot_host_min=10)
    eng.crawl(SEEDS, cycles=1)
    # simulate a partial cycle-2 write that never reached _save_state
    eng.images.append(eng.images.read().limit(1))
    eng2 = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True, bloom_min_seen=0,
                       record_trace=True, hot_host_min=10)
    assert eng2.resume() == 1
    eng2.run_cycle(2)
    assert _engine_trace(eng2) == oracle_res.trace


def test_bloom_off_identical(spark, tmp_path, oracle_res):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "nobloom"), n_buckets=8,
        use_bloom=False, record_trace=True, hot_host_min=10,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    assert _engine_trace(eng) == oracle_res.trace


def test_bloom_sharded_identical(spark, tmp_path, oracle_res):
    """Force the bucket-routed shard path (the 10^10-URL form: no
    merged filter, no broadcast — membership checks cogroup against
    per-bucket shards) and assert the crawl trace, seen set, and
    stored images are byte-identical to the oracle."""
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "sharded"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, bloom_sharded=True,
        record_trace=True, hot_host_min=10,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    assert eng.bloom_sharded and eng._seen_shards is not None
    assert eng._seen_bloom is None  # no merged filter was ever built
    # the phash prefilter follows the same flavor: sharded, no merged
    # array, no broadcast
    assert eng._phash_shards is not None and eng._phash_bloom is None
    assert eng._phash_bloom_bc is None
    assert _engine_trace(eng) == oracle_res.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == oracle_res.seen
    got_imgs = {r.image_id for r in eng.images.read().select("image_id").collect()}
    assert got_imgs == {r["image_id"] for r in oracle_res.images}


def test_bloom_sharded_auto_threshold(spark, tmp_path):
    """bloom_sharded=None auto-selects by broadcastability: a filter
    bigger than bloom_broadcast_max_bytes goes sharded."""
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "auto"), n_buckets=8,
        bloom_bits=1 << 22, bloom_broadcast_max_bytes=1 << 10,
    )
    assert eng.bloom_sharded
    eng2 = CrawlEngine(
        spark, CFG, str(tmp_path / "auto2"), n_buckets=8,
        bloom_bits=1 << 22, bloom_broadcast_max_bytes=1 << 30,
    )
    assert not eng2.bloom_sharded


def test_fetch_errors_match_oracle(spark, tmp_path):
    """fail_pct injects deterministic fetch errors: slot consumed, no
    parse, status 'error', errors metric — engine must match the
    oracle on trace (incl. fetch_error events), seen-set, statuses,
    and per-host error counts."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, fail_pct=25)
    seeds = synthweb.seed_urls(cfg, 16)
    want = oracle.crawl(cfg, seeds, cycles=2)
    assert any(t[5] == "fetch_error" for t in want.trace)  # fixture bites
    # fixture also exercises retry-then-success (transient failures):
    err_urls = {t[2] for t in want.trace if t[5] == "fetch_error"}
    refetched = {
        t[2] for t in want.trace if t[5] == "fetched" and t[2] in err_urls
    }
    assert refetched, "expected ≥1 URL to succeed on retry"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "err"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=2)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_status = {
        r.url_norm: r.status for r in eng.frontier.read().collect()
    }
    want_status = {u: e.status for u, e in want.frontier.items()}
    assert got_status == want_status
    got_err = {
        (r.cycle, r.host): r.errors for r in eng.metrics.read().collect()
    }
    want_err = {(m["cycle"], m["host"]): m["errors"] for m in want.metrics}
    assert got_err == want_err


def test_redirect_of_invariants():
    """Single-hop by construction: only odd pages redirect, targets are
    the prior even page on the same host and NEVER redirect themselves;
    pure function of (cfg, url); off by default."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, redirect_pct=100)
    hops = 0
    for k in range(4):
        for j in range(50):
            u = f"http://{cfg.host(k)}/p/{j}"
            tgt = synthweb.redirect_of(cfg, u)
            if j % 2 == 0:
                assert tgt is None
            else:
                assert tgt == f"http://{cfg.host(k)}/p/{j - 1}"
                assert synthweb.redirect_of(cfg, tgt) is None
                hops += 1
            assert synthweb.redirect_of(cfg, u) == tgt  # deterministic
    assert hops == 4 * 25
    off = synthweb.WebConfig(n_hosts=4, pages_per_host=50)
    assert synthweb.redirect_of(off, "http://h0.test/p/1") is None
    assert synthweb.redirect_of(cfg, "http://h0.test/img/abc.png") is None


def test_redirects_match_oracle(spark, tmp_path):
    """redirect_pct makes a deterministic slice of odd pages 301 to the
    prior page: slot consumed, no parse, terminal status 'redirect',
    'redirect' trace event; the Location target enters the frontier
    like a discovered link (fetched in the next cycle) or emits 'dup'
    if already seen. Engine must match the oracle on all of it."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, redirect_pct=40)
    seeds = synthweb.seed_urls(cfg, 16)
    want = oracle.crawl(cfg, seeds, cycles=2)
    redir_urls = {t[2] for t in want.trace if t[5] == "redirect"}
    assert redir_urls, "fixture must produce redirects"
    # at least one redirect TARGET got fetched in a later cycle
    import re

    tgts = {re.sub(r"/p/(\d+)$", lambda m: f"/p/{int(m.group(1)) - 1}", u)
            for u in redir_urls}
    fetched_later = {t[2] for t in want.trace if t[5] == "fetched"} & tgts
    assert fetched_later, "expected ≥1 redirect target to be crawled"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "redir"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=2)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_status = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    assert got_status == {u: e.status for u, e in want.frontier.items()}
    got_m = {
        (r.cycle, r.host): (r.redirects, r.fetched)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["redirects"], m["fetched"])
        for m in want.metrics
    }
    assert got_m == want_m


def test_sitemap_seeds_match_oracle(spark, tmp_path):
    """sitemap_seeds expands the frontier from each seed host's
    /sitemap.xml (distributed fetch+parse, two-phase dt_seq numbering):
    engine must match the oracle on the seeded frontier (priorities +
    dt_seq), trace, and seen set — and the expansion must actually add
    URLs beyond the explicit seed list."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=40)
    seeds = synthweb.seed_urls(cfg, 8)
    want = oracle.crawl(cfg, seeds, cycles=1, sitemap_seeds=True)
    plain = oracle.crawl(cfg, seeds, cycles=1)
    assert len(want.frontier) > len(plain.frontier)

    eng = CrawlEngine(spark, cfg, str(tmp_path / "sm"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=1, sitemap_seeds=True)
    got_seed = {
        r.url_norm: (r.priority, r.dt_cycle, r.dt_seq)
        for r in eng.frontier.read().filter("cycle_added = 0").collect()
    }
    want_seed = {
        e.url_norm: (e.priority, e.dt_cycle, e.dt_seq)
        for e in want.frontier.values()
        if e.cycle_added == 0
    }
    assert got_seed == want_seed
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen


def test_trap_filter_matches_oracle(spark, tmp_path):
    """trap_pct plants calendar-loop links; with trap_filter on, both
    sides parse them (metrics count pre-filter) but never enqueue them,
    and the crawl stays byte-identical to the oracle."""
    from ccbot_spark import urlkit

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, trap_pct=60)
    seeds = synthweb.seed_urls(cfg, 16)
    unfiltered = oracle.crawl(cfg, seeds, cycles=2)
    trap_urls = {u for u in unfiltered.seen if urlkit.is_trap(u)}
    assert trap_urls, "fixture must produce trap URLs"

    want = oracle.crawl(cfg, seeds, cycles=2, trap_filter=True)
    assert not any(urlkit.is_trap(u) for u in want.seen)
    # not a subset relation: dropping traps frees politeness slots, so
    # the filtered crawl legitimately reaches different pages — the
    # invariant is only that no trap URL is ever enqueued
    assert want.seen != unfiltered.seen

    eng = CrawlEngine(spark, cfg, str(tmp_path / "trap"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, trap_filter=True)
    eng.crawl(seeds, cycles=2)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_links = {
        (r.cycle, r.host): r.parsed_links for r in eng.metrics.read().collect()
    }
    want_links = {
        (m["cycle"], m["host"]): m["parsed_links"] for m in want.metrics
    }
    assert got_links == want_links


def test_nofollow_matches_oracle(spark, tmp_path):
    """rel=nofollow anchors are never extracted (not followed, not
    counted) — JVM tag-filter and parsekit agree, and the crawl stays
    byte-identical to the oracle with nofollow links planted."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, nofollow_pct=50)
    seeds = synthweb.seed_urls(cfg, 16)
    baseline = oracle.crawl(
        synthweb.WebConfig(n_hosts=4, pages_per_host=50), seeds, cycles=2
    )
    want = oracle.crawl(cfg, seeds, cycles=2)
    # nofollow actually suppressed discoveries vs the same web without it
    assert want.seen != baseline.seen

    eng = CrawlEngine(spark, cfg, str(tmp_path / "nf"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=2)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen


def test_recrawl_304_matches_oracle(spark, tmp_path):
    """Revisit policy: recrawl_every re-enqueues fetched pages; a
    revisit inside the same content epoch answers 304 (slot consumed,
    no parse), a revisit across an epoch boundary re-fetches the
    re-rendered page. Engine must match the oracle event-for-event."""
    from collections import Counter

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50, change_every=2)
    seeds = synthweb.seed_urls(cfg, 16)
    want = oracle.crawl(cfg, seeds, cycles=4, recrawl_every=1)
    actions = Counter(t[5] for t in want.trace)
    assert actions["not_modified"] > 0, "fixture must produce 304s"
    refetches = Counter(t[2] for t in want.trace if t[5] == "fetched")
    assert any(c >= 2 for c in refetches.values()), (
        "fixture must re-fetch changed pages"
    )

    eng = CrawlEngine(spark, cfg, str(tmp_path / "recrawl"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, recrawl_every=1)
    eng.crawl(seeds, cycles=4)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_m = {
        (r.cycle, r.host): (r.not_modified, r.fetched)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["not_modified"], m["fetched"])
        for m in want.metrics
    }
    assert got_m == want_m
    # revisit clock persisted: every fetched page's last_cycle is set
    lc = {r.last_cycle for r in eng.frontier.read()
          .filter("status = 'fetched'").collect()}
    assert lc and -1 not in lc


def test_recrawl_static_web_all_304(spark, tmp_path):
    """change_every=0 (static web): every revisit is a 304 — no page is
    ever parsed twice, stored images don't grow after the first visit."""
    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=30)
    seeds = synthweb.seed_urls(cfg, 9)
    want = oracle.crawl(cfg, seeds, cycles=3, recrawl_every=1)
    from collections import Counter

    fetch_counts = Counter(t[2] for t in want.trace if t[5] == "fetched")
    assert fetch_counts and max(fetch_counts.values()) == 1
    assert any(t[5] == "not_modified" for t in want.trace)

    eng = CrawlEngine(spark, cfg, str(tmp_path / "static"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, recrawl_every=1)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen


def test_cuckoo_merged_identical(spark, tmp_path, oracle_res):
    """seen_filter="cuckoo" (merged/broadcast form): same trace, seen
    set, and stored images as the oracle — the filter flavor is a
    prefilter implementation detail, never visible in results."""
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "cuckoo"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, seen_filter="cuckoo",
        record_trace=True, hot_host_min=10,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    from ccbot_spark.operators.cuckoo import CuckooFilter

    assert isinstance(eng._seen_bloom, CuckooFilter)
    assert not eng._seen_bloom.overflow
    assert _engine_trace(eng) == oracle_res.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == oracle_res.seen


def test_cuckoo_sharded_identical(spark, tmp_path, oracle_res):
    """seen_filter="cuckoo" with the bucket-routed shard path forced
    (per-bucket cuckoo shards, cogroup probe, incremental shard merge
    across cycles) — trace and seen set still exact."""
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "cuckoosh"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, bloom_sharded=True,
        seen_filter="cuckoo", record_trace=True, hot_host_min=10,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    assert eng._seen_shards is not None and eng._seen_bloom is None
    assert _engine_trace(eng) == oracle_res.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == oracle_res.seen


def test_lineage_and_compaction(spark, tmp_path, oracle_res):
    """compact_every bounds the COW small-file growth without touching
    results; the lineage table records per-(cycle, table, partition)
    snapshot stats and, being an audit log, is append-only."""
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "maint"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, record_trace=True,
        hot_host_min=10, compact_every=1,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    assert _engine_trace(eng) == oracle_res.trace
    # every churned partition is compacted down to one file
    for t in (eng.frontier, eng.seen):
        assert all(s["n_files"] == 1 for s in t.partition_file_stats())
    lin = eng.lineage.read().collect()
    assert {r.cycle for r in lin} == set(range(1, CYCLES + 1))
    by = {(r.cycle, r.table): 0 for r in lin}
    for r in lin:
        by[(r.cycle, r.table)] += r.n_rows
    # last cycle's lineage row totals match the tables' manifest counts
    # (lineage is recorded pre-compaction; compaction preserves rows)
    assert by[(CYCLES, "frontier")] == eng.frontier.row_count()
    assert by[(CYCLES, "seen")] == eng.seen.row_count()
    assert by[(CYCLES, "images")] == eng.images.row_count()


def test_rank_reprioritization_identical(spark, tmp_path, oracle_res):
    """Dynamic PageRank re-prioritization (rank_every=1): engine and
    oracle run the same integer rank over the same accumulated link
    graph, so traces stay byte-identical — and differ from the static
    decay-priority crawl (the feature provably changes crawl order)."""
    from ccbot_spark import oracle as omod

    want = omod.crawl(CFG, SEEDS, cycles=CYCLES, rank_every=1)
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "ranked"), n_buckets=8,
        use_bloom=True, bloom_min_seen=0, record_trace=True,
        hot_host_min=10, rank_every=1,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    got = _engine_trace(eng)
    assert got == want.trace
    assert got != oracle_res.trace  # non-vacuous: ordering changed
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen


def test_warc_archive_matches_images_table(spark, tmp_path):
    """warc_dir sink: every cycle's stored images also land as
    .warc.gz segments whose records round-trip byte-exactly to the
    images table (payload, caption, fmt), with deterministic ids."""
    from ccbot_spark import warc as warcmod

    wd = str(tmp_path / "we")
    warc_dir = str(tmp_path / "warc")
    eng = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True,
                      bloom_min_seen=0, hot_host_min=10,
                      warc_dir=warc_dir, warc_segments=3, warc_wet=True)
    eng.crawl(SEEDS, cycles=2)

    table = {
        r.image_id: (bytes(r.bytes), r.caption, r.fmt)
        for r in eng.images.read().collect()
    }
    recs = warcmod.read_segments(
        spark, warc_dir, pattern="cycle=*/*.warc.gz"
    ).collect()
    assert len(recs) == len(table) and len(table) > 0
    for r in recs:
        payload, caption, fmt = table[r["target_uri"]]
        assert bytes(r["payload"]) == payload, r["target_uri"]
        assert r["headers"]["X-Caption"] == caption
        assert r["headers"]["X-Image-Fmt"] == fmt
        assert r["record_id"] == warcmod.record_id_of(
            r["target_uri"], r["warc_date"]
        )
    # WET companion: one "conversion" record per fetched page, body ==
    # the python extract_text of the (static-web) page html
    from ccbot_spark import parsekit, synthweb

    wet = warcmod.read_segments(
        spark, warc_dir, pattern="cycle=*/wet/*.warc.gz"
    ).collect()
    want_res = oracle.crawl(CFG, SEEDS, cycles=2)
    fetched_urls = {t[2] for t in want_res.trace if t[5] == "fetched"}
    assert {r["target_uri"] for r in wet} == fetched_urls and wet
    for r in wet:
        assert r["warc_type"] == "conversion"
        want_text = parsekit.extract_text(
            synthweb.fetch(CFG, r["target_uri"], 0)
        )
        assert bytes(r["payload"]).decode("utf-8") == want_text, r["target_uri"]
    # trace unaffected by the extra sinks
    assert _engine_trace(eng) == want_res.trace


def test_adaptive_recrawl_matches_oracle(spark, tmp_path):
    """Adaptive revisit intervals: a 304 doubles a URL's interval, a
    changed revisit halves it (bounded by ADAPT_MIN/MAX). The engine's
    integer column arithmetic must match the oracle event-for-event,
    the policy must actually move intervals (non-vacuous), and it must
    waste fewer revisits than the fixed policy on the same web."""
    from collections import Counter

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=40, change_every=3)
    seeds = synthweb.seed_urls(cfg, 12)
    want = oracle.crawl(cfg, seeds, cycles=7, recrawl_every=1,
                        adaptive_recrawl=True)
    fixed = oracle.crawl(cfg, seeds, cycles=7, recrawl_every=1)
    ca = Counter(t[5] for t in want.trace)
    cf = Counter(t[5] for t in fixed.trace)
    assert ca["not_modified"] > 0 and ca["fetched"] > 0
    assert want.trace != fixed.trace, "fixture must separate the policies"
    # the policy's point: backed-off intervals waste fewer 304 slots
    assert ca["not_modified"] < cf["not_modified"]
    want_ivs = {e.url_norm: e.interval for e in want.frontier.values()
                if e.status == "fetched"}
    assert {1, 2} <= set(want_ivs.values()), "intervals must diverge"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "adapt"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, recrawl_every=1,
                      adaptive_recrawl=True)
    eng.crawl(seeds, cycles=7)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_m = {
        (r.cycle, r.host): (r.not_modified, r.fetched)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["not_modified"], m["fetched"])
        for m in want.metrics
    }
    assert got_m == want_m
    # per-URL intervals persisted in the frontier match the oracle's
    got_ivs = {r.url_norm: r.interval for r in eng.frontier.read()
               .filter("status = 'fetched'").collect()}
    assert got_ivs == want_ivs


def test_content_dedup_matches_oracle(spark, tmp_path):
    """Content-seen test (Mercator): pages whose body digest was
    already stored consume their slot, are traced 'content_dup', and
    are never parsed — so mirror-site link trees are pruned from the
    crawl. Engine (digest window + digests-table join) must match the
    oracle's sequential digest set event-for-event."""
    from collections import Counter

    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=50, mirror_pct=40)
    seeds = synthweb.seed_urls(cfg, 15)
    want = oracle.crawl(cfg, seeds, cycles=3, content_dedup=True)
    ca = Counter(t[5] for t in want.trace)
    assert ca["content_dup"] > 0, "fixture must produce content dups"
    off = oracle.crawl(cfg, seeds, cycles=3)
    assert want.trace != off.trace, "dedup must change the crawl"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "cdup"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, content_dedup=True)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_m = {
        (r.cycle, r.host): (r.content_dup, r.fetched, r.parsed_links, r.bytes)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (
            m["content_dup"], m["fetched"], m["parsed_links"], m["bytes"]
        )
        for m in want.metrics
    }
    assert got_m == want_m
    # digests table: one row per DISTINCT stored body, all unique
    digs = [r.digest for r in eng.digests.read().collect()]
    assert len(digs) == len(set(digs))
    n_content_new = sum(
        1 for t in want.trace if t[5] == "fetched"
    )
    assert len(digs) == n_content_new


def test_age_boost_matches_oracle(spark, tmp_path):
    """Starvation-free scheduling: candidates rank on priority +
    age_boost x cycles-waited (stored priority untouched). Combined
    with PageRank re-prioritization (which creates the old-low vs
    new-high inversions aging exists for), previously budget-starved
    URLs provably win slots — and the engine's sort-time `_eff` column
    must reproduce the oracle's aged ordering event-for-event."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=80, hot_frac_pct=40)
    seeds = synthweb.seed_urls(cfg, 16)
    want = oracle.crawl(cfg, seeds, cycles=4, rank_every=1, age_boost=200)
    base = oracle.crawl(cfg, seeds, cycles=4, rank_every=1)
    assert want.trace != base.trace, "fixture: aging must change the crawl"
    fetched_aged = {t[2] for t in want.trace if t[5] == "fetched"}
    fetched_base = {t[2] for t in base.trace if t[5] == "fetched"}
    assert fetched_aged - fetched_base, (
        "fixture: some starved URL must be fetched only with aging"
    )

    eng = CrawlEngine(spark, cfg, str(tmp_path / "aged"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, rank_every=1, age_boost=200)
    eng.crawl(seeds, cycles=4)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    # stored priorities are the PageRank values, never the aged ones
    got_pri = {r.url_norm: r.priority for r in eng.frontier.read().collect()}
    want_pri = {e.url_norm: e.priority for e in want.frontier.values()}
    assert got_pri == want_pri


def test_warc_cdx_random_access(spark, tmp_path):
    """warc_cdx: the cdx table indexes every archived record with a
    seekable (path, offset, length) span — seek+read+gunzip retrieves
    exactly that record, digest and SURT key match, and the spans tile
    each segment file completely."""
    import gzip as _gz
    import hashlib as _hl
    from collections import defaultdict

    from ccbot_spark import urlkit, warc as warcmod

    wd = str(tmp_path / "wcdx")
    warc_dir = str(tmp_path / "warc")
    eng = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True,
                      bloom_min_seen=0, hot_host_min=10,
                      warc_dir=warc_dir, warc_segments=3, warc_cdx=True)
    eng.crawl(SEEDS, cycles=2)

    n_images = eng.images.read().count()
    rows = eng.cdx.read().collect()
    assert len(rows) == n_images and n_images > 0
    spans = defaultdict(list)
    for r in rows:
        with open(r.path, "rb") as fh:
            fh.seek(r.offset)
            member = fh.read(r.length)
        recs = warcmod.parse_records(_gz.decompress(member))
        assert len(recs) == 1
        rec = recs[0]
        assert rec["target_uri"] == r.uri
        assert _hl.md5(rec["payload"]).hexdigest() == r.digest
        assert urlkit.surt(r.uri) == r.surt
        spans[r.path].append((r.offset, r.length))
    # spans tile each file: contiguous from 0 to file size, no gaps
    import os as _os

    for path, sp in spans.items():
        sp.sort()
        pos = 0
        for off, ln in sp:
            assert off == pos, (path, off, pos)
            pos += ln
        assert pos == _os.path.getsize(path)


def test_warc_fetch_records_point_lookup(spark, tmp_path):
    """warc.fetch_records: a filtered cdx subset retrieves exactly those
    records by seek+read — equal to what a full segment scan returns
    for the same URIs."""
    from pyspark.sql import functions as F

    from ccbot_spark import warc as warcmod

    wd = str(tmp_path / "wfr")
    warc_dir = str(tmp_path / "warc")
    eng = CrawlEngine(spark, CFG, wd, n_buckets=8, use_bloom=True,
                      bloom_min_seen=0, hot_host_min=10,
                      warc_dir=warc_dir, warc_segments=3, warc_cdx=True)
    eng.crawl(SEEDS, cycles=1)

    # point-lookup: only h0's captures, via a cdx filter
    want_cdx = eng.cdx.read().filter(F.col("surt").startswith("test,h0)"))
    n_want = want_cdx.count()
    assert 0 < n_want < eng.cdx.read().count()
    got = warcmod.fetch_records(spark, want_cdx).collect()
    assert len(got) == n_want
    full = {
        r["target_uri"]: bytes(r["payload"])
        for r in warcmod.read_segments(
            spark, warc_dir, pattern="cycle=*/*.warc.gz"
        ).collect()
    }
    for r in got:
        assert r["target_uri"].startswith("http://h0.test/")
        assert bytes(r["payload"]) == full[r["target_uri"]]


def test_sitemap_robots_discovery_matches_oracle(spark, tmp_path):
    """sitemap_seeds="robots": only hosts whose robots.txt carries a
    `Sitemap:` directive are expanded (spec-compliant discovery).
    Expansion sits strictly between no-sitemaps and all-hosts, and the
    engine matches the oracle on frontier/trace/seen."""
    from ccbot_spark import robots

    cfg = synthweb.WebConfig(n_hosts=6, pages_per_host=40)
    seeds = synthweb.seed_urls(cfg, 12)
    declaring = [
        cfg.host(k) for k in range(6)
        if robots.parse_robots(
            synthweb.robots_txt(cfg, cfg.host(k))
        ).sitemaps
    ]
    assert 0 < len(declaring) < 6, "fixture must mix declaring hosts"
    want = oracle.crawl(cfg, seeds, cycles=1, sitemap_seeds="robots")
    allm = oracle.crawl(cfg, seeds, cycles=1, sitemap_seeds=True)
    off = oracle.crawl(cfg, seeds, cycles=1)
    assert len(off.seen) < len(want.seen) < len(allm.seen)
    # every robots-discovered seed URL is on a declaring host
    extra = {
        e.url_norm for e in want.frontier.values() if e.cycle_added == 0
    } - {e.url_norm for e in off.frontier.values() if e.cycle_added == 0}
    assert extra and all(
        any(u.startswith(f"http://{h}/") for h in declaring) for u in extra
    )

    eng = CrawlEngine(spark, cfg, str(tmp_path / "smr"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=1, sitemap_seeds="robots")
    got_seed = {
        r.url_norm: (r.priority, r.dt_cycle, r.dt_seq)
        for r in eng.frontier.read().filter("cycle_added = 0").collect()
    }
    want_seed = {
        e.url_norm: (e.priority, e.dt_cycle, e.dt_seq)
        for e in want.frontier.values()
        if e.cycle_added == 0
    }
    assert got_seed == want_seed
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen


def test_canonical_matches_oracle(spark, tmp_path):
    """rel=canonical handling: a page declaring a different canonical
    URL consumes its slot, is traced 'canonical', reaches terminal
    frontier status 'canonical' and is never parsed/stored; the target
    joins the discovered pool with the page's own priority. Engine
    (JVM regexp scan + one-href resolve UDF) must match the oracle's
    parsekit-parsed run event-for-event — combined here with fail/
    redirect injection so the alias path composes with retries and
    301s."""
    from collections import Counter

    cfg = synthweb.WebConfig(
        n_hosts=5, pages_per_host=60, canonical_pct=60, fail_pct=10,
        redirect_pct=10,
    )
    seeds = synthweb.seed_urls(cfg, 20)
    want = oracle.crawl(cfg, seeds, cycles=3, canonical_dedup=True)
    ca = Counter(t[5] for t in want.trace)
    assert ca["canonical"] > 0, "fixture must produce canonical aliases"
    off = oracle.crawl(cfg, seeds, cycles=3)
    assert want.trace != off.trace, "canonical handling must change the crawl"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "canon"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, canonical_dedup=True)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    # terminal alias status: never re-fetched, and the canonical
    # TARGETS got enqueued (pending or already fetched)
    fr = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    want_fr = {e.url_norm: e.status for e in want.frontier.values()}
    assert fr == want_fr
    assert "canonical" in set(fr.values())
    got_m = {
        (r.cycle, r.host): (r.canonicals, r.fetched, r.parsed_links, r.bytes)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (
            m["canonicals"], m["fetched"], m["parsed_links"], m["bytes"]
        )
        for m in want.metrics
    }
    assert got_m == want_m


def test_canonical_extraction_jvm_matches_parsekit(spark):
    """fetchparse.with_canonical (JVM regexp + one-href resolve UDF)
    == parsekit.extract_canonical (python re) on every page of a
    canonical-bearing web, including pages with no declaration."""
    from ccbot_spark import parsekit
    from ccbot_spark.operators import fetchparse

    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=40, canonical_pct=50)
    urls = [
        f"http://{cfg.host(k)}/p/{j}"
        for k in range(cfg.n_hosts)
        for j in range(cfg.pages_per_host)
    ]
    rows = [(u, synthweb.render_page(cfg, u)) for u in urls]
    want = {u: parsekit.extract_canonical(u, h) for u, h in rows}
    assert any(v is not None for v in want.values())
    assert any(v is None for v in want.values())
    df = spark.createDataFrame(rows, "url_norm string, html string")
    got = {
        r.url_norm: r.canonical
        for r in fetchparse.with_canonical(df).collect()
    }
    assert got == want


def test_robots_change_matches_oracle(spark, tmp_path):
    """robots_change_every: robots.txt re-renders every K cycles and
    the crawl must follow the CURRENT epoch's rules — allow/deny sets
    AND crawl-delays shift, so denied events, budgets-after-denial,
    and sched slots all move between epochs. The engine rebuilds its
    robots dimension table every cycle (one mapInPandas over the
    pending hosts) with the cycle's epoch; the oracle keys its rules
    cache on (host, epoch). Both must stay byte-identical."""
    cfg = synthweb.WebConfig(
        n_hosts=5, pages_per_host=60, robots_change_every=1
    )
    seeds = synthweb.seed_urls(cfg, 20)

    # fixture non-vacuity: epochs actually change bytes for some host,
    # and epoch 0 (the static web) is reproduced exactly by ver=0
    assert any(
        synthweb.robots_txt(cfg, cfg.host(k), 1)
        != synthweb.robots_txt(cfg, cfg.host(k), 0)
        for k in range(cfg.n_hosts)
    )
    assert all(
        synthweb.robots_txt(cfg, cfg.host(k))
        == synthweb.robots_txt(cfg, cfg.host(k), 0)
        for k in range(cfg.n_hosts)
    )
    assert synthweb.robots_version(cfg, 2) == 2
    static = oracle.crawl(
        synthweb.WebConfig(n_hosts=5, pages_per_host=60), seeds, cycles=3
    )
    want = oracle.crawl(cfg, seeds, cycles=3)
    assert want.trace != static.trace, "changing robots must change the crawl"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "robch"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_m = {
        (r.cycle, r.host): (r.fetched, r.parsed_links)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["fetched"], m["parsed_links"])
        for m in want.metrics
    }
    assert got_m == want_m
    # non-vacuity on the traced deny path itself: some cycle's denied
    # set differs from the static web's (rules actually moved)
    denied = {(t[1], t[2]) for t in want.trace if t[5] == "robots_denied"}
    denied_static = {
        (t[1], t[2]) for t in static.trace if t[5] == "robots_denied"
    }
    assert denied != denied_static


def test_rate_limit_429_matches_oracle(spark, tmp_path):
    """HTTP 429 Retry-After deferral: hash-selected hosts
    (WebConfig.rate_limit_pct) refuse every request at sched_slot >=
    their per-cycle cap. A refused slot is consumed (it WAS a request),
    nothing is served — no 304, no parse, no error — and the URL
    becomes invisible to GENERATE until cycle + Retry-After. The
    verdict is slot-deterministic (synthweb.rate_limit_of), so the
    engine's salted applyInPandas fetch workers and the sequential
    oracle agree with no cross-worker state; traces must stay
    byte-identical, and deferred URLs must come back and be fetched."""
    cfg = synthweb.WebConfig(
        n_hosts=12, pages_per_host=40, rate_limit_pct=60,
        fail_pct=10, redirect_pct=10,
    )
    seeds = synthweb.seed_urls(cfg, 24)

    # fixture non-vacuity: some host rate-limits, some doesn't, and
    # every cap is below that host's robots budget (429s actually fire)
    rls = {
        h: synthweb.rate_limit_of(cfg, h)
        for h in (cfg.host(k) for k in range(cfg.n_hosts))
    }
    assert any(v is not None for v in rls.values())
    assert any(v is None for v in rls.values())
    assert all(
        v[0] < synthweb.host_budget(cfg, h)
        for h, v in rls.items()
        if v is not None
    )

    want = oracle.crawl(cfg, seeds, cycles=4)
    rl_events = [t for t in want.trace if t[5] == "rate_limited"]
    assert rl_events, "fixture must produce 429s"
    # the deferral is not terminal: some refused URL is fetched later
    rl_urls = {t[2] for t in rl_events}
    assert any(
        t[2] in rl_urls and t[5] == "fetched" for t in want.trace
    ), "some deferred URL must come back and be fetched"
    # and the deferral is real: after a 429 at cycle c, the URL's next
    # attempt of any kind happens no earlier than c + Retry-After
    attempt_kinds = (
        "fetched", "fetch_error", "redirect", "not_modified", "rate_limited"
    )
    by_url: dict[str, list[tuple[int, str]]] = {}
    for t in want.trace:
        if t[5] in attempt_kinds:
            by_url.setdefault(t[2], []).append((t[1], t[3]))
    for t in rl_events:
        url, c0, host = t[2], t[1], t[3]
        retry_after = synthweb.rate_limit_of(cfg, host)[1]
        nxt = [c for c, _ in by_url[url] if c > c0]
        assert all(c >= c0 + retry_after for c in nxt), (url, c0, nxt)

    eng = CrawlEngine(spark, cfg, str(tmp_path / "rl"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=4)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    # frontier deferral state matches entry-for-entry (incl. not_before)
    got_nb = {
        r.url_norm: (r.status, r.not_before)
        for r in eng.frontier.read().collect()
    }
    want_nb = {
        e.url_norm: (e.status, e.not_before) for e in want.frontier.values()
    }
    assert got_nb == want_nb
    # per-host 429 metrics match
    got_m = {
        (r.cycle, r.host): (r.fetched, r.rate_limited, r.errors)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["fetched"], m["rate_limited"], m["errors"])
        for m in want.metrics
    }
    assert got_m == want_m


def test_rate_limit_resume_preserves_deferrals(spark, tmp_path):
    """A 429 deferral must survive a crash/resume: not_before rides in
    the frontier table, so a fresh engine resumed from the cycle-2
    checkpoint honors pending Retry-After gates exactly — the final
    4-cycle state is byte-identical to the uninterrupted oracle run."""
    cfg = synthweb.WebConfig(
        n_hosts=12, pages_per_host=40, rate_limit_pct=60, fail_pct=10,
    )
    seeds = synthweb.seed_urls(cfg, 24)
    want = oracle.crawl(cfg, seeds, cycles=4)
    # non-vacuity: some deferral must still be open at the crash point
    # (a 429 in cycle 2 defers to >= cycle 3), so resume really is
    # carrying live Retry-After state across the restart
    assert any(t[1] == 2 and t[5] == "rate_limited" for t in want.trace)

    wd = str(tmp_path / "rlresume")
    eng1 = CrawlEngine(spark, cfg, wd, n_buckets=8, use_bloom=True,
                       bloom_min_seen=0, record_trace=True, hot_host_min=10)
    eng1.crawl(seeds, cycles=2)  # ... then the process "dies"

    eng2 = CrawlEngine(spark, cfg, wd, n_buckets=8, use_bloom=True,
                       bloom_min_seen=0, record_trace=True, hot_host_min=10)
    assert eng2.resume() == 2
    eng2.run_cycle(3)
    eng2.run_cycle(4)
    assert _engine_trace(eng2) == want.trace
    got_nb = {
        r.url_norm: (r.status, r.not_before)
        for r in eng2.frontier.read().collect()
    }
    want_nb = {
        e.url_norm: (e.status, e.not_before) for e in want.frontier.values()
    }
    assert got_nb == want_nb


def test_rate_limit_with_adaptive_recrawl_matches_oracle(spark, tmp_path):
    """429 deferral composed with the revisit policy: a recrawl-due
    page refused with 429 keeps status 'fetched' and its revisit clock
    untouched, and the not_before gate must suppress the due-revisit
    candidacy branch (not just pending/error) until Retry-After
    expires. change_every makes revisits a 304/changed mix so the
    adaptive interval fold and the deferral interact."""
    cfg = synthweb.WebConfig(
        n_hosts=8, pages_per_host=30, rate_limit_pct=60, change_every=2,
    )
    seeds = synthweb.seed_urls(cfg, 24)
    want = oracle.crawl(
        cfg, seeds, cycles=5, recrawl_every=1, adaptive_recrawl=True
    )
    # non-vacuity: a 429 must actually hit a revisit attempt (the URL
    # was fetched in an earlier cycle, then refused on its recrawl)
    fetched_at = {}
    hit_revisit = False
    for t in want.trace:
        if t[5] in ("fetched", "not_modified"):
            fetched_at.setdefault(t[2], t[1])
        if t[5] == "rate_limited" and t[2] in fetched_at:
            hit_revisit = True
    assert hit_revisit, "fixture: some revisit must be refused with 429"
    assert any(t[5] == "not_modified" for t in want.trace)

    eng = CrawlEngine(spark, cfg, str(tmp_path / "rladapt"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, recrawl_every=1, adaptive_recrawl=True)
    eng.crawl(seeds, cycles=5)
    assert _engine_trace(eng) == want.trace
    got = {
        r.url_norm: (r.status, r.last_cycle, r.interval, r.not_before)
        for r in eng.frontier.read().collect()
    }
    want_f = {
        e.url_norm: (e.status, e.last_cycle, e.interval, e.not_before)
        for e in want.frontier.values()
    }
    assert got == want_f


def test_error_backoff_matches_oracle(spark, tmp_path):
    """error_backoff=CAP: a failed fetch cools down min(2^retries, CAP)
    cycles through the same not_before gate as the 429 deferral,
    instead of retrying next cycle. Engine and oracle must agree on
    trace/seen/frontier, the policy must actually move retries (differ
    from the no-backoff run), and no errored URL may be re-attempted
    before its cooldown expires."""
    cfg = synthweb.WebConfig(n_hosts=6, pages_per_host=40, fail_pct=30)
    seeds = synthweb.seed_urls(cfg, 18)
    plain = oracle.crawl(cfg, seeds, cycles=5)
    want = oracle.crawl(cfg, seeds, cycles=5, error_backoff=8)
    assert want.trace != plain.trace, "backoff must change the schedule"
    # no-backoff: first retry happens the very next cycle for some URL;
    # with backoff the gap after the FIRST error is always >= 2 cycles
    errs_at: dict[str, int] = {}
    attempt_kinds = ("fetched", "fetch_error", "redirect", "not_modified")
    gap_ok = checked = 0
    for t in want.trace:
        if t[5] == "fetch_error" and t[2] not in errs_at:
            errs_at[t[2]] = t[1]
        elif t[5] in attempt_kinds and t[2] in errs_at:
            checked += 1
            if t[1] >= errs_at[t[2]] + 2:
                gap_ok += 1
            del errs_at[t[2]]
    assert checked > 0 and gap_ok == checked, (checked, gap_ok)

    eng = CrawlEngine(spark, cfg, str(tmp_path / "ebo"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, error_backoff=8)
    eng.crawl(seeds, cycles=5)
    assert _engine_trace(eng) == want.trace
    got = {
        r.url_norm: (r.status, r.retries, r.not_before)
        for r in eng.frontier.read().collect()
    }
    want_f = {
        e.url_norm: (e.status, e.retries, e.not_before)
        for e in want.frontier.values()
    }
    assert got == want_f


def test_phash_blocklist_engine_matches_oracle(spark, tmp_path):
    """Moderation gate in the crawl loop: images whose phash falls
    within blocklist_ham of a known-bad hash are dropped BEFORE the
    dedup insert (never stored, never in the phash set). Engine ==
    oracle on trace, stored rows, and blocked counts; blocked phashes
    provably absent from the images table."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=25)
    seeds = synthweb.seed_urls(cfg, 12)
    base = oracle.crawl(cfg, seeds, cycles=2)
    # bad list: 1-bit-flipped variants of real stored hashes — exact
    # misses, Hamming-1 hits, so only the near path can block them
    bad = [r["phash"] ^ (1 << 7) for r in sorted(
        base.images, key=lambda r: r["image_id"]
    )[:5]]
    want = oracle.crawl(
        cfg, seeds, cycles=2,
        phash_blocklist=frozenset(bad), blocklist_ham=1,
    )
    assert want.blocked_images >= 5, "blocklist never fired"
    assert len(want.images) < len(base.images)

    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "bl"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        phash_blocklist=bad, blocklist_ham=1,
    )
    res = eng.crawl(seeds, cycles=2)
    assert _engine_trace(eng) == want.trace
    got_imgs = {
        (r.image_id, r.caption, r.phash)
        for r in eng.images.read().select("image_id", "caption", "phash").collect()
    }
    assert got_imgs == {
        (r["image_id"], r["caption"], r["phash"]) for r in want.images
    }
    assert sum(c.get("blocked_images", 0) for c in res) == want.blocked_images
    stored_ph = {r.phash for r in eng.images.read().select("phash").collect()}
    for b in bad:
        assert all(bin(p ^ b).count("1") > 1 for p in stored_ph)


def test_warc_revisit_records(spark, tmp_path):
    """WARC revisit records (Common Crawl semantics): with content
    dedup + a WARC sink, each traced content_dup page is archived as a
    body-less `revisit` record under {cycle}/revisit/ — WARC-Type
    revisit, identical-payload-digest profile, Content-Length 0, and a
    WARC-Payload-Digest that points at a digest the engine actually
    stored. The archive then accounts for every consumed politeness
    slot without duplicating mirror bytes."""
    from ccbot_spark import warc as warcmod

    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=50, mirror_pct=40)
    seeds = synthweb.seed_urls(cfg, 15)
    want = oracle.crawl(cfg, seeds, cycles=3, content_dedup=True)
    want_dups = {
        (t[1], t[2]) for t in want.trace if t[5] == "content_dup"
    }
    assert want_dups, "fixture must produce content dups"

    warc_dir = str(tmp_path / "warc")
    eng = CrawlEngine(spark, cfg, str(tmp_path / "rv"), n_buckets=8,
                      record_trace=True, hot_host_min=10,
                      content_dedup=True,
                      warc_dir=warc_dir, warc_segments=3)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace

    recs = warcmod.read_segments(
        spark, warc_dir, pattern="cycle=*/revisit/*.warc.gz"
    ).collect()
    got_dups = set()
    for r in recs:
        assert r.warc_type == "revisit"
        assert r.headers["WARC-Profile"] == warcmod.REVISIT_PROFILE
        assert r.headers["Content-Length"] == "0"
        assert bytes(r.payload) == b""
        dig = r.headers["WARC-Payload-Digest"]
        assert dig.startswith("md5:") and len(dig) == 4 + 32
        # cycle=NNNNN comes from the segment path; warc_date encodes it
        # too but the path is what a reader partitions on
        cyc = int(r.path.split("cycle=")[1][:5])
        got_dups.add((cyc, r.target_uri, dig[4:]))
    # (cycle, url) multiplicity: one revisit record per traced dup
    assert {(c, u) for c, u, _ in got_dups} == want_dups
    assert len(recs) == len(want_dups)
    # every revisit digest is a digest the engine stored exactly once
    digs = {r.digest for r in eng.digests.read().collect()}
    for _, _, d in got_dups:
        assert d in digs


def test_max_depth_matches_oracle(spark, tmp_path):
    """Depth gate (Heritrix max-hops): seeds are depth 0, a discovered
    URL's depth is min(parent depth)+1 at first insert, and with
    max_depth=K candidates beyond K hops are dropped at extraction time
    (no dup trace, never enqueued). Engine trace/seen/frontier-depths
    must match the oracle's sequential bookkeeping exactly — and the
    gate must actually change the crawl."""
    cfg = synthweb.WebConfig(n_hosts=6, pages_per_host=60)
    seeds = synthweb.seed_urls(cfg, 8)
    want = oracle.crawl(cfg, seeds, cycles=3, max_depth=2)
    free = oracle.crawl(cfg, seeds, cycles=3)
    assert want.trace != free.trace, "fixture must make the gate bind"
    assert any(e.depth == 2 for e in want.frontier.values())
    assert all(e.depth <= 2 for e in want.frontier.values())

    eng = CrawlEngine(spark, cfg, str(tmp_path / "md"), n_buckets=8,
                      record_trace=True, hot_host_min=10, max_depth=2)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    got_d = {r.url_norm: r.depth for r in
             eng.frontier.read().select("url_norm", "depth").collect()}
    want_d = {u: e.depth for u, e in want.frontier.items()}
    assert got_d == want_d


def test_depth_values_unlimited(spark, tmp_path):
    """Without a cap the depth column still records hops-from-seed
    (min over parents, first insert wins) — engine == oracle on every
    frontier row, with depths strictly beyond 1 present."""
    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=50)
    seeds = synthweb.seed_urls(cfg, 4)
    want = oracle.crawl(cfg, seeds, cycles=3)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "dv"), n_buckets=8,
                      record_trace=True, hot_host_min=10)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_d = {r.url_norm: r.depth for r in
             eng.frontier.read().select("url_norm", "depth").collect()}
    want_d = {u: e.depth for u, e in want.frontier.items()}
    assert got_d == want_d
    assert max(want_d.values()) >= 2


def test_binary_content_gate_matches_oracle(spark, tmp_path):
    """Content-type gate: a binary_pct slice of pages serves
    application/octet-stream — fetched (slot, bytes, terminal status,
    metrics) but never parsed: no links, no images, no canonical scan.
    Engine trace/seen/metrics must equal the oracle's sequential
    bookkeeping, the gate must actually bind, and binary pages must
    contribute zero outlinks."""
    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=50, binary_pct=30)
    seeds = synthweb.seed_urls(cfg, 8)
    want = oracle.crawl(cfg, seeds, cycles=3)
    free = oracle.crawl(
        synthweb.WebConfig(n_hosts=5, pages_per_host=50), seeds, cycles=3
    )
    assert want.trace != free.trace, "fixture must make the gate bind"
    bin_urls = {e[2] for e in want.trace if e[5] == "binary"}
    assert bin_urls, "fixture must type some fetched pages binary"
    assert len(want.seen) < len(free.seen), "binary pages must cut discovery"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "bg"), n_buckets=8,
                      record_trace=True, hot_host_min=10)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    # per-host metrics (fetched counts include binary pages; parsed
    # links exclude them) match the oracle's
    got_m = {
        (r.cycle, r.host): (r.fetched, r.parsed_links)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["fetched"], m["parsed_links"])
        for m in want.metrics
    }
    assert got_m == want_m


def test_soft404_matches_oracle(spark, tmp_path):
    """Content-based soft-404 detection: an HTTP-200 response whose
    body is an error template consumes its slot, is traced 'soft404',
    reaches terminal frontier status 'soft404' and is never parsed or
    stored. Composed with fail/redirect injection AND canonical_pct —
    the gate runs BEFORE the canonical scan, so an error page that
    also declares rel=canonical must be dropped as soft404, never
    enqueue its target. Engine (one JVM lower+rlike over the cached
    fetch output) must match the oracle's parsekit.is_soft404 run
    event-for-event."""
    from collections import Counter

    cfg = synthweb.WebConfig(
        n_hosts=5, pages_per_host=60, soft404_pct=25, fail_pct=10,
        redirect_pct=10, canonical_pct=40,
    )
    seeds = synthweb.seed_urls(cfg, 20)
    want = oracle.crawl(
        cfg, seeds, cycles=3, soft404_detect=True, canonical_dedup=True
    )
    ca = Counter(t[5] for t in want.trace)
    assert ca["soft404"] > 0, "fixture must produce soft-404 hits"
    assert ca["canonical"] > 0, "fixture must still produce aliases"
    off = oracle.crawl(cfg, seeds, cycles=3, canonical_dedup=True)
    assert want.trace != off.trace, "detection must change the crawl"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "s404"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, soft404_detect=True,
                      canonical_dedup=True)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    fr = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    want_fr = {e.url_norm: e.status for e in want.frontier.values()}
    assert fr == want_fr
    assert "soft404" in set(fr.values())
    got_m = {
        (r.cycle, r.host): (r.soft404s, r.fetched, r.parsed_links, r.bytes)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (
            m["soft404s"], m["fetched"], m["parsed_links"], m["bytes"]
        )
        for m in want.metrics
    }
    assert got_m == want_m


def test_soft404_predicate_jvm_matches_parsekit(spark):
    """fetchparse.soft404_col (JVM lower+rlike) == parsekit.is_soft404
    (python re) on every page of a soft404-bearing web — real pages,
    error templates, and edge strings with stray marker fragments."""
    from ccbot_spark import parsekit
    from ccbot_spark.operators import fetchparse

    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=50, soft404_pct=30)
    urls = [
        f"http://{cfg.host(k)}/p/{j}"
        for k in range(cfg.n_hosts)
        for j in range(cfg.pages_per_host)
    ]
    rows = [(u, synthweb.fetch(cfg, u)) for u in urls]
    rows += [
        ("http://x.test/a", "<html><title>404 NOT Found</title></html>"),
        ("http://x.test/b", "<html><h1> Page Not Found </h1></html>"),
        ("http://x.test/c", "this page was not found on this server ok"),
        ("http://x.test/d", "<html>all fine: 404 mentions in prose</html>"),
        ("http://x.test/e", ""),
    ]
    want = {u: parsekit.is_soft404(h) for u, h in rows}
    assert any(want.values()) and not all(want.values())
    assert want["http://x.test/a"] and want["http://x.test/b"]
    assert want["http://x.test/c"] and not want["http://x.test/d"]
    df = spark.createDataFrame(rows, "url_norm string, html string")
    got = {
        r.url_norm: r.s4
        for r in df.select(
            "url_norm", fetchparse.soft404_col("html").alias("s4")
        ).collect()
    }
    assert got == want


def test_incremental_image_export_between_cycle_tags(engine_res):
    """Incremental training export: the images appended after the
    cycle-1 snapshot tag are EXACTLY the full table minus the cycle-1
    table — served from only the data files committed since that tag
    (Iceberg incremental read), never a rescan of the store."""
    eng = engine_res
    v1 = eng.images.tagged_version("cycle-1")
    assert v1 is not None
    at1 = {r.image_id for r in eng.images.read(version=v1).collect()}
    full = {r.image_id for r in eng.images.read().collect()}
    delta = {r.image_id for r in eng.images.read_added(v1).collect()}
    assert delta == full - at1
    assert delta, "cycle 2 must have stored new images"
    old_paths = {e["path"] for e in eng.images._files(v1)}
    assert all(
        e["path"] not in old_paths for e in eng.images.added_files(v1)
    )


def test_robots_5xx_matches_oracle(spark, tmp_path):
    """Hosts with a 5xx robots endpoint are completely disallowed
    (RFC 9309 §2.3.1.4): every candidate on them traces robots_denied
    and nothing is ever fetched there; reachable hosts crawl normally.
    Engine == oracle on trace/seen/frontier."""
    cfg = synthweb.WebConfig(n_hosts=6, pages_per_host=40, robots_5xx_pct=35)
    seeds = synthweb.seed_urls(cfg, 18)
    bad_hosts = {
        cfg.host(k)
        for k in range(cfg.n_hosts)
        if synthweb.robots_unreachable(cfg, cfg.host(k))
    }
    assert bad_hosts and len(bad_hosts) < cfg.n_hosts, "fixture must split"
    want = oracle.crawl(cfg, seeds, cycles=3)
    off = oracle.crawl(
        synthweb.WebConfig(n_hosts=6, pages_per_host=40), seeds, cycles=3
    )
    assert want.trace != off.trace, "5xx handling must change the crawl"
    fetched_hosts = {t[3] for t in want.trace if t[5] == "fetched"}
    assert not (fetched_hosts & bad_hosts), "no fetch on unreachable hosts"
    assert any(
        t[3] in bad_hosts and t[5] == "robots_denied" for t in want.trace
    ), "unreachable hosts must produce denials"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "r5"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    fr = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    want_fr = {e.url_norm: e.status for e in want.frontier.values()}
    assert fr == want_fr


def test_max_body_bytes_matches_oracle(spark, tmp_path):
    """Oversize gate (the Heritrix maxLength rule): a transfer longer
    than the cap aborts — slot consumed, exactly cap bytes counted,
    terminal status 'oversize', never parsed (no links, no images, no
    digest). The cap is derived from the fixture's real body-length
    distribution so the gate provably splits the corpus. Engine (one
    JVM octet_length filter) == oracle on trace/seen/frontier/metrics,
    composed with fail/redirect injection."""
    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=60, fail_pct=10,
                             redirect_pct=10)
    seeds = synthweb.seed_urls(cfg, 20)
    lens = sorted(
        len(synthweb.fetch(cfg, f"http://{cfg.host(k)}/p/{j}").encode())
        for k in range(cfg.n_hosts)
        for j in range(30)
    )
    cap = lens[len(lens) // 2]  # median: both sides non-empty
    assert lens[0] <= cap < lens[-1]

    want = oracle.crawl(cfg, seeds, cycles=3, max_body_bytes=cap)
    from collections import Counter

    ca = Counter(t[5] for t in want.trace)
    assert ca["oversize"] > 0 and ca["fetched"] > 0
    off = oracle.crawl(cfg, seeds, cycles=3)
    assert want.trace != off.trace

    eng = CrawlEngine(spark, cfg, str(tmp_path / "cap"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, max_body_bytes=cap)
    eng.crawl(seeds, cycles=3)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    fr = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    want_fr = {e.url_norm: e.status for e in want.frontier.values()}
    assert fr == want_fr
    assert "oversize" in set(fr.values())
    got_m = {
        (r.cycle, r.host): (r.oversized, r.fetched, r.bytes)
        for r in eng.metrics.read().collect()
    }
    want_m = {
        (m["cycle"], m["host"]): (m["oversized"], m["fetched"], m["bytes"])
        for m in want.metrics
    }
    assert got_m == want_m


def test_dead_host_circuit_breaker_matches_oracle(spark, tmp_path):
    """Dead-host circuit breaker: a host whose attempts ALL errored in
    one cycle (>= 2 of them) is deferred for K cycles — a host-wide
    not_before with no trace events, held in the host_backoff TABLE
    (never driver state). Dead hosts' URLs are attempted in bursts
    separated by >= K silent cycles instead of every cycle; live hosts
    are unaffected. Engine == oracle on trace/seen/frontier."""
    cfg = synthweb.WebConfig(n_hosts=6, pages_per_host=40, dead_host_pct=35)
    seeds = synthweb.seed_urls(cfg, 18)
    dead = {
        cfg.host(k)
        for k in range(cfg.n_hosts)
        if synthweb.host_dead(cfg, cfg.host(k))
    }
    assert dead and len(dead) < cfg.n_hosts, "fixture must split"
    K = 2
    want = oracle.crawl(cfg, seeds, cycles=6, dead_host_backoff=K)
    off = oracle.crawl(cfg, seeds, cycles=6)
    assert want.trace != off.trace, "the breaker must change the crawl"

    # non-vacuous: with the breaker, a dead host's error events cluster
    # in bursts with >= K fully-silent cycles between them
    def err_cycles(trace, host):
        return sorted({t[1] for t in trace if t[3] == host and t[5] == "fetch_error"})

    h = sorted(dead)[0]
    on_c, off_c = err_cycles(want.trace, h), err_cycles(off.trace, h)
    assert on_c and off_c
    gaps = [b - a for a, b in zip(on_c, on_c[1:])]
    assert all(g >= K + 1 for g in gaps), (on_c, gaps)
    assert len(on_c) < len(off_c), "breaker must save politeness slots"

    eng = CrawlEngine(spark, cfg, str(tmp_path / "dead"), n_buckets=8,
                      use_bloom=True, bloom_min_seen=0, record_trace=True,
                      hot_host_min=10, dead_host_backoff=K)
    eng.crawl(seeds, cycles=6)
    assert _engine_trace(eng) == want.trace
    got_seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert got_seen == want.seen
    fr = {r.url_norm: r.status for r in eng.frontier.read().collect()}
    want_fr = {e.url_norm: e.status for e in want.frontier.values()}
    assert fr == want_fr
    # the deferral table holds rows for dead hosts only
    hb = {r.host for r in eng.host_backoff.read().collect()}
    assert hb and hb <= dead
