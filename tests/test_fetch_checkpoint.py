"""Mid-cycle fetch checkpoint (VERDICT r3 item 8): at 100 TB a cycle
is hours and FETCH is the stage that consumes politeness slots — a
crash after FETCH must resume at PARSE, not re-fetch. The engine
snapshots the fetch output to the workdir as soon as it materializes;
a resumed run re-enters the crashed cycle from the snapshot, and its
final state must be byte-identical to an uninterrupted run's.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=5, pages_per_host=40, fail_pct=10, redirect_pct=15
)
SEEDS = synthweb.seed_urls(CFG, 15)


def _state(eng):
    trace = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in eng.trace.read().orderBy("seq").collect()
    ]
    seen = {r.url_norm for r in eng.seen.read().collect()}
    frontier = {
        (r.url_norm, r.status, r.priority, r.retries)
        for r in eng.frontier.read().collect()
    }
    imgs = {
        (r.image_id, r.caption, r.phash)
        for r in eng.images.read().select("image_id", "caption", "phash").collect()
    }
    return trace, seen, frontier, imgs


def _engine(spark, wd, **kw):
    return CrawlEngine(
        spark, CFG, wd, n_buckets=8, bloom_min_seen=0, record_trace=True,
        hot_host_min=10, **kw,
    )


def _poison_fetcher(url, retries):
    raise AssertionError(f"fetch re-executed for {url} — snapshot unused")


def test_kill_after_fetch_resumes_at_parse(spark, tmp_path):
    # ground truth: uninterrupted run (checkpointing on — also proves
    # the snapshot write itself never changes results vs the oracle)
    wd_ok = str(tmp_path / "uninterrupted")
    eng_ok = _engine(spark, wd_ok, fetch_checkpoint=True)
    eng_ok.crawl(SEEDS, cycles=2)
    want = _state(eng_ok)
    assert want[0] == oracle.crawl(CFG, SEEDS, cycles=2).trace

    # crashed run: cycle 1 commits, cycle 2 dies right after the fetch
    # snapshot lands
    wd = str(tmp_path / "crashed")
    eng_a = _engine(spark, wd, fetch_checkpoint=True)
    eng_a.seed(SEEDS)
    eng_a.run_cycle(1)
    eng_a._crash_after_fetch = True
    with pytest.raises(RuntimeError, match="crash after fetch snapshot"):
        eng_a.run_cycle(2)

    # resume in a fresh engine whose fetcher REFUSES to run: the only
    # way cycle 2 can complete is from the snapshot (no slot re-fetched)
    eng_b = _engine(
        spark, wd, fetch_checkpoint=True, fetcher=_poison_fetcher
    )
    assert eng_b.resume() == 1
    out = eng_b.crawl(SEEDS, cycles=2, start_cycle=1)
    assert [c["cycle"] for c in out] == [2]
    assert _state(eng_b) == want
    # the spent snapshot was cleaned up at commit
    import os

    assert not os.path.isdir(eng_b._fetch_snap_dir())


def test_fetch_checkpoint_off_by_default_and_result_neutral(spark, tmp_path):
    eng_off = _engine(spark, str(tmp_path / "off"))
    assert eng_off.fetch_checkpoint is False
    eng_off.crawl(SEEDS, cycles=1)
    eng_on = _engine(spark, str(tmp_path / "on"), fetch_checkpoint=True)
    eng_on.crawl(SEEDS, cycles=1)
    assert _state(eng_on) == _state(eng_off)
