"""Streaming crawl cycle (§2.8 end-to-end, round 5): one batch-engine
crawl cycle re-expressed as a Structured Streaming pipeline composed
from the individually-tested pieces (robots gate → stateful per-host
budget slots → foreachBatch fetch/parse/decode/phash-dedup slice →
downstream image streams). Gates:

  * single-file source (1 micro-batch = the whole cycle): EXACT parity
    with oracle.crawl cycles=1 — fetched (host, url, slot) rows,
    over-budget skip set, robots-denied set (by complement), seen set
    (seeds ∪ discovered links), and stored image ROWS incl. bytes and
    phash;
  * 4-file source: slot-level fetch parity still exact (the per-host
    budget state makes slot assignment batching-invariant for ordered
    arrival), phash SET parity for the store (keeper identity is
    arrival-order — the streaming-native first-wins semantics);
  * restart over the spent checkpoint: no new batches, outputs
    byte-identical (exactly-once composition);
  * downstream: st_image_profile over the produced store == the batch
    header-meta grouping; st_wds_export round-trips every stored
    sample exactly once.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ccbot_spark import oracle, synthweb
from ccbot_spark.streaming import crawl_stream as cs

CFG = synthweb.WebConfig(
    n_hosts=6,
    pages_per_host=40,
    # full r5 codec family on the wire: ppm/png/qpng/bmp/jpeg/gif
    img_fmts=("ppm", "png", "qpng", "bmp", "jpeg", "gif"),
)
SEEDS = synthweb.seed_urls(CFG, 120)  # 20/host vs budgets 5..20 → real skips

PAGES_SCHEMA = "host string, url_norm string, sched_slot int, ok boolean"
SKIP_SCHEMA = "host string, url_norm string"
LINKS_SCHEMA = "url_norm string"
IMG_SCHEMA = (
    "ts timestamp, image_id string, bytes binary, w int, h int, "
    "fmt string, caption string, phash long"
)


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=1)


def _run(spark, root, n_files):
    in_dir, out = os.path.join(root, "in"), os.path.join(root, "out")
    cs.write_seed_files(CFG, SEEDS, in_dir, n_files=n_files)
    q = cs.st_crawl_cycle(spark, CFG, in_dir, out)
    q.awaitTermination(600)
    return in_dir, out


def _read(spark, out, sub, schema):
    return spark.read.schema(schema).parquet(
        *sorted(glob.glob(os.path.join(out, sub, "c1-b*")))
    )


def _oracle_sets(oracle_res):
    fetched, skipped, denied = set(), set(), set()
    for (_seq, _cyc, url, host, slot, action) in oracle_res.trace:
        if action == "fetched":
            fetched.add((host, url, slot))
        elif action == "budget_skipped":
            skipped.add(url)
        elif action == "robots_denied":
            denied.add(url)
    return fetched, skipped, denied


def test_single_batch_exact_parity(spark, tmp_path, oracle_res):
    _, out = _run(spark, str(tmp_path), n_files=1)
    want_fetch, want_skip, want_deny = _oracle_sets(oracle_res)

    pages = _read(spark, out, "pages", PAGES_SCHEMA).collect()
    assert all(r.ok for r in pages)
    assert {(r.host, r.url_norm, r.sched_slot) for r in pages} == want_fetch

    skipped = {
        r.url_norm for r in _read(spark, out, "skipped", SKIP_SCHEMA).collect()
    }
    assert skipped == want_skip and skipped  # non-vacuous: budgets bind

    # robots-denied by complement: every seed is fetched, skipped, or denied
    got_urls = {r.url_norm for r in pages} | skipped
    assert set(SEEDS) - got_urls == want_deny and want_deny

    links = {
        r.url_norm for r in _read(spark, out, "links", LINKS_SCHEMA).collect()
    }
    assert set(SEEDS) | links == oracle_res.seen

    imgs = _read(spark, out, "images", IMG_SCHEMA).collect()
    got_rows = {
        (r.image_id, bytes(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash)
        for r in imgs
    }
    want_rows = {
        (
            d["image_id"], bytes(d["bytes"]), d["w"], d["h"], d["fmt"],
            d["caption"], d["phash"],
        )
        for d in oracle_res.images
    }
    assert got_rows == want_rows and got_rows
    # the full r5 codec family actually crossed the wire
    assert {r.fmt for r in imgs} == set(CFG.img_fmts)


def test_multi_batch_set_parity_and_restart(spark, tmp_path, oracle_res):
    in_dir, out = _run(spark, str(tmp_path), n_files=4)
    assert len(os.listdir(os.path.join(out, "pages"))) == 4

    want_fetch, want_skip, _ = _oracle_sets(oracle_res)
    pages = _read(spark, out, "pages", PAGES_SCHEMA).collect()
    # slot-level parity survives the split: per-host budget state is
    # carried across micro-batches and arrival order is seed order
    assert {(r.host, r.url_norm, r.sched_slot) for r in pages} == want_fetch
    assert {
        r.url_norm for r in _read(spark, out, "skipped", SKIP_SCHEMA).collect()
    } == want_skip

    imgs = _read(spark, out, "images", IMG_SCHEMA).collect()
    got_ph = [r.phash for r in imgs]
    assert sorted(got_ph) == sorted({d["phash"] for d in oracle_res.images})
    assert len(got_ph) == len(set(got_ph))  # each phash stored exactly once

    # restart over the spent checkpoint: no-op, bytes untouched
    def _digest_tree():
        return {
            p: hashlib.sha256(open(p, "rb").read()).hexdigest()
            for p in sorted(
                glob.glob(os.path.join(out, "*", "c*-b*", "*.parquet"))
            )
        }

    before = _digest_tree()
    q = cs.st_crawl_cycle(spark, CFG, in_dir, out)
    q.awaitTermination(600)
    assert _digest_tree() == before


def test_downstream_image_streams_compose(spark, tmp_path):
    """st_image_profile + st_wds_export tail the crawl's image store:
    profile == the batch header-meta grouping over the same rows; the
    WDS export round-trips every stored sample exactly once."""
    from ccbot_spark import wds
    from ccbot_spark.functions import multimodal
    from ccbot_spark.streaming import image_stream as ims
    from ccbot_spark.streaming import metrics_stream as ms

    _, out = _run(spark, str(tmp_path), n_files=3)
    img_glob = os.path.join(out, "images", "c1-b*")

    stream = ims.st_image_profile(ims.read_image_events(spark, img_glob))
    ms.run_complete_to_memory(stream, "crawl_img_prof")
    got = {
        (r.win_start, r.container, r.size_class): (r.n_images, r.total_bytes)
        for r in spark.table("crawl_img_prof").collect()
    }
    meta = multimodal.header_meta(
        spark.read.schema(IMG_SCHEMA).parquet(*sorted(glob.glob(img_glob)))
    )
    batch = meta.groupBy(
        F.window("ts", "1 minute").alias("win"),
        F.coalesce("container", F.lit("unknown")).alias("container"),
        F.when(F.col("container").isNull(), F.lit("n/a"))
        .otherwise(multimodal.size_class_col())
        .alias("size_class"),
    ).agg(F.count("*").alias("n"), F.sum("nbytes").alias("b"))
    want = {
        (r["win"].start, r.container, r.size_class): (r.n, r.b)
        for r in batch.collect()
    }
    assert got == want and got

    wds_out, ckpt = str(tmp_path / "wds"), str(tmp_path / "wds_ckpt")
    q = ims.st_wds_export(
        ims.read_sample_events(spark, img_glob), wds_out, ckpt,
        target_bytes=64 * 1024,
    )
    q.awaitTermination(300)
    exported = {}
    for b in sorted(os.listdir(wds_out)):
        for r in wds.read_shards(spark, os.path.join(wds_out, b)).collect():
            assert r["image_id"] not in exported, "sample exported twice"
            exported[r["image_id"]] = bytes(r["bytes"])
    stored = {
        r.image_id: bytes(r.bytes)
        for r in spark.read.schema(IMG_SCHEMA)
        .parquet(*sorted(glob.glob(img_glob)))
        .collect()
    }
    assert exported == stored and exported


def test_streaming_crawl_multi_cycle_parity(spark, tmp_path):
    """Continuous streaming crawl (3 chained cycles, 2 files/cycle):
    per-cycle fetched (host, url, slot) rows and budget-skip sets equal
    the 3-cycle oracle crawl's trace cycle-for-cycle; the final seen
    set and the accumulated cross-cycle phash store match; discovered
    links really feed later cycles (non-vacuous)."""
    cfg = synthweb.WebConfig(n_hosts=5, pages_per_host=30)
    seeds = synthweb.seed_urls(cfg, 40)
    want = oracle.crawl(cfg, seeds, cycles=3)

    out = cs.streaming_crawl(spark, cfg, seeds, str(tmp_path), cycles=3,
                             n_files=2)

    by_cycle_fetch: dict[int, set] = {}
    by_cycle_skip: dict[int, set] = {}
    for (_seq, cyc, url, host, slot, action) in want.trace:
        if action == "fetched":
            by_cycle_fetch.setdefault(cyc, set()).add((host, url, slot))
        elif action == "budget_skipped":
            by_cycle_skip.setdefault(cyc, set()).add(url)

    for cyc in (1, 2, 3):
        got_f = {
            (r.host, r.url_norm, r.sched_slot)
            for p in sorted(glob.glob(os.path.join(out, "pages", f"c{cyc}-b*")))
            for r in spark.read.schema(PAGES_SCHEMA).parquet(p).collect()
        }
        assert got_f == by_cycle_fetch.get(cyc, set()), f"cycle {cyc} fetched"
        got_s = {
            r.url_norm
            for p in sorted(glob.glob(os.path.join(out, "skipped", f"c{cyc}-b*")))
            for r in spark.read.schema(SKIP_SCHEMA).parquet(p).collect()
        }
        assert got_s == by_cycle_skip.get(cyc, set()), f"cycle {cyc} skipped"
    # discovered links really got fetched in later cycles (priority 990
    # rows exist only via the frontier feedback)
    assert by_cycle_fetch.get(2) and by_cycle_fetch[2] - by_cycle_fetch[1]

    # final seen set: seeds + every discovered link across cycles
    links = {
        r.url_norm
        for p in sorted(glob.glob(os.path.join(out, "links", "c*-b*")))
        for r in spark.read.schema("url_norm string, parent_priority long")
        .parquet(p)
        .collect()
    }
    assert set(seeds) | links == want.seen

    # accumulated image store: phash set == the 3-cycle oracle's, each
    # stored exactly once across ALL cycles (cross-cycle dedup worked)
    got_ph = [
        r.phash
        for p in sorted(glob.glob(os.path.join(out, "images", "c*-b*")))
        for r in spark.read.schema(IMG_SCHEMA).parquet(p).collect()
    ]
    assert sorted(got_ph) == sorted({d["phash"] for d in want.images})
    assert len(got_ph) == len(set(got_ph))
