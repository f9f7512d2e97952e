"""WebDataset tar shard export: plan → write → read round trip.

Gates:
  * global_running_total == single-partition SQL window (exact longs);
  * plan_shards assignment == the SQL window formula; shards are
    contiguous key ranges; every non-final shard reaches the target and
    overshoots by less than one sample's cost;
  * write_shards emits byte-identical tar files at different
    parallelism (determinism under speculative/retried tasks);
  * read_shards round-trips (image_id, fmt, bytes, caption) exactly.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ccbot_spark import wds
from ccbot_spark.functions import multimodal
from ccbot_spark.operators import sequencing

TARGET = 96 * 1024


def _docs(spark, n=240):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _samples(spark, n=240):
    """Deterministic image+caption table matching the BASELINE input
    shape (image_id, bytes, w, h, fmt, caption)."""
    imgs = multimodal.synth_images_from_docs(_docs(spark, n))
    return imgs.withColumn(
        "caption",
        F.concat(
            F.lit("caption for image "),
            F.regexp_extract("image_id", r"(\d+)", 1),
        ),
    )


def test_global_running_total_matches_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37 + 11) % 1000 + 1).alias("v"),
    )
    got, total, cache = sequencing.global_running_total(df, ["k"], "v", 16)
    try:
        rows = {r["k"]: r["run_total"] for r in got.collect()}
    finally:
        cache.unpersist()
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rt"]
        for r in df.select("k", F.sum("v").over(w).alias("rt")).collect()
    }
    assert rows == want
    assert total == sum(
        r["v"] for r in df.collect()
    )


def test_plan_matches_sql_window_and_bounds(spark):
    s = _samples(spark)
    costed = s.withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    )
    assigned, cache = wds.plan_shards(costed, TARGET, num_partitions=16)
    try:
        got = {
            r["image_id"]: (r["shard_id"], r["plan_cost"])
            for r in assigned.collect()
        }
    finally:
        cache.unpersist()
    # oracle formula: one global window (fine at test scale)
    w = Window.orderBy("image_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want_df = costed.select(
        "image_id",
        "plan_cost",
        F.floor(
            (F.sum("plan_cost").over(w) - F.col("plan_cost")) / F.lit(TARGET)
        ).alias("sid"),
    )
    want = {r["image_id"]: r["sid"] for r in want_df.collect()}
    assert {k: v[0] for k, v in got.items()} == want

    # shards are contiguous in key order and size-bounded
    by_shard: dict[int, list[str]] = {}
    for key, (sid, _c) in got.items():
        by_shard.setdefault(sid, []).append(key)
    order = sorted(got)  # global key order
    seen_sids = [got[k][0] for k in order]
    assert seen_sids == sorted(seen_sids), "shard ids ascend with key order"
    max_cost = max(c for _s, c in got.values())
    totals = {
        sid: sum(got[k][1] for k in keys) for sid, keys in by_shard.items()
    }
    last = max(totals)
    for sid, tot in totals.items():
        if sid != last:
            # a boundary-straddling sample stays in the earlier shard,
            # so a shard may start partway into its budget: within one
            # sample's cost of the target on either side
            assert TARGET - max_cost < tot < TARGET + max_cost


def _export(spark, out_dir, shuffle_partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        s = _samples(spark).withColumn(
            "plan_cost",
            wds.sample_cost(F.col("w"), F.col("h"), F.col("caption")),
        )
        assigned, cache = wds.plan_shards(
            s, TARGET, num_partitions=shuffle_partitions
        )
        manifest = wds.write_shards(assigned, out_dir).collect()
        cache.unpersist()
        return sorted(
            (r["shard_id"], r["n_samples"], r["n_bytes"], r["key_min"], r["key_max"])
            for r in manifest
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _file_hashes(out_dir):
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out_dir, "*.tar"))
    }


def test_write_bytes_parallelism_independent(spark, tmp_path):
    m4 = _export(spark, str(tmp_path / "p4"), 4)
    m32 = _export(spark, str(tmp_path / "p32"), 32)
    assert m4 == m32
    h4, h32 = _file_hashes(str(tmp_path / "p4")), _file_hashes(str(tmp_path / "p32"))
    assert h4 == h32 and len(h4) >= 3
    # manifest n_bytes is the real file size
    for r, (name, _h) in zip(m4, sorted(h4.items())):
        assert r[2] == os.path.getsize(tmp_path / "p4" / name)


def test_round_trip_exact(spark, tmp_path):
    out = str(tmp_path / "rt")
    _export(spark, out, 8)
    src = {
        r["image_id"]: (r["fmt"], bytes(r["bytes"]), r["caption"])
        for r in _samples(spark).collect()
    }
    back = {
        r["image_id"]: (r["fmt"], bytes(r["bytes"]), r["caption"])
        for r in wds.read_shards(spark, out).collect()
    }
    assert back == src


def test_engine_wds_sink_round_trips_stored_images(spark, tmp_path):
    """Crawl with the WDS sink on: every cycle's stored image+caption
    pairs land as tar shards, and reading ALL cycle dirs back yields
    exactly the oracle crawler's stored rows (ids, bytes, fmt,
    caption) — the loader-ready corpus equals the table of record."""
    from ccbot_spark import oracle, synthweb
    from ccbot_spark.engine import CrawlEngine

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=30)
    seeds = synthweb.seed_urls(cfg, 10)
    want_res = oracle.crawl(cfg, seeds, cycles=2)
    out = str(tmp_path / "wds_export")
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "eng"), n_buckets=8,
        record_trace=False, hot_host_min=10, bloom_min_seen=0,
        wds_dir=out, wds_target_bytes=64 * 1024,
    )
    eng.crawl(seeds, cycles=2)
    cycle_dirs = sorted(os.listdir(out))
    assert cycle_dirs and all(c.startswith("cycle=") for c in cycle_dirs)
    got = {}
    for c in cycle_dirs:
        for r in wds.read_shards(spark, os.path.join(out, c)).collect():
            assert r["image_id"] not in got, "sample exported twice"
            got[r["image_id"]] = (r["fmt"], bytes(r["bytes"]), r["caption"])
    want = {
        r["image_id"]: (r["fmt"], r["bytes"], r["caption"])
        for r in want_res.images
    }
    assert got == want

    # the wds_manifest table indexes exactly the files on disk, and a
    # point lookup through any cycle's manifest rows returns the sample
    man = eng.wds_manifest.read().collect()
    disk = {
        os.path.join(out, c, f)
        for c in cycle_dirs
        for f in os.listdir(os.path.join(out, c))
    }
    assert {r["path"] for r in man} == disk
    assert sum(r["n_samples"] for r in man) == len(want)
    for r in man:
        assert os.path.getsize(r["path"]) == r["n_bytes"]
    some = man[0]
    hit = wds.lookup(
        spark, [m.asDict() for m in man if m["cycle"] == some["cycle"]],
        some["key_min"],
    )
    assert hit is not None and hit["image_id"] == some["key_min"]


def test_lookup_point_reads_one_shard(spark, tmp_path):
    """Manifest key ranges pin one shard per key: lookup returns the
    exact sample reading only that tar; keys outside every range (and
    absent keys inside a range) return None."""
    out = str(tmp_path / "lk")
    s = _samples(spark).withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    )
    assigned, cache = wds.plan_shards(s, TARGET, num_partitions=8)
    manifest = [r.asDict() for r in wds.write_shards(assigned, out).collect()]
    cache.unpersist()

    src = {
        r["image_id"]: (r["fmt"], bytes(r["bytes"]), r["caption"])
        for r in _samples(spark).collect()
    }
    for key in list(sorted(src))[:5] + list(sorted(src))[-3:]:
        hits = [m for m in manifest if m["key_min"] <= key <= m["key_max"]]
        assert len(hits) == 1, (key, hits)
        got = wds.lookup(spark, manifest, key)
        assert (got["fmt"], got["bytes"], got["caption"]) == src[key]
    assert wds.lookup(spark, manifest, "zzz-out-of-range") is None
    assert wds.lookup(spark, manifest, "doc-0!") is None  # inside a range


# ---------------------------------------------------- group-pure planning

def test_plan_shards_grouped_purity_and_python_reference(spark):
    s = _samples(spark, 240)
    costed = s.withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    ).withColumn("bucket", multimodal.aspect_bucket_col("w", "h"))
    assigned, cache = wds.plan_shards_grouped(
        costed, TARGET, "bucket", num_partitions=8
    )
    rows = assigned.select("bucket", "image_id", "plan_cost", "shard_id").collect()
    cache.unpersist()

    # python reference: per-group running cut in (group, key) order,
    # bases = shards of earlier groups
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.bucket, []).append((r.image_id, r.plan_cost))
    want = {}
    base = 0
    for g in sorted(by_group):
        run = 0
        top = 0
        for k, c in sorted(by_group[g]):
            local = run // TARGET
            want[k] = base + local
            top = local
            run += c
        base += top + 1
    got = {r.image_id: r.shard_id for r in rows}
    assert got == want

    # shard ids are 0..N-1 with no gaps; every shard is group-pure
    shard_groups: dict[int, set] = {}
    for r in rows:
        shard_groups.setdefault(r.shard_id, set()).add(r.bucket)
    assert set(shard_groups) == set(range(len(shard_groups)))
    assert all(len(gs) == 1 for gs in shard_groups.values())
    assert len({r.bucket for r in rows}) >= 3, "fixture must span buckets"
    assert len(shard_groups) > len({r.bucket for r in rows}), \
        "groups must split into multiple shards"


def test_grouped_shards_after_letterbox_are_fixed_shape(spark, tmp_path):
    # the actual training-export composition: letterbox to bucket
    # shapes, plan group-pure shards, write, read back — every shard's
    # samples decode to ONE tensor shape
    from ccbot_spark import codecs

    s = _samples(spark, 90)
    boxed = multimodal.bucket_resize(s)
    # bucket_resize keeps (image_id, bucket, bytes, w, h, fmt); re-add captions
    caps = s.select("image_id", "caption")
    boxed = boxed.join(caps, "image_id")
    costed = boxed.withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    )
    assigned, cache = wds.plan_shards_grouped(
        costed, 48 * 1024, "bucket", num_partitions=8
    )
    out = str(tmp_path / "shards")
    manifest = wds.write_shards(assigned, out).collect()
    cache.unpersist()
    assert sum(m.n_samples for m in manifest) == 90
    tars = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert len(tars) == len(manifest)
    n_back = 0
    for t in tars:
        rows_t = wds.read_shards(spark, out, pattern=os.path.basename(t)).collect()
        n_back += len(rows_t)
        dims = {codecs.decode(bytes(r.bytes), "ppm").shape for r in rows_t}
        assert len(dims) == 1, (t, dims)
    assert n_back == 90


def test_engine_grouped_wds_sink_bucket_pure_and_complete(spark, tmp_path):
    """wds_grouped=True: the per-cycle export still round-trips exactly
    (same corpus as the oracle's stored rows), and no shard mixes
    aspect buckets — every tar's samples share one bucket of the
    ladder (computed from the stored dims)."""
    from ccbot_spark import oracle, synthweb
    from ccbot_spark.engine import CrawlEngine

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=30)
    seeds = synthweb.seed_urls(cfg, 10)
    want_res = oracle.crawl(cfg, seeds, cycles=2)
    out = str(tmp_path / "wds_g")
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "eng_g"), n_buckets=8,
        record_trace=False, hot_host_min=10, bloom_min_seen=0,
        wds_dir=out, wds_target_bytes=48 * 1024, wds_grouped=True,
    )
    eng.crawl(seeds, cycles=2)
    want = {
        r["image_id"]: (r["fmt"], r["bytes"], r["caption"], r["w"], r["h"])
        for r in want_res.images
    }
    got = {}
    buckets_seen = set()
    for c in sorted(os.listdir(out)):
        cyc = os.path.join(out, c)
        for t in sorted(os.listdir(cyc)):
            rows_t = wds.read_shards(spark, cyc, pattern=t).collect()
            shard_buckets = set()
            for r in rows_t:
                iid = r["image_id"]
                assert iid not in got, "sample exported twice"
                got[iid] = (r["fmt"], bytes(r["bytes"]), r["caption"])
                w, h = want[iid][3], want[iid][4]
                shard_buckets.add(multimodal.aspect_bucket_py(w, h))
            assert len(shard_buckets) == 1, (t, shard_buckets)
            buckets_seen |= shard_buckets
    assert got == {k: v[:3] for k, v in want.items()}
    assert len(buckets_seen) >= 3, "fixture must span buckets"


def test_pack_samples_first_fit_matches_python_greedy(spark):
    # sequential first-fit per shard: Spark == a plain python walk on
    # the same ordered costs, plus the packing invariants (no window
    # over cap, offsets contiguous, bump resets offset, -1 for
    # cost > cap, parallelism-independent)
    rows = [
        (f"s-{i:03d}", i % 3, 1 + (i * 37) % 400) for i in range(120)
    ]
    rows.append(("s-998", 0, 901))  # exactly-fits-after-bump case
    rows.append(("s-999", 1, 1500))  # unpackable
    cap = 900
    df = spark.createDataFrame(rows, "image_id string, shard int, cost long")
    for parts in (1, 7):
        got = {
            r.image_id: (r.pack_id, r.fill_offset)
            for r in wds.pack_samples(
                df.repartition(parts), cap=cap
            ).collect()
        }
        state = {}
        for iid, shard, cost in sorted(rows):
            pack, fill = state.get(shard, (0, 0))
            if cost > cap:
                assert got[iid] == (-1, 0), iid
                continue
            if fill + cost > cap:
                pack, fill = pack + 1, 0
            assert got[iid] == (pack, fill), iid
            state[shard] = (pack, fill + cost)
