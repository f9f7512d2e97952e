"""Bucket-routed Bloom shard tests (the 10^10-URL seen-set path):
per-bucket shards as a small (bucket, bits) table, membership checks
routed by pmod(url_hash, P) cogroup — no merged filter on the driver
or in a broadcast, ever (SCALE.md §"URL-seen membership";
seen.py sharded variant).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccbot_spark.operators import seen as seenops

P = 8
SHARD_BITS = 1 << 12


@pytest.fixture(scope="module")
def keys(spark):
    # seen keys: multiples of 3; candidates: everything 0..899
    seen = spark.range(0, 900, 3).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("key")
    )
    cand = spark.range(0, 900).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("key")
    )
    return seen, cand


def test_shards_no_false_negatives(spark, keys):
    """Every actually-seen key must come back maybe_seen (a false
    negative would silently re-crawl — the one corruption the
    prefilter contract cannot absorb)."""
    seen, cand = keys
    shards = seenops.build_bloom_shards(seen, P, SHARD_BITS)
    new, maybe, cache = seenops.split_by_bloom_shards(
        cand, shards, SHARD_BITS, P
    )
    maybe_keys = {r.key for r in maybe.collect()}
    seen_keys = {r.key for r in seen.collect()}
    assert seen_keys <= maybe_keys
    # the split is a partition of the candidates
    new_keys = {r.key for r in new.collect()}
    assert new_keys | maybe_keys == set(range(900))
    assert not (new_keys & maybe_keys)
    # and the filter actually filters: most unseen keys skip the join
    unseen = set(range(900)) - seen_keys
    assert len(new_keys) > len(unseen) * 0.5
    cache.unpersist()


def test_shard_table_shape(spark, keys):
    """One row per non-empty bucket, each shard exactly shard_bits/8
    bytes — the whole filter is P small rows, nothing driver-merged."""
    seen, _ = keys
    rows = seenops.build_bloom_shards(seen, P, SHARD_BITS).collect()
    assert 1 <= len(rows) <= P
    assert {r.bucket for r in rows} <= set(range(P))
    assert all(len(bytes(r.shard)) == SHARD_BITS // 8 for r in rows)


def test_or_merge_shards_unions_membership(spark):
    a = spark.range(0, 100).select(F.xxhash64("id").alias("url_hash"),
                                   F.col("id").alias("key"))
    b = spark.range(100, 200).select(F.xxhash64("id").alias("url_hash"),
                                     F.col("id").alias("key"))
    both = spark.range(0, 200).select(F.xxhash64("id").alias("url_hash"),
                                      F.col("id").alias("key"))
    sa = seenops.build_bloom_shards(a, P, SHARD_BITS)
    sb = seenops.build_bloom_shards(b, P, SHARD_BITS)
    merged = seenops.or_merge_shards(sa, sb)
    _new, maybe, cache = seenops.split_by_bloom_shards(
        both, merged, SHARD_BITS, P
    )
    assert maybe.count() == 200  # every inserted key positive post-merge
    cache.unpersist()
    # bucket-wise the merge is the bitwise OR of the inputs
    da = {r.bucket: np.frombuffer(r.shard, dtype=np.uint64) for r in sa.collect()}
    db = {r.bucket: np.frombuffer(r.shard, dtype=np.uint64) for r in sb.collect()}
    for r in merged.collect():
        want = np.bitwise_or(
            da.get(r.bucket, np.uint64(0)), db.get(r.bucket, np.uint64(0))
        )
        assert np.array_equal(np.frombuffer(r.shard, dtype=np.uint64), want)


def test_empty_bucket_means_definitely_new(spark):
    """Candidates whose bucket holds no seen keys must ALL route to
    definitely-new without touching any shard."""
    seen = spark.range(0, 0).select(F.xxhash64("id").alias("url_hash"))
    cand = spark.range(0, 50).select(F.xxhash64("id").alias("url_hash"),
                                     F.col("id").alias("key"))
    shards = seenops.build_bloom_shards(seen, P, SHARD_BITS)
    new, maybe, cache = seenops.split_by_bloom_shards(
        cand, shards, SHARD_BITS, P
    )
    assert maybe.count() == 0 and new.count() == 50
    cache.unpersist()


def test_shard_bits_for():
    assert seenops.shard_bits_for(1 << 22, 32) == (1 << 22) // 32
    assert seenops.shard_bits_for(100, 32) == 64  # floor: one word
    # ~10^10 keys at 8 bits/key over 4096 buckets → ~2.4 MB/shard,
    # each a single task-resident array; no 10 GB object anywhere
    assert seenops.shard_bits_for(8 * 10**10, 4096) * 4096 <= 8 * 10**10
