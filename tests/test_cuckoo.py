"""Cuckoo-filter seen-set tests (operators/cuckoo.py): the Bloom
prefilter contract (no false negatives, overflow degrades to
all-maybe) plus the cuckoo-only capability — deletion — and the
partial-key merge that powers per-partition build + treeAggregate.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ccbot_spark.operators import cuckoo

P = 8


def _rng_hashes(seed: int, n: int) -> np.ndarray:
    return (
        np.random.default_rng(seed)
        .integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    )


# ------------------------------------------------------------- unit


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300))
def test_no_false_negatives(keys):
    """Every inserted key answers maybe — the one corruption the
    prefilter contract cannot absorb is a false negative."""
    cf = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(1024))
    arr = np.asarray(keys, dtype=np.int64)
    cf.insert_many(arr)
    assert cf.contains_many(arr).all()


def test_false_positive_rate_sane():
    cf = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(4096))
    cf.insert_many(_rng_hashes(1, 2000))
    probes = _rng_hashes(2, 20000)
    assert not cf.overflow
    # 16-bit fingerprints, 2 buckets x 4 slots: theoretical fpr ~ 8/2^16
    assert cf.contains_many(probes).mean() < 0.01


def test_overflow_degrades_to_all_maybe():
    """A full filter must saturate (answer maybe for everything), never
    drop a fingerprint."""
    cf = cuckoo.CuckooFilter(2)  # 8 slots total
    inserted = _rng_hashes(3, 200)
    cf.insert_many(inserted)
    assert cf.overflow
    assert cf.contains_many(inserted).all()
    assert cf.contains_many(_rng_hashes(4, 50)).all()


def test_delete_keeps_remaining_members():
    """Deleting inserted keys never creates false negatives for the
    keys that stay — the exactness half of the delete contract."""
    cf = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(4096))
    keys = _rng_hashes(5, 2000)
    cf.insert_many(keys)
    gone, kept = keys[:500], keys[500:]
    assert cf.delete_many(gone).all()
    assert cf.contains_many(kept).all()
    # and deletion actually frees space: most deleted keys turn negative
    # (a few may still hit via fingerprint collisions with kept keys)
    assert cf.contains_many(gone).mean() < 0.05


def test_delete_then_reinsert_roundtrip():
    cf = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(1024))
    keys = _rng_hashes(6, 300)
    cf.insert_many(keys)
    cf.delete_many(keys)
    cf.insert_many(keys)
    assert cf.contains_many(keys).all()


def test_merge_is_union():
    a, b = (cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(4096)) for _ in range(2))
    ka, kb = _rng_hashes(7, 1000), _rng_hashes(8, 1000)
    a.insert_many(ka)
    b.insert_many(kb)
    a.merge(b)
    assert a.contains_many(ka).all() and a.contains_many(kb).all()
    assert not a.overflow


def test_merge_idempotent_no_saturation():
    """Re-merging the same filter many times must not eat slots
    (present fingerprints are skipped) — incremental per-cycle merges
    would otherwise saturate a long crawl's filter."""
    a = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(1024))
    keys = _rng_hashes(9, 500)
    a.insert_many(keys)
    occ0 = int(a._occ.sum())
    b = cuckoo.CuckooFilter.from_bytes(a.to_bytes())
    for _ in range(20):
        a.merge(b)
    assert int(a._occ.sum()) == occ0
    assert not a.overflow


def test_bytes_roundtrip():
    cf = cuckoo.CuckooFilter(cuckoo.cuckoo_m_for(1024), overflow=False)
    keys = _rng_hashes(10, 400)
    cf.insert_many(keys)
    back = cuckoo.CuckooFilter.from_bytes(cf.to_bytes())
    assert back.m == cf.m and back.overflow == cf.overflow
    assert (back.table == cf.table).all()
    assert back.contains_many(keys).all()


# ------------------------------------------------------------ spark


@pytest.fixture(scope="module")
def keys(spark):
    seen = spark.range(0, 900, 3).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("key")
    )
    cand = spark.range(0, 900).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("key")
    )
    return seen, cand


def test_build_split_merged(spark, keys):
    """build_cuckoo (mapInPandas + treeAggregate) + split_by_cuckoo
    partition the candidates with no false negatives."""
    seen, cand = keys
    cf = cuckoo.build_cuckoo(seen, cuckoo.cuckoo_m_for(2048))
    assert not cf.overflow
    new, maybe = cuckoo.split_by_cuckoo(cand, cf, spark)
    maybe_keys = {r.key for r in maybe.collect()}
    new_keys = {r.key for r in new.collect()}
    seen_keys = {r.key for r in seen.collect()}
    assert seen_keys <= maybe_keys
    assert new_keys | maybe_keys == set(range(900))
    assert not (new_keys & maybe_keys)
    unseen = set(range(900)) - seen_keys
    assert len(new_keys) > len(unseen) * 0.5


def test_build_split_sharded(spark, keys):
    """Bucket-routed shard probe: same partition-of-candidates
    contract as the merged form, no merged filter anywhere."""
    seen, cand = keys
    shard_m = cuckoo.shard_m_for(2048, P)
    shards = cuckoo.build_cuckoo_shards(seen, P, shard_m)
    rows = shards.collect()
    assert 1 <= len(rows) <= P
    assert {r.bucket for r in rows} <= set(range(P))
    new, maybe, cache = cuckoo.split_by_cuckoo_shards(cand, shards, P)
    maybe_keys = {r.key for r in maybe.collect()}
    new_keys = {r.key for r in new.collect()}
    seen_keys = {r.key for r in seen.collect()}
    assert seen_keys <= maybe_keys
    assert new_keys | maybe_keys == set(range(900))
    assert not (new_keys & maybe_keys)
    cache.unpersist()


def test_shard_incremental_merge(spark, keys):
    """merge_cuckoo_shards(old, delta) answers maybe for both the old
    and the delta keys — the incremental per-cycle maintenance path."""
    seen, cand = keys
    a = seen.filter(F.col("key") < 450)
    b = seen.filter(F.col("key") >= 450)
    shard_m = cuckoo.shard_m_for(2048, P)
    sa = cuckoo.build_cuckoo_shards(a, P, shard_m)
    sb = cuckoo.build_cuckoo_shards(b, P, shard_m)
    merged = cuckoo.merge_cuckoo_shards(sa, sb)
    _new, maybe, cache = cuckoo.split_by_cuckoo_shards(cand, merged, P)
    maybe_keys = {r.key for r in maybe.collect()}
    assert {r.key for r in seen.collect()} <= maybe_keys
    cache.unpersist()
