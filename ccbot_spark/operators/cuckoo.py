"""Cuckoo-filter variant of the URL-seen prefilter (SURVEY.md §2.4
a_bloom_build/a_bloom_merge family; BASELINE.json north_star:
"partitioned Bloom/cuckoo filters, one filter shard per frontier
partition, merged via treeAggregate").

Same contract as the Bloom path in operators/seen.py — the filter is a
PREFILTER, never the decider: a negative answer is definitely-unseen
(no false negatives, ever), a positive answer goes to the exact
anti-join. On top of that, a cuckoo filter (Fan et al., CoNEXT 2014,
"Cuckoo Filter: Practically Better than Bloom") adds what a Bloom
filter cannot: **deletion** (retire seen entries when a frontier
bucket is rolled back) and better space per key at the same
false-positive rate (16-bit fingerprints, 4-slot buckets, ~95% max
load).

Exactness under saturation: a cuckoo insert can fail when the table is
full (the kick loop gives up). Dropping the fingerprint would create a
false negative — forbidden — so a failed insert sets the filter-wide
``overflow`` flag instead, after which every probe answers "maybe" and
the exact join decides everything. Degraded, never wrong.

Layout notes (all numpy, vectorized; per-row Python only in the rare
kick/delete paths):
  - ``table``: (m, 4) uint16, fingerprint 0 = empty slot, real
    fingerprints remapped 0→1. m is a power of two (required by the
    partial-key trick: alt_index = index XOR mix(fp) stays in range).
  - buckets are kept LEFT-PACKED (delete swaps the last occupied slot
    into the hole), so occupancy == index of the first free slot and
    batch placement vectorizes with one argsort + searchsorted.
  - merge re-inserts the other table's (index, fp) pairs using the
    partial-key property (the key itself is not needed) — this is what
    makes per-partition build + treeAggregate merge possible.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4
MAX_KICKS = 500
_MIX = np.uint64(0x5BD1E995)  # MurmurHash2 multiplier — public constant


def _next_pow2(n: int) -> int:
    return 1 << max(1, (int(n) - 1).bit_length())


def cuckoo_m_for(n_slots: int) -> int:
    """Bucket count (power of two) giving at least ``n_slots`` total
    slots at 4 slots/bucket."""
    return _next_pow2((int(n_slots) + SLOTS - 1) // SLOTS)


class CuckooFilter:
    """Numpy-backed cuckoo filter over int64 key hashes.

    Capacity is ~0.95 * 4m fingerprints; size it with headroom
    (``cuckoo_m_for(expected_keys / 0.84)`` is a safe default) — the
    ``overflow`` flag keeps saturation correct but costs the prefilter
    its selectivity.
    """

    def __init__(self, m: int, table: np.ndarray | None = None, overflow: bool = False):
        if m & (m - 1):
            raise ValueError(f"m must be a power of two, got {m}")
        self.m = m
        self.table = (
            table if table is not None else np.zeros((m, SLOTS), dtype=np.uint16)
        )
        self._occ = (self.table != 0).sum(axis=1).astype(np.int64)
        self.overflow = bool(overflow)

    # ------------------------------------------------------ key mixing

    def _fingerprints(self, hashes: np.ndarray):
        """(fp uint16 nonzero, i1 int64, i2 int64) from int64 hashes."""
        h = np.ascontiguousarray(hashes, dtype=np.int64).view(np.uint64)
        mask = np.uint64(self.m - 1)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        i1 = (h & mask).astype(np.int64)
        i2 = self._alt_index(i1, fp)
        return fp, i1, i2

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.m - 1)
        mixed = (fp.astype(np.uint64) * _MIX) & mask
        return (idx.astype(np.uint64) ^ mixed).astype(np.int64)

    # ------------------------------------------------------- placement

    def _match_at(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (self.table[idx] == fp[:, None]).any(axis=1)

    def _fill(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized batch placement into left-packed buckets; returns
        the placed mask. Duplicate bucket indices within the batch are
        handled by ranking (argsort + searchsorted) so each placed row
        lands in a distinct slot."""
        placed = np.zeros(len(idx), dtype=bool)
        if not len(idx):
            return placed
        order = np.argsort(idx, kind="stable")
        si, sf = idx[order], fp[order]
        rank = np.arange(len(si)) - np.searchsorted(si, si, side="left")
        pos = self._occ[si] + rank
        ok = pos < SLOTS
        self.table[si[ok], pos[ok]] = sf[ok]
        np.add.at(self._occ, si[ok], 1)
        placed[order] = ok
        return placed

    def _kick_one(self, fp: int, i: int) -> bool:
        """Single-key insert with eviction (the rare path — only keys
        whose both buckets were full in the batch phases get here).
        Victim choice is deterministic (kick counter mod SLOTS)."""
        for kick in range(MAX_KICKS):
            if self._occ[i] < SLOTS:
                self.table[i, self._occ[i]] = fp
                self._occ[i] += 1
                return True
            v = kick % SLOTS
            victim = int(self.table[i, v])
            self.table[i, v] = fp
            fp = victim
            i = int(
                self._alt_index(
                    np.asarray([i], dtype=np.int64),
                    np.asarray([fp], dtype=np.uint16),
                )[0]
            )
        self.overflow = True
        return False

    def _place_pairs(self, fp: np.ndarray, ia: np.ndarray, ib: np.ndarray) -> None:
        """Place fingerprints given their two candidate buckets,
        skipping ones already present (idempotent union semantics —
        re-inserting the same key twice must not eat a second slot,
        or incremental merges would saturate the filter)."""
        todo = ~(self._match_at(ia, fp) | self._match_at(ib, fp))
        fp, ia, ib = fp[todo], ia[todo], ib[todo]
        placed = self._fill(ia, fp)
        rem = ~placed
        placed2 = self._fill(ib[rem], fp[rem])
        for f, i in zip(fp[rem][~placed2], ia[rem][~placed2]):
            self._kick_one(int(f), int(i))

    # ------------------------------------------------------ public API

    def insert_many(self, hashes: np.ndarray) -> None:
        hashes = np.unique(np.asarray(hashes, dtype=np.int64))
        if not len(hashes):
            return
        fp, i1, i2 = self._fingerprints(hashes)
        self._place_pairs(fp, i1, i2)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.int64)
        if self.overflow:
            return np.ones(len(hashes), dtype=bool)
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fingerprints(hashes)
        return self._match_at(i1, fp) | self._match_at(i2, fp)

    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy of each key's fingerprint (standard
        cuckoo-filter contract: only delete keys that were inserted).
        Returns per-key deleted flags. Buckets stay left-packed (the
        last occupied slot swaps into the hole)."""
        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        if not len(hashes):
            return out
        fp, i1, i2 = self._fingerprints(hashes)
        for k in range(len(hashes)):
            for i in (int(i1[k]), int(i2[k])):
                occ = int(self._occ[i])
                row = self.table[i, :occ]
                hit = np.nonzero(row == fp[k])[0]
                if len(hit):
                    s = int(hit[0])
                    self.table[i, s] = self.table[i, occ - 1]
                    self.table[i, occ - 1] = 0
                    self._occ[i] = occ - 1
                    out[k] = True
                    break
        return out

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Union-in another filter's fingerprints via the partial-key
        property (alt bucket is recoverable from (index, fp) alone).
        Associative in the only sense the contract needs: the merged
        filter answers "maybe" for every key either side would."""
        if other.m != self.m:
            raise ValueError(f"shape mismatch: m={self.m} vs {other.m}")
        self.overflow = self.overflow or other.overflow
        ii, ss = np.nonzero(other.table)
        if len(ii):
            fps = other.table[ii, ss]
            ia = ii.astype(np.int64)
            self._place_pairs(fps, ia, self._alt_index(ia, fps))
        return self

    # --------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        return struct.pack("<QB", self.m, int(self.overflow)) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        m, overflow = struct.unpack_from("<QB", blob)
        table = (
            np.frombuffer(blob, dtype=np.uint16, offset=9)
            .reshape(int(m), SLOTS)
            .copy()
        )
        return cls(int(m), table, bool(overflow))

    def __reduce__(self):  # broadcast/pickle support
        return (CuckooFilter.from_bytes, (self.to_bytes(),))


# ------------------------------------------------- merged (broadcast)


def build_cuckoo(seen: DataFrame, m: int, col: str = "url_hash") -> CuckooFilter:
    """One cuckoo filter per ``seen`` partition (mapInPandas), merged
    via RDD.treeAggregate — the cuckoo twin of seen.build_bloom.
    Partition filters share the final m so the merge is index-stable."""

    def part_to_filter(batches):
        cf = CuckooFilter(m)
        nonempty = False
        for pdf in batches:
            if len(pdf):
                nonempty = True
                cf.insert_many(pdf["url_hash"].to_numpy(dtype=np.int64))
        if nonempty:
            yield pd.DataFrame({"filt": [cf.to_bytes()]})

    parts = seen.select(F.col(col).alias("url_hash")).mapInPandas(
        part_to_filter, schema="filt binary"
    )
    return parts.rdd.treeAggregate(
        CuckooFilter(m),
        lambda acc, row: acc.merge(CuckooFilter.from_bytes(row[0])),
        lambda a, b: a.merge(b),
        depth=2,
    )


def split_by_cuckoo(
    links: DataFrame, filt, spark, col: str = "url_hash"
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) under the broadcast filter — the
    cuckoo twin of seen.split_by_bloom. ``filt`` is a CuckooFilter or
    an existing Broadcast of one (pass the broadcast when calling
    repeatedly; the engine holds one handle per filter)."""
    from pyspark.broadcast import Broadcast

    bc = filt if isinstance(filt, Broadcast) else spark.sparkContext.broadcast(filt)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(url_hash: pd.Series) -> pd.Series:
        vals = url_hash.to_numpy(dtype=np.int64)
        return pd.Series(bc.value.contains_many(vals))

    tagged = links.withColumn("_maybe", maybe_seen_udf(F.col(col)))
    return tagged.filter(~F.col("_maybe")).drop("_maybe"), tagged.filter(
        F.col("_maybe")
    ).drop("_maybe")


# ------------------------------------------------- sharded (routed)
#
# 10^10-URL form, mirroring seen.build_bloom_shards /
# split_by_bloom_shards: one cuckoo shard per pmod(url_hash, P) bucket
# kept as a P-row DataFrame, membership probes routed by bucket with a
# cogroup — no merged filter on the driver or in a broadcast.


def shard_m_for(total_slots: int, n_buckets: int) -> int:
    """Per-shard bucket count: each shard holds ~1/P of the keys."""
    return cuckoo_m_for(max(SLOTS, total_slots // max(1, n_buckets)))


def build_cuckoo_shards(
    seen: DataFrame, n_buckets: int, shard_m: int, col: str = "url_hash"
) -> DataFrame:
    """DF[bucket int, shard binary]: one serialized cuckoo filter per
    non-empty pmod(col, P) bucket, bucket-aligned with the seen
    table's own partitioning."""

    def to_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(shard_m)
        cf.insert_many(pdf["_h"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])], "shard": [cf.to_bytes()]}
        )

    keyed = seen.select(
        F.pmod(F.col(col), F.lit(n_buckets)).cast("int").alias("_bucket"),
        F.col(col).alias("_h"),
    )
    return keyed.groupBy("_bucket").applyInPandas(
        to_shard, schema="bucket int, shard binary"
    )


def merge_cuckoo_shards(shards: DataFrame, delta: DataFrame) -> DataFrame:
    """Union two shard tables bucket-wise (incremental per-cycle
    maintenance) — the cuckoo twin of seen.or_merge_shards."""

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["shard"]:
            cf = CuckooFilter.from_bytes(blob)
            acc = cf if acc is None else acc.merge(cf)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "shard": [acc.to_bytes()]}
        )

    return (
        shards.unionByName(delta)
        .groupBy("bucket")
        .applyInPandas(merge_group, schema="bucket int, shard binary")
    )


def split_by_cuckoo_shards(
    links: DataFrame,
    shards: DataFrame,
    n_buckets: int,
    col: str = "url_hash",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bucket-routed membership check (cogroup; one shard in memory per
    task). Returns (definitely_new, maybe_seen, cache_handle) exactly
    like seen.split_by_bloom_shards — caller unpersists the handle."""
    from pyspark.storagelevel import StorageLevel

    out_fields = list(links.schema.fields) + [
        T.StructField("_maybe", T.BooleanType(), False)
    ]
    out_schema = T.StructType(out_fields)
    cand_cols = links.columns

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(columns=[f.name for f in out_fields])
        out = left[cand_cols].copy()
        if len(right):
            cf = CuckooFilter.from_bytes(right["shard"].iloc[0])
            out["_maybe"] = cf.contains_many(left[col].to_numpy(dtype=np.int64))
        else:
            out["_maybe"] = False
        return out

    keyed = links.withColumn(
        "_bb", F.pmod(F.col(col), F.lit(n_buckets)).cast("int")
    )
    tagged = (
        keyed.groupBy("_bb")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return (
        tagged.filter(~F.col("_maybe")).drop("_maybe"),
        tagged.filter(F.col("_maybe")).drop("_maybe"),
        tagged,
    )
