"""URL-seen set: exact anti-join + partitioned Bloom prefilter
(SURVEY.md §2.3 j_seen_anti / j_seen_semi, §2.4 a_bloom_build /
a_bloom_merge; BASELINE.json north_star: "partitioned Bloom/cuckoo
filters, one filter shard per frontier partition, merged via
treeAggregate").

Exactness contract (SURVEY.md §7.4 item 2): the Bloom filter is used
in the only safe direction — a negative is *definitely unseen* (fast
path, skips the join); positives ("maybe seen") still go through the
exact anti-join. The filter can therefore never corrupt the seen-set,
only reduce join traffic. At a 10^10-URL frontier the filter absorbs
the overwhelmingly-common case (a discovered link is new), turning a
huge shuffle join into a small one over Bloom-positive candidates.

Hashing: both sides key on the SAME JVM-computed ``xxhash64(url_norm)``
(a column, not recomputed in Python), so filter membership is
consistent by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_N_HASHES = 5


def _set_bits(bits: np.ndarray, hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """Double-hashing Bloom insert, vectorized (h1 + i*h2 mod n_bits).

    Inserts use the UNBUFFERED np.bitwise_or.at: plain fancy-index
    `bits[idx] |= mask` silently keeps only one update when two keys
    in the batch land in the same 64-bit word — a dropped bit is a
    future FALSE NEGATIVE, the one corruption the prefilter contract
    cannot absorb (a seen URL would skip the exact join and re-crawl).
    """
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(n_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd → full period
    for i in range(_N_HASHES):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return bits


def _test_bits(bits: np.ndarray, hashes: np.ndarray, n_bits: int) -> np.ndarray:
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(n_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    out = np.ones(len(h), dtype=bool)
    for i in range(_N_HASHES):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return out


def build_bloom(
    seen: DataFrame, n_bits: int = 1 << 22, depth: int = 2, col: str = "url_hash"
) -> np.ndarray:
    """One Bloom shard per `seen` partition (mapPartitions builds a
    local bit-array from that partition's url_hash values), OR-merged
    via RDD.treeAggregate — the single RDD-level op in the engine
    (treeAggregate has no DataFrame equivalent).

    Scale note: at 10^10 URLs a single merged filter does not fit one
    broadcast; the engine then uses build_bloom_shards /
    split_by_bloom_shards below (per-bucket shard table + bucket-routed
    cogroup, no merged array anywhere). The merged form is right while
    the filter is comfortably broadcastable.
    """
    n_words = n_bits // 64

    def part_to_shard(batches):
        """mapInPandas shard builder: Arrow-batched (no per-row pickling
        on the JVM→Python hop), one packed shard row per partition."""
        bits = np.zeros(n_words, dtype=np.uint64)
        nonempty = False
        for pdf in batches:
            if len(pdf):
                nonempty = True
                _set_bits(bits, pdf["url_hash"].to_numpy(dtype=np.int64), n_bits)
        if nonempty:
            yield pd.DataFrame({"shard": [bits.tobytes()]})

    shards = seen.select(F.col(col).alias("url_hash")).mapInPandas(
        part_to_shard, schema="shard binary"
    )
    zero = np.zeros(n_words, dtype=np.uint64)
    return shards.rdd.treeAggregate(
        zero,
        lambda acc, row: np.bitwise_or(
            acc, np.frombuffer(row[0], dtype=np.uint64)
        ),
        np.bitwise_or,
        depth=depth,
    )


def split_by_bloom(
    links: DataFrame, bloom_bits, n_bits: int, spark,
    col: str = "url_hash",
) -> tuple[DataFrame, DataFrame]:
    """Split candidate rows into (definitely_new, maybe_seen) using the
    broadcast filter. `col` must be a JVM-computed int64 hash column
    (url_hash for the seen set, phash for image dedup).

    `bloom_bits` is either the packed np.uint64 array or an existing
    ``Broadcast`` of one — pass the broadcast when calling repeatedly
    against the same filter (the engine holds one handle per filter
    and destroys it when the filter changes; a fresh broadcast per
    call would leak ~n_bits/8 bytes on driver and executors each
    cycle)."""
    from pyspark.broadcast import Broadcast

    bc = (
        bloom_bits
        if isinstance(bloom_bits, Broadcast)
        else spark.sparkContext.broadcast(bloom_bits)
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(url_hash: pd.Series) -> pd.Series:
        vals = url_hash.to_numpy(dtype=np.int64)
        return pd.Series(_test_bits(bc.value, vals, n_bits))

    tagged = links.withColumn("_maybe", maybe_seen_udf(F.col(col)))
    return tagged.filter(~F.col("_maybe")).drop("_maybe"), tagged.filter(
        F.col("_maybe")
    ).drop("_maybe")


# ----------------------------------------------------- sharded variant
#
# At a 10^10-URL seen set, 8 bits/key means a 10+ GB filter — too big
# for a single driver-resident array or one broadcast. The sharded path
# keeps ONE Bloom shard per hash bucket (the SAME pmod(url_hash, P)
# buckets the seen table is partitioned by) as a P-row DataFrame
# (bucket, packed bits); candidate membership checks are ROUTED by
# bucket with a cogroup, so a task only ever holds its own bucket's
# shard. No merged filter exists anywhere — not on the driver, not in a
# broadcast. Exactness contract is unchanged (prefilter-only: negatives
# are definitely unseen, positives go to the exact anti-join).

def shard_bits_for(total_bits: int, n_buckets: int) -> int:
    """Per-shard bit width giving the same false-positive rate as one
    `total_bits` filter over the full key set: keys are split across P
    buckets, so each shard needs total/P bits (floored to a 64-bit
    word, min one word)."""
    return max(64, (total_bits // n_buckets) // 64 * 64)


def build_bloom_shards(
    seen: DataFrame, n_buckets: int, shard_bits: int, col: str = "url_hash"
) -> DataFrame:
    """Per-bucket Bloom shards: DF[bucket int, shard binary], one row
    per non-empty bucket, each shard built from that bucket's hashes
    via groupBy(bucket).applyInPandas. The shuffle is bucket-aligned
    with the seen table's own partitioning, and the output is P rows
    of shard_bits/8 bytes — never a merged array."""
    n_words = shard_bits // 64

    def to_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_words, dtype=np.uint64)
        _set_bits(bits, pdf["_h"].to_numpy(dtype=np.int64), shard_bits)
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])], "shard": [bits.tobytes()]}
        )

    keyed = seen.select(
        F.pmod(F.col(col), F.lit(n_buckets)).cast("int").alias("_bucket"),
        F.col(col).alias("_h"),
    )
    return keyed.groupBy("_bucket").applyInPandas(
        to_shard, schema="bucket int, shard binary"
    )


def or_merge_shards(shards: DataFrame, delta: DataFrame) -> DataFrame:
    """OR two shard tables bucket-wise (incremental per-cycle
    maintenance: old shards ∪ the new-keys delta). Buckets present in
    only one side carry through unchanged."""

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["shard"]:
            arr = np.frombuffer(blob, dtype=np.uint64)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "shard": [acc.tobytes()]}
        )

    return (
        shards.unionByName(delta)
        .groupBy("bucket")
        .applyInPandas(or_group, schema="bucket int, shard binary")
    )


def split_by_bloom_shards(
    links: DataFrame,
    shards: DataFrame,
    shard_bits: int,
    n_buckets: int,
    col: str = "url_hash",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bucket-routed membership check: candidates shuffle by
    pmod(col, P) and cogroup with the shard table, so each task tests
    its bucket's candidates against ONLY that bucket's shard (one
    shard in memory per task — the 10^10-scale form of
    split_by_bloom). A bucket with no shard row means no seen keys
    hash there: all its candidates are definitely new.

    Returns (definitely_new, maybe_seen, cache_handle): both outputs
    filter one persisted cogroup result (the caller unpersists the
    handle after consuming them — re-running the cogroup shuffle per
    output would double the routing cost)."""
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
            bits = np.frombuffer(right["shard"].iloc[0], dtype=np.uint64)
            out["_maybe"] = _test_bits(
                bits, left[col].to_numpy(dtype=np.int64), shard_bits
            )
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


def anti_join_seen(links: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact unseen selection (j_seen_anti). Catalyst/AQE picks
    broadcast vs shuffled-hash vs sort-merge by size."""
    return links.join(seen.select("url_norm"), on="url_norm", how="left_anti")


def semi_join_seen(links: DataFrame, seen: DataFrame) -> DataFrame:
    """Already-seen subset (j_seen_semi) — feeds 'dup' trace events."""
    return links.join(seen.select("url_norm"), on="url_norm", how="left_semi")
