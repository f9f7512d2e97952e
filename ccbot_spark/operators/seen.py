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
    """Double-hashing Bloom insert, vectorized (h1 + i*h2 mod n_bits)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(n_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd → full period
    for i in range(_N_HASHES):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        bits[(idx >> np.uint64(6)).astype(np.int64)] |= np.uint64(1) << (
            idx & np.uint64(63)
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
    broadcast; there the shards stay resident per frontier bucket and
    candidate checks are routed by bucket (same code path, smaller
    n_bits per shard). The merged form is right for per-cycle batches.
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
    links: DataFrame, bloom_bits: np.ndarray, n_bits: int, spark,
    col: str = "url_hash",
) -> tuple[DataFrame, DataFrame]:
    """Split candidate rows into (definitely_new, maybe_seen) using the
    broadcast filter. `col` must be a JVM-computed int64 hash column
    (url_hash for the seen set, phash for image dedup)."""
    bc = spark.sparkContext.broadcast(bloom_bits)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(url_hash: pd.Series) -> pd.Series:
        vals = url_hash.to_numpy(dtype=np.int64)
        return pd.Series(_test_bits(bc.value, vals, n_bits))

    tagged = links.withColumn("_maybe", maybe_seen_udf(F.col(col)))
    return tagged.filter(~F.col("_maybe")).drop("_maybe"), tagged.filter(
        F.col("_maybe")
    ).drop("_maybe")


def anti_join_seen(links: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact unseen selection (j_seen_anti). Catalyst/AQE picks
    broadcast vs shuffled-hash vs sort-merge by size."""
    return links.join(seen.select("url_norm"), on="url_norm", how="left_anti")


def semi_join_seen(links: DataFrame, seen: DataFrame) -> DataFrame:
    """Already-seen subset (j_seen_semi) — feeds 'dup' trace events."""
    return links.join(seen.select("url_norm"), on="url_norm", how="left_semi")
