"""Image pipeline: batch decode + phash + dedup + sink (SURVEY.md §2.7
u_img_decode / u_phash, §2.3 j_phash_dedup / j_phash_near).

Decode/phash run in one ``mapInPandas`` pass (iterator form: a single
Python worker streams Arrow batches without materializing the whole
partition). Image bytes are binary blobs — the engine caps
``spark.sql.execution.arrow.maxRecordsPerBatch`` on this path so a
batch stays memory-bounded (SURVEY.md §7.4 item 6).

Dedup is exact 64-bit phash equality, reproducing the oracle's
sequential first-wins semantics with a deterministic window tie-break:
row_number over phash partitions ordered by the page's global fetch
order (sched_time, page_host, page_url, img_idx), then a left-anti
join against already-stored phashes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import codecs, phash as phash_mod, synthweb

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("page_host", T.StringType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("sched_time", T.LongType(), False),
        T.StructField("img_idx", T.IntegerType(), False),
    ]
)

def _order():
    return [
        F.col("sched_time").asc(),
        F.col("page_host").asc(),
        F.col("page_url").asc(),
        F.col("img_idx").asc(),
    ]


def fetch_decode_phash(imgs_raw: DataFrame, cfg: synthweb.WebConfig) -> DataFrame:
    """(img_url, caption, order keys) → decoded rows with phash.

    In production the byte fetch is an HTTP GET inside the same batch
    function; here it is the deterministic synthetic web. Decode and
    phash are numpy, vectorized per image, batched by Arrow.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data_l, w_l, h_l, fmt_l, ph_l = [], [], [], [], []
            for img_url in pdf["img_url"]:
                data, w, h, fmt = synthweb.fetch_image(cfg, img_url)
                px = codecs.decode(data, fmt)
                data_l.append(data)
                w_l.append(w)
                h_l.append(h)
                fmt_l.append(fmt)
                ph_l.append(phash_mod.phash64(px))
            out = pd.DataFrame(
                {
                    "image_id": pdf["img_url"].astype(str),
                    "bytes": data_l,
                    "w": pd.Series(w_l, dtype="int32"),
                    "h": pd.Series(h_l, dtype="int32"),
                    "fmt": fmt_l,
                    "caption": pdf["caption"].astype(str),
                    "phash": pd.Series(ph_l, dtype="int64"),
                    "page_host": pdf["page_host"].astype(str),
                    "page_url": pdf["page_url"].astype(str),
                    "sched_time": pdf["sched_time"].astype("int64"),
                    "img_idx": pdf["img_idx"].astype("int32"),
                }
            )
            yield out

    return imgs_raw.mapInPandas(gen, schema=DECODED_SCHEMA)


def dedup_by_phash(
    decoded: DataFrame,
    stored_phashes: DataFrame,
    bloom=None,
    bloom_bits: int = 0,
    spark=None,
    shards: DataFrame | None = None,
    shard_bits: int = 0,
    n_buckets: int = 0,
) -> dict[str, DataFrame]:
    """Exact phash dedup (first-wins by deterministic page order).

    stored_phashes: DF[phash] from the images table (column-pruned scan
    — the manifest/Parquet reader never touches `bytes`).

    With `bloom` (an engine-maintained filter over every stored phash),
    Bloom-negative rows skip the stored-table join entirely — the
    prefilter-only discipline of the seen set (§7.4 item 2): a negative
    is definitely new, positives are verified by the exact join, so the
    result is identical with or without the filter. At 10^10 stored
    images this turns the per-cycle join against an 80 GB phash column
    into a join over the rare Bloom-positive rows.

    Returns {'store': new unique rows, 'dups': dedup hits with page_host}.
    """
    w = Window.partitionBy("phash").orderBy(*_order())
    ranked = decoded.withColumn("_rn", F.row_number().over(w))
    firsts = ranked.filter(F.col("_rn") == 1).drop("_rn")
    within_dups = ranked.filter(F.col("_rn") > 1).drop("_rn")
    cache = None
    if shards is not None:
        # bucket-routed shard form (the 10^10-stored-images path — the
        # same no-merged-filter discipline as the seen set: at 8
        # bits/key a merged phash filter would be 10+ GB, too big for
        # one broadcast; shards stay distributed and candidates route
        # by pmod(phash, P))
        from . import seen as seenops

        sure_new, maybe, cache = seenops.split_by_bloom_shards(
            firsts, shards, shard_bits, n_buckets, col="phash"
        )
        new = sure_new.unionByName(
            maybe.join(stored_phashes.select("phash"), on="phash", how="left_anti")
        )
        seen_again = maybe.join(
            stored_phashes.select("phash"), on="phash", how="left_semi"
        )
    elif bloom is not None:
        from . import seen as seenops

        sure_new, maybe = seenops.split_by_bloom(
            firsts, bloom, bloom_bits, spark, col="phash"
        )
        new = sure_new.unionByName(
            maybe.join(stored_phashes.select("phash"), on="phash", how="left_anti")
        )
        seen_again = maybe.join(
            stored_phashes.select("phash"), on="phash", how="left_semi"
        )
    else:
        new = firsts.join(stored_phashes.select("phash"), on="phash", how="left_anti")
        seen_again = firsts.join(
            stored_phashes.select("phash"), on="phash", how="left_semi"
        )
    return {
        "store": new,
        "dups": within_dups.unionByName(seen_again),
        # persisted cogroup handle from the sharded split (None
        # otherwise); the caller unpersists it once store/dups are
        # fully consumed
        "cache": cache,
    }


def phash_near_dup(
    images: DataFrame, max_hamming: int = 8, n_bands: int = 4
) -> DataFrame:
    """Optional near-duplicate pairs via LSH banding (SURVEY.md §2.3
    j_phash_near): split the 64-bit hash into `n_bands` 16-bit bands;
    candidates share ≥1 band (equi-join — a true Hamming-ball query
    without a cross join); verify with bit_count(a^b) ≤ max_hamming.

    Returns DF[image_id_a, image_id_b, hamming] with a < b.
    """
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("phash"), i * width).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    e = (
        images.select("image_id", "phash")
        .withColumn("b", F.explode(bands))
        .select("image_id", "phash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.image_id") < F.col("b.image_id"),
            ],
        )
        .select(
            F.col("a.image_id").alias("image_id_a"),
            F.col("b.image_id").alias("image_id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["image_id_a", "image_id_b"])
    )
    return pairs
