"""Streaming image ingest (SURVEY.md §2.8 × the image axis).

Binary blobs land in a directory as parquet — the crawler's image-sink
shape — and these jobs profile and dedup them continuously. The header
parse is the SAME pure-JVM expression set the batch path uses
(`multimodal.header_meta`): container sniff + dimensions straight from
the first bytes, so no blob ever crosses into Python inside the
stream, and state never holds pixels:

  * `st_image_profile` — per-minute (container × size-class) ingest
    profile with a late-data watermark. The aggregation state is a
    handful of counter rows per window; the blobs themselves are
    projected away before the stateful operator.
  * `st_image_dedup` — byte-exact repost suppression within the
    watermark horizon: blobs reduce to 16-byte md5 digests in the
    stateless projection, and `dropDuplicatesWithinWatermark` keys on
    the digest — state is bounded by the watermark and holds digests,
    not images (the EXACT forever-seen set stays the batch anti-join's
    job, same division of labor as st_dedup_urls).

Tests drive both with trigger(availableNow) and compare against the
batch twins (`multimodal.size_histogram` grouping / distinct digest
count); on a live cluster the same code tails the sink directory
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import multimodal

# Image-ingest stream schema: one row per stored image, event-time ts.
IMAGE_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def read_image_events(spark: SparkSession, images_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(IMAGE_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(images_dir)
    )


def st_image_profile(images: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Tumbling 1-minute ingest profile: JVM header parse → (container,
    size_class) counts + byte totals per window. Unparseable blobs are
    counted under container NULL→'unknown' so ingest anomalies (codec
    drift, truncation) surface in the same report."""
    meta = multimodal.header_meta(images)
    return (
        meta.withWatermark("ts", late)
        .groupBy(
            F.window("ts", "1 minute").alias("win"),
            F.coalesce("container", F.lit("unknown")).alias("container"),
            F.when(F.col("container").isNull(), F.lit("n/a"))
            .otherwise(multimodal.size_class_col())
            .alias("size_class"),
        )
        .agg(
            F.count("*").alias("n_images"),
            F.sum("nbytes").alias("total_bytes"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "container",
            "size_class",
            "n_images",
            "total_bytes",
        )
    )


def st_image_dedup(images: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Streaming byte-exact image dedup: md5 digest computed in the
    stateless projection (JVM, over the blob), blob dropped by the
    header parse, state keyed on the 16-byte digest within the
    watermark. Emits each distinct blob once with its parsed header
    metadata attached."""
    with_digest = images.withColumn("digest", F.md5("bytes"))
    meta = multimodal.header_meta(with_digest)  # keeps digest, drops blob
    return meta.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        ["digest"]
    )


# Sample stream schema for the training-export sink: the engine's
# stored-image row (BASELINE input shape) plus event time.
SAMPLE_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
    ]
)


def read_sample_events(spark: SparkSession, samples_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SAMPLE_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(samples_dir)
    )


def st_wds_export(
    samples: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    target_bytes: int = 1 << 20,
    num_partitions: int = 8,
):
    """Continuous WebDataset export: each micro-batch's image+caption
    samples land as ``{out_dir}/batch=NNNNNN/shard-*.tar`` through
    ``foreachBatch``. Exactly-once composition: Structured Streaming
    checkpoints the batch_id, and a REPLAYED batch rewrites the same
    deterministic shard bytes over itself (wds.write_shards is a pure
    function of the batch rows + atomic rename), so the sink is
    idempotent under recovery — the same argument the engine's
    per-cycle WDS sink makes for crash-resumed cycles.

    Returns the started StreamingQuery; callers awaitTermination (the
    tests drive trigger(availableNow)).
    """
    import os

    from .. import wds as wdsmod

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        costed = batch_df.withColumn(
            "plan_cost",
            wdsmod.sample_cost(F.col("w"), F.col("h"), F.col("caption")),
        )
        assigned, cache = wdsmod.plan_shards(
            costed, target_bytes, num_partitions=num_partitions
        )
        try:
            wdsmod.write_shards(
                assigned, os.path.join(out_dir, f"batch={batch_id:06d}")
            ).collect()
        finally:
            cache.unpersist()

    return (
        samples.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------- image+caption pair stream

# Pair-ingest schema: the crawler's image+caption sink rows with the
# stored embedding attached (the image tower runs at ingest in a real
# deployment; here the stub discipline of functions/similarity.py).
IMGCAP_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def read_imgcap_events(spark: SparkSession, pairs_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(IMGCAP_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(pairs_dir)
    )


def st_imgcap_filter(pairs: DataFrame) -> DataFrame:
    """CLIP-score alignment gate IN the ingest stream: the per-row
    projection form (`similarity.clip_align_project`) — stub caption
    tower, 2^20-quantized image embedding, integer dot, cross-
    multiplied cosine gate — as one STATELESS JVM expression per pair.
    No shuffle, no state, blobs never involved; emits the same
    integers as the batch `clip_align_filter`, so a pair admitted by
    the stream is exactly the pair the batch curation would admit."""
    from ..functions import similarity

    return similarity.clip_align_project(pairs, keep_cols=("ts",))


def st_imgcap_profile(pairs: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Per-minute alignment-keep-rate profile with a late-data
    watermark: counts of kept vs dropped pairs per tumbling window —
    the live dashboard for caption-quality drift at the crawl edge.
    State is two counter rows per window; captions/embeddings are
    reduced to one verdict column before the stateful operator."""
    scored = st_imgcap_filter(pairs)
    return (
        scored.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 minute").alias("win"), F.col("keep"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("dot").alias("sum_dot"),
        )
        .select(
            F.col("win").start.alias("win_start"),
            "keep",
            "n_pairs",
            "sum_dot",
        )
    )
