"""Streaming MIXED-media ingest (SURVEY.md §2.8 × the multimodal
family).

A crawl's media sink is not pre-sorted by type: image, audio, and
video blobs land interleaved in the same directory. `st_media_profile`
is the first gate — one stateless JVM sniff (`multimodal.
media_container_col`: the image magics + RIFF/WAVE + YUV4MPEG2)
classifies every blob, and a watermarked per-minute
(modality × container) profile reports ingest volume and bytes. The
blobs are projected away before the stateful operator, so state is a
handful of counter rows per window — never pixels, samples, or
frames. Downstream per-modality pipelines (the image/audio/video
tiers) subscribe to their `modality` slice of the same stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import multimodal

# Mixed media-ingest stream schema: one row per stored blob.
MEDIA_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def read_media_events(spark: SparkSession, media_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(MEDIA_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(media_dir)
    )


def st_media_dedup(media: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Streaming byte-exact dedup across the WHOLE mixed stream: a
    reposted blob is a repost whatever its modality, so the md5 digest
    is computed once in the stateless projection (JVM, over the blob),
    the blob replaced by its sniffed container + size, and state keyed
    on the 16-byte digest within the watermark — the cross-modal twin
    of st_image_dedup (the EXACT forever-seen set stays the batch
    anti-join's job). Emits each distinct blob once with its modality
    routing attached."""
    classified = media.select(
        "ts",
        "media_id",
        F.md5("bytes").alias("digest"),
        multimodal.media_container_col("bytes").alias("container"),
        F.length("bytes").cast("long").alias("nbytes"),
    ).withColumn("modality", multimodal.modality_col("container"))
    return classified.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def st_media_profile(media: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Tumbling 1-minute mixed-media ingest profile: one JVM sniff →
    (modality, container) counts + byte totals per window. Unknown
    magic lands in ('unknown', 'unknown') so ingest anomalies surface
    in the same report."""
    classified = media.select(
        "ts",
        multimodal.media_container_col("bytes").alias("container"),
        F.length("bytes").cast("long").alias("nbytes"),
    )
    return (
        classified.withWatermark("ts", late)
        .groupBy(
            F.window("ts", "1 minute").alias("win"),
            multimodal.modality_col("container").alias("modality"),
            F.coalesce("container", F.lit("unknown")).alias("container"),
        )
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("nbytes").alias("total_bytes"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "modality",
            "container",
            "n_blobs",
            "total_bytes",
        )
    )
