"""Structured Streaming metrics/lineage path (SURVEY.md §2.8).

The crawl loop itself is iterative micro-batch (cycle loop — that is
what makes crawl order exactly reproducible); Structured Streaming
carries the OBSERVABILITY path: fetch/parse events land in a directory
as parquet, and these jobs aggregate them continuously.

All jobs read a file-source stream (exactly-once via checkpointed file
tracking), apply an event-time watermark for late fetch results, and
write append-mode parquet. Tests drive them with trigger(availableNow)
so they are deterministic batch-equivalent runs; on a live cluster the
same code tails the directory forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fetch-event stream schema: one row per fetched URL, event-time ts.
FETCH_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def read_fetch_events(spark: SparkSession, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(FETCH_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )


def st_metrics_stream(events: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Tumbling 1-minute per-host throughput/error aggregation with a
    late-data watermark (st_metrics_stream + st_watermark)."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 minute").alias("win"), "host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum("bytes").alias("bytes"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("errors"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "host",
            "fetched",
            "bytes",
            "errors",
        )
    )


PAGE_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("html", T.StringType(), False),
    ]
)


def read_page_events(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGE_EVENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def st_anchor_terms(pages: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Windowed anchor-text aggregation over a parsed-page stream: the
    batch anchors sink's streaming twin — per tumbling minute, how
    many followed anchors used `term` for `target`. The element scan,
    nofollow filter and term split are the SAME JVM expressions the
    batch operator runs (fetchparse.extract_anchor_texts with the
    event-time column passed through for the watermark); hrefs stay
    raw here — a streaming ingest aggregates what pages say and leaves
    resolution to the batch join that consumes the table. State is
    bounded by the watermark horizon."""
    from ccbot_spark.operators import fetchparse

    pairs = fetchparse.extract_anchor_texts(
        pages, url_col="page_url", keep_cols=("ts",)
    )
    terms = pairs.select(
        "ts",
        F.col("href").alias("target"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("anchor")), r"\s+"),
                lambda w: w != "",
            )
        ).alias("term"),
    )
    return (
        terms.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 minute").alias("win"), "target", "term")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "target", "term", "cnt")
    )


def st_sessions(events: DataFrame, gap: str = "5 minutes",
                late: str = "10 minutes") -> DataFrame:
    """Per-host fetch sessions (st_session): session window closes after
    `gap` of inactivity."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.session_window("ts", gap).alias("sess"), "host")
        .agg(F.count("*").alias("fetched"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "host",
            "fetched",
        )
    )


def st_dedup_urls(events: DataFrame, late: str = "10 minutes") -> DataFrame:
    """Streaming URL dedup within the watermark (st_dedup): state is
    bounded by the watermark horizon, so it runs forever at 10^10-URL
    scale (the EXACT seen-set stays the batch anti-join's job)."""
    return events.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        ["url_norm"]
    )


def run_complete_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain the source into an in-memory table in `complete` mode —
    the deterministic way to observe a windowed aggregation's final
    state in tests (append mode only emits a window once the watermark
    passes it, which a drained availableNow run never does for the
    last windows)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(stream_df: DataFrame, out_dir: str, ckpt_dir: str) -> None:
    """Drain everything currently in the source, exactly-once, then
    stop — the deterministic test/benchmark driver. Live deployments
    use .trigger(processingTime='30 seconds') with the same code."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def st_trending_hosts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "1 minute",
    late: str = "10 minutes",
    min_fetches: int = 5,
) -> DataFrame:
    """Sliding-window trending-host detection (the window shape the
    tumbling metrics job can't express): per host, fetch count and
    bytes over the last `window`, re-evaluated every `slide` — the
    continuous feed for the hot-host salting decision (a_topk_hosts is
    its batch twin). State is bounded by window/slide x watermark, so
    it runs forever at any event rate; the output is already
    per-(window, host) aggregated, orders of magnitude smaller than
    the event stream."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window, slide).alias("win"), "host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum("bytes").alias("bytes"),
        )
        .filter(F.col("fetched") >= min_fetches)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "fetched",
            "bytes",
        )
    )


def st_cm_sketch(events: DataFrame, key: str = "url_norm", d: int = 4,
                 w: int = 64) -> DataFrame:
    """Count-Min registers as a STREAMING aggregation — the natural
    home of the sketch (Cormode & Muthukrishnan wrote it for streams):
    the d×w register table is a running groupBy-sum, so each
    micro-batch folds in with map-side partial aggregation and state
    is bounded at d·w rows forever, whatever the stream's key
    cardinality — the frequency monitor a crawl dashboard keeps
    without a per-key state explosion. Same md5-salted construction
    as sketchkit.cm_registers, so the drained stream equals the batch
    sketch row-for-row (pytest) and merges with batch sketches via
    cm_merge."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(int(d) - 1))).alias("row")
    base = events.select(F.col(key).cast("string").alias("_k")).select(
        "*", rows
    )
    h = F.md5(
        F.concat_ws(":", F.lit("cm"), F.col("row").cast("string"), F.col("_k"))
    )
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(int(w))
    )
    return (
        base.select(
            F.col("row").cast("long").alias("row"), bucket.alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
