"""Streaming crawl cycle (SURVEY.md §2.8 told end-to-end, round 5).

One crawl cycle of the batch engine, re-expressed as a Structured
Streaming micro-batch pipeline composed ENTIRELY from pieces that
already exist and are individually §2.8-tested:

  stream of discovered URLs (file source, 1 file = 1 micro-batch)
    → stateless robots gate           (broadcast rules + the same
                                       vectorized robots_allow_udf the
                                       batch GENERATE uses)
    → st_host_politeness_state        (per-host budget slots carried
                                       ACROSS micro-batches — the
                                       stateful twin of the batch
                                       politeness window; per-host
                                       budgets ride in as a column)
    → foreachBatch crawl slice        (fetchparse.fetch applyInPandas →
                                       extract_links / extract_images →
                                       images.fetch_decode_phash →
                                       images.dedup_by_phash against
                                       the accumulated store)
    → downstream image streams        (st_image_profile /
                                       st_image_dedup / st_wds_export
                                       tail the produced image table).

Exactly-once: every foreachBatch output lands under a deterministic
``b={batch_id}`` directory with mode=overwrite, and the cross-batch
phash-dedup reads every OTHER batch directory — so a replayed batch
(crash between sink write and checkpoint commit) rewrites identical
bytes over itself and dedups against exactly the state it saw the
first time. Same idempotency argument as st_wds_export.

Parity contract (tests/test_crawl_stream.py): with the whole pending
set in ONE file the pipeline reproduces the batch cycle EXACTLY
(fetched trace rows, skipped set, robots-denied set, stored image rows
and phashes, discovered-link seen set vs ccbot_spark.oracle.crawl
cycles=1). Split across several files, set-level parity holds
(fetched / skipped / seen / phash sets are batching-invariant — the
per-host budget state makes slot assignment independent of the split);
only the within-cycle phash KEEPER may differ, because arrival order
replaces the batch cycle's global deterministic tie-break — the
streaming-native first-wins semantics, asserted as such.

Scale posture: the stateless gate and the stateful slot counter shuffle
only (host, url) rows — two longs of state per host; fetch/parse/decode
run inside the micro-batch with the SAME salted applyInPandas and
Arrow-batched decode the cycle engine uses, so the per-trigger plan is
the engine's cycle plan, just driven by the streaming scheduler.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import synthweb
from ..operators import fetchparse, images, politeness
from ..oracle import SEED_PRIORITY
from .state import st_host_politeness_state

#: Discovered-URL stream schema. ts is the DISCOVERY ORDER as event
#: time (epoch + seq seconds): the stateful politeness op orders each
#: host's candidates by (ts, url_norm), which for a seed generation is
#: exactly the batch GENERATE order (uniform priority, dt_seq = seed
#: index) — that is what makes slot parity with the cycle engine exact.
URL_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

_EPOCH = 1_600_000_000  # fixed base so event times are deterministic


def write_seed_files(cfg: synthweb.WebConfig, seeds: list[str],
                     in_dir: str, n_files: int = 1) -> list[str]:
    """Write the cycle's pending set as ``n_files`` parquet files in
    CONTIGUOUS seed-order chunks with strictly increasing mtimes, so
    the file source replays them as ordered micro-batches (the file
    stream processes oldest-modification-time first)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .. import urlkit

    os.makedirs(in_dir, exist_ok=True)
    per = (len(seeds) + n_files - 1) // n_files
    paths = []
    for i in range(n_files):
        chunk = seeds[i * per : (i + 1) * per]
        if not chunk:
            continue
        base = i * per
        tbl = pa.table(
            {
                "ts": pa.array(
                    [(_EPOCH + base + j) * 1_000_000 for j in range(len(chunk))],
                    pa.timestamp("us"),
                ),
                "url_norm": pa.array(chunk, pa.string()),
                "host": pa.array(
                    [urlkit.host_of(u) for u in chunk], pa.string()
                ),
            }
        )
        path = os.path.join(in_dir, f"seeds-{i:04d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (_EPOCH + i, _EPOCH + i))
        paths.append(path)
    return paths


def read_url_events(spark: SparkSession, in_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(URL_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _stored_phash_paths(out_root: str, exclude_batch: int) -> list[str]:
    """Image-batch directories written by batches OTHER than the one
    being (re)processed — the replay-safe dedup baseline."""
    img_root = os.path.join(out_root, "images")
    if not os.path.isdir(img_root):
        return []
    return sorted(
        os.path.join(img_root, d)
        for d in os.listdir(img_root)
        if d.startswith("b=") and d != f"b={exclude_batch}"
    )


def st_crawl_cycle(
    spark: SparkSession,
    cfg: synthweb.WebConfig,
    in_dir: str,
    out_root: str,
    cycle: int = 1,
):
    """Start the streaming crawl cycle; returns the StreamingQuery
    (callers awaitTermination — tests drive trigger(availableNow)).

    Outputs under out_root, one ``b={batch_id}`` dir per micro-batch:
      pages/    (host, url_norm, sched_slot, ok)       fetched slice
      skipped/  (host, url_norm)                       over-budget rows
      links/    (url_norm)                             discovered urls
      images/   IMAGE/SAMPLE_EVENTS columns + phash    post-dedup store
    """
    hosts = spark.createDataFrame(
        [(cfg.host(k),) for k in range(cfg.n_hosts)], "host string"
    )
    robots_meta = politeness.build_robots_table(
        hosts, cfg, ver=synthweb.robots_version(cfg, cycle)
    )
    # robots_meta is host-cardinality-sized: collect once, rebroadcast
    # per micro-batch as a local DataFrame (foreachBatch runs on the
    # driver; the join inside each slice is a broadcast hash join).
    robots_rows = robots_meta.collect()
    robots_local = spark.createDataFrame(robots_rows, robots_meta.schema)

    ev = read_url_events(spark, in_dir)
    allowed = (
        ev.join(F.broadcast(robots_local), on="host", how="inner")
        .filter(
            politeness.robots_allow_udf(
                F.col("allow"), F.col("disallow"), F.col("url_norm")
            )
        )
        .select(
            "ts", "host", "url_norm",
            F.col("budget_per_cycle").alias("budget"),
        )
    )
    annotated = st_host_politeness_state(allowed)

    delays = robots_local.select("host", "crawl_delay_ms")

    def one_slice(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        try:
            b.filter(F.col("over_budget")).select("host", "url_norm").write.mode(
                "overwrite"
            ).parquet(os.path.join(out_root, "skipped", f"b={batch_id}"))

            sched = (
                b.filter(~F.col("over_budget"))
                .join(F.broadcast(delays), on="host")
                .select(
                    "url_norm",
                    "host",
                    F.lit(SEED_PRIORITY).cast("long").alias("priority"),
                    F.lit(0).cast("long").alias("dt_cycle"),
                    F.lit(0).cast("long").alias("dt_seq"),
                    F.lit(0).cast("int").alias("retries"),
                    (F.col("seq_in_host") - 1).cast("int").alias("sched_slot"),
                    ((F.col("seq_in_host") - 1) * F.col("crawl_delay_ms"))
                    .cast("long")
                    .alias("sched_time"),
                    "crawl_delay_ms",
                )
            )
            fetched = fetchparse.fetch(sched, cfg, cycle=cycle).persist()
            try:
                fetched.select("host", "url_norm", "sched_slot", "ok").write.mode(
                    "overwrite"
                ).parquet(os.path.join(out_root, "pages", f"b={batch_id}"))

                ok_pages = fetched.filter(F.col("ok") & F.col("redirect").isNull())
                fetchparse.extract_links(ok_pages).select(
                    "url_norm"
                ).distinct().write.mode("overwrite").parquet(
                    os.path.join(out_root, "links", f"b={batch_id}")
                )

                decoded = images.fetch_decode_phash(
                    fetchparse.extract_images(ok_pages), cfg
                )
                prior = _stored_phash_paths(out_root, batch_id)
                stored_phashes = (
                    # explicit schema: an all-denied/empty slice writes
                    # a schemaless (part-file-free) directory
                    spark.read.schema("phash long").parquet(*prior)
                    if prior
                    else spark.createDataFrame([], "phash long")
                )
                res = images.dedup_by_phash(decoded, stored_phashes)
                # event time: one tumbling-window minute per micro-batch
                # (the downstream profile stream groups by this window)
                res["store"].withColumn(
                    "ts",
                    F.timestamp_seconds(F.lit(_EPOCH + int(batch_id) * 60)),
                ).select(
                    "ts", "image_id", "bytes", "w", "h", "fmt",
                    "caption", "phash",
                ).write.mode("overwrite").parquet(
                    os.path.join(out_root, "images", f"b={batch_id}")
                )
            finally:
                fetched.unpersist()
        finally:
            b.unpersist()

    return (
        annotated.writeStream.foreachBatch(one_slice)
        .option("checkpointLocation", os.path.join(out_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
