"""Streaming crawl (SURVEY.md §2.8 told end-to-end, round 5).

The batch engine's crawl cycle re-expressed as a Structured Streaming
micro-batch pipeline composed ENTIRELY from pieces that already exist
and are individually §2.8-tested:

  stream of pending URLs (file source, 1 file = 1 micro-batch)
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

`streaming_crawl` chains cycles into a CONTINUOUS crawl: each cycle is
one availableNow drain (fresh politeness state — budgets are per
cycle), and the next generation's pending set is the cycle's
budget-skipped candidates (original priority + discovery keys) plus
its newly discovered links (max-parent priority decayed by
PRIORITY_DECAY, discovery time (cycle, 0)) minus the seen set — the
exact frontier-update rule of the batch engine and the oracle crawler,
which is what makes multi-cycle set parity exact.

Exactly-once: every foreachBatch output lands under a deterministic
``c{cycle}-b{batch_id}`` directory with mode=overwrite, and the
cross-batch phash-dedup reads every OTHER slice directory — so a
replayed batch (crash between sink write and checkpoint commit)
rewrites identical bytes over itself and dedups against exactly the
state it saw the first time. Same idempotency argument as
st_wds_export.

Parity contract (tests/test_crawl_stream.py): with a cycle's pending
set in ONE file the pipeline reproduces the batch cycle EXACTLY
(fetched trace rows, skipped set, robots-denied set, seen set, stored
image rows and phashes vs ccbot_spark.oracle.crawl); split across
several files, set-level parity holds (fetched / skipped / seen /
phash sets are batching-invariant — the per-host budget state makes
slot assignment independent of the split); only the within-cycle phash
KEEPER may differ, because arrival order replaces the batch cycle's
global deterministic tie-break — the streaming-native first-wins
semantics, asserted as such. `streaming_crawl` extends the same
assertions across cycles (per-cycle fetched/skipped sets, final seen
set, accumulated phash set vs the multi-cycle oracle).

Scale posture: the stateless gate and the stateful slot counter shuffle
only (host, url) rows — two longs of state per host; fetch/parse/decode
run inside the micro-batch with the SAME salted applyInPandas and
Arrow-batched decode the cycle engine uses, so the per-trigger plan is
the engine's cycle plan, just driven by the streaming scheduler. The
slice joins candidate priorities back from the cycle's pending table
(the frontier-table join a deployment would run); the demo's
generation bookkeeping is driver-side lists sized by the per-cycle
frontier delta — the table-backed form at 10^10 scale is the batch
engine's COW frontier, which remains the primary path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import synthweb, urlkit
from ..operators import fetchparse, images, politeness
from ..oracle import PRIORITY_DECAY, SEED_PRIORITY
from .state import st_host_politeness_state

#: Pending-URL stream schema. ts is the GENERATE candidate order as
#: event time: the stateful politeness op orders each host's candidates
#: by (ts, url_norm), and ts encodes (priority DESC, dt_cycle, dt_seq)
#: — exactly the batch GENERATE order, with the same final url_norm
#: tie-break. That is what makes slot parity with the cycle engine
#: exact. priority rides along for the fetch stage and link decay.
URL_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.LongType(), False),
    ]
)

_EPOCH = 1_600_000_000  # fixed base so event times are deterministic
_M_SEQ = 1 << 14  # dt_seq < 16384
_M_CYC = _M_SEQ * 64  # dt_cycle < 64


def _order_key(priority: int, dt_cycle: int, dt_seq: int) -> int:
    """Integer encoding of the GENERATE candidate order
    (-priority, dt_cycle, dt_seq) — smaller key = earlier candidate."""
    return (SEED_PRIORITY - priority) * _M_CYC + dt_cycle * _M_SEQ + dt_seq


def write_pending_files(
    rows: list[tuple[str, str, int, int, int]],
    in_dir: str,
    n_files: int = 1,
) -> list[str]:
    """rows: (url_norm, host, priority, dt_cycle, dt_seq) → parquet
    files in CONTIGUOUS candidate-order chunks with strictly increasing
    mtimes, so the file source replays them as ordered micro-batches
    (the file stream processes oldest-modification-time first; ordered
    chunks keep every host's within-cycle arrival order equal to the
    batch candidate order, which the slot-parity contract needs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir, exist_ok=True)
    ordered = sorted(
        rows, key=lambda r: (_order_key(r[2], r[3], r[4]), r[0])
    )
    per = (len(ordered) + n_files - 1) // n_files
    paths = []
    for i in range(n_files):
        chunk = ordered[i * per : (i + 1) * per]
        if not chunk:
            continue
        tbl = pa.table(
            {
                "ts": pa.array(
                    [
                        (_EPOCH + _order_key(r[2], r[3], r[4])) * 1_000_000
                        for r in chunk
                    ],
                    pa.timestamp("us"),
                ),
                "url_norm": pa.array([r[0] for r in chunk], pa.string()),
                "host": pa.array([r[1] for r in chunk], pa.string()),
                "priority": pa.array([r[2] for r in chunk], pa.int64()),
            }
        )
        path = os.path.join(in_dir, f"pending-{i:04d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (_EPOCH + i, _EPOCH + i))
        paths.append(path)
    return paths


def write_seed_files(cfg: synthweb.WebConfig, seeds: list[str],
                     in_dir: str, n_files: int = 1) -> list[str]:
    """Cycle-1 pending set from a seed list (priority SEED_PRIORITY,
    discovery time (0, seed index) — the engine's seeding rule)."""
    return write_pending_files(
        [
            (u, urlkit.host_of(u), SEED_PRIORITY, 0, idx)
            for idx, u in enumerate(seeds)
        ],
        in_dir,
        n_files=n_files,
    )


def read_url_events(spark: SparkSession, in_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(URL_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _stored_phash_paths(out_root: str, exclude_slice: str) -> list[str]:
    """Image-slice directories written by slices OTHER than the one
    being (re)processed — the replay-safe dedup baseline. Accumulates
    ACROSS cycles (the store is one table)."""
    img_root = os.path.join(out_root, "images")
    if not os.path.isdir(img_root):
        return []
    return sorted(
        os.path.join(img_root, d)
        for d in os.listdir(img_root)
        if d != exclude_slice
    )


def st_crawl_cycle(
    spark: SparkSession,
    cfg: synthweb.WebConfig,
    in_dir: str,
    out_root: str,
    cycle: int = 1,
):
    """Start one streaming crawl cycle; returns the StreamingQuery
    (callers awaitTermination — tests drive trigger(availableNow)).

    Outputs under out_root, one ``c{cycle}-b{batch_id}`` dir per
    micro-batch slice:
      pages/    (host, url_norm, sched_slot, ok)         fetched slice
      skipped/  (host, url_norm)                         over-budget rows
      links/    (url_norm, parent_priority)              discovered urls
      images/   IMAGE/SAMPLE_EVENTS columns + phash      post-dedup store
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
    # candidate priorities come back from the cycle's own pending table
    # (static read of the same files the stream consumes — the
    # frontier-table join a deployment would run per slice)
    prio_dim = (
        spark.read.schema(URL_EVENTS)
        .parquet(in_dir)
        .select("url_norm", "priority")
    )

    def one_slice(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"c{cycle}-b{batch_id}"
        b = batch_df.persist()
        try:
            b.filter(F.col("over_budget")).select("host", "url_norm").write.mode(
                "overwrite"
            ).parquet(os.path.join(out_root, "skipped", tag))

            sched = (
                b.filter(~F.col("over_budget"))
                .join(F.broadcast(delays), on="host")
                .join(F.broadcast(prio_dim), on="url_norm")
                .select(
                    "url_norm",
                    "host",
                    F.col("priority").cast("long").alias("priority"),
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
                ).parquet(os.path.join(out_root, "pages", tag))

                ok_pages = fetched.filter(F.col("ok") & F.col("redirect").isNull())
                fetchparse.extract_links(ok_pages).groupBy("url_norm").agg(
                    F.max("parent_priority").alias("parent_priority")
                ).write.mode("overwrite").parquet(
                    os.path.join(out_root, "links", tag)
                )

                decoded = images.fetch_decode_phash(
                    fetchparse.extract_images(ok_pages), cfg
                )
                prior = _stored_phash_paths(out_root, tag)
                stored_phashes = (
                    # explicit schema: an all-denied/empty slice writes
                    # a schemaless (part-file-free) directory
                    spark.read.schema("phash long").parquet(*prior)
                    if prior
                    else spark.createDataFrame([], "phash long")
                )
                res = images.dedup_by_phash(decoded, stored_phashes)
                # event time: one tumbling-window minute per slice (the
                # downstream profile stream groups by this window)
                res["store"].withColumn(
                    "ts",
                    F.timestamp_seconds(
                        F.lit(_EPOCH + (cycle * 1000 + int(batch_id)) * 60)
                    ),
                ).select(
                    "ts", "image_id", "bytes", "w", "h", "fmt",
                    "caption", "phash",
                ).write.mode("overwrite").parquet(
                    os.path.join(out_root, "images", tag)
                )
            finally:
                fetched.unpersist()
        finally:
            b.unpersist()

    return (
        annotated.writeStream.foreachBatch(one_slice)
        .option(
            "checkpointLocation", os.path.join(out_root, "ckpt", f"c{cycle}")
        )
        .trigger(availableNow=True)
        .start()
    )


def streaming_crawl(
    spark: SparkSession,
    cfg: synthweb.WebConfig,
    seeds: list[str],
    work_root: str,
    cycles: int,
    n_files: int = 1,
) -> str:
    """Continuous streaming crawl: chain `cycles` streaming cycles,
    feeding each cycle's budget-skipped candidates (original priority +
    discovery keys) and newly discovered links (max-parent priority −
    PRIORITY_DECAY, discovery time (cycle, 0), deduped against the seen
    set) into the next cycle's pending files — the batch engine's
    frontier-update rule. Returns out_root (all cycles' slices)."""
    out_root = os.path.join(work_root, "out")
    pending = [
        (u, urlkit.host_of(u), SEED_PRIORITY, 0, idx)
        for idx, u in enumerate(seeds)
    ]
    seen = {u for u, *_ in pending}
    for cycle in range(1, cycles + 1):
        if not pending:
            break
        in_dir = os.path.join(work_root, f"in_c{cycle}")
        write_pending_files(pending, in_dir, n_files=n_files)
        q = st_crawl_cycle(spark, cfg, in_dir, out_root, cycle=cycle)
        q.awaitTermination()

        def _slices(sub):
            root = os.path.join(out_root, sub)
            return sorted(
                os.path.join(root, d)
                for d in os.listdir(root)
                if d.startswith(f"c{cycle}-")
            )

        skipped = {
            r.url_norm
            for p in _slices("skipped")
            for r in spark.read.schema("host string, url_norm string")
            .parquet(p)
            .collect()
        }
        carry = [row for row in pending if row[0] in skipped]
        link_paths = _slices("links")
        discovered: dict[str, int] = {}
        if link_paths:
            for r in (
                spark.read.schema("url_norm string, parent_priority long")
                .parquet(*link_paths)
                .groupBy("url_norm")
                .agg(F.max("parent_priority").alias("p"))
                .collect()
            ):
                if r.url_norm not in seen:
                    discovered[r.url_norm] = int(r.p)
        fresh = [
            (
                u,
                urlkit.host_of(u),
                max(discovered[u] - PRIORITY_DECAY, 0),
                cycle,
                0,
            )
            for u in sorted(discovered)
        ]
        seen.update(discovered)
        pending = carry + fresh
    return out_root
