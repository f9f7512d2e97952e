"""Explicit release of localCheckpoint storage.

``DataFrame.localCheckpoint()`` truncates lineage by persisting the
physical RDD (MEMORY_AND_DISK) — but ``DataFrame.unpersist()`` does NOT
release those blocks: it only uncaches through the SQL cache manager,
and a checkpoint's RDD was persisted at the RDD layer, below it
(verified empirically: after ``df.localCheckpoint(); df.unpersist()``
the RDD still sits in ``sc.getPersistentRDDs``). Without explicit
release, every iterative operator round (PageRank, connected
components, the engine's per-cycle Bloom-shard merges) leaks one
materialized RDD into executor storage for the lifetime of the session
— exactly the accumulated pressure that contaminated the round-3
driver bench.

The fix: track the RDD ids a checkpoint creates (driver-side diff of
``getPersistentRDDs`` around the call — safe in the single-threaded
contexts all our iterative loops run in) and unpersist them through
their JavaRDD handles when the round/owner is done with them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_IDS_ATTR = "_ccbot_ckpt_rdd_ids"


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently persisted in this SparkContext."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids, blocking: bool = False) -> None:
    """Release persisted RDDs by id via their JavaRDD handles (the only
    route that works for localCheckpoint blocks)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(blocking)


def local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` (eager) with the created RDD ids
    recorded on the returned DataFrame, so :func:`release` can free the
    blocks deterministically. Must be called from a single driver
    thread (the id diff would misattribute ids under concurrent
    persistence)."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    out = df.localCheckpoint()
    setattr(out, _IDS_ATTR, persistent_rdd_ids(spark) - before)
    return out


def release(df: DataFrame | None) -> None:
    """Free a tracked checkpoint's blocks (no-op for None or frames
    without tracking info; also runs the regular unpersist for frames
    cached through the SQL layer). After release the frame is
    unusable — lineage was truncated, so nothing can recompute it."""
    if df is None:
        return
    ids = getattr(df, _IDS_ATTR, None)
    if ids:
        unpersist_rdd_ids(df.sparkSession, ids)
        setattr(df, _IDS_ATTR, set())
    else:
        df.unpersist()
