"""Executor-storage hygiene: iterative operators must not leak
localCheckpoint blocks into the session (the round-3 driver-bench
contamination). DataFrame.unpersist() is a NO-OP for checkpoint
storage — only storagekit's JavaRDD-handle release frees it — so these
tests assert directly on sc.getPersistentRDDs().
"""

from __future__ import annotations

import pytest

from ccbot_spark import storagekit
from ccbot_spark.functions import dedup, linkrank


def _n_persistent(spark) -> int:
    return len(storagekit.persistent_rdd_ids(spark))


def test_unpersist_is_noop_for_local_checkpoint(spark):
    """The premise: without storagekit, checkpoint blocks leak."""
    before = storagekit.persistent_rdd_ids(spark)
    ck = spark.range(64).localCheckpoint()
    ck.count()
    ck.unpersist()  # SQL-layer uncache: does not touch checkpoint blocks
    leaked = storagekit.persistent_rdd_ids(spark) - before
    assert leaked, "premise changed: plain unpersist now frees checkpoints"
    storagekit.unpersist_rdd_ids(spark, leaked)
    assert not (storagekit.persistent_rdd_ids(spark) - before)


def test_tracked_checkpoint_releases(spark):
    before = storagekit.persistent_rdd_ids(spark)
    ck = storagekit.local_checkpoint(spark.range(64))
    assert ck.count() == 64
    assert storagekit.persistent_rdd_ids(spark) - before
    storagekit.release(ck)
    assert not (storagekit.persistent_rdd_ids(spark) - before)


def test_pagerank_releases_all_storage(spark):
    """pagerank_int frees every intermediate round's blocks itself and
    registers only the final ranks, freed by clear_caches()."""
    linkrank.clear_caches()
    dedup.clear_caches()
    base = storagekit.persistent_rdd_ids(spark)
    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(200)], "src long, dst long"
    )
    ranks = linkrank.pagerank_int(edges, iterations=4)
    assert ranks.count() > 0
    held = storagekit.persistent_rdd_ids(spark) - base
    # only the final ranks checkpoint may remain resident
    assert len(held) <= 1, held
    linkrank.clear_caches()
    assert not (storagekit.persistent_rdd_ids(spark) - base)


def test_components_release_all_storage(spark):
    dedup.clear_caches()
    linkrank.clear_caches()
    base = storagekit.persistent_rdd_ids(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 2)] + [(1, 40), (3, 41)],
        "doc_a long, doc_b long",
    )
    labels = dedup.connected_components(pairs)
    assert labels.count() > 0
    held = storagekit.persistent_rdd_ids(spark) - base
    assert len(held) <= 1, held  # the final labels checkpoint only
    dedup.clear_caches()
    assert not (storagekit.persistent_rdd_ids(spark) - base)


def test_entry_clear_caches_empties_storage(spark, sf_dir):
    """Session-hygiene gate for the bench harness: after the heavy
    iterative queries run and clear_caches() is called, NO persisted
    RDD this test created survives — the exact condition whose
    violation contaminated BENCH_r03's crawl timing."""
    import __spark_entry__ as entry

    entry.clear_caches()
    base = storagekit.persistent_rdd_ids(spark)
    qs = entry.queries()
    for name in ("dedup_components", "link_pagerank", "dedup_keep_best"):
        assert qs[name](spark, sf_dir).count() >= 0
    entry.clear_caches()
    assert not (storagekit.persistent_rdd_ids(spark) - base)
