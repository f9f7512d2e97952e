"""Scalable global sequence numbering (SURVEY.md §2.5 w_global_order,
engine trace sequencing §3.1 step 7).

A `Window.orderBy(...)` with no partitionBy funnels every row through a
single task — fine for a post-filtered top-k, fatal for a cycle trace
that can emit 10^8 events at 100 TB scale. This operator assigns the
exact same sequence numbers with two phases, never collapsing to one
partition:

  1. range-partition + sort the rows by the explicit key columns, so
     partition p holds a contiguous, locally-sorted key range;
  2. count rows per partition (bounded driver collect: one long per
     partition), prefix-sum the counts into per-partition offsets, and
     broadcast-join the offsets back;
  3. seq = partition_offset + (row_number within partition) - 1.

Determinism requires the key tuple to be UNIQUE per row (the engine's
trace key (phase, sched_time, host, url_norm) is — each url appears at
most once per phase). Range boundaries may differ across parallelism,
but ranges are disjoint and the local sort is total, so the global
numbering is a pure function of the key order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def global_sequence(
    df: DataFrame,
    keys: list,
    num_partitions: int,
    seq_col: str = "seq",
    offset: int = 0,
) -> tuple[DataFrame, int, DataFrame]:
    """Number `df` rows 0..n-1 (+offset) in `keys` order without a
    single-partition exchange. `keys` entries are column names or sort
    Columns (e.g. ``F.col("x").desc()``) — range partitioning honors
    the sort direction, so partition ids ascend in output order either
    way.

    Returns (numbered_df, total_rows, cached_handle); the caller
    unpersists `cached_handle` when done with `numbered_df` (the count
    pass materializes the cache, so the numbering pass never re-runs
    the upstream lineage).
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ev = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["n"] for r in ev.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    total = int(sum(counts.values()))
    offs, acc = [], offset
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    if offs:
        off_df = spark.createDataFrame(offs, "_pid int, _off long")
    else:
        off_df = spark.createDataFrame([], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        ev.join(F.broadcast(off_df), "_pid")
        .withColumn(seq_col, (F.col("_off") + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid", "_off")
    )
    return out, total, ev


def global_running_total(
    df: DataFrame,
    keys: list,
    val_col: str,
    num_partitions: int,
    out_col: str = "run_total",
) -> tuple[DataFrame, int, DataFrame]:
    """Running SUM(val_col) over the GLOBAL `keys` order — the same
    number ``SUM(v) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)``
    assigns — without collapsing to one partition.  Same two-phase
    shape as :func:`global_sequence`: range-partition + local sort,
    per-partition partial sums (one long per partition collected),
    prefix-summed offsets broadcast back, within-partition cumulative
    window on top.  Inclusive of the current row; `keys` must be a
    unique tuple per row for the order (hence the result) to be
    well-defined.

    Returns ``(df_with_out_col, grand_total, cached_handle)``; the
    caller unpersists `cached_handle` when done (the partial-sum pass
    materializes it so the window pass never recomputes upstream).
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ev = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    parts = {
        r["_pid"]: r["s"]
        for r in ev.groupBy("_pid")
        .agg(F.sum(F.col(val_col).cast("long")).alias("s"))
        .collect()
    }
    offs, acc = [], 0
    for pid in sorted(parts):
        offs.append((pid, acc))
        acc += int(parts[pid] or 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs or [], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ev.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            (F.col("_off") + F.sum(F.col(val_col).cast("long")).over(w)).cast(
                "long"
            ),
        )
        .drop("_pid", "_off")
    )
    return out, acc, ev


def exact_quantiles(
    df: DataFrame,
    val_col: str,
    p_bps: tuple[int, ...] = (5000, 9000, 9900, 9990),
    num_partitions: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """EXACT discrete percentiles of one column — SQL percentile_disc
    semantics (the value at 1-based sorted position ceil(p·n), which
    DuckDB's native quantile_disc implements) — without
    percentile_approx's wrong-by-design sketch answer and without the
    single-partition global sort that dies at 10^10 rows.

    Two-phase: global_sequence range-partitions + locally sorts the
    values and broadcasts per-partition prefix offsets (one long per
    partition on the driver), then the target ranks — computed in
    INTEGER arithmetic, rank_p = ⌈p_bp·n / 10^4⌉ = (p_bp·n + 9999)
    div 10^4 — broadcast-join against the numbered rows. Ties are
    harmless: the VALUE at a global rank is well-defined whatever
    order tied rows take. p99.9 of fetch latency / body bytes over a
    full crawl is this exact query.

    Returns (DF[p_bp, value, n_rows], cached_handle) — the caller
    unpersists the handle when done (global_sequence contract)."""
    numbered, n, handle = global_sequence(
        df.select(F.col(val_col).alias("v")), ["v"], num_partitions
    )
    spark = df.sparkSession
    tgt = [(int(p), max(1, (int(p) * n + 9999) // 10_000)) for p in p_bps]
    tdf = spark.createDataFrame(tgt, "p_bp long, rn long")
    out = (
        numbered.join(F.broadcast(tdf), F.col("seq") == F.col("rn") - 1)
        .select(
            "p_bp",
            F.col("v").alias("value"),
            F.lit(n).cast("long").alias("n_rows"),
        )
    )
    return out, handle


def grouped_rank(
    df: DataFrame,
    group: list[str],
    order: str,
    buckets: int = 256,
    out_col: str = "grank",
) -> DataFrame:
    """Exact 0-based rank WITHIN each group by a hex-digest order
    column, without ever giving one group to one window task — the
    per-group sibling of global_sequence, for ranks keyed on a skewed
    group (a 10^7-image host) where `Window.partitionBy(group)` would
    funnel. Requires `order` to be a hex string (md5-style) unique per
    row within its group.

    Bucket = the first two hex chars of the order value, i.e. a PREFIX
    of the sort key — so ordering by bucket then order is ordering by
    order, and rank decomposes exactly:

      1. per-(group, bucket) counts: one map-side-combinable hash-agg
         (≤ `buckets` rows per group, whatever the group's size);
      2. per-group prefix sums over those ≤ `buckets` rows (a window
         bounded by the bucket COUNT, not the group size);
      3. rank = bucket offset + row_number within (group, bucket) — a
         hot group spreads over `buckets` window partitions.
    """
    b = F.conv(F.substring(F.col(order), 1, 2), 16, 10).cast("int")
    base = df.withColumn("_gb", b)
    counts = base.groupBy(*group, "_gb").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(*group)
        .orderBy("_gb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).drop("_n")
    w_in = Window.partitionBy(*group, "_gb").orderBy(F.col(order))
    return (
        base.join(offsets, [*group, "_gb"])
        .withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(w_in) - 1).cast("long"),
        )
        .drop("_gb", "_off")
    )
