"""Z-order (Morton-curve) file-layout planning for two-dimension data
skipping — the Iceberg/Delta sort-order story for the crawl store.

A 100 TB image+caption table is queried by BOTH host bucket (politeness
replays, per-site audits) and time bucket (incremental exports,
recrawl windows). Range-clustering on either key alone makes the other
key's predicates scan every file: file min/max stats on the sort key
are selective, stats on the orthogonal key cover the full domain in
every file. Interleaving the two keys' bits onto a Morton (Z-order)
curve bounds each file to a small rectangle of the (a, b) grid, so
min/max stats prune on BOTH dimensions at once — a predicate touching
1/k of either axis touches ~1/k of the files instead of all of them.

Scale shape:
  * the Morton key is a pure JVM integer expression — ``bits``
    shift-mask-shift terms per dimension summed over disjoint bit
    positions (sum == bitwise-OR there), inside whole-stage codegen;
    no UDF, no Python;
  * file assignment is the exact global rank along the curve divided
    by the target rows-per-file, computed with the two-phase
    sequencing.global_sequence (range-partition + per-partition
    offsets) — never a single-partition window;
  * the emitted plan is per-FILE (id, row count, z/a/b min-max), i.e.
    output cardinality ~ n_rows / rows_per_file — the driver only ever
    sees the bounded stats rows, like Iceberg's manifest metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit i of `a` lands at position 2i, bit i of `b`
    at 2i+1. Built as a static sum of 2*bits disjoint-bit terms so the
    whole expression stays in one codegen stage. Callers bucket raw
    keys into [0, 2^bits) first — Z-ordering cares about locality, not
    exact values."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def plan_zorder_files(
    df: DataFrame,
    a: Column,
    b: Column,
    tiebreak: str,
    rows_per_file: int,
    bits: int = 16,
    num_partitions: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Assign every row a file id by exact global rank along the
    Z-curve (seq // rows_per_file) and emit the per-file stats plan:
    (file_id, n_rows, zmin, zmax, amin, amax, bmin, bmax). The a/b
    min-max columns ARE the data-skipping stats a reader consults.

    Returns (plan_df, cache); the caller unpersists `cache` after
    consuming plan_df (global_sequence materializes its range layout).
    """
    from ccbot_spark.operators import sequencing

    keyed = df.select(
        F.col(tiebreak),
        a.cast("long").alias("a"),
        b.cast("long").alias("b"),
    ).withColumn("zval", zorder_key(F.col("a"), F.col("b"), bits))
    numbered, _total, cache = sequencing.global_sequence(
        keyed, ["zval", tiebreak], num_partitions
    )
    plan = (
        numbered.withColumn(
            "file_id", (F.col("seq") / rows_per_file).cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zval").alias("zmin"),
            F.max("zval").alias("zmax"),
            F.min("a").alias("amin"),
            F.max("a").alias("amax"),
            F.min("b").alias("bmin"),
            F.max("b").alias("bmax"),
        )
    )
    return plan, cache
