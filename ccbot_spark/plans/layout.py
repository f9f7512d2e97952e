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


def column_stats(df: DataFrame, cols) -> DataFrame:
    """Iceberg-manifest-style column statistics in ONE scan: per
    column, (n_rows, n_nulls, exact ndv, min, max) plus the
    dictionary-encoding recommendation (ndv·10 ≤ n_rows → 'dict').
    This is the writer-side metadata a 100 TB table's readers live
    off — min/max drive file skipping, ndv drives encoding choice and
    join-size estimation, null counts drive IS NULL pruning.

    `cols` is a list of (name, Column) pairs, so derived stats columns
    (e.g. exact integer cents for a money double) ride the same pass.
    Shape: one aggregate row (COUNT + 4 aggregates per column — the
    multi-distinct expand is the standard price of exact ndv; swap in
    approx_count_distinct at the 10^12-row tier), exploded to one row
    per column. min/max are computed in the column's NATIVE order and
    stringified after (a string-side min would order "10" < "9")."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, c in cols:
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"_nn_{name}"),
            F.countDistinct(c).alias(f"_ndv_{name}"),
            F.min(c).cast("string").alias(f"_min_{name}"),
            F.max(c).cast("string").alias(f"_max_{name}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("col_name"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"_nn_{name}").cast("long").alias("n_nulls"),
            F.col(f"_ndv_{name}").cast("long").alias("ndv"),
            F.col(f"_min_{name}").alias("min_val"),
            F.col(f"_max_{name}").alias("max_val"),
        )
        for name, _ in cols
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .withColumn(
            "encoding",
            F.when(F.col("ndv") * 10 <= F.col("n_rows"), F.lit("dict"))
            .otherwise(F.lit("plain")),
        )
    )
