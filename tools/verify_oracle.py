"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark at sf0.01 and compare against
oracle_sql() in DuckDB — row count, column-name set, and
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def norm_val(v):
    # Unwrap numpy scalars/arrays (fetchdf path) to Python types first, so a
    # DuckDB HUGEINT column (rendered float64 by fetchdf) normalizes as a
    # float and MISmatches a Spark int64 — exactly like the driver's hash.
    if type(v).__module__ == "numpy":
        v = v.tolist() if hasattr(v, "ndim") and getattr(v, "ndim", 0) else v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("verify-oracle")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # release the previous query's plan caches (dedup band/shingle
        # tables, sequencing materializations) — entry-module contract:
        # callers running many queries clear between batches
        entrymod.clear_caches()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if len(srows) >= 0 else "??"
            print(f"{status}  {name}: {len(srows)} rows  [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.execute(oracles[name])
            # fetchdf(), not fetchall(): the driver hashes dataframe values,
            # so dtype artifacts (HUGEINT -> float64) must fail here too.
            ddf = rel.fetchdf()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        float_cols = [c for c, dt in ddf.dtypes.items() if dt.kind == "f"]
        int_spark = {f.name for f in sdf.schema.fields
                     if f.dataType.typeName() in ("long", "integer", "short", "byte")}
        suspect = sorted(set(float_cols) & int_spark)
        if suspect:
            problems.append(
                f"oracle dtype float where Spark is int (HUGEINT? wrap in "
                f"CAST(... AS BIGINT)): {suspect}")
        # Raw DATE/TIMESTAMP outputs normalize differently between
        # fetchdf (pd.Timestamp '1995-01-01 00:00:00') and Spark
        # (datetime.date '1995-01-01') — the repo discipline is to
        # output strftime strings or epoch micros instead; flag early.
        dt_cols = sorted(c for c, dt in ddf.dtypes.items() if dt.kind == "M")
        if dt_cols:
            problems.append(
                f"date/timestamp-typed oracle columns {dt_cols}: output "
                f"strftime strings or epoch microseconds instead "
                f"(fetchdf vs Spark stringify these differently)")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            a = norm_rows(scols, [tuple(r) for r in srows])
            b = norm_rows(dcols, drows)
            if a != b:
                diff = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows  [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
