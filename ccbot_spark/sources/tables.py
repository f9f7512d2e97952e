"""Sources (SURVEY.md §2.1): parquet test tables, seed lists, frontier.

`src_parquet` is the generic scan used by every verification query —
a plain `spark.read.parquet` so Catalyst keeps predicate pushdown,
column pruning, and partition pruning (the scan shows `PushedFilters`
/ `ReadSchema` in `.explain`; see plans/explainkit.py for the check).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def src_parquet(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Generic parquet scan (§2.1 src_parquet)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: src_parquet(spark, sf_dir, t) for t in TABLES}


def src_seed(spark: SparkSession, path: str) -> DataFrame:
    """Seed-list ingest (§2.1 src_seed): one URL per line →
    DF[url, priority, discovery_time-as-line-number]. The line number
    (deterministic via zipWithIndex on the text source, which preserves
    file order) is the seed's dt_seq — never wall clock (§7.5)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = rdd.toDF(["url", "seed_idx"])
    return df.filter(F.trim("url") != "").select(
        F.trim("url").alias("url"),
        F.lit(1000).cast("long").alias("priority"),
        F.col("seed_idx").cast("long").alias("dt_seq"),
    )
