"""Shared helpers for the per-domain query registry modules.

Moved verbatim from __spark_entry__.py in the round-5 registry split;
the driver-facing surface (entry/queries/oracle_sql/clear_caches) is
still __spark_entry__.py, which re-exports everything here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccbot_spark.functions import textkit
from ccbot_spark.sources.tables import src_parquet


# Caches created inside queries() plans that must stay alive until the
# returned DataFrame is consumed. sequencing.global_sequence computes
# per-partition offsets from its cached materialization; if the cache
# were released at plan-construction time, a re-executed
# repartitionByRange could sample different range boundaries (its
# sampling seed depends on the fresh RDD id) and the recomputed layout
# would silently shift every seq. Callers running many queries in one
# session call clear_caches() between batches (tools/verify_oracle.py
# and bench.py do); the driver gate runs each query once.
_ACTIVE_CACHES: list[DataFrame] = []


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # make ccbot_spark importable on executor Python workers (several
    # queries carry pandas-UDF closures referencing the package) no
    # matter what cwd/PYTHONPATH the driver session was built with
    from ccbot_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    return src_parquet(spark, sf_dir, name)


def _cents(col):
    """Exact integer cents from a double money column — deterministic
    across engines (double arithmetic is identical; the sum is then an
    order-independent integer sum)."""
    return F.round(col * 100, 0).cast("long")


def _doc_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL column synthesized from `documents` (the
    driver tables carry no URLs; both sides build the same strings)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


def _mixed_scheme_urls(events: DataFrame) -> DataFrame:
    """URL list with non-fetchable schemes mixed in (from `events`)."""
    scheme = (
        F.when(F.col("event_id") % 4 == 0, F.lit("mailto:u@example.com"))
        .when(F.col("event_id") % 4 == 1, F.lit("javascript:void(0)"))
        .otherwise(
            F.concat(
                F.lit("https://h"), (F.col("event_id") % 7).cast("string"),
                F.lit(".test/p/"), F.col("event_id").cast("string"),
            )
        )
    )
    return events.select("event_id", scheme.alias("url"))


# --------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------

def q_a_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation (the a_metrics shape: partial+final
    hash aggregate, one shuffle on the two grouping keys)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            F.sum(
                _cents(F.col("l_extendedprice")) - _cents(F.col("l_discount") * 100)
            ).alias("sum_disc_expr_cents"),
            F.count("*").alias("n_rows"),
        )
    )


def _sql_h64(expr: str) -> str:
    """DuckDB: first 8 bytes of md5(expr) as a HUGEINT in [0, 2^64) —
    Horner fold over the 16 hex chars; mirrors dedup._h64 (Spark
    conv(substr(md5(x),1,16),16,10)) and the python references'
    int.from_bytes(md5(s).digest()[:8], 'big')."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}),1,16), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT)), "
        "(a,b) -> a*16 + b)"
    )


# exact double cosine, same fold order as the Spark side
_COS = (
    "list_sum(list_transform(generate_series(1, len(a.emb)), "
    "i -> a.emb[i] * b.emb[i])) / "
    "(sqrt(list_sum(list_transform(a.emb, x -> x*x))) * "
    "sqrt(list_sum(list_transform(b.emb, x -> x*x))))"
)
_EMB_D = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"


# --------------------------------------------------------------------
# oracle SQL (DuckDB dialect; same tables pre-registered as views)
# --------------------------------------------------------------------

_STOP_SQL = "('" + "','".join(textkit.STOPWORDS) + "')"

# shared SQL fragments -------------------------------------------------
_DOC_URLS = (
    "SELECT doc_id, 'https://' || source || '.example.com/d/' || "
    "CAST(doc_id AS VARCHAR) AS url FROM documents"
)
_MIXED_URLS = (
    "SELECT event_id, CASE "
    "WHEN event_id % 4 = 0 THEN 'mailto:u@example.com' "
    "WHEN event_id % 4 = 1 THEN 'javascript:void(0)' "
    "ELSE 'https://h' || CAST(event_id % 7 AS VARCHAR) || '.test/p/' || "
    "CAST(event_id AS VARCHAR) END AS url FROM events"
)
# distinct word-3-gram shingles per doc (single-space split), matching
# ccbot_spark.functions.dedup.shingles exactly
_SHINGLES = (
    "SELECT doc_id, unnest(list_distinct(list_transform("
    "generate_series(1, len(string_split(text,' ')) - 2), "
    "i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))) AS shingle "
    "FROM documents WHERE len(string_split(text,' ')) >= 3"
)


# conv(substr(md5(key),1,15),16,10) % mod (60 bits — BIGINT-safe
# Horner fold here, no HUGEINT needed)
def _sql_hmod(expr: str, mod: int) -> str:
    return (
        f"(list_reduce(list_transform(string_split(substr(md5({expr}),1,15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        f"(a,b) -> a*16 + b) % {mod})"
    )


def _sql_h60(expr: str) -> str:
    """Raw 60-bit md5 fold (the un-modded _sql_hmod): mirrors Spark
    conv(substr(md5(x),1,15),16,10) cast long — fits BIGINT exactly."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}),1,15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        "(a,b) -> a*16 + b)"
    )
