"""Text-analysis functions for a training-data pipeline over the
`documents` table: token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Everything except the fingerprint is pure JVM-side column expressions
(whole-stage codegen, no Python hop) so the hot path scales to 100 TB
of documents as a single scan + project. The fingerprint is the one
Arrow-batched pandas_udf (rolling hash has no Spark built-in).

Integer-first outputs: counts, not ratios, so the DuckDB oracle can
compare values exactly with no float-representation hazards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Closed stopword list shared with the oracle SQL (keep sorted; any
# change must be mirrored in __spark_entry__.oracle_sql).
STOPWORDS = ("a", "and", "for", "in", "is", "it", "of", "on", "the", "to")

FP_MOD = (1 << 61) - 1  # Mersenne prime 2^61-1
FP_BASE = 257


def tokens(text_col: Column) -> Column:
    """Whitespace tokens (single-space split — mirrors the oracle's
    string_split(text, ' ') exactly, including empty tokens)."""
    return F.split(text_col, " ")


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def stopword_count(text_col: Column) -> Column:
    toks = tokens(F.lower(text_col))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def punct_count(text_col: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))


def quality_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality-scoring projection: integer counts a downstream filter
    thresholds on (length / stopword / punctuation ratios in exact
    integer form: ratio tests become cross-multiplications)."""
    c = F.col(text)
    return df.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars_q"),
        token_count(c).cast("long").alias("n_tokens"),
        stopword_count(c).cast("long").alias("n_stopwords"),
        punct_count(c).cast("long").alias("n_punct"),
        F.size(F.array_distinct(tokens(F.lower(c)))).cast("long").alias("n_distinct_tokens"),
    )


def langid(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-ratio language-ID heuristic: predict 'en' when
    stopwords are ≥ 5% of tokens (exact integer test: 20*stop >= tok).
    A real system would use n-gram profiles per language; the Spark
    shape (scan → project → filter, zero shuffles) is identical."""
    c = F.col(text)
    pred = F.when(
        stopword_count(c) * 20 >= token_count(c), F.lit("en")
    ).otherwise(F.lit("other"))
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_tagged"),
        pred.alias("lang_pred"),
    )


@F.pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash of UTF-8 bytes mod 2^61-1 (document
    fingerprint). Arrow-batched; numpy Horner evaluation per string.
    Value range [0, 2^61) so it always fits LongType."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        h = 0
        if s is not None:
            for b in s.encode("utf-8"):
                h = (h * FP_BASE + b) % FP_MOD
        out[i] = h
    return pd.Series(out)


def fingerprint_py(s: str) -> int:
    """Pure-Python reference for fingerprint_udf (property tests)."""
    h = 0
    for b in s.encode("utf-8"):
        h = (h * FP_BASE + b) % FP_MOD
    return h


def vocab_topk(df: DataFrame, k: int = 30, text: str = "text") -> DataFrame:
    """Corpus vocabulary head: top-k tokens by occurrence count with
    document frequency — the first statistic any tokenizer/BPE build
    reads off a corpus. One explode + one hash-agg; the top-k is a
    TakeOrdered (no global sort materialization). Deterministic total
    order: (n_occurrences DESC, tok) — tok is unique per group, so the
    LIMIT never ties."""
    toks = df.select(
        "doc_id", F.explode(tokens(F.lower(F.col(text)))).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), "tok")
        .limit(k)
    )
