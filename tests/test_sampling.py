"""Deterministic sampling / quota operators (functions/sampling.py):
selection must be a pure function of the data — stable across
partitionings — with per-group caps honoring their explicit order key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccbot_spark.functions import sampling, textkit


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_deterministic_across_partitionings(docs):
    a = {r.doc_id for r in sampling.hash_sample(docs.repartition(2), "doc_id", 10).collect()}
    b = {r.doc_id for r in sampling.hash_sample(docs.repartition(16), "doc_id", 10).collect()}
    assert a == b and len(a) > 0


def test_hash_sample_rate_roughly_holds(docs):
    n = docs.count()
    got = sampling.hash_sample(docs, "doc_id", 10).count()
    assert 0.03 * n < got < 0.25 * n  # ~10% with small-n slack


def test_stratified_rates_and_dropped_strata(docs):
    out = sampling.stratified_sample(
        docs, "lang", "doc_id", rates={"en": 20, "zh": 100}
    )
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) <= {"en", "zh"}  # absent strata dropped entirely
    n_zh = docs.filter(F.col("lang") == "zh").count()
    assert per.get("zh") == n_zh  # rate 100/100 keeps everything
    n_en = docs.filter(F.col("lang") == "en").count()
    assert per.get("en", 0) < n_en * 0.5


def test_group_cap_bounds_and_order(docs):
    capped = sampling.group_cap(docs, "source", order_by=["doc_id"], k=3)
    per = capped.groupBy("source").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    )
    assert per.filter(F.col("n") > 3).count() == 0
    # the keeper set is the k LOWEST doc_ids per source, not arbitrary
    mins = (
        docs.groupBy("source")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select("source", F.expr("ids[2]").alias("third"))
    )
    joined = per.join(mins, "source").filter(F.col("n") == 3)
    assert joined.filter(F.col("mx") != F.col("third")).count() == 0


def test_vocab_topk_deterministic(docs):
    a = textkit.vocab_topk(docs.repartition(2), k=10).collect()
    b = textkit.vocab_topk(docs.repartition(16), k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10
