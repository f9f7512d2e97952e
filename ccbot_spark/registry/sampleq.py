"""Deterministic sampling / quotas: hash-Bernoulli,
train/val/test split, stratified rates, per-source caps."""
# Split from __spark_entry__.py (round 5): driver-facing surface
# (entry/queries/oracle_sql/clear_caches) unchanged; this module
# contributes its domain's entries via register()/register_sql().
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ccbot_spark.functions import (  # noqa: F401
    dedup,
    eventops,
    linkrank,
    multimodal,
    sampling,
    similarity,
    textkit,
)
from ccbot_spark.operators import urlops  # noqa: F401
from ccbot_spark.registry.common import (  # noqa: F401
    _ACTIVE_CACHES,
    _COS,
    _DOC_URLS,
    _EMB_D,
    _MIXED_URLS,
    _SHINGLES,
    _STOP_SQL,
    _sql_h60,
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _sql_hmod,
    _t,
    q_a_metrics,
)


def register(q):

    # ---------------- deterministic sampling / quotas (corpus curation;
    # functions/sampling.py — hash-of-key selection, reproducible by
    # an independent engine, unlike df.sample's partition-seeded RNG)
    def sample_hash(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return sampling.hash_sample(d, "doc_id", pct=10).select(
            "doc_id", "lang", "source", "n_chars"
        )
    q["sample_hash"] = sample_hash

    def sample_split(spark, sf_dir):
        # deterministic train/val/test assignment: stable under corpus
        # growth (depends only on the row's own key hash), zero
        # shuffle, the same md5 bucket construction as sample_hash.
        d = _t(spark, sf_dir, "documents")
        return sampling.hash_split(d, "doc_id").select(
            "doc_id", "split_bucket", "split"
        )
    q["sample_split"] = sample_split

    def sample_epoch_shuffle(spark, sf_dir):
        # WebDataset-style per-epoch shuffle plan: seeded shard-order
        # permutation × seeded within-shard permutation — a fresh
        # reproducible global permutation per epoch with NO global
        # sort (within-shard windows bounded by shard size, shard
        # order by shard count). All ranks are md5-keyed row_numbers,
        # so DuckDB replays every slot exactly.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
        base = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
                "image_id"
            ),
            (F.col("doc_id") % 16).cast("int").alias("shard"),
        )
        return sampling.epoch_shuffle_plan(base, epochs=3)
    q["sample_epoch_shuffle"] = sample_epoch_shuffle

    def sample_batch_plan(spark, sf_dir):
        # contrastive batches with no same-host negatives: stripe
        # batch = (md5(host) + per-host seeded rank) mod 12; ranks
        # come from the skew-safe grouped_rank (md5-prefix buckets),
        # hosts of 13+ members exercise the overflow flag. DuckDB
        # replays rank + stripe with a plain per-host window.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
        base = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
                "image_id"
            ),
            F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string")).alias(
                "host"
            ),
        )
        return sampling.contrastive_batch_plan(base, n_batches=12)
    q["sample_batch_plan"] = sample_batch_plan

    def sample_curriculum(spark, sf_dir):
        # curriculum schedule: epoch e of 4 keeps the top
        # ceil(n·(e+1)/4) docs by (n_chars DESC, doc_id) — exact
        # global rank via the two-phase global_sequence, one ranking
        # pass serving all epochs.
        d = _t(spark, sf_dir, "documents")
        plan, cache = sampling.curriculum_plan(
            d, epochs=4, quality="n_chars", key="doc_id"
        )
        _ACTIVE_CACHES.append(cache)
        return plan
    q["sample_curriculum"] = sample_curriculum

    def sample_reservoir(spark, sf_dir):
        # fixed-SIZE uniform sample (vs sample_hash's fixed rate): the
        # 100 smallest md5('rs:'||doc_id) — reservoir-sample
        # distribution, executed as TakeOrdered (per-partition heads +
        # one 100-row driver merge, never a global sort).
        d = _t(spark, sf_dir, "documents")
        return sampling.reservoir_sample(
            d.select("doc_id", "lang", "source"), n=100
        )
    q["sample_reservoir"] = sample_reservoir

    def sample_weighted(spark, sf_dir):
        # fixed-size probability-proportional-to-length sample
        # (sequential Poisson / priority sampling): the 60 smallest
        # md5-uniform / n_chars priorities. Longer docs draw smaller
        # priorities, so selection skews toward length — the
        # token-budget-aware cousin of sample_reservoir, still fully
        # deterministic and TakeOrdered-mergeable.
        d = _t(spark, sf_dir, "documents")
        return sampling.weighted_sample(
            d.select("doc_id", "lang", "source", "n_chars"),
            n=60,
            weight="n_chars",
        )
    q["sample_weighted"] = sample_weighted

    def sample_bootstrap(spark, sf_dir):
        # bootstrap replicate planning (Bag-of-Little-Bootstraps-style
        # subsampling for variance estimates over corpus metrics): 8
        # replicates, each the deterministic 63%-rate md5 draw keyed
        # ('bs'||replicate||':'||doc_id) — replicates are independent
        # redraws, rows explode from a literal replicate array (no
        # shuffle; the filter is one hash expr per row).
        d = _t(spark, sf_dir, "documents")
        reps = d.select(
            "doc_id",
            F.explode(F.array(*[F.lit(r) for r in range(8)])).alias(
                "replicate"
            ),
        )
        key = F.concat(
            F.lit("bs"),
            F.col("replicate").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
        return reps.filter(sampling.key_hash_mod(key, 100) < 63).select(
            F.col("replicate").cast("long").alias("replicate"), "doc_id"
        )
    q["sample_bootstrap"] = sample_bootstrap

    def sample_stratified(spark, sf_dir):
        # per-language rates; strata absent from the dict (es, fr) are
        # dropped — the downsample-the-head corpus-balancing move
        d = _t(spark, sf_dir, "documents")
        return sampling.stratified_sample(
            d, "lang", "doc_id", rates={"en": 20, "de": 50, "zh": 80}
        ).select("doc_id", "lang", "source")
    q["sample_stratified"] = sample_stratified

    def doc_source_cap(spark, sf_dir):
        # per-source contribution cap (≤ 10 docs per source, by doc_id)
        d = _t(spark, sf_dir, "documents")
        return sampling.group_cap(
            d, "source", order_by=["doc_id"], k=10
        ).select("doc_id", "source")
    q["doc_source_cap"] = doc_source_cap


def register_sql(o):

    o["sample_hash"] = f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 10
    """

    o["sample_split"] = f"""
        SELECT doc_id,
               {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} AS split_bucket,
               CASE WHEN {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 90
                    THEN 'train'
                    WHEN {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} < 95
                    THEN 'val' ELSE 'test' END AS split
        FROM documents
    """

    # --- sample_weighted: sequential Poisson sampling — ORDER BY the
    # exact-integer 60-bit md5 fold divided (IEEE-exact) by n_chars;
    # doc_id tiebreak is unreachable (md5 keys are distinct) but keeps
    # both plans total orders.
    o["sample_weighted"] = f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        ORDER BY CAST({_sql_h60("'ws:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
                 / CAST(n_chars AS DOUBLE), doc_id
        LIMIT 60
    """

    # --- sample_bootstrap: same md5 rate draw per (replicate, doc)
    o["sample_bootstrap"] = f"""
        SELECT CAST(r AS BIGINT) AS replicate, doc_id
        FROM documents, UNNEST(range(0, 8)) AS t(r)
        WHERE {_sql_hmod(
            "'bs' || CAST(r AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)",
            100,
        )} < 63
    """

    # --- sample_reservoir: the same md5 order, stated as a plain
    # ORDER BY ... LIMIT (the driver compare is order-insensitive, so
    # only the 100-row SET must match).
    o["sample_reservoir"] = """
        SELECT doc_id, lang, source FROM documents
        ORDER BY md5('rs:' || CAST(doc_id AS VARCHAR)) LIMIT 100
    """

    # --- sample_curriculum: the two-phase global_sequence equals the
    # naive global window; prefix size = ceil(n·(e+1)/4).
    o["sample_curriculum"] = """
        WITH rk AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(ROW_NUMBER() OVER (
                   ORDER BY n_chars DESC, doc_id
                 ) - 1 AS BIGINT) AS q_rank,
                 COUNT(*) OVER () AS n
          FROM documents
        )
        SELECT CAST(e AS INTEGER) AS epoch, doc_id, n_chars, q_rank,
               CAST(CASE WHEN q_rank <
                      CAST(ceil(n * (e + 1) / 4.0) AS BIGINT)
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM rk, UNNEST([0, 1, 2, 3]) AS t(e)
    """

    # --- sample_batch_plan: the grouped_rank equals this plain
    # per-host window; stripe offset = the same md5/Horner-fold the
    # Spark side computes on the host string.
    o["sample_batch_plan"] = f"""
        WITH base AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
                 md5('cb:doc-' || CAST(doc_id AS VARCHAR)) AS ok
          FROM documents WHERE doc_id < 800
        ),
        rk AS (
          SELECT image_id, host,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY host ORDER BY ok
                 ) - 1 AS BIGINT) AS host_rank
          FROM base
        )
        SELECT image_id, host, host_rank,
               CAST(({_sql_hmod("host", 12)} + host_rank) % 12 AS BIGINT)
                 AS batch,
               CAST(CASE WHEN host_rank >= 12 THEN 1 ELSE 0 END AS BIGINT)
                 AS overflow
        FROM rk
    """

    # --- sample_epoch_shuffle: both permutation levels replayed as
    # md5-keyed row_numbers; global_pos = epoch shard-offset (running
    # size sum in shard-order) + within-shard position.
    o["sample_epoch_shuffle"] = """
        WITH base AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST(doc_id % 16 AS INTEGER) AS shard
          FROM documents WHERE doc_id < 600
        ),
        ranked AS (
          SELECT CAST(e AS INTEGER) AS epoch, image_id, shard,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY e, shard
                   ORDER BY md5('ep:' || CAST(e AS VARCHAR) || ':' || image_id),
                            image_id
                 ) - 1 AS BIGINT) AS pos_in_shard
          FROM base, UNNEST([0, 1, 2]) AS t(e)
        ),
        sizes AS (SELECT shard, COUNT(*) AS n FROM base GROUP BY shard),
        shord AS (
          SELECT CAST(e AS INTEGER) AS epoch, shard,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY e
                   ORDER BY md5('ep:' || CAST(e AS VARCHAR) || ':'
                                || CAST(shard AS VARCHAR)), shard
                 ) - 1 AS BIGINT) AS shard_rank,
                 CAST(COALESCE(SUM(n) OVER (
                   PARTITION BY e
                   ORDER BY md5('ep:' || CAST(e AS VARCHAR) || ':'
                                || CAST(shard AS VARCHAR)), shard
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS off
          FROM sizes, UNNEST([0, 1, 2]) AS t(e)
        )
        SELECT r.epoch, r.image_id, r.shard, s.shard_rank, r.pos_in_shard,
               CAST(s.off + r.pos_in_shard AS BIGINT) AS global_pos
        FROM ranked r JOIN shord s ON r.epoch = s.epoch AND r.shard = s.shard
    """

    o["sample_stratified"] = f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_sql_hmod("CAST(doc_id AS VARCHAR)", 100)} <
              CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50
                        WHEN 'zh' THEN 80 ELSE 0 END
    """

    o["doc_source_cap"] = """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn <= 10
    """
