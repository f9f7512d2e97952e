"""Text-analysis / curation pipeline: quality, langid,
tokens, vocab, fingerprint, repetition, packing, paragraph dedup,
mixture planning, trigram LM, classifier, PII scrub, composed
curation + training export."""
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
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _sql_hmod,
    _t,
    q_a_metrics,
)


def register(q):

    # ---------------- text analysis
    def text_quality(spark, sf_dir):
        return textkit.quality_columns(_t(spark, sf_dir, "documents"))
    q["text_quality"] = text_quality

    def text_tokens_bpe(spark, sf_dir):
        """Token counting: whitespace split vs a BPE-ish regex
        (word-pieces + standalone punctuation)."""
        d = _t(spark, sf_dir, "documents")
        return d.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]"))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    q["text_tokens_bpe"] = text_tokens_bpe

    def text_quality_filter(spark, sf_dir):
        """The downstream keep/drop decision, integer threshold tests
        only (ratio tests as cross-multiplications)."""
        qc = textkit.quality_columns(_t(spark, sf_dir, "documents"))
        return qc.filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stopwords") * 100 >= F.col("n_tokens") * 2)
            & (F.col("n_distinct_tokens") * 10 >= F.col("n_tokens") * 3)
        ).select("doc_id")
    q["text_quality_filter"] = text_quality_filter

    def text_langid(spark, sf_dir):
        return textkit.langid(_t(spark, sf_dir, "documents"))
    q["text_langid"] = text_langid

    def text_bm25(spark, sf_dir):
        # focused-crawl topic relevance: BM25-shaped score of every
        # doc against the crawl's query terms — one scan + one 1-row
        # broadcast agg (N, total tokens, per-term df); log-free
        # rational idf and rational-cleared tf saturation keep every
        # value an exact integer (see textkit.bm25_scores).
        d = _t(spark, sf_dir, "documents")
        return textkit.bm25_scores(d, terms=("scan", "merge", "hash"))
    q["text_bm25"] = text_bm25

    def text_vocab_coverage(spark, sf_dir):
        # tokenizer-eval metric: per-doc coverage of the corpus top-30
        # vocabulary (textkit.vocab_topk) — n_covered / n_tokens is
        # the OOV-rate complement every vocab build is judged by. The
        # 30-row vocab broadcasts; one scan computes per-doc hits.
        d = _t(spark, sf_dir, "documents")
        vocab = textkit.vocab_topk(d, k=30).select("tok")
        toks = d.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda t: t != F.lit(""),
                )
            ).alias("tok"),
        )
        j = toks.join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), "tok", "left"
        )
        return j.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("_v").isNotNull().cast("long"))
            .cast("long")
            .alias("n_covered"),
        ).withColumn(
            "coverage_ppm",
            F.expr("n_covered * 1000000 DIV n_tokens").cast("long"),
        )
    q["text_vocab_coverage"] = text_vocab_coverage

    def text_collocations(spark, sf_dir):
        # PMI-shaped collocation mining: top-50 adjacent bigrams by
        # the log-free association ratio p(ab)/(p(a)p(b)) in exact
        # nested-integer ppm; Zipf tail (c_ab < 5) dropped pre-join
        d = _t(spark, sf_dir, "documents")
        return textkit.collocations_topk(d, k=50, min_count=5)
    q["text_collocations"] = text_collocations

    def text_keywords(spark, sf_dir):
        # per-doc top-3 tf·idf keywords (stopwords excluded, log-free
        # Robertson idf permil) — per-DOC windows, token-keyed df
        # join, 1-row corpus count broadcast (textkit.keywords_topk)
        d = _t(spark, sf_dir, "documents")
        return textkit.keywords_topk(d, k=3)
    q["text_keywords"] = text_keywords

    def text_bpe_train(spark, sf_dir):
        # BPE tokenizer-vocabulary induction (Sennrich merge loop):
        # 6 learned merges over the corpus word vocabulary — one
        # corpus scan, then vocabulary-sized hash-aggs + a 1-row
        # argmax collect per round (textkit.bpe_train).
        d = _t(spark, sf_dir, "documents")
        return textkit.bpe_train(d, n_merges=6)
    q["text_bpe_train"] = text_bpe_train

    def text_bpe_segment(spark, sf_dir):
        # the learned tokenizer APPLIED: word → symbol count after the
        # 6 merges (Σ n·n_symbols = corpus token count under the
        # vocab — the compression curve a tokenizer build is judged
        # by); same loop, final vocab table out
        d = _t(spark, sf_dir, "documents")
        return textkit.bpe_segment(d, n_merges=6)
    q["text_bpe_segment"] = text_bpe_segment

    def text_vocab_topk(spark, sf_dir):
        # tokenizer/BPE-build prerequisite: corpus vocabulary head
        # (one explode + hash-agg + TakeOrdered; textkit.vocab_topk)
        return textkit.vocab_topk(_t(spark, sf_dir, "documents"), k=30)
    q["text_vocab_topk"] = text_vocab_topk

    def text_fingerprint(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return d.select(
            "doc_id", textkit.fingerprint_udf(F.col("text")).alias("fp")
        )
    q["text_fingerprint"] = text_fingerprint

    def text_repetition(spark, sf_dir):
        # Gopher-style within-doc repetition gate (duplicate word
        # 2-gram fraction ≤ 0.2, integer cross-multiplication)
        return textkit.repetition_features(_t(spark, sf_dir, "documents"))
    q["text_repetition"] = text_repetition

    def text_pack(spark, sf_dir):
        # GPT-style sequence packing: per-(source, shard) token-stream
        # concat cut into 512-token windows; shard bounds the window
        # partitions so no source funnels through one task
        return textkit.pack_sequences(
            _t(spark, sf_dir, "documents"), cap=512, n_shards=8
        )
    q["text_pack"] = text_pack

    def text_para_dedup(spark, sf_dir):
        # C4/CCNet paragraph-level exact dedup: first occurrence
        # (lowest doc_id, pos) of each 3-word chunk survives corpus-
        # wide; winner via skew-safe groupBy+min (map-side combine),
        # never a per-paragraph window funnel
        return textkit.paragraph_dedup(
            _t(spark, sf_dir, "documents"), words_per_para=3
        )
    q["text_para_dedup"] = text_para_dedup

    def text_mixture_plan(spark, sf_dir):
        # Pile/DoReMi-static domain-mixture planner: biggest corpus
        # achievable without upsampling, each source a weight-
        # proportional token share, greedy md5-prefix selection.
        # src0's weight makes it the binding source (all kept);
        # src1..4 truncate; src5+ drop (weight 0).
        d = _t(spark, sf_dir, "documents").withColumn(
            "n_tokens", textkit.token_count(F.col("text"))
        )
        return sampling.mixture_plan(
            d, {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
        )
    q["text_mixture_plan"] = text_mixture_plan

    def text_temperature_plan(spark, sf_dir):
        # mBERT/XLM-R/mT5 temperature mixing (T = 2): per-source
        # sampling weight = isqrt(available tokens) — low-resource
        # sources upweighted, high-resource damped; rates and token
        # budgets by integer division.
        d = _t(spark, sf_dir, "documents").withColumn(
            "n_tokens", textkit.token_count(F.col("text"))
        )
        return sampling.temperature_plan(d, budget=100000)
    q["text_temperature_plan"] = text_temperature_plan

    def text_trigram_lm(spark, sf_dir):
        # CCNet-style LM-quality proxy with exact integer semantics:
        # corpus char-trigram counts (the "LM", broadcastable) scored
        # back per doc — big side never shuffles pre-agg
        return textkit.trigram_familiarity(_t(spark, sf_dir, "documents"))
    q["text_trigram_lm"] = text_trigram_lm

    def text_classifier(spark, sf_dir):
        # fastText-style linear quality classifier: hashed-token
        # features × a broadcast integer weight table, threshold on
        # the cross-multiplied average. The demo weight table is a
        # pure function of the bucket id (range × Knuth constant mod
        # 2001, centered), so DuckDB rebuilds the identical "learned"
        # layer and replays the scoring end-to-end.
        docs = _t(spark, sf_dir, "documents")
        weights = spark.range(4096).select(
            F.col("id").alias("bucket"),
            ((F.col("id") * 2654435761) % 2001 - 1000).alias("weight"),
        )
        return textkit.linear_classifier_score(
            docs, weights, n_buckets=4096, threshold_milli=50
        )
    q["text_classifier"] = text_classifier

    def text_pii_scrub(spark, sf_dir):
        # PII redaction (emails → IPv4 → phones, chained JVM
        # regexp_replace + regexp_count, one codegen scan). PII is
        # PLANTED arithmetically on doc_id slices so the gate is
        # non-vacuous; DuckDB plants the identical strings and runs
        # the identical RE2-safe patterns — counts AND the full
        # clean_text hash-compare.
        d = F.col("doc_id")
        s = lambda x: x.cast("string")  # noqa: E731
        planted = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    d % 3 == 0,
                    F.concat(F.lit(" contact user"), s(d), F.lit("@ex"),
                             s(d % 7), F.lit(".org")),
                ).otherwise(F.lit("")),
                F.when(
                    d % 4 == 0,
                    F.concat(F.lit(" from 10."), s(d % 256), F.lit(".0."),
                             s(d % 200)),
                ).otherwise(F.lit("")),
                F.when(
                    d % 5 == 0,
                    F.concat(F.lit(" call 040-555-"), s(1000 + d % 9000)),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return textkit.pii_scrub(planted)
    q["text_pii_scrub"] = text_pii_scrub

    def text_curation_pipeline(spark, sf_dir):
        # The end-to-end curation story a training-data user actually
        # runs, composed as ONE declarative plan: quality gate (length /
        # stopword / distinct-token ratios) → Gopher repetition gate →
        # exact-dedup keeper (md5 digest, min doc_id wins) → language
        # tag over the survivors. Catalyst collapses the three gates'
        # column expressions into the same corpus scan; the only
        # shuffles are the digest hash-agg and the keeper semi-join,
        # both over (digest, doc_id) pairs — never the text bytes at
        # width. The oracle chains the proven per-stage CTEs.
        d = _t(spark, sf_dir, "documents")
        ok = textkit.quality_columns(d).filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stopwords") * 100 >= F.col("n_tokens") * 2)
            & (F.col("n_distinct_tokens") * 10 >= F.col("n_tokens") * 3)
        ).select("doc_id", "n_tokens")
        rep = (
            textkit.repetition_features(d)
            .filter(F.col("keep") == 1)
            .select("doc_id")
        )
        survivors = d.join(ok, "doc_id").join(rep, "doc_id")
        keepers = survivors.groupBy(F.md5("text").alias("digest")).agg(
            F.min("doc_id").alias("doc_id")
        )
        kept = survivors.join(keepers.select("doc_id"), "doc_id")
        return textkit.langid(kept).join(
            kept.select("doc_id", "n_tokens"), "doc_id"
        )
    q["text_curation_pipeline"] = text_curation_pipeline

    def text_training_export(spark, sf_dir):
        # The EXPORT half of the text story composed as one plan:
        # duplicate-span gate (corpus-repeated 5-grams cover < 20% of
        # a doc's tokens) → GPT-style sequence packing over the
        # survivors → per-(source, shard, pack) manifest. Packing
        # offsets are computed over the GATED set (the stream a loader
        # actually reads); the oracle chains the dup-span CTE into the
        # same filtered pack window.
        d = _t(spark, sf_dir, "documents")
        spans = dedup.dup_span_features(d, n=5)
        kept_ids = spans.filter(F.col("dup_frac_x1000") < 200).select("doc_id")
        packed = textkit.pack_sequences(
            d.join(kept_ids, "doc_id"), cap=512, n_shards=8
        )
        return packed.groupBy("source", "shard", "pack_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
    q["text_training_export"] = text_training_export

    def text_boilerplate(spark, sf_dir):
        # Site-template boilerplate removal (textkit.boilerplate_strip
        # — the C4 rule that DELETES high-df paragraphs everywhere,
        # vs para_dedup which keeps one copy). A 3-word header
        # ("subscribe to {source}") is prepended to every doc, so
        # chunk 1 has df = the source's whole doc count and must be
        # stripped from every row; body chunks shift by one slot and
        # survive unless they naturally cross the df threshold (both
        # engines agree either way).
        d = _t(spark, sf_dir, "documents")
        boosted = d.select(
            "doc_id",
            "source",
            F.concat(
                F.lit("subscribe to "), F.col("source"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
        return textkit.boilerplate_strip(boosted, min_docs=20)
    q["text_boilerplate"] = text_boilerplate


def register_sql(o):

    o["text_tokens_bpe"] = r"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents
    """

    o["text_quality_filter"] = f"""
        WITH qc AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> t IN {_STOP_SQL})) AS n_stopwords,
                 len(list_distinct(string_split(lower(text), ' ')))
                     AS n_distinct_tokens
          FROM documents
        )
        SELECT doc_id FROM qc
        WHERE n_tokens >= 20
          AND n_stopwords * 100 >= n_tokens * 2
          AND n_distinct_tokens * 10 >= n_tokens * 3
    """

    o["text_quality"] = f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_q,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN {_STOP_SQL})) AS BIGINT) AS n_stopwords,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS BIGINT) AS n_distinct_tokens
        FROM documents
    """

    # --- Fingerprint: Horner fold of UTF-8 bytes mod 2^61-1; byte
    # stream recovered engine-neutrally via hex(encode(text)).
    o["text_fingerprint"] = """
        SELECT doc_id,
               CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                 ELSE list_reduce(
                   list_transform(
                     generate_series(1, octet_length(encode(text))),
                     i -> CAST(
                       16 * (strpos('0123456789ABCDEF',
                                    substr(hex(encode(text)), 2*i - 1, 1)) - 1)
                       + strpos('0123456789ABCDEF',
                                substr(hex(encode(text)), 2*i, 1)) - 1
                       AS HUGEINT)),
                   (a, b) -> (a * 257 + b) % 2305843009213693951)
               END AS BIGINT) AS fp
        FROM documents
    """

    o["text_langid"] = f"""
        SELECT doc_id, lang AS lang_tagged,
               CASE WHEN len(list_filter(string_split(lower(text), ' '),
                         t -> t IN {_STOP_SQL})) * 20
                         >= len(string_split(text, ' '))
                    THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents
    """

    # --- text_vocab_coverage: same top-30 vocab + per-doc hit counts
    o["text_vocab_coverage"] = """
        WITH v AS (
          SELECT tok FROM (
            SELECT tok, COUNT(*) AS n FROM (
              SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents
            ) WHERE tok <> '' GROUP BY tok
            ORDER BY n DESC, tok LIMIT 30
          )
        ),
        t AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN tok IN (SELECT tok FROM v)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
               CAST(SUM(CASE WHEN tok IN (SELECT tok FROM v)
                             THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                    AS BIGINT) AS coverage_ppm
        FROM t WHERE tok <> ''
        GROUP BY doc_id
    """

    # --- text_collocations: identical nested-integer PMI ratio
    o["text_collocations"] = """
        WITH tk AS (
          SELECT list_filter(string_split(lower(text), ' '), t -> t <> '')
                   AS toks
          FROM documents
        ),
        uni AS (
          SELECT tok, COUNT(*) AS c FROM (
            SELECT unnest(toks) AS tok FROM tk
          ) GROUP BY tok
        ),
        bi AS (
          SELECT w1, w2, COUNT(*) AS c_ab FROM (
            SELECT toks[j] AS w1, toks[j+1] AS w2
            FROM tk, UNNEST(range(1, len(toks))) AS r(j)
          ) GROUP BY w1, w2 HAVING COUNT(*) >= 5
        ),
        tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total FROM uni),
        bt AS (
          SELECT CAST(SUM(greatest(len(toks) - 1, 0)) AS BIGINT) AS b_total
          FROM tk
        )
        SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS pair_count,
               CAST((((1000000 * b.c_ab * t_total) // (b_total * ua.c))
                     * t_total) // ub.c AS BIGINT) AS pmi_ratio_ppm
        FROM bi b
        JOIN uni ua ON ua.tok = b.w1
        JOIN uni ub ON ub.tok = b.w2, tt, bt
        ORDER BY pmi_ratio_ppm DESC, b.w1, b.w2
        LIMIT 50
    """

    # --- text_keywords: same tf·idf permil integers + per-doc window
    o["text_keywords"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        ),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM toks
          WHERE tok <> '' AND tok NOT IN {_STOP_SQL}
          GROUP BY doc_id, tok
        ),
        dfreq AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, tok, tf,
                 tf * (((2*(n_docs - df_t) + 1) * 1000) // (2*df_t + 1))
                   AS score_permil
          FROM tf JOIN dfreq USING (tok), nd
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score_permil DESC, tok
          ) AS kw_rank FROM scored
        )
        SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
               CAST(score_permil AS BIGINT) AS score_permil,
               CAST(kw_rank AS BIGINT) AS kw_rank
        FROM r WHERE kw_rank <= 3
    """

    # --- text_bpe_train: the 6 merge rounds unrolled CTE-for-CTE.
    # Each round: pair counts from the previous symbol strings, the
    # (count DESC, pair ASC) argmax as a 1-row CTE, and the merge
    # applied with the same BPE_REPLACE_PASSES fixed replace() passes
    # as the Spark side (both engines' replace() scans left-to-right
    # without rescanning replacements). MATERIALIZED pins each vocab
    # level so the chain doesn't re-inline exponentially.
    _bpe = [
        """w0 AS MATERIALIZED (
             SELECT tok AS w, COUNT(*) AS n FROM (
               SELECT unnest(string_split(lower(text), ' ')) AS tok
               FROM documents
             ) WHERE tok <> '' GROUP BY tok
           ),
           v0 AS MATERIALIZED (
             SELECT w, n,
                    array_to_string(
                      list_transform(range(1, len(w)+1), i -> w[i]), ' ') AS s
             FROM w0
           )"""
    ]
    for _i in range(1, 7):
        _expr = "' ' || s || ' '"
        for _ in range(textkit.BPE_REPLACE_PASSES):
            _expr = (
                f"replace({_expr}, ' ' || (SELECT pr FROM b{_i}) || ' ', "
                f"' ' || replace((SELECT pr FROM b{_i}), ' ', '') || ' ')"
            )
        _bpe.append(
            f"""p{_i} AS (
             SELECT pr, SUM(n) AS c FROM (
               SELECT n, unnest(list_transform(
                 range(1, len(string_split(s, ' '))),
                 j -> string_split(s, ' ')[j] || ' ' || string_split(s, ' ')[j+1]
               )) AS pr
               FROM v{_i-1}
             ) GROUP BY pr
           ),
           b{_i} AS MATERIALIZED (
             SELECT pr, c FROM p{_i} ORDER BY c DESC, pr LIMIT 1
           ),
           v{_i} AS MATERIALIZED (
             SELECT w, n, trim({_expr}) AS s FROM v{_i-1}
           )"""
        )
    o["text_bpe_train"] = (
        "WITH "
        + ",\n".join(_bpe)
        + "\n"
        + "\nUNION ALL\n".join(
            f"""SELECT {_i} AS step,
                   string_split(pr, ' ')[1] AS left_sym,
                   string_split(pr, ' ')[2] AS right_sym,
                   replace(pr, ' ', '') AS merged,
                   CAST(c AS BIGINT) AS pair_count
            FROM b{_i}"""
            for _i in range(1, 7)
        )
    )

    # --- text_bpe_segment: the same chain's FINAL vocab level
    o["text_bpe_segment"] = (
        "WITH "
        + ",\n".join(_bpe)
        + """
        SELECT w, CAST(n AS BIGINT) AS n_occurrences,
               CAST(len(w) AS BIGINT) AS n_chars_w,
               CAST(len(string_split(s, ' ')) AS BIGINT) AS n_symbols
        FROM v6
    """
    )

    # --- text_bm25: same integer formula — HUGEINT-safe in DuckDB
    # (SUM promotes), floored divisions mirror Spark's DIV exactly.
    o["text_bm25"] = """
        WITH p AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                          t -> t <> '')) AS BIGINT) AS dl,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                          t -> t = 'scan')) AS BIGINT) AS tf0,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                          t -> t = 'merge')) AS BIGINT) AS tf1,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                          t -> t = 'hash')) AS BIGINT) AS tf2
          FROM documents
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS tt,
                 CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                 CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                 CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
          FROM p
        )
        SELECT doc_id, dl AS n_tokens,
               tf0 AS tf_scan, tf1 AS tf_merge, tf2 AS tf_hash,
               CAST(
                 (((2*(n_docs-df0)+1)*1000) // (2*df0+1))
                   * ((1000000*44*tt*tf0) // (20*tt*tf0 + 6*tt + 18*dl*n_docs)) // 1000
                 + (((2*(n_docs-df1)+1)*1000) // (2*df1+1))
                   * ((1000000*44*tt*tf1) // (20*tt*tf1 + 6*tt + 18*dl*n_docs)) // 1000
                 + (((2*(n_docs-df2)+1)*1000) // (2*df2+1))
                   * ((1000000*44*tt*tf2) // (20*tt*tf2 + 6*tt + 18*dl*n_docs)) // 1000
               AS BIGINT) AS bm25_micro
        FROM p, s
    """

    o["text_vocab_topk"] = """
        SELECT tok, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 30
    """

    # --- text_repetition: NON-distinct word 2-grams (total vs distinct
    # counts; the dedup oracles use the distinct form) — the Gopher
    # duplicate-fraction gate as an integer cross-multiplication.
    o["text_repetition"] = """
        WITH g AS (
          SELECT doc_id,
                 CASE WHEN len(string_split(text, ' ')) >= 2
                      THEN list_transform(
                        generate_series(1, len(string_split(text, ' ')) - 1),
                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                      ELSE [] END AS grams
          FROM documents
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
               CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
                 AS n_dup_grams,
               CAST(CASE WHEN (len(grams) - len(list_distinct(grams))) * 20
                              <= len(grams)
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM g
    """

    # --- text_pack: running token-offset per (source, doc_id % 8)
    # shard, cut at 512-token boundaries
    o["text_pack"] = """
        SELECT doc_id, source,
               CAST(doc_id % 8 AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY source, doc_id % 8 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start_offset,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY source, doc_id % 8 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // 512 AS BIGINT) AS pack_id
        FROM documents
    """

    # --- text_para_dedup: corpus-wide first-occurrence paragraph
    # dedup over 3-word chunks; winner = min (doc_id, pos) per chunk
    o["text_para_dedup"] = """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        paras AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(t[((i-1)*3+1):((i-1)*3+3)], ' ') AS para
          FROM toks,
               UNNEST(range(1, CAST(ceil(len(t)/3.0) AS BIGINT) + 1)) AS r(i)
        ),
        winners AS (
          SELECT para, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
          FROM paras GROUP BY para
        ),
        marked AS (
          SELECT p.doc_id, p.pos, p.para,
                 CASE WHEN p.doc_id = w.w.doc_id AND p.pos = w.w.pos
                      THEN 1 ELSE 0 END AS kept
          FROM paras p JOIN winners w USING (para)
        )
        SELECT doc_id,
               count(*) AS n_paras,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               coalesce(
                 string_agg(CASE WHEN kept = 1 THEN para END, ' '
                            ORDER BY pos), '') AS text_dedup
        FROM marked GROUP BY doc_id
    """

    # --- text_mixture_plan: all-integer mixture feasibility + greedy
    # md5-prefix selection; DIV/// keep both engines exact
    o["text_mixture_plan"] = """
        WITH w(source, _w) AS (
          VALUES ('src0', 5), ('src1', 3), ('src2', 2),
                 ('src3', 1), ('src4', 1)
        ),
        base AS (
          SELECT d.source, d.doc_id,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                 w._w
          FROM documents d JOIN w USING (source)
        ),
        avail AS (
          SELECT source, _w, SUM(n_tokens) AS _avail
          FROM base GROUP BY source, _w
        ),
        t AS (SELECT MIN(_avail * 12 // _w) AS _t FROM avail),
        budgets AS (
          SELECT source, _w * _t // 12 AS budget FROM avail CROSS JOIN t
        ),
        sel AS (
          SELECT source, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cum_before
          FROM base
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum_before AS BIGINT) AS cum_before,
               CAST(budget AS BIGINT) AS budget
        FROM sel JOIN budgets USING (source)
        WHERE cum_before < budget
    """

    # --- text_trigram_lm: corpus char-trigram familiarity, exact
    # integer LM proxy (counts join + per-doc sum)
    o["text_trigram_lm"] = """
        WITH tri AS (
          SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tri
          FROM documents, UNNEST(range(1, len(text) - 1)) AS r(i)
          WHERE len(text) >= 3
        ),
        counts AS (SELECT tri, COUNT(*) AS _freq FROM tri GROUP BY tri),
        per_doc AS (
          SELECT doc_id, COUNT(*) AS n_tri, SUM(_freq) AS sum_freq
          FROM tri JOIN counts USING (tri) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri,
               CAST(COALESCE(sum_freq, 0) AS BIGINT) AS sum_freq,
               CAST(CASE WHEN n_tri IS NOT NULL
                    THEN sum_freq * 1000 // n_tri ELSE 0 END
                 AS BIGINT) AS familiarity_x1000
        FROM documents d LEFT JOIN per_doc USING (doc_id)
    """

    # --- text_classifier: rebuild the weight layer from the bucket id,
    # hash tokens with the shared 8-hex-char md5 fold, sum weights per
    # doc, cross-multiplied threshold — the whole classifier replayed.
    o["text_classifier"] = """
        WITH w AS (
          SELECT CAST(range AS BIGINT) AS bucket,
                 CAST((range * 2654435761) % 2001 - 1000 AS BIGINT) AS weight
          FROM range(4096)
        ),
        tok AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        ),
        b AS (
          SELECT doc_id, n_tokens,
                 list_reduce(list_transform(
                   string_split(substr(md5(tok), 1, 8), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) % 4096 AS bucket
          FROM tok
        ),
        s AS (
          SELECT doc_id, n_tokens,
                 SUM(COALESCE(weight, 0)) AS score
          FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id, n_tokens
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(score AS BIGINT) AS score,
               CAST(CASE WHEN 1000 * score >= 50 * n_tokens
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM s
    """

    # --- text_pii_scrub: identical planting arithmetic + identical
    # backreference/lookaround-free patterns under RE2 ('g' flag:
    # DuckDB replaces first-match by default, Spark replaces all).
    o["text_pii_scrub"] = """
        WITH planted AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                    ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                    THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                    ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                    THEN ' call 040-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                    ELSE '' END AS text
          FROM documents
        ), s1 AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                   AS n_emails,
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS t
          FROM planted
        ), s2 AS (
          SELECT doc_id, n_emails,
                 CAST(len(regexp_extract_all(t,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                   AS n_ips,
                 regexp_replace(t,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                   '<IP>', 'g') AS t
          FROM s1
        )
        SELECT doc_id, n_emails, n_ips,
               CAST(len(regexp_extract_all(t,
                 '\\+?[0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}\\b')) AS BIGINT)
                 AS n_phones,
               regexp_replace(t,
                 '\\+?[0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}\\b',
                 '<PHONE>', 'g') AS clean_text
        FROM s2
    """

    # --- text_training_export: dup-span gate chained into the packing
    # window over the SURVIVORS (offsets over the gated stream).
    o["text_training_export"] = """
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(l[i+1:i+5], ' ') AS gram
          FROM toks, UNNEST(range(len(l) - 4)) AS r(i)
          WHERE len(l) >= 5
        ),
        dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
        cov AS (
          SELECT DISTINCT g.doc_id, g.pos + o.o AS idx
          FROM grams g JOIN dupg USING (gram), UNNEST(range(5)) AS o(o)
        ),
        nt AS (SELECT doc_id, len(l) AS n_tokens FROM toks WHERE len(l) > 0),
        kept AS (
          SELECT nt.doc_id FROM nt LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id
          ) c USING (doc_id)
          WHERE 1000 * COALESCE(c.n, 0) // nt.n_tokens < 200
        ),
        packed AS (
          SELECT d.doc_id, d.source,
                 CAST(d.doc_id % 8 AS INTEGER) AS shard,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(COALESCE(SUM(len(string_split(d.text, ' '))) OVER (
                   PARTITION BY d.source, d.doc_id % 8 ORDER BY d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS BIGINT) AS pack_id
          FROM documents d JOIN kept USING (doc_id)
        )
        SELECT source, shard, pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY source, shard, pack_id
    """

    # --- text_curation_pipeline: the composed end-to-end run — the
    # proven per-stage CTEs (quality gate, Gopher repetition gate,
    # md5-digest keeper, stopword lang-ID) chained exactly as the
    # Spark plan chains the operators.
    o["text_curation_pipeline"] = f"""
        WITH qc AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> t IN {_STOP_SQL})) AS n_stopwords,
                 len(list_distinct(string_split(lower(text), ' ')))
                     AS n_distinct_tokens
          FROM documents
        ),
        ok AS (
          SELECT doc_id, n_tokens FROM qc
          WHERE n_tokens >= 20
            AND n_stopwords * 100 >= n_tokens * 2
            AND n_distinct_tokens * 10 >= n_tokens * 3
        ),
        g AS (
          SELECT doc_id,
                 CASE WHEN len(string_split(text, ' ')) >= 2
                      THEN list_transform(
                        generate_series(1, len(string_split(text, ' ')) - 1),
                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                      ELSE [] END AS grams
          FROM documents
        ),
        rep AS (
          SELECT doc_id FROM g
          WHERE (len(grams) - len(list_distinct(grams))) * 20 <= len(grams)
        ),
        surv AS (
          SELECT d.doc_id, d.text, d.lang, ok.n_tokens
          FROM documents d JOIN ok USING (doc_id) JOIN rep USING (doc_id)
        ),
        keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY md5(text)
        )
        SELECT s.doc_id, s.lang AS lang_tagged,
               CASE WHEN len(list_filter(string_split(lower(s.text), ' '),
                         t -> t IN {_STOP_SQL})) * 20
                         >= len(string_split(s.text, ' '))
                    THEN 'en' ELSE 'other' END AS lang_pred,
               s.n_tokens
        FROM surv s JOIN keepers USING (doc_id)
    """

    # --- text_temperature_plan: availability^(1/2) weights via
    # floor(sqrt(int64)) (correctly-rounded IEEE sqrt — engine-neutral),
    # rates/budgets by integer //.
    o["text_temperature_plan"] = """
        WITH avail AS (
          SELECT source,
                 SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                   AS avail_tokens
          FROM documents GROUP BY source
        ),
        w AS (
          SELECT source, avail_tokens,
                 CAST(FLOOR(SQRT(avail_tokens)) AS BIGINT) AS weight
          FROM avail
        ),
        t AS (SELECT SUM(weight) AS _tw FROM w)
        SELECT source, CAST(avail_tokens AS BIGINT) AS avail_tokens,
               weight,
               CAST(weight * 1000000 // _tw AS BIGINT) AS rate_ppm,
               CAST(weight * 100000 // _tw AS BIGINT) AS take_tokens
        FROM w CROSS JOIN t
    """

    # --- text_boilerplate: same prepended-header fixture; df per
    # (source, para) over distinct docs, strip everywhere at df >= 20
    o["text_boilerplate"] = """
        WITH toks AS (
          SELECT doc_id, source,
                 string_split('subscribe to ' || source || ' ' || text,
                              ' ') AS t
          FROM documents
        ),
        paras AS (
          SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
                 array_to_string(t[((i-1)*3+1):((i-1)*3+3)], ' ') AS para
          FROM toks,
               UNNEST(range(1, CAST(ceil(len(t)/3.0) AS BIGINT) + 1)) AS r(i)
        ),
        boiler AS (
          SELECT source, para FROM paras
          GROUP BY 1, 2 HAVING COUNT(DISTINCT doc_id) >= 20
        ),
        marked AS (
          SELECT p.doc_id, p.pos, p.para,
                 CASE WHEN b.para IS NOT NULL THEN 1 ELSE 0 END AS is_boiler
          FROM paras p
          LEFT JOIN boiler b ON b.source = p.source AND b.para = p.para
        )
        SELECT doc_id, count(*) AS n_paras,
               CAST(sum(is_boiler) AS BIGINT) AS n_boiler,
               coalesce(string_agg(CASE WHEN is_boiler = 0 THEN para END,
                                   ' ' ORDER BY pos), '') AS text_clean
        FROM marked GROUP BY doc_id
    """
