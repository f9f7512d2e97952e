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


def repetition_features(df: DataFrame, n: int = 2, text: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family:
    Rae et al. 2021 drop docs whose duplicate n-gram fraction is too
    high — boilerplate, keyword stuffing, templated spam). Counts are
    integer (duplicate n-grams = total − distinct) and the keep verdict
    is an integer cross-multiplication (dup·10 ≤ threshold·total), so
    the DuckDB oracle matches bit-for-bit. Pure JVM array expressions —
    one scan, zero shuffle, codegen-resident at any corpus size."""
    toks = F.split(F.col(text), " ")
    k = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, k)
    for i in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(toks, i, k), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    grams = F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    out = df.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        (n_grams - n_distinct).alias("n_dup_grams"),
    )
    # Gopher-style gate: duplicate-2-gram fraction ≤ 0.05 (tuned so it
    # actually discriminates on the test corpus, whose dup fractions
    # run 0–13%; production corpora tune this knob per Rae et al.)
    keep = F.col("n_dup_grams") * 20 <= F.col("n_grams")
    return out.withColumn(
        "keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )


def pack_sequences(
    df: DataFrame, cap: int = 2048, n_shards: int = 8, text: str = "text"
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a fixed
    order and cut the token stream into `cap`-token context windows;
    a doc's pack_id is floor(start_offset / cap). Packing runs per
    (source, shard) — the shard key (doc_id % n_shards) bounds every
    window partition, so a 10^9-doc source never funnels through one
    window task; raise n_shards with corpus size. Deterministic order
    (doc_id) inside each shard ⇒ reproducible packs on any cluster."""
    from pyspark.sql.window import Window

    n_tokens = token_count(F.col(text))
    base = df.select(
        "doc_id",
        "source",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    ).withColumn(
        "pack_id", F.expr(f"start_offset div {cap}").cast("long")
    )


def wet_text(html_col) -> Column:
    """WET-style text extraction (web-archive "conversion" body): the
    JVM twin of ``parsekit.extract_text`` — script/style blocks
    dropped, tags → spaces, the five standard entities decoded (&amp;
    last), whitespace collapsed, trimmed. Pure regexp_replace/replace
    chain inside whole-stage codegen: at 100 TB the WET conversion is
    one scan, no Python. The pattern set avoids backreferences so the
    identical patterns run under Java regex here, RE2 in the DuckDB
    oracle, and Python `re` in parsekit (byte-equality tested)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    t = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def trigram_familiarity(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Corpus char-trigram familiarity score — the exact-integer proxy
    for the CCNet/KenLM perplexity filter (no LM binary in-sandbox, and
    log-probs would break cross-engine float equality): a document
    whose trigrams are common across the corpus scores high, one full
    of gibberish/boilerplate-noise scores low. Two corpus scans:

      1. explode char trigrams → hash-agg counts (the "LM"): the
         vocabulary is charset-bounded (≪ corpus — broadcastable);
      2. re-explode, broadcast-join the counts back, agg per doc.

    Scale shape: the big side never shuffles — the counts join is a
    broadcast, and the per-doc agg's partial (map-side) combine
    collapses each doc's trigrams to one row before the doc_id shuffle
    because explode keeps a doc's trigrams inside one input partition.
    familiarity_x1000 = sum_freq*1000 DIV n_tri (integer, exact).
    Docs shorter than 3 chars score (0, 0, 0).
    """
    c_key, c_txt = F.col(key), F.col(text)
    tri = df.filter(F.char_length(c_txt) >= 3).select(
        c_key,
        F.explode(
            F.expr(
                f"transform(sequence(1, char_length({text}) - 2),"
                f" i -> substring({text}, i, 3))"
            )
        ).alias("tri"),
    )
    counts = tri.groupBy("tri").agg(F.count("*").alias("_freq"))
    per_doc = (
        tri.join(F.broadcast(counts), "tri")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_tri"),
            F.sum("_freq").alias("sum_freq"),
        )
    )
    return (
        df.select(key)
        .join(per_doc, key, "left")
        .select(
            key,
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.coalesce("sum_freq", F.lit(0)).alias("sum_freq"),
            F.when(
                F.col("n_tri").isNotNull(),
                F.expr("sum_freq * 1000 DIV n_tri"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("familiarity_x1000"),
        )
    )


def paragraph_dedup(
    df: DataFrame, words_per_para: int = 3, text: str = "text"
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the C4 / CCNet rule:
    a paragraph that already appeared anywhere earlier in the corpus
    is dropped; the first occurrence — lowest (doc_id, pos) — is
    kept). The test corpus is a single-space word stream, so
    "paragraphs" are fixed ``words_per_para``-word chunks (trailing
    partial chunk included); real corpora would split on blank lines
    instead — everything downstream is unchanged.

    Scale shape: the winner per paragraph is computed with
    ``groupBy(para).agg(min(struct(doc_id, pos)))`` rather than a
    row_number window. Partial (map-side) aggregation means a hot
    boilerplate paragraph that appears in 1% of a 10^9-doc corpus
    costs each map task one row, and the reducer sees at most
    #partitions rows per key — a window would funnel every copy of
    the hot paragraph through one task. The join back is an equi-join
    on the paragraph text itself (exact, not a hash prefilter), and
    the per-doc re-aggregation keys on doc_id, which is near-uniform.

    Output per doc: total paragraph count, surviving count, and the
    surviving text re-joined in position order (deterministic on any
    cluster: winners are a pure min, order restored by array_sort on
    pos).
    """
    toks = F.split(F.col(text), " ")
    w = words_per_para
    n_chunks = F.ceil(F.size(toks) / F.lit(w)).cast("int")
    paras_arr = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(
                F.slice(toks, (i - F.lit(1)) * w + F.lit(1), F.lit(w)), " "
            ).alias("para"),
        ),
    )
    ex = (
        df.select("doc_id", F.explode(paras_arr).alias("p"))
        .select("doc_id", F.col("p.pos").alias("pos"), F.col("p.para").alias("para"))
    )
    winners = ex.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    kept = (
        (F.col("doc_id") == F.col("w.doc_id")) & (F.col("pos") == F.col("w.pos"))
    ).cast("long")
    joined = ex.join(winners, "para").select(
        "doc_id", "pos", "para", kept.alias("kept")
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum("kept").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("kept") == 1, F.struct("pos", "para")
                        )
                    )
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("text_dedup"),
    )


# ------------------------------------------------------- linear classifier

def feature_bucket(tok_col, n_buckets: int):
    """Feature-hash bucket of a token: first 8 md5 hex chars (32 bits)
    mod n_buckets — pure JVM md5/conv/pmod, the repo's engine-neutral
    hash idiom (DuckDB and python replay it exactly)."""
    h = F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def linear_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 4096,
    threshold_milli: int = 0,
    text: str = "text",
) -> DataFrame:
    """fastText-style linear text classifier scoring — the standard
    learned quality gate (CCNet/fastText lang+quality models, the
    GPT-3 "WebText-like" LR filter): hash each lowercased token into
    one of n_buckets features, sum the learned per-bucket weights, and
    threshold the AVERAGE weight per token.

    weights: (bucket:long, weight:long) — the trained dense layer in
    integer milli-units. It is ≤ n_buckets rows by construction, so it
    ALWAYS broadcasts: the corpus side explodes to tokens, map-side
    partial-aggregates the per-doc sum, and shuffles one (doc_id, sum)
    row per doc — no big-side shuffle at any corpus size, the same
    shape as the decontamination gate.

    The keep verdict avoids division entirely (float thresholds drift
    across engines): keep ⇔ 1000·Σweight ≥ threshold_milli·n_tokens —
    the repo's integer cross-multiplication idiom. Output:
    (doc_id, n_tokens, score, keep); score = Σ weight over tokens
    (milli-units, missing buckets weigh 0)."""
    toks = docs.select(
        "doc_id",
        token_count(F.col(text)).cast("long").alias("n_tokens"),
        F.explode(tokens(F.lower(F.col(text)))).alias("tok"),
    ).withColumn("bucket", feature_bucket(F.col("tok"), n_buckets))
    scored = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id", "n_tokens")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("score"))
    )
    keep = (
        F.lit(1000) * F.col("score")
        >= F.lit(threshold_milli) * F.col("n_tokens")
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.col("score").cast("long").alias("score"),
        keep.cast("long").alias("keep"),
    )


def linear_classifier_score_py(
    text: str, weights: dict[int, int], n_buckets: int, threshold_milli: int
) -> tuple[int, int, int]:
    """Pure-python twin (pytest reference): (n_tokens, score, keep)."""
    import hashlib as _hl

    toks = text.lower().split(" ")
    score = 0
    for t in toks:
        h = int(_hl.md5(t.encode("utf-8")).hexdigest()[:8], 16)
        score += weights.get(h % n_buckets, 0)
    keep = 1 if 1000 * score >= threshold_milli * len(toks) else 0
    return len(toks), score, keep


# ------------------------------------------------------------- PII scrub

#: Redaction patterns, applied IN THIS ORDER (emails first — an email's
#: host part could otherwise be nibbled by the IP pattern; phones last).
#: Deliberately backreference- and lookaround-free so the IDENTICAL
#: pattern runs under Java regex (Spark), RE2 (DuckDB oracle), and
#: python `re` (the twin) — the wet_text discipline.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and separator-grouped phone
    numbers — the PII pass every training-data pipeline runs before
    export. One JVM scan: per-class occurrence counts via regexp_count
    plus a chained regexp_replace, all inside whole-stage codegen
    (zero Python, zero shuffle — the wet_text shape). Replacement
    order is part of the contract (emails before IPs: an address's
    host part must not be half-eaten by the IP pattern).

    Output: doc_id, n_emails/n_ips/n_phones (counts BEFORE any
    replacement ran, each measured on the original text for the
    classes already removed — i.e. counts are per-class matches in
    the progressively-scrubbed text, matching the replacement
    semantics exactly), and clean_text."""
    c = F.col(text)
    out_counts = []
    cur = c
    for name, pat, token in PII_PATTERNS:
        out_counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}s")
        )
        cur = F.regexp_replace(cur, pat, token)
    return df.select(
        "doc_id", *out_counts, cur.alias("clean_text")
    )


def pii_scrub_py(text: str) -> tuple:
    """Pure-python twin of pii_scrub (pytest reference):
    (n_emails, n_ips, n_phones, clean_text)."""
    import re as _re

    counts = []
    cur = text
    for _name, pat, token in PII_PATTERNS:
        counts.append(len(_re.findall(pat, cur)))
        cur = _re.sub(pat, token, cur)
    return (*counts, cur)


# ------------------------------------------------- boilerplate removal

def boilerplate_strip(
    df: DataFrame,
    min_docs: int = 20,
    words_per_para: int = 3,
    text: str = "text",
    group: str = "source",
) -> DataFrame:
    """Site-level boilerplate removal (the C4/CCNet companion to
    paragraph_dedup, different rule): a paragraph that appears in
    ≥ min_docs DISTINCT documents of the same ``group`` (host/source)
    is template chrome — nav bars, cookie banners, footers — and is
    stripped from EVERY document, first occurrence included. Contrast
    paragraph_dedup, which keeps exactly one copy: dedup preserves
    content that happens to repeat; boilerplate removal deletes
    structure that repeats BY CONSTRUCTION of the site template.

    Paragraphs are fixed ``words_per_para``-word chunks of the
    single-space test corpus (same convention as paragraph_dedup;
    real corpora split on blank lines — downstream unchanged).

    Scale shape: document frequency per (group, para) via
    groupBy + countDistinct — Spark plans partial dedup of
    (group, para, doc_id) map-side, so a nav bar on every page of a
    10^7-page host costs each map task one row, not a funnel. The
    boiler set (df ≥ min_docs) is tiny — template chrome per host —
    and joins back as an equi-join on (group, para); per-doc
    re-aggregation keys on doc_id (near-uniform).

    Output per doc: (doc_id, n_paras, n_boiler, text_clean) with
    text_clean the surviving chunks re-joined in position order."""
    toks = F.split(F.col(text), " ")
    w = words_per_para
    n_chunks = F.ceil(F.size(toks) / F.lit(w)).cast("int")
    paras_arr = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(
                F.slice(toks, (i - F.lit(1)) * w + F.lit(1), F.lit(w)), " "
            ).alias("para"),
        ),
    )
    ex = df.select("doc_id", F.col(group).alias("_g"), F.explode(paras_arr).alias("p")).select(
        "doc_id", "_g", F.col("p.pos").alias("pos"), F.col("p.para").alias("para")
    )
    boiler = (
        ex.groupBy("_g", "para")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_g", "para", F.lit(1).alias("_b"))
    )
    marked = ex.join(boiler, ["_g", "para"], "left").select(
        "doc_id", "pos", "para",
        F.coalesce(F.col("_b"), F.lit(0)).cast("long").alias("is_boiler"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum("is_boiler").alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_boiler") == 0, F.struct("pos", "para")
                        )
                    )
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("text_clean"),
    )


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """BM25-shaped query relevance over the corpus (the focused-crawl
    frontier prior: score every candidate page against the crawl's
    topic terms), with the house's integer-exact discipline:

      * k1 = 1.2 and b = 0.75 are kept as exact rationals (6/5, 3/4)
        and cleared from the denominators, so the tf-saturation term
        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) becomes the exact
        integer ratio 44·TT·tf / (20·TT·tf + 6·TT + 18·dl·N)
        (avgdl = TT/N substituted, everything × 20·TT), floored to ppm;
      * the idf is the LOG-FREE Robertson ratio (N − df + ½)/(df + ½)
        as an exact integer permil ((2(N−df)+1)·1000 // (2·df+1)) —
        same ordering as the log form for any fixed df comparison,
        never negative, and exactly reproducible in any engine (a
        float ln() is not);
      * one corpus scan computes dl and each term's tf as JVM array
        expressions (no explode — the term list is a static column
        set); ONE one-row aggregate computes N, TT and every df; that
        row broadcasts back with a crossJoin. Total cost: one scan +
        one 1-row shuffle, independent of corpus size.

    63-bit headroom: the tf numerator 10^6·44·TT·tf caps TT·tf at
    ~2·10^11 — per-stats-scope (e.g. per-shard or per-crawl-slice)
    totals at 100 TB, exactly how df/avgdl stats are scoped in a
    sharded index anyway.

    Output: (key, n_tokens, tf_<term>..., bm25_micro) — score in
    micro-units (idf_permil × tf_ppm // 1000 summed over terms).
    """
    toks = F.filter(tokens(F.lower(F.col(text))), lambda t: t != F.lit(""))

    def _tf(w):
        # NB: a `lambda t, w=w:` default would make pyspark treat the
        # lambda as (element, index) — the closure keeps arity 1
        return F.size(F.filter(toks, lambda t: t == F.lit(w))).cast("long")

    proj = df.select(
        key,
        F.size(toks).cast("long").alias("dl"),
        *[_tf(w).alias(f"_tf{i}") for i, w in enumerate(terms)],
    )
    stats = proj.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("tt"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    joined = proj.crossJoin(F.broadcast(stats))
    contribs = [
        F.expr(
            f"(((2 * (n_docs - _df{i}) + 1) * 1000) DIV (2 * _df{i} + 1)) "
            f"* ((1000000 * 44 * tt * _tf{i}) "
            f"DIV (20 * tt * _tf{i} + 6 * tt + 18 * dl * n_docs)) DIV 1000"
        )
        for i in range(len(terms))
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return joined.select(
        key,
        F.col("dl").alias("n_tokens"),
        *[F.col(f"_tf{i}").alias(f"tf_{w}") for i, w in enumerate(terms)],
        score.cast("long").alias("bm25_micro"),
    )


def bm25_scores_py(
    docs: list[tuple[int, str]], terms: tuple[str, ...]
) -> dict[int, int]:
    """Pure-python twin of bm25_scores (same integer formula), for the
    pytest gate."""
    toked = {
        d: [t for t in txt.lower().split(" ") if t] for d, txt in docs
    }
    n = len(toked)
    tt = sum(len(v) for v in toked.values())
    dfs = {w: sum(1 for v in toked.values() if w in v) for w in terms}
    out = {}
    for d, v in toked.items():
        dl = len(v)
        s = 0
        for w in terms:
            tf = sum(1 for t in v if t == w)
            idf_permil = ((2 * (n - dfs[w]) + 1) * 1000) // (2 * dfs[w] + 1)
            tf_ppm = (1000000 * 44 * tt * tf) // (
                20 * tt * tf + 6 * tt + 18 * dl * n
            )
            s += idf_permil * tf_ppm // 1000
        out[d] = s
    return out


#: fixed replace() passes per BPE merge application. replace() consumes
#: its trailing delimiter, so one pass over " a a a a " merges only
#: every other occurrence of " a a "; each extra pass halves what's
#: left. 4 passes close any overlap run up to ~16 repeats — beyond any
#: natural word — and a FIXED count (not run-to-fixpoint) is what keeps
#: the result an exact, engine-neutral function of the data.
BPE_REPLACE_PASSES = 4


def bpe_train(
    df, n_merges: int = 6, text: str = "text", return_vocab: bool = False
):
    """Distributed BPE vocabulary induction — the merge-learning loop
    of Sennrich-Haddow-Birch 2016 §3.2 (and of every GPT-style
    tokenizer build), run as Spark aggregations over the WORD
    vocabulary:

      * ONE corpus scan builds (word, count) — from then on all state
        is vocabulary-sized, never corpus-sized (the classic reason
        BPE training scales: a 100 TB corpus has ~10^8 distinct words,
        not 10^13);
      * each round: adjacent symbol pairs via a JVM array transform
        weighted by word count → one hash-agg on the pair → the argmax
        ((count DESC, pair ASC) — deterministic tie-break) via
        TakeOrdered(1), a ONE-row driver collect per round (same
        bounded-collect budget as the IVF centroid sample);
      * the winning pair is applied to every word's symbol string with
        BPE_REPLACE_PASSES fixed replace() passes over the
        space-joined symbols (' a b ' → ' ab '; symbols never contain
        spaces, so the delimiters make the match unambiguous). Both
        Spark and DuckDB replace() scan left-to-right without
        rescanning replacements, so the oracle replays the exact
        transformation.

    The symbol-string frame is persisted once; each round's lineage is
    i replace-expressions over that cache. The learned merge table
    (n_merges rows) is assembled from the collected argmax rows — the
    output IS the bounded driver state.

    Returns a DataFrame (step, left_sym, right_sym, merged,
    pair_count)."""
    from pyspark.storagelevel import StorageLevel

    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text)), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    vocab = words.withColumn(
        "s", F.array_join(F.split(F.col("w"), ""), " ")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    spark = df.sparkSession
    merges = []
    sym = F.col("s")
    for step in range(1, n_merges + 1):
        toks = F.split(sym, " ")
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda j: F.concat(
                    F.element_at(toks, j), F.lit(" "), F.element_at(toks, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            vocab.select(F.col("n"), F.explode(pairs).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), "pr")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pr, c = best[0].pr, best[0].c
        left, right = pr.split(" ")
        merges.append((step, left, right, left + right, int(c)))
        pat, rep = f" {pr} ", f" {left + right} "
        padded = F.concat(F.lit(" "), sym, F.lit(" "))
        for _ in range(BPE_REPLACE_PASSES):
            padded = F.replace(padded, F.lit(pat), F.lit(rep))
        sym = F.trim(padded)
    if return_vocab:
        out = vocab.select(
            "w",
            F.col("n").cast("long").alias("n_occurrences"),
            F.length("w").cast("long").alias("n_chars_w"),
            F.size(F.split(sym, " ")).cast("long").alias("n_symbols"),
        )
        # the caller consumes `out` before the cache would matter; the
        # projection re-reads the persisted vocab exactly once
        _BPE_CACHES.append(vocab)
        return out
    vocab.unpersist()
    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


#: vocab frames still referenced by a bpe_train(return_vocab=True)
#: result; released via clear_bpe_caches() (wired into
#: __spark_entry__.clear_caches through the dedup-module convention).
_BPE_CACHES: list = []


def clear_bpe_caches() -> None:
    while _BPE_CACHES:
        _BPE_CACHES.pop().unpersist()


def bpe_segment(df, n_merges: int = 6, text: str = "text"):
    """The learned tokenizer APPLIED: every corpus word with its
    symbol count after `n_merges` BPE merges — the compression curve
    a tokenizer build is judged by (Σ n_occurrences·n_symbols is the
    corpus token count under the learned vocab; n_chars_w is the
    ceiling with no merges). Runs the same training loop and returns
    the final word→segmentation table instead of the merge list.
    Output: (w, n_occurrences, n_chars_w, n_symbols)."""
    return bpe_train(df, n_merges=n_merges, text=text, return_vocab=True)


def bpe_train_py(texts: list[str], n_merges: int = 6) -> list[tuple]:
    """Pure-python twin of bpe_train (same word counts, same argmax
    tie-break, same fixed-pass replace rule), for the pytest gate."""
    from collections import Counter

    words = Counter(
        t for txt in texts for t in txt.lower().split(" ") if t
    )
    syms = {w: " ".join(w) for w in words}
    out = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, s in syms.items():
            ts = s.split(" ")
            for a, b in zip(ts, ts[1:]):
                counts[f"{a} {b}"] += words[w]
        if not counts:
            break
        pr = min(counts, key=lambda p: (-counts[p], p))
        left, right = pr.split(" ")
        out.append((step, left, right, left + right, counts[pr]))
        pat, rep = f" {pr} ", f" {left + right} "
        for w in syms:
            padded = f" {syms[w]} "
            for _ in range(BPE_REPLACE_PASSES):
                padded = padded.replace(pat, rep)
            syms[w] = padded.strip(" ")
    return out


def keywords_topk(
    df: DataFrame, k: int = 3, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction: the top-k non-stopword tokens
    by tf·idf — the doc-level companion of bm25_scores' corpus query
    scoring (what is this page ABOUT, for anchor-text synthesis,
    topical routing, caption fallback). idf is the same log-free
    Robertson permil ratio as bm25_scores, so the score is an exact
    integer in any engine.

    Shape: one explode + (doc, tok) hash-agg for tf, one token-keyed
    hash-agg for df joined back ON TOKEN, the 1-row corpus count as a
    broadcast crossJoin, and a per-doc window top-k — partitioned BY
    DOCUMENT, so every window is bounded by a single doc's distinct
    token count; no global funnel anywhere.

    Output: (key, tok, tf, score_permil, kw_rank)."""
    from pyspark.sql.window import Window

    toks = (
        df.select(
            key, F.explode(tokens(F.lower(F.col(text)))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .filter(~F.col("tok").isin(*STOPWORDS))
    )
    tf = toks.groupBy(key, "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df_t"))
    nd = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score_permil",
            F.expr(
                "tf * (((2 * (n_docs - df_t) + 1) * 1000) DIV (2 * df_t + 1))"
            ).cast("long"),
        )
    )
    w = Window.partitionBy(key).orderBy(
        F.col("score_permil").desc(), F.col("tok")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("kw_rank") <= k)
        .select(
            key,
            "tok",
            F.col("tf").cast("long").alias("tf"),
            "score_permil",
            "kw_rank",
        )
    )


def collocations_topk(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text: str = "text",
) -> DataFrame:
    """Collocation (phrase) mining: adjacent-token bigrams ranked by a
    PMI-SHAPED association ratio — pointwise mutual information
    without its log, as the exact integer ppm of

        p(ab) / (p(a)·p(b)) = (c_ab · T²) / (B · c_a · c_b)

    computed with the FIXED nesting ((10⁶·c_ab·T) div (B·c_a))·T div
    c_b, which keeps every intermediate inside int64 for per-scope
    token totals up to ~10⁷ (shard the stats scope above that, as for
    bm25_scores). The nesting order is part of the contract — both
    engines replay it literally, so the score is engine-exact; and
    since log is monotone, the RANKING equals true-PMI ranking.

    Shape: one scan builds the token arrays; unigram and bigram
    hash-aggs; the two 1-row totals broadcast back; bigrams below
    `min_count` are dropped BEFORE the unigram joins (the Zipf tail is
    where PMI is pure noise — standard practice since Church & Hanks
    1990); final top-k is a TakeOrdered, never a global sort.

    Output: (w1, w2, pair_count, pmi_ratio_ppm)."""
    toks = F.filter(tokens(F.lower(F.col(text))), lambda t: t != F.lit(""))
    base = df.select(toks.alias("_tk"))
    uni = (
        base.select(F.explode(F.col("_tk")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    pairs = F.when(
        F.size(F.col("_tk")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_tk")) - 1),
            lambda j: F.struct(
                F.element_at(F.col("_tk"), j).alias("w1"),
                F.element_at(F.col("_tk"), j + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        base.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    tt = uni.agg(F.sum("c").alias("t_total"))
    bt = (
        base.select(
            F.greatest(F.size(F.col("_tk")) - 1, F.lit(0)).alias("_nb")
        )
        .agg(F.sum("_nb").alias("b_total"))
    )
    scored = (
        bi.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("pair_count"),
            F.expr(
                "(((1000000 * c_ab * t_total) DIV (b_total * c_a)) * t_total)"
                " DIV c_b"
            ).cast("long").alias("pmi_ratio_ppm"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio_ppm").desc(), "w1", "w2"
    ).limit(k)
