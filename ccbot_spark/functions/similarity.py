"""Similarity search over an embedding column (`embeddings` table:
vec_id:int64, embedding:array<float>, label:int32).

Two tiers (SURVEY-style baseline + scale path):
  * `ann_bruteforce_topk` — exact cosine top-k: broadcast the (small)
    query set against the full vector table; one scan, no shuffle of
    the big side, rank with a per-query window. Exact double
    arithmetic mirrored by the DuckDB oracle (same fold order).
  * `ann_lsh_topk` — sign-random-projection LSH: 2^P hyperplane-sign
    buckets; candidates = vectors sharing the query's bucket; exact
    rerank inside the bucket. Sub-linear candidates per query — the
    10^9-vector path (bucket table is also the natural IVF layout:
    partition-by-bucket at write time makes a query a partition-pruned
    scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

LSH_PLANES = 6  # 2^6 buckets; scale P with log2(n_vectors / target_bucket_size)


def _cos(a: Column, b: Column) -> Column:
    """cosine(a, b) in exact left-fold double arithmetic (matches the
    oracle SQL's list_sum(list_transform(...)) evaluation order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


def ann_bruteforce_topk(
    df: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries (a deterministic
    small subset), candidates = every OTHER vector. The query side is
    broadcast; the big side streams through one scan. Returns
    (query_id, neighbor_id, rank) — integer output only, so the oracle
    comparison has no float-hash hazard. Ties broken by neighbor_id."""
    e = df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    joined = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def _bucket_udf(dim: int):
    """Sign buckets from the md5-seeded INTEGER planes shared with
    functions/dedup (plane_weights) over floor(emb*10^4)-quantized
    vectors: exact int64 arithmetic, so the bucket assignment is
    engine-neutral and the DuckDB oracle reproduces it bit-for-bit."""
    from .dedup import EMB_Q, plane_weights

    planes = np.array(plane_weights(dim, n_planes=LSH_PLANES), dtype=np.int64)

    @F.pandas_udf(T.IntegerType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(np.float64)
        q = np.floor(mat * EMB_Q).astype(np.int64)
        signs = (q @ planes.T) > 0  # (batch, P) — exact integer dots
        vals = np.zeros(len(embs), dtype=np.int32)
        for p in range(LSH_PLANES):
            vals |= signs[:, p].astype(np.int32) << p
        return pd.Series(vals)

    return bucket


def lsh_buckets(df: DataFrame, dim: int = 64) -> DataFrame:
    """Assign each vector its sign-projection bucket (vectorized numpy
    matmul per Arrow batch). At scale this DataFrame is written
    partitioned by `bucket` — queries then partition-prune."""
    b = _bucket_udf(dim)
    return df.select("vec_id", "embedding", b(F.col("embedding")).alias("bucket"))


def ivf_build(
    df: DataFrame, out_dir: str, n_centroids: int = 16, dim: int = 64
) -> np.ndarray:
    """IVF index build: coarse-quantize every vector to its nearest
    centroid and write the table PARTITIONED BY the centroid id.

    Centroids are a deterministic seeded sample of the data (k-means
    would drop in here unchanged). At 10^9 vectors the payoff is
    physical: a query only scans its probed centroids' partitions —
    Spark partition pruning, visible as PartitionFilters in the plan.
    Returns the centroid matrix (small; the query side broadcasts it).
    """
    sample = df.filter(F.col("vec_id") % 997 < 31).limit(n_centroids).collect()
    cents = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in sample]
    )[:n_centroids]

    @F.pandas_udf(T.IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(np.float64)
        sims = mat @ cents.T  # cosine order == dot order after norm
        sims /= np.linalg.norm(mat, axis=1)[:, None]
        sims /= np.linalg.norm(cents, axis=1)[None, :]
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    (
        df.withColumn("centroid", assign(F.col("embedding")))
        .repartition(F.col("centroid"))
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(out_dir)
    )
    return cents


def ivf_query(
    spark,
    index_dir: str,
    centroids: np.ndarray,
    query_vecs: dict[int, np.ndarray],
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: probe each query's nprobe nearest centroids, scan
    ONLY those partitions (pushed partition filter), exact rerank
    inside. Returns DF[query_id, neighbor_id, rank]."""
    qids = sorted(query_vecs)
    qmat = np.vstack([query_vecs[q] for q in qids]).astype(np.float64)
    sims = qmat @ centroids.T
    sims /= np.linalg.norm(qmat, axis=1)[:, None]
    sims /= np.linalg.norm(centroids, axis=1)[None, :]
    probes = np.argsort(-sims, axis=1)[:, :nprobe]  # (nq, nprobe)

    probe_rows = [
        (int(q), int(c)) for qi, q in enumerate(qids) for c in probes[qi]
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id int, centroid int")
    wanted = sorted({c for _, c in probe_rows})

    # partition-pruned scan: only the probed centroid dirs are read
    idx = spark.read.parquet(index_dir).filter(F.col("centroid").isin(wanted))
    cand = idx.join(F.broadcast(probe_df), "centroid").filter(
        F.col("vec_id") != F.col("query_id")
    )

    qb = {int(q): query_vecs[q] for q in qids}

    @F.pandas_udf(T.DoubleType())
    def cos_q(qid: pd.Series, embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(np.float64)
        qm = np.vstack([qb[int(q)] for q in qid]).astype(np.float64)
        dots = np.einsum("ij,ij->i", mat, qm)
        return pd.Series(
            dots
            / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qm, axis=1))
        )

    scored = cand.withColumn("cos", cos_q(F.col("query_id"), F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ann_lsh_topk(
    df: DataFrame, n_queries: int = 10, k: int = 5, dim: int = 64
) -> DataFrame:
    """Approximate top-k: rerank only within the query's LSH bucket.
    Candidates/query ≈ n/2^P — the join is equi on `bucket`, never a
    cross join. Recall measured against ann_bruteforce_topk in tests."""
    bk = lsh_buckets(df, dim).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "bucket"
    )
    q = bk.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    joined = (
        bk.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------------------------------------- integer IVF

IVF_SCALE = 1 << 20  # quantization of unit-normalized coords (exact in int64)


def _quantized_unit(df: DataFrame) -> DataFrame:
    """vec_id → q: array<long>, q[c] = floor((x_c / ||x||) · 2^20).

    The norm is a strict left fold in element order (`F.aggregate`),
    which DuckDB's `list_sum(list_transform(...))` reproduces
    bit-for-bit; /, ·2^20, sqrt and floor are correctly-rounded IEEE
    ops, so the quantized vectors are ENGINE-NEUTRAL — every downstream
    comparison is on exact int64 arithmetic."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    q = F.transform(v, lambda x: F.floor(x / nrm * F.lit(float(IVF_SCALE))).cast("long"))
    return df.select("vec_id", q.alias("q"))


def _idot(a: Column, b: Column) -> Column:
    """Exact int64 dot of two quantized vectors (64 · 2^40 < 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_topk_int(
    df: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """IVF cosine top-k with fully integer-exact, oracle-able semantics.

    The float IVF (`ivf_build`/`ivf_query`) is the physical-layout
    variant (index PARTITIONED BY centroid, partition-pruned probes —
    plan-asserted in tests/test_plans.py); this one fixes every
    tie-prone comparison in int64 so a DuckDB oracle can replay it:

      * centroids: the n_centroids smallest vec_ids with
        vec_id % 997 < 31 (deterministic seeded sample stand-in);
      * assignment: argmax integer dot(q_vec, q_cent), tie → smaller
        centroid vec_id — the coarse quantizer;
      * probes: each query's nprobe best centroids by the same order;
      * rerank: integer dot within probed cells only, tie → smaller
        neighbor_id.

    On unit-quantized vectors the integer dot is monotone in cosine up
    to 2^-20 quantization, so recall matches the float IVF; at 10^10
    vectors the assignment is one broadcast join (centroid table is
    tiny) and the probe scan touches nprobe/n_centroids of the data —
    same physical story as ivf_query, with partitionBy(centroid) as the
    layout when the index is materialized."""
    q = _quantized_unit(df)
    cents = (
        q.filter(F.col("vec_id") % 997 < 31)
        .orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
    )
    scored = q.join(F.broadcast(cents)).withColumn(
        "dot", _idot(F.col("q"), F.col("cq"))
    )
    wa = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("cid").asc()
    )
    assign = (
        scored.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "q", "cid")
    )
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("dot", _idot(F.col("qq"), F.col("cq")))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("dot").desc(), F.col("cid").asc()
            )
        ))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qq", "cid")
    )
    cand = assign.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _idot(F.col("qq"), F.col("q")).alias("dot"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------- PQ

def pq_train(
    df: DataFrame, m: int = 16, k: int = 32, iters: int = 8, dim: int = 64
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al.): the embedding
    splits into m subvectors; each subspace gets k centroids from
    Lloyd k-means on a DETERMINISTIC seeded sample (bounded driver
    collect — the ivf_build posture; deterministic init = first k
    sample rows, so retraining reproduces the index byte-for-byte).
    Returns (m, k, dim/m) float64 — a few KB that every scorer
    broadcasts."""
    if dim % m:
        raise ValueError("dim must divide into m subspaces")
    rows = (
        df.filter(F.col("vec_id") % 997 < 127)
        .limit(max(2048, 4 * k))
        .collect()
    )
    X = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in rows]
    )
    d_sub = dim // m
    books = np.zeros((m, k, d_sub), dtype=np.float64)
    for j in range(m):
        sub = X[:, j * d_sub : (j + 1) * d_sub]
        cents = sub[:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(k):
                sel = sub[a == c]
                if len(sel):
                    cents[c] = sel.mean(0)
        books[j] = cents
    return books


def pq_encode(df: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes: array<int> of length m) — each 64-dim float
    vector compresses to m sub-space centroid ids (m·log2(k) bits; at the
    m=16, k=32 defaults that is 10 bytes per vector, a ~26× shrink —
    recall-calibrated on the fixture embeddings). One
    Arrow-vectorized argmin pass; the codebooks ride the closure
    (broadcast-sized)."""
    m, k, d_sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(embs: pd.Series) -> pd.Series:
        X = np.vstack(embs.to_numpy()).astype(np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * d_sub : (j + 1) * d_sub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d2.argmin(1)
        return pd.Series(list(codes))

    return df.select("vec_id", enc(F.col("embedding")).alias("codes"))


def ann_pq_topk(
    df: DataFrame,
    books: np.ndarray,
    n_queries: int = 5,
    k: int = 3,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes its m×k subspace distance table driver-side (tiny),
    every candidate's approximate L2 distance is m table lookups —
    never a d-dim dot — and a per-query window ranks. At 10^9 vectors
    the scan reads 4-byte codes instead of 256-byte vectors (the
    memory-bandwidth win PQ exists for); compose with the IVF
    partition layout for sub-linear candidates. Approximate by
    construction — recall vs the exact brute-force scorer is the
    pytest gate."""
    m, kk, d_sub = books.shape
    q_rows = (
        df.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    tables = {}
    for r in q_rows:
        qv = np.asarray(r.embedding, dtype=np.float64)
        t = np.empty((m, kk), dtype=np.float64)
        for j in range(m):
            qs = qv[j * d_sub : (j + 1) * d_sub]
            t[j] = ((books[j] - qs[None, :]) ** 2).sum(-1)
        tables[int(r.vec_id)] = t
    codes = pq_encode(df, books)
    qids = sorted(tables)
    q_df = df.sparkSession.createDataFrame(
        [(i,) for i in qids], "query_id long"
    )

    @F.pandas_udf(T.DoubleType())
    def adist(qid: pd.Series, codes_s: pd.Series) -> pd.Series:
        C = np.vstack(codes_s.to_numpy()).astype(np.int64)
        out = np.empty(len(C), dtype=np.float64)
        rng = np.arange(m)
        for q in np.unique(qid.to_numpy()):
            t = tables[int(q)]
            sel = (qid == q).to_numpy()
            out[sel] = t[rng[None, :], C[sel]].sum(1)
        return pd.Series(out)

    wr = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        codes.join(F.broadcast(q_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adist(F.col("query_id"), F.col("codes")).alias("adist"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
        )
    )


# ------------------------------------------------- CLIP-score-shaped filter


def caption_tower_sparse(
    docs: DataFrame, dim: int = 64, text: str = "text"
) -> Column:
    """Deterministic STUB text tower for the CLIP-score curation gate:
    each lowercased caption token hashes into one of `dim` coordinates
    (first-8-md5-hex-chars bucket — the repo's engine-neutral hash
    idiom) with a ±1 sign from the 9th md5 hex char's parity; the
    caption embedding is the signed token-count vector, kept SPARSE as
    (doc_id, bucket, cval) rows.

    A real deployment swaps this for an ONNX/torch text encoder
    broadcast to the executors — the surrounding plumbing (sparse
    per-coordinate rows, integer dot against the stored image
    embedding, cross-multiplied cosine gate) is the part that has to
    be Spark-shaped, and it is: one explode + one (doc_id, bucket)
    hash-agg with map-side combine, ≤ min(n_tokens, dim) rows per
    caption into the join. Returns a DataFrame (doc_id, bucket, cval),
    zero rows for coordinates that cancel to 0."""
    from . import textkit

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                textkit.tokens(F.lower(F.col(text))),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    sign = (
        F.conv(F.substring(F.md5(F.col("tok")), 9, 1), 16, 10).cast("long")
        % 2
    ) * 2 - 1
    return (
        toks.select(
            "doc_id",
            textkit.feature_bucket(F.col("tok"), dim).alias("bucket"),
            sign.alias("s"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("long").alias("cval"))
        .filter(F.col("cval") != 0)
    )


def clip_align_filter(
    docs: DataFrame,
    embs: DataFrame,
    dim: int = 64,
    t4: int = 200,
    text: str = "text",
) -> DataFrame:
    """CLIP-score-shaped image–text alignment gate (the LAION-400M/5B
    curation step: drop pairs whose caption does not describe the
    image, cosine(text_emb, image_emb) < threshold).

    The image tower's output is the stored `embedding` column
    (embeddings table, vec_id = the pair id); the text tower is the
    deterministic stub in `caption_tower_sparse` (a deployment
    broadcasts real encoder weights there). Both sides are made
    ENGINE-EXACT: the image embedding is unit-normalized and quantized
    to int64 (floor(x/‖x‖·2^20) — `_quantized_unit`, the IVF
    discipline), the caption vector is integer by construction, and
    the cosine threshold is a cross-multiplied integer compare in
    decimal(38,0) (exact: |10^8·dot²| < 10^26 ≪ 10^38), so there is no
    float-hash hazard anywhere.

    Scale shape: caption side explodes to ≤ min(n_tokens, dim) sparse
    rows per doc and hash-aggregates with map-side combine; ONE
    equi-join on the pair id attaches the image vector; the dot is
    element_at on the quantized array (JVM, no shuffle beyond the
    join); per-pair reduce is a second hash-agg on the same key. The
    embedding array never leaves the JVM and the blob/text columns are
    pruned before the shuffle. keep ⇔ dot > 0 ∧ 10^8·dot² ≥
    t4²·cap_n2·img_n2 (t4 = cosine threshold in 1e-4 units).

    Returns (image_id, dot, cap_n2, img_n2, keep) — all int64."""
    cap = caption_tower_sparse(docs, dim=dim, text=text)
    qv = _quantized_unit(embs).select(
        F.col("vec_id").alias("image_id"),
        "q",
        _idot(F.col("q"), F.col("q")).alias("img_n2"),
    )
    j = cap.join(
        qv, cap["doc_id"] == qv["image_id"]
    ).select(
        "image_id",
        "img_n2",
        (F.col("cval") * F.element_at("q", F.col("bucket").cast("int") + 1))
        .alias("term"),
        (F.col("cval") * F.col("cval")).alias("c2"),
    )
    per = j.groupBy("image_id", "img_n2").agg(
        F.sum("term").cast("long").alias("dot"),
        F.sum("c2").cast("long").alias("cap_n2"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lhs = d38(F.lit(100000000)) * d38(F.col("dot")) * d38(F.col("dot"))
    rhs = (
        d38(F.lit(t4 * t4)) * d38(F.col("cap_n2")) * d38(F.col("img_n2"))
    )
    keep = (F.col("dot") > 0) & (lhs >= rhs)
    return per.select(
        "image_id",
        "dot",
        "cap_n2",
        "img_n2",
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep"),
    )


def clip_align_project(
    df: DataFrame,
    dim: int = 64,
    t4: int = 200,
    caption: str = "caption",
    embedding: str = "embedding",
    id_col: str = "image_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-ROW projection form of `clip_align_filter` — the SAME
    integers (stub tower, 2^20 quantization, dot, cross-multiplied
    gate) computed as one stateless JVM expression per pair, no
    explode, no shuffle, no state. This is the form a STREAM applies
    (Structured Streaming stateless projection; also the right shape
    when the pair row already carries both caption and embedding and a
    dense O(dim·n_tokens) per-row fold beats two hash-aggs).

    Rows whose caption tower is identically zero (no tokens, or every
    coordinate cancels) are dropped — the sparse batch form never
    emits them either. Returns (id, dot, cap_n2, img_n2, keep) +
    keep_cols passthrough."""
    toks = F.filter(
        F.split(F.lower(F.col(caption)), " "), lambda t: t != F.lit("")
    )
    zero = F.lit(0).cast("long")

    def bucket(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(dim),
        )

    def sign(t):
        return (
            F.conv(F.substring(F.md5(t), 9, 1), 16, 10).cast("long") % 2
        ) * 2 - 1

    cap_vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.aggregate(
            toks,
            zero,
            lambda acc, t: acc
            + F.when(bucket(t) == b.cast("long"), sign(t)).otherwise(zero),
        ),
    )
    v = F.transform(F.col(embedding), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    q = F.transform(
        v, lambda x: F.floor(x / nrm * F.lit(float(IVF_SCALE))).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("image_id"),
        *[F.col(c) for c in keep_cols],
        cap_vec.alias("_cap"),
        q.alias("_q"),
    ).select(
        "image_id",
        *keep_cols,
        F.aggregate(
            F.zip_with(F.col("_cap"), F.col("_q"), lambda c, x: c * x),
            zero,
            lambda a, x: a + x,
        ).alias("dot"),
        F.aggregate(
            F.col("_cap"), zero, lambda a, c: a + c * c
        ).alias("cap_n2"),
        _idot(F.col("_q"), F.col("_q")).alias("img_n2"),
    ).filter(F.col("cap_n2") != 0)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    keep = (F.col("dot") > 0) & (
        d38(F.lit(100000000)) * d38(F.col("dot")) * d38(F.col("dot"))
        >= d38(F.lit(t4 * t4)) * d38(F.col("cap_n2")) * d38(F.col("img_n2"))
    )
    return base.select(
        "image_id",
        *keep_cols,
        "dot",
        "cap_n2",
        "img_n2",
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep"),
    )
