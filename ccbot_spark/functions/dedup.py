"""Deduplication operators for a training-data pipeline over the
`documents` table (exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup).

Scale design (100 TB of documents):
  * exact dedup is one hash-aggregate on md5(text) — a single shuffle
    keyed by digest, never by the raw text (bytes shuffled = 16/doc).
  * n-gram Jaccard / MinHash avoid the quadratic all-pairs join: pairs
    are generated ONLY via equi-joins on shingles / LSH band hashes
    (candidates ∝ true-duplicate density, not n²).
  * all thresholds are integer cross-multiplications (10*inter >=
    t10*union) — exact arithmetic, no float-epsilon drift between
    engines, and the DuckDB oracle can reproduce them verbatim.
  * per-doc shingle sets are bounded (cap via slice) so one pathological
    document can't blow up a join partition; LSH band tables are the
    skew-safe path for the heavy hitters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Intermediates persisted by the pair-generating functions (band /
# shingle / quantized tables reused across self-join sides). They must
# stay cached while the returned DataFrame is consumed, so the
# functions cannot unpersist them; callers running many dedup queries
# in one session call clear_caches() between batches (bench.py does).
_ACTIVE_CACHES: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _ACTIVE_CACHES.append(df)
    return df


def clear_caches() -> None:
    """Unpersist every intermediate cached by this module's dedup
    functions (safe while no returned DataFrame is still in use).
    Routed through storagekit.release: connected_components registers
    localCheckpoint frames whose blocks plain unpersist cannot free."""
    from .. import storagekit

    while _ACTIVE_CACHES:
        storagekit.release(_ACTIVE_CACHES.pop())


# MinHash parameters (mirrored by tests/test_dedup.py's reference impl)
MH_K = 64  # signature length
MH_BANDS = 8  # LSH bands
MH_ROWS = MH_K // MH_BANDS
_MH_P = 2147483647  # 2^31-1; products fit uint64
_rng = np.random.RandomState(42)
MH_A = _rng.randint(1, _MH_P, size=MH_K).astype(np.uint64)
MH_B = _rng.randint(0, _MH_P, size=MH_K).astype(np.uint64)


# ------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text: str = "text") -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id.
    Returns one row per distinct text: (text_md5, keeper_id, copies)."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("copies"),
        )
    )


# ------------------------------------------------------------- shingles

def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles, distinct, single-space tokenization —
    value-identical to the oracle SQL's list_transform/generate_series
    construction (guard: <n tokens → empty array).

    Built as n−1 chained zip_withs over shifted slices instead of a
    per-index slice+array_join transform: 3 array allocations per doc
    rather than one per gram — ~3× faster at the shingle-explode stage,
    which dominates every shingle-based dedup query."""
    toks = F.split(text_col, " ")
    k = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, k)
    for i in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(toks, i, k), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(
        F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))
    )


def doc_shingles(df: DataFrame, text: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded pairs, distinct per doc."""
    return df.select(
        "doc_id", F.explode(shingles(F.col(text), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text: str = "text", n: int = 3, t10: int = 5
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ t10/10, via shingle equi-join
    (never a cross join): explode → self-join on shingle → count the
    intersection → |A∪B| = |A|+|B|−inter → integer threshold test.

    Returns (doc_a, doc_b, inter, union_sz) with doc_a < doc_b.
    """
    # sh feeds three consumers (sizes + both join sides): materialize
    # the exploded shingle table once instead of recomputing the
    # split/zip_with pipeline per consumer
    sh = _persist(doc_shingles(df, text, n))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.col("inter") * 10 >= F.lit(t10) * F.col("union_sz"))
        .select("doc_a", "doc_b", "inter", "union_sz")
    )


def ngram_jaccard_pairs_capped(
    df: DataFrame, text: str = "text", n: int = 3, t10: int = 1, max_df: int = 20
) -> DataFrame:
    """Web-scale variant of ngram_jaccard_pairs: shingles appearing in
    more than `max_df` documents are dropped BEFORE any join (they are
    stop-shingles — at 10^10 docs a single ubiquitous shingle would
    otherwise create a count²-sized join group). Jaccard is computed
    over the FILTERED shingle sets on both sides, so the semantics are
    self-consistent and exactly mirrorable in SQL."""
    sh = _persist(doc_shingles(df, text, n))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df_ct"))
        .filter(F.col("df_ct") <= max_df)
        .select("shingle")
    )
    sh = _persist(sh.join(rare, "shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.col("inter") * 10 >= F.lit(t10) * F.col("union_sz"))
        .select("doc_a", "doc_b", "inter", "union_sz")
    )


# ------------------------------------------------------------- MinHash

def _h32_pair(hex_col: Column) -> tuple[Column, Column]:
    """(hi, lo): the first 8 bytes of an md5 hex string as two unsigned
    32-bit longs (hi = bytes 0-3, lo = bytes 4-7), so the full 64-bit
    hash value is hi·2^32 + lo. Two int64 conv casts keep every
    downstream op in whole-stage-codegen long arithmetic — decimal
    (the only Spark type that holds a raw uint64) would drop the plan
    out of codegen and cost ~3× on the dedup hot path."""
    hi = F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hex_col, 9, 8), 16, 10).cast("long")
    return hi, lo


def minhash_signatures(df: DataFrame, text: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures with NO Python in
    the hot path: shingle hashes via built-in md5/conv on the exploded
    shingle column, the signature fold as 64 JVM min-aggregates
    (a_i·x + b_i fits int64: both factors < 2^31). Map-side partial
    aggregation means the shuffle carries 64 longs per doc, not the
    shingle set. Output is bit-identical to minhash_signature_py
    (pytest-enforced)."""
    sh = df.select(
        "doc_id", F.explode_outer(shingles(F.col(text), n)).alias("shingle")
    ).withColumn("hex", F.md5("shingle"))
    # (hi·2^32 + lo) mod p == (hi·2 + lo) mod p, since 2^32 ≡ 2 (mod
    # 2^31−1); hi·2 + lo < 2^34 — pure long arithmetic, same value as
    # the reference's uint64 mod.
    hi, lo = _h32_pair(F.col("hex"))
    sh = sh.withColumn("x", (hi * 2 + lo) % F.lit(_MH_P)).drop("hex")
    aggs = [
        F.coalesce(
            F.min((F.lit(int(MH_A[i])) * F.col("x") + F.lit(int(MH_B[i]))) % F.lit(_MH_P)),
            F.lit(int(_MH_P)),  # empty shingle set → sentinel p (ref parity)
        ).alias(f"s{i}")
        for i in range(MH_K)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"s{i}" for i in range(MH_K)]).alias("sig"))
    )


def _shingle_hash_np(shingle_list: list[str]) -> np.ndarray:
    """Stable 32-bit-ish shingle hashes (md5 first 8 bytes mod p)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            % _MH_P
            for s in shingle_list
        ),
        dtype=np.uint64,
        count=len(shingle_list),
    )


def minhash_signature_py(shingle_list: list[str]) -> list[int]:
    """Reference MinHash signature (also used by the pandas UDF):
    sig[i] = min over shingles of (a_i*x + b_i) mod p. Empty set → p."""
    if not shingle_list:
        return [int(_MH_P)] * MH_K
    x = _shingle_hash_np(shingle_list)
    hs = (MH_A[:, None] * x[None, :] + MH_B[:, None]) % np.uint64(_MH_P)
    return hs.min(axis=1).astype(np.int64).tolist()


def minhash_lsh_candidates(
    df: DataFrame, text: str = "text", n: int = 3
) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 64-hash signature →
    8 bands of 8 → equi-join docs sharing any band (banding makes the
    join linear in true-pair density — the 100 TB path). Returns
    (doc_a, doc_b, est10) where est10 = 10*estimated-Jaccard rounded
    down (matching signature positions / K).

    The band table is persisted before the self-join: the join's build
    side is broadcast, so without materialization the whole
    shingle→hash→signature pipeline would run twice (once per side).
    At cluster scale this is the 'write the signature table once' step
    of every production MinHash pipeline; the cache is K longs + 8
    band hashes per doc — ~1 KB/doc, orders below the corpus."""
    sig = minhash_signatures(df, text, n)
    bands = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(MH_BANDS - 1)),
                lambda b: F.md5(
                    F.array_join(F.slice("sig", b * MH_ROWS + 1, MH_ROWS), ",")
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    bands = _persist(bands)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return cand.select(
        "doc_a", "doc_b", (matches * 10 / F.lit(MH_K)).cast("long").alias("est10")
    )


# ------------------------------------------------------------- SimHash

def simhash64_py(token_list: list[str]) -> int:
    """Reference SimHash: per-token 64-bit md5 hash; bit votes ±1;
    sign → bit. Returns signed int64 (two's complement)."""
    votes = np.zeros(64, dtype=np.int64)
    for t in token_list:
        h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    bits = 0
    for j in range(64):
        if votes[j] > 0:
            bits |= 1 << j
    return bits - (1 << 64) if bits >= (1 << 63) else bits


_BITS64 = np.arange(64, dtype=np.uint64)


def simhash64_np(token_list: list[str]) -> int:
    """Vectorized SimHash (identical output to simhash64_py; the bit
    votes run as one numpy broadcast instead of a 64-iteration Python
    loop per token)."""
    if not token_list:
        return 0
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in token_list
        ),
        dtype=np.uint64,
        count=len(token_list),
    )
    bits = ((h[:, None] >> _BITS64) & np.uint64(1)).astype(np.int64)  # (n, 64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(j)
    v = int(out)
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_signatures(df: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, sh: long) SimHash-64 with NO Python in the hot path:
    per-token 64-bit hash via built-in md5/conv on the exploded token
    column (two's-complement reinterpretation keeps bit ops on int64),
    bit votes as 64 conditional JVM sum-aggregates, sign → bit with
    weight −2^63 for bit 63. Token multiplicity counts (explode, not
    distinct) — bit-identical to simhash64_py (pytest-enforced)."""
    # explode_outer: a NULL text keeps its doc with one NULL token —
    # all 64 votes fall to the otherwise(-1) branch → sh = 0, matching
    # simhash64_py([]) and minhash_signatures' null policy
    tok = df.select(
        "doc_id", F.explode_outer(F.split(F.lower(F.col(text)), " ")).alias("tok")
    ).withColumn("hex", F.md5("tok"))
    # two unsigned 32-bit halves keep the bit extraction in long
    # codegen; bit j of the 64-bit hash lives in lo for j<32, hi else
    hi, lo = _h32_pair(F.col("hex"))
    tok = tok.withColumn("hh", hi).withColumn("hl", lo).drop("hex")
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(
                    F.col("hl") if j < 32 else F.col("hh"), j % 32
                ).bitwiseAND(F.lit(1))
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{j}")
        for j in range(64)
    ]
    weights = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    bits_expr = None
    for j in range(64):
        term = F.when(F.col(f"v{j}") > 0, F.lit(weights[j])).otherwise(F.lit(0))
        bits_expr = term if bits_expr is None else bits_expr + term
    return (
        tok.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", bits_expr.cast("long").alias("sh"))
    )


def simhash_near_pairs(df: DataFrame, text: str = "text", max_ham: int = 8) -> DataFrame:
    """SimHash near-dup pairs: Hamming(simhash_a, simhash_b) ≤ max_ham,
    found by the 4×16-bit band trick (a pair within Hamming ≤ 3 shares
    ≥1 exact band by pigeonhole; with max_ham > 3 the bands are a recall
    heuristic, as in production SimHash dedup). Join is equi on
    (band_id, band_val) — no cross join at any scale. The band table
    is persisted pre-join (same materialize-once rationale as
    minhash_lsh_candidates: the broadcast self-join would otherwise
    recompute the signature pipeline per side)."""
    sh = simhash_signatures(df, text)
    bands = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    bands = _persist(bands)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_ham)
    )


# ------------------------------------------------------------- clustering

def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_rounds: int = 25
) -> DataFrame:
    """Near-dup pairs → dedup clusters: (doc_id, cluster_id) with
    cluster_id = the MIN doc id reachable in the pair graph (the
    canonical 'keeper' every production dedup pipeline ends with —
    losers map to their cluster's keeper).

    Min-label propagation with pointer-jumping: each round takes the
    min label over self+neighbors, then shortcuts lab ← lab(lab), so
    convergence is O(log diameter) bounded-shuffle rounds instead of
    O(diameter) — a 10^10-scale near-dup component (celebrity images,
    boilerplate pages) resolves in ~a dozen equi-join + min-agg rounds,
    each shuffling one long per node. Deterministic (min is order-free
    and labels only decrease); raises after max_rounds rather than
    returning a silently unconverged clustering.
    """
    # localCheckpoint (eager) per round, NOT persist: an iterative
    # DataFrame loop re-references the previous round's plan several
    # times per round, so the LOGICAL plan grows exponentially and
    # Catalyst analysis dominates after a handful of rounds (caching
    # only short-circuits physical execution). Checkpointing truncates
    # lineage to a LogicalRDD — per-round plan cost stays constant.
    # Checkpoints go through storagekit so their blocks are actually
    # freed (DataFrame.unpersist is a no-op for checkpoint storage):
    # each round releases the prior round's labels, and the final
    # labels frame is registered for clear_caches().
    from .. import storagekit

    und = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = storagekit.local_checkpoint(
        und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = storagekit.local_checkpoint(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    for _ in range(max_rounds):
        nb = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lab").alias("nlab"))
            .withColumnRenamed("src", "node")
        )
        stepped = labels.join(nb, "node", "left").select(
            "node",
            F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias("lab"),
        )
        # pointer jump: labels are node ids, so lab(lab) is a self-join;
        # a label's own label can only be ≤ it (labels never increase)
        jumped = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("lab"), F.col("lab").alias("_ll")
                ),
                "lab",
            )
            .select("node", F.least(F.col("lab"), F.col("_ll")).alias("lab"))
        )
        new_labels = storagekit.local_checkpoint(jumped)
        changed = (
            new_labels.join(
                labels.select("node", F.col("lab").alias("_olab")), "node"
            )
            .filter(F.col("lab") != F.col("_olab"))
            .count()
        )
        storagekit.release(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    storagekit.release(edges)
    _ACTIVE_CACHES.append(labels)  # final: freed by clear_caches()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id")
    )


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    quality: str = "n_chars",
    doc_id: str = "doc_id",
) -> DataFrame:
    """The dedup endgame after clustering: one KEEPER per near-dup
    cluster — the highest-`quality` member (tie-break lowest doc id) —
    with unclustered docs kept as their own singletons. Output:
    (doc_id, cluster_id, quality) of the keepers only; the filtered
    corpus is exactly these doc ids.

    One broadcast-or-shuffle left join (clusters is |graph nodes| ≪
    |docs|) + one per-cluster window. Hot clusters (boilerplate with
    millions of members) stay safe: the window ranks within a cluster
    but only row 1 survives, and the same two-phase pre-cap used by
    the politeness GENERATE applies if a cluster ever dominates a
    task."""
    from pyspark.sql.window import Window

    joined = docs.select(doc_id, quality).join(
        clusters.withColumnRenamed("doc_id", doc_id), doc_id, "left"
    )
    cid = F.coalesce(F.col("cluster_id"), F.col(doc_id)).alias("cluster_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality), F.col(doc_id)
    )
    return (
        joined.select(doc_id, cid, quality)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------------- embeddings

# Sign-random-projection LSH planes, seeded from md5 so any engine can
# reproduce them: w[p][c] = (h64(f"plane:{p}:{c}") mod 2001) - 1000,
# an integer in [-1000, 1000].
EMB_PLANES = 64
EMB_BAND_BITS = 8  # 8 bands of 8 sign bits each
EMB_Q = 10_000  # embedding quantization scale (floor(x * EMB_Q))


def plane_weights(d: int, n_planes: int = EMB_PLANES) -> list[list[int]]:
    return [
        [
            int.from_bytes(
                hashlib.md5(f"plane:{p}:{c}".encode()).digest()[:8], "big"
            )
            % 2001
            - 1000
            for c in range(d)
        ]
        for p in range(n_planes)
    ]


def embedding_lsh_near_pairs(df: DataFrame, t4: int = 3500) -> DataFrame:
    """Sub-quadratic embedding near-dup: LSH-bucket equi-join prefilter
    → exact integer rerank. This is the 100 TB path (candidates ∝ bucket
    collision density, never n²); embedding_near_pairs is the small-n
    exact cross-check.

    Everything is integer-exact and engine-neutral: embeddings quantize
    to q[c] = floor(emb[c]·10^4); plane weights derive from md5; the
    cosine threshold cos ≥ t4/10^4 is tested as
    dot > 0  AND  10^8·dot² ≥ t4²·‖a‖²·‖b‖²  in decimal(38,0) — no
    float summation order anywhere, so the DuckDB oracle matches
    bit-for-bit by construction. Pairs must share at least one of the
    8 8-bit sign bands.

    Recall is the standard sign-LSH amplification 1-(1-p^8)^8 with
    p = 1 - acos(cos)/π: ≈0.96 at cos 0.92 (true near-dups, the
    intended regime — pytest asserts ≥0.8 on planted near-dups),
    falling steeply at permissive thresholds (≈0.15 at cos 0.35);
    random pairs collide at ≈3% (the 97% join reduction that makes
    this the scale path). For low-threshold similarity search use
    similarity.ann_* instead.
    """
    first = df.select("embedding").first()
    if first is None:  # empty input → empty pair set, no plan needed
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("vec_a", df.schema["vec_id"].dataType, True),
                    T.StructField("vec_b", df.schema["vec_id"].dataType, True),
                ]
            ),
        )
    d = len(first[0])
    planes = np.array(plane_weights(d), dtype=np.int64)  # (P, d)
    bitw = np.array([1 << j for j in range(EMB_BAND_BITS)], dtype=np.int64)
    n_bands = EMB_PLANES // EMB_BAND_BITS

    # Arrow-batched int64 matmul for the P plane dots + band packing —
    # exact integer arithmetic (no float summation order), ~10× over
    # an interpreted per-plane zip_with/aggregate fold at d=64, P=64.
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_vals_udf(qs: pd.Series) -> pd.Series:
        qm = np.vstack(qs.to_numpy()).astype(np.int64)  # (batch, d)
        bits = (qm @ planes.T > 0).astype(np.int64)  # (batch, P)
        vals = bits.reshape(len(qm), n_bands, EMB_BAND_BITS) @ bitw
        return pd.Series(list(vals))

    @F.pandas_udf(T.LongType())
    def int_dot_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xm = np.vstack(xs.to_numpy()).astype(np.int64)
        ym = np.vstack(ys.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", xm, ym))

    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * EMB_Q).cast("long"),
    )
    e = df.select("vec_id", q.alias("q"))
    # e feeds the band build and both rerank sides — materialize once
    e = _persist(e.withColumn("n2", int_dot_udf("q", "q")))
    bands = e.select(
        "vec_id",
        F.posexplode(band_vals_udf("q")).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("n2").alias("na2"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("n2").alias("nb2"))
    dot = int_dot_udf("qa", "qb")
    dec = "decimal(38,0)"
    lhs = (
        F.lit(EMB_Q).cast(dec) * F.lit(EMB_Q).cast(dec)
        * F.col("dot").cast(dec) * F.col("dot").cast(dec)
    )
    rhs = (
        F.lit(t4).cast(dec) * F.lit(t4).cast(dec)
        * F.col("na2").cast(dec) * F.col("nb2").cast(dec)
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("dot", dot)
        .filter((F.col("dot") > 0) & (lhs >= rhs))
        .select("vec_a", "vec_b")
    )

def embedding_near_pairs(df: DataFrame, t4: int = 3500) -> DataFrame:
    """Embedding-cosine near-dup pairs: cosine(a, b) ≥ t4/10000 over the
    `embeddings` table in double precision.

    The dot/norm sums are STRICT LEFT FOLDS in index order (np.cumsum,
    sequential by definition) — the exact summation order of the DuckDB
    oracle's list_sum fold — so the two engines compute bit-identical
    doubles and the threshold compare carries no float-epsilon
    assumption. embedding_lsh_near_pairs is the fully-integer,
    sub-quadratic scale path.

    This is the exact/baseline form (all-pairs join, fine to ~10^5
    vectors). Returns (vec_a, vec_b) id pairs only — no float output
    columns.
    """
    # The pair generation is a JVM-side join; the cosine is ONE
    # Arrow-vectorized pandas UDF over the pair batches — Catalyst's
    # interpreted higher-order-function fold is ~20× slower per pair.
    # cumsum (not einsum/sum: those may use pairwise/SIMD summation)
    # keeps the per-element fold order identical to a left fold.
    def _lfold_rows(m: np.ndarray) -> np.ndarray:
        return np.cumsum(m, axis=1)[:, -1]

    @F.pandas_udf(T.DoubleType())
    def cos_udf(ea: pd.Series, eb: pd.Series) -> pd.Series:
        ma = np.vstack(ea.to_numpy()).astype(np.float64)
        mb = np.vstack(eb.to_numpy()).astype(np.float64)
        dots = _lfold_rows(ma * mb)
        na = np.sqrt(_lfold_rows(ma * ma))
        nb = np.sqrt(_lfold_rows(mb * mb))
        return pd.Series(dots / (na * nb))

    e = df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", cos_udf(F.col("a.emb"), F.col("b.emb")))
        .filter(F.col("cos") >= F.lit(t4) / F.lit(10000.0))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
    )


# ----------------------------------------------------------- SemDeDup

def semdedup(
    df: DataFrame, n_centroids: int = 16, eps4: int = 9000
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = cluster the embedding space, then inside each
    cluster drop every item that has a ≥ ε cosine neighbor EARLIER in
    the keep order. The paper's keep order — ASCENDING similarity to
    the cluster centroid, i.e. the most atypical member of a duplicate
    neighborhood survives — is what distinguishes this from plain
    near-dup pruning, and their official implementation's "max sim to
    any previous item ≥ ε ⇒ drop" rule (y need not itself survive) is
    reproduced verbatim as an EXISTS join.

    Engine-neutral integer semantics end to end: vectors unit-quantize
    to floor((x/‖x‖)·2^20) (similarity._quantized_unit — left-fold
    norm, correctly-rounded IEEE ops); centroids are the deterministic
    seeded sample used by ivf_topk_int (at production scale you'd feed
    MLlib KMeans centers through the same assignment — the math
    downstream is unchanged); assignment = argmax exact int64 dot (tie
    → smaller cid); the ε test is the integer cross-multiplication
    10^4·dot(a,b) ≥ eps4·2^40 (dot ≤ 64·2^40 so ·10^4 < 2^63).

    Scale shape: the centroid table broadcasts (n_centroids rows);
    assignment is one scan + one small-side join; the only shuffle
    keys on cid; the within-cluster pair join is the paper's own
    Σ n_c² cost, bounded by cluster granularity (k grows with n —
    ~100k clusters at LAION scale keeps n_c ≈ 10^4). Quantized
    vectors, never raw floats, move through the shuffle.

    Returns (vec_id, cid, cdot, keep) — all int64, fully oracle-able.
    """
    from ccbot_spark.functions import similarity as _sim

    scale2 = _sim.IVF_SCALE * _sim.IVF_SCALE  # 2^40
    q = _sim._quantized_unit(df)
    cents = (
        q.filter(F.col("vec_id") % 997 < 31)
        .orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
    )
    from pyspark.sql.window import Window

    scored = q.join(F.broadcast(cents)).withColumn(
        "cdot", _sim._idot(F.col("q"), F.col("cq"))
    )
    wa = Window.partitionBy("vec_id").orderBy(
        F.col("cdot").desc(), F.col("cid").asc()
    )
    assign = _persist(
        scored.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "q", "cid", "cdot")
    )

    # Arrow-batched exact int64 pair dot (same rationale as
    # embedding_lsh_near_pairs: ~10× over the interpreted fold).
    @F.pandas_udf(T.LongType())
    def int_dot_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xm = np.vstack(xs.to_numpy()).astype(np.int64)
        ym = np.vstack(ys.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", xm, ym))

    a = assign.select(
        F.col("vec_id").alias("va"), F.col("q").alias("qa"),
        "cid", F.col("cdot").alias("ca"),
    )
    b = assign.select(
        F.col("vec_id").alias("vb"), F.col("q").alias("qb"),
        "cid", F.col("cdot").alias("cb"),
    )
    earlier = (F.col("cb") < F.col("ca")) | (
        (F.col("cb") == F.col("ca")) & (F.col("vb") < F.col("va"))
    )
    drops = (
        a.join(b, "cid")
        .filter(earlier)
        .withColumn("dot", int_dot_udf("qa", "qb"))
        .filter(F.lit(10_000) * F.col("dot") >= F.lit(eps4 * scale2))
        .select(F.col("va").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(drops.withColumn("_drop", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").cast("long").alias("cid"),
            "cdot",
            F.when(F.col("_drop").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("keep"),
        )
    )


# ------------------------------------------------------- decontamination

def contamination_hits(
    corpus: DataFrame, eval_set: DataFrame, n: int = 3
) -> DataFrame:
    """Train/eval decontamination: (doc_id, shared_grams) for every
    corpus doc sharing ≥ 1 word n-gram with the eval/benchmark set.

    The eval side of a decontamination pass is tiny relative to the
    corpus (benchmarks are 10^3–10^5 docs vs 10^9+ corpus docs), so its
    distinct gram set is broadcast; the corpus side is one
    shingle-explode scan + broadcast inner join + per-doc count — no
    shuffle of corpus grams at 100 TB (the groupBy shuffles only the
    HIT rows, a vanishing fraction). Per-doc grams are distinct
    (`shingles`), so the count is the number of distinct contaminated
    grams; the drop/flag policy stays with the caller."""
    ev = (
        eval_set.select(F.explode(shingles(F.col("text"), n)).alias("sh"))
        .distinct()
    )
    cg = corpus.select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("sh")
    )
    return (
        cg.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_grams"))
    )


# --------------------------------------------------- duplicate spans

def dup_span_features(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus duplicate-span signal (the exact-substring dedup
    measure of Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): for every document, how many of its tokens sit
    inside an n-gram that occurs anywhere ELSE in the corpus (or twice
    in the same doc). Output per doc: (doc_id, n_tokens, dup_tokens,
    dup_frac_x1000) — the gate a curation run thresholds on.

    Scale shape: tokens → positional n-grams entirely in JVM
    (``transform(sequence(...))`` + ``posexplode``), one hash-agg for
    global gram counts, one equi-join back (never all-pairs), an
    explode ×n bounded by doc length for interval coverage, and a
    per-doc distinct. Everything keys on the gram string; a 100 TB run
    would key on xxhash64(gram) instead (shuffle moves 8 bytes, not
    5 words) at the cost of SQL-oracle neutrality — mechanics
    identical.
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    grams = base.filter(F.col("n_tokens") >= n).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {n}),"
                f" i -> array_join(slice(toks, i + 1, {n}), ' '))"
            )
        ).alias("pos", "gram"),
    )
    dupg = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("gram")
    )
    cov = (
        grams.join(dupg, "gram")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("idx"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .filter(F.col("n_tokens") > 0)
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac_x1000",
            F.expr("1000 * dup_tokens div n_tokens").cast("long"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    text: str = "text",
    max_dist: int = 20,
    n: int = 3,
    t10: int = 3,
) -> DataFrame:
    """Fuzzy (edit-distance) near-dup pairs — the typo/OCR-noise dedup
    family Jaccard alone misses the thresholds for: CANDIDATES come
    from the shingle equi-join (ngram_jaccard_pairs at a loose t10 —
    never all-pairs, the only scale-safe blocking), and each candidate
    is VERIFIED by exact Levenshtein distance plus a length-difference
    sanity bound (|len(a)−len(b)| ≤ dist ≤ max_dist always holds for
    true matches, and the cheap length check documents it).

    levenshtein() is a JVM builtin with the identical definition in
    DuckDB, so the verify stage is engine-exact; the join that attaches
    the two texts to a candidate pair is by doc_id (the texts never
    participate in the shuffle key). Returns
    (doc_a, doc_b, dist, len_a, len_b) for pairs with dist ≤ max_dist.
    """
    cands = ngram_jaccard_pairs(df, text=text, n=n, t10=t10).select(
        "doc_a", "doc_b"
    )
    ta = df.select(
        F.col("doc_id").alias("doc_a"), F.col(text).alias("_ta")
    )
    tb = df.select(
        F.col("doc_id").alias("doc_b"), F.col(text).alias("_tb")
    )
    return (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_ta", "_tb").cast("long").alias("dist"),
            F.length("_ta").cast("long").alias("len_a"),
            F.length("_tb").cast("long").alias("len_b"),
        )
        .filter(F.col("dist") <= F.lit(max_dist))
    )


# ----------------------------------------------------- mirror hosts

def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 5,
    df_cap: int = 64,
    host: str = "host",
    digest: str = "digest",
) -> DataFrame:
    """Mirror-site detection over per-host content-digest sets — the
    crawl-budget saver: two hosts serving (near-)identical page sets
    should share ONE crawl budget, and the engine's content-seen dedup
    only catches the second copy after fetching it; this query finds
    the host pairs so a scheduler can stop fetching the mirror at all.

    pair(a, b): shared  = |digests(a) ∩ digests(b)|
                jaccard_milli = (shared · 1000) div |union|
    keeping pairs with shared ≥ min_shared. Digests served by more
    than df_cap hosts are dropped FIRST (boilerplate — error pages,
    empty pages — the same stop-shingle discipline as
    ngram_jaccard_pairs_capped), and the per-host set sizes used for
    the union are counted over the SAME capped universe, so the score
    is well-defined and SQL-replayable. Integer milli-units: no float
    hash hazard.

    Scale shape: one digest hash-agg for the cap + per-host sizes, one
    self equi-join ON DIGEST (each digest contributes ≤ df_cap² pairs,
    so the join output is ≤ |digests|·df_cap² — linear, never the
    all-pairs host quadratic), one pair hash-agg. Host-pair results
    are host-cardinality-sized."""
    p = pages.select(
        F.col(host).alias("host"), F.col(digest).alias("digest")
    ).distinct()
    # digests surviving the cap, with how many hosts serve each
    by_digest = p.groupBy("digest").agg(F.count("*").alias("n_hosts"))
    kept = p.join(
        by_digest.filter(F.col("n_hosts") <= df_cap).select("digest"),
        "digest",
    )
    kept = _persist(kept)
    sizes = kept.groupBy("host").agg(F.count("*").alias("n_digests"))
    a = kept.select(F.col("host").alias("host_a"), "digest")
    b = kept.select(F.col("host").alias("host_b"), "digest")
    shared = (
        a.join(b, "digest")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    # size attach: no broadcast hint — `shared` is pair-filtered small
    # but `sizes` is host-cardinality; AQE picks the build side from
    # runtime stats (at 10^8 hosts it broadcasts `shared`, not sizes)
    return (
        shared.join(
            sizes.withColumnRenamed("host", "host_a")
            .withColumnRenamed("n_digests", "na"),
            "host_a",
        )
        .join(
            sizes.withColumnRenamed("host", "host_b")
            .withColumnRenamed("n_digests", "nb"),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            F.col("shared").cast("long").alias("shared"),
            F.expr("(shared * 1000) div (na + nb - shared)")
            .cast("long")
            .alias("jaccard_milli"),
        )
    )


def incremental_dedup(
    prior: DataFrame,
    batch: DataFrame,
    digest,
    key: str = "doc_id",
) -> DataFrame:
    """Cross-snapshot incremental dedup — the per-batch corpus-hygiene
    pass of a CONTINUOUS crawl: a new batch is deduplicated (a)
    against the whole PRIOR corpus by content digest and (b) within
    itself, first occurrence (min key) winning. Every batch row comes
    back labeled:

        'prior_dup'  digest already in the prior corpus
        'batch_dup'  digest new, but an earlier batch row has it
        'kept'       the batch winner for a new digest

    `digest` is a Column expression evaluated on BOTH frames (md5 of
    the full text in production; any canonicalized fingerprint works).
    Shape: the prior side reduces to DISTINCT digests (digest-sized,
    not corpus-sized), one digest-keyed left join + one batch-side
    min-key hash-agg. At 10^10 prior digests the join rides the
    engine's Bloom-shard prefilter (seen.py) under the house
    prefilter-only exactness contract — the Bloom only ever skips
    definite non-members, so the result is identical."""
    d = batch.withColumn("_dg", digest)
    p = prior.select(digest.alias("_dg")).distinct().withColumn(
        "_in_prior", F.lit(1)
    )
    w = d.groupBy("_dg").agg(F.min(key).alias("_w"))
    return (
        d.join(p, "_dg", "left")
        .join(w, "_dg")
        .select(
            key,
            F.col("_dg").alias("digest"),
            F.when(F.col("_in_prior").isNotNull(), F.lit("prior_dup"))
            .when(F.col(key) != F.col("_w"), F.lit("batch_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
