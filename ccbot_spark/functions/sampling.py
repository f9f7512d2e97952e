"""Deterministic sampling / quota operators for a training-data
pipeline (corpus curation over the `documents` table): hash-based
Bernoulli sampling, per-stratum rates, and per-group caps.

Why hash-based instead of df.sample(): `sample()` draws from a
per-partition RNG, so the selected set changes with partitioning and
can never be reproduced by an independent oracle. Hashing the row KEY
(md5-derived 64-bit integer, house construction shared with the dedup
oracles) makes selection a pure function of the data — stable across
engines, partitionings, and reruns, which is what corpus-curation
lineage ("which docs were in the training set?") actually needs.

Scale posture: sampling is a scan + filter (whole-stage codegen, no
shuffle); the stratum-rate join broadcasts a tiny dim; group_cap is
one window per group key — for pathologically hot groups, pre-cap per
(partition, group) first with the same two-phase trick as the
politeness GENERATE top-k (operators/politeness.py skew_safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_hash_mod(col, mod: int = 100):
    """Deterministic bucket in [0, mod): first 16 hex chars of md5 as
    an int64 (non-negative, < 2^63 after the 15-char truncation below
    — 60 bits — so no sign hazard), mod `mod`. Mirrored exactly by the
    oracle SQL's md5/Horner-fold construction."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(mod))


def hash_sample(df: DataFrame, key: str, pct: int, mod: int = 100) -> DataFrame:
    """Keep rows whose key hashes into the first `pct` of `mod`
    buckets — a deterministic ~pct/mod Bernoulli sample."""
    return df.filter(key_hash_mod(F.col(key), mod) < pct)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, rates: dict[str, int], mod: int = 100
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s]/mod
    of its rows (strata absent from `rates` are dropped). The rates dim
    is a handful of rows — broadcast, never a shuffle."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(rates.items())], f"{stratum} string, _pct int"
    )
    return (
        df.join(F.broadcast(dim), stratum)
        .filter(key_hash_mod(F.col(key), mod) < F.col("_pct"))
        .drop("_pct")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, int],
    source: str = "source",
    key: str = "doc_id",
    tokens: str = "n_tokens",
) -> DataFrame:
    """Static domain-mixture planner (the Pile / DoReMi-static corpus
    recipe): given integer target weights per source, select the
    LARGEST corpus achievable without upsampling any source, with each
    source contributing tokens in proportion to its weight.

    All-integer semantics (exactly oracle-reproducible):
      W        = sum(weights)
      avail_s  = sum(tokens) over source s          (one hash-agg)
      T        = min_s floor(avail_s * W / w_s)     (feasible total)
      budget_s = floor(w_s * T / W)                 (≤ avail_s always)
    Docs within a source are ordered by md5(key) (deterministic,
    engine-neutral) and a doc is selected iff the running token total
    BEFORE it is < budget_s — greedy prefix, so the realized mixture
    overshoots each budget by at most one document.

    Scale posture: the per-source availability table has one row per
    source (broadcast both ways); the corpus side sees one scan + one
    per-source window. The window's running sum is the only per-source
    serialization — for a source holding most of a 100 TB corpus,
    substitute sequencing.global_running_total per source bucket (same
    two-phase shape as w_global_runsum); selection itself stays a
    filter. Sources absent from `weights` are dropped (weight 0).

    Returns (key, source, tokens, cum_before, budget) for selected
    rows only — budget/cum_before kept for audit lineage.
    """
    spark = df.sparkSession
    total_w = int(sum(weights.values()))
    wdim = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(weights.items())],
        f"{source} string, _w long",
    )
    base = df.join(F.broadcast(wdim), source).select(
        source, key, F.col(tokens).cast("long").alias(tokens), "_w"
    )
    avail = base.groupBy(source, "_w").agg(F.sum(tokens).alias("_avail"))
    # feasible total corpus size: integer DIV keeps both engines exact
    t_row = avail.select(
        F.min(F.expr(f"_avail * {total_w} DIV _w")).alias("_t")
    )
    budgets = (
        avail.crossJoin(F.broadcast(t_row))
        .select(source, F.expr(f"_w * _t DIV {total_w}").alias("budget"))
    )
    w = (
        Window.partitionBy(source)
        .orderBy(F.md5(F.col(key).cast("string")), key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "cum_before", F.coalesce(F.sum(tokens).over(w), F.lit(0))
        )
        .join(F.broadcast(budgets), source)
        .filter(F.col("cum_before") < F.col("budget"))
        .select(key, source, tokens, "cum_before", "budget")
    )


def group_cap(
    df: DataFrame, group: str, order_by: list[str], k: int
) -> DataFrame:
    """At most `k` rows per group, chosen by the explicit `order_by`
    key list (deterministic — never arrival order). The per-domain /
    per-source contribution cap every corpus build applies."""
    w = Window.partitionBy(group).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hash_split(
    df: DataFrame,
    key: str,
    cuts: tuple[int, ...] = (90, 95),
    names: tuple[str, ...] = ("train", "val", "test"),
    mod: int = 100,
) -> DataFrame:
    """Deterministic train/val/test split — the assignment every
    training pipeline needs to be (a) reproducible across reruns and
    engines, and (b) stable under corpus growth (a doc's split never
    changes when other docs arrive, because it depends only on the
    doc's own key hash). Bucket = key_hash_mod(key, mod); split i is
    the half-open bucket range [cuts[i-1], cuts[i]). One column
    expression, zero shuffle, SQL-replayable."""
    if len(cuts) + 1 != len(names):
        raise ValueError("need len(cuts) + 1 names")
    b = key_hash_mod(F.col(key), mod)
    lab = F.lit(names[-1])
    for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
        lab = F.when(b < F.lit(cut), F.lit(name)).otherwise(lab)
    return df.select("*", b.alias("split_bucket"), lab.alias("split"))


def leakfree_split(
    df: DataFrame,
    key: str,
    pairs: DataFrame,
    a: str = "img_a",
    b: str = "img_b",
    cuts: tuple[int, ...] = (90, 95),
    names: tuple[str, ...] = ("train", "val", "test"),
    mod: int = 100,
) -> DataFrame:
    """Near-dup-closed train/val/test assignment — the FIXER for the
    split-leakage audit: hash_split keyed on the item's near-dup
    COMPONENT label (min reachable id via connected_components;
    singletons key on themselves), so every member of a duplicate
    neighborhood lands in the same split and cross-split leakage is
    zero BY CONSTRUCTION, not by post-hoc filtering. Still stable
    under corpus growth *within* a component's lifetime: an item's
    split moves only if new data merges its component — which is
    exactly when it must move to stay leak-free.

    Scale shape: components is the O(log diameter) pointer-jumping
    pass already paid for by dedup; the assignment itself is a left
    join + one column expression, zero extra shuffles beyond the
    component labels. Returns (key, group_key, split_bucket, split).
    """
    from ccbot_spark.functions import dedup as _dedup

    comp = _dedup.connected_components(pairs, a=a, b=b)
    with_group = (
        df.select(key)
        .join(comp.withColumnRenamed("doc_id", key), key, "left")
        .select(
            key,
            F.coalesce(F.col("cluster_id"), F.col(key)).alias("group_key"),
        )
    )
    out = hash_split(with_group, "group_key", cuts=cuts, names=names, mod=mod)
    return out.select(key, "group_key", "split_bucket", "split")


def temperature_plan(
    df: DataFrame,
    budget: int,
    source: str = "source",
    tokens: str = "n_tokens",
) -> DataFrame:
    """Temperature-scaled source mixture (the mBERT/XLM-R/mT5
    multilingual recipe, T = 2): sampling weight per source ∝
    availability^(1/T) = isqrt(avail_s) — low-resource sources are
    upweighted relative to their share, high-resource ones damped.

    All-integer semantics: avail_s from one hash-agg; w_s =
    floor(sqrt(avail_s)) (sqrt is a correctly-rounded IEEE op on an
    exact int64 → identical in every engine, the audiokit isqrt
    discipline); rate_ppm = 10^6·w_s DIV Σw and take_tokens =
    budget·w_s DIV Σw by integer division. One |sources|-row result —
    broadcast-sized at any corpus scale; the corpus side is a single
    scan + hash-agg with map-side combine.

    Returns (source, avail_tokens, weight, rate_ppm, take_tokens)."""
    avail = (
        df.groupBy(source)
        .agg(F.sum(F.col(tokens).cast("long")).alias("avail_tokens"))
        .withColumn(
            "weight", F.floor(F.sqrt(F.col("avail_tokens"))).cast("long")
        )
    )
    tot = avail.select(F.sum("weight").alias("_tw"))
    return (
        avail.crossJoin(F.broadcast(tot))
        .select(
            source,
            "avail_tokens",
            "weight",
            F.expr("weight * 1000000 DIV _tw").alias("rate_ppm"),
            F.expr(f"weight * {int(budget)} DIV _tw").alias("take_tokens"),
        )
    )


def epoch_shuffle_plan(
    df: DataFrame,
    epochs: int,
    key: str = "image_id",
    shard: str = "shard",
    seed: str = "ep",
) -> DataFrame:
    """Deterministic per-epoch shuffle plan — the WebDataset two-level
    recipe, which avoids the one thing a naive global shuffle needs
    (a full sort of the corpus per epoch): each epoch (1) permutes the
    SHARD ORDER by a seeded hash and (2) permutes samples WITHIN each
    shard by a seeded hash. A loader streaming shards in epoch order,
    samples in within-shard order, sees a fresh reproducible
    permutation every epoch with no global exchange: the within-shard
    window is bounded by shard size, the shard permutation by the
    shard COUNT (one tiny agg + broadcast join). Every rank is a
    row_number over md5(seed:epoch:·) — engine-neutral, so an
    independent SQL engine replays the exact permutation, and the plan
    is stable across reruns and cluster sizes by construction.

    Output: one row per (epoch, sample) — epoch:int, key, shard,
    shard_rank (position of the shard in this epoch's shard order),
    pos_in_shard, and global_pos = shard-offset + pos_in_shard (the
    0-based slot in the epoch's full permutation)."""
    ep = F.explode(
        F.sequence(F.lit(0), F.lit(int(epochs) - 1))
    ).alias("epoch")
    base = df.select(F.col(key).alias(key), F.col(shard).alias(shard))
    fanned = base.select("*", ep)
    skey = F.md5(
        F.concat_ws(
            ":", F.lit(seed), F.col("epoch").cast("string"),
            F.col(key).cast("string"),
        )
    )
    w_in = Window.partitionBy("epoch", shard).orderBy(skey, F.col(key))
    ranked = fanned.withColumn(
        "pos_in_shard", (F.row_number().over(w_in) - 1).cast("long")
    )

    sizes = base.groupBy(shard).agg(F.count("*").alias("_n"))
    shard_ep = sizes.select("*", ep)
    shkey = F.md5(
        F.concat_ws(
            ":", F.lit(seed), F.col("epoch").cast("string"),
            F.col(shard).cast("string"),
        )
    )
    w_sh = Window.partitionBy("epoch").orderBy(shkey, F.col(shard))
    order = shard_ep.withColumn(
        "shard_rank", (F.row_number().over(w_sh) - 1).cast("long")
    ).withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                w_sh.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    ).select("epoch", shard, "shard_rank", "_offset")

    return ranked.join(F.broadcast(order), ["epoch", shard]).select(
        F.col("epoch").cast("int").alias("epoch"),
        key,
        shard,
        "shard_rank",
        "pos_in_shard",
        (F.col("_offset") + F.col("pos_in_shard")).cast("long").alias("global_pos"),
    )


def contrastive_batch_plan(
    df: DataFrame,
    n_batches: int,
    key: str = "image_id",
    host: str = "host",
    seed: str = "cb",
) -> DataFrame:
    """Contrastive-batch composition with NO same-host negatives: in
    CLIP-style training every other sample in the batch is a negative,
    and two crops/pages from one site are usually NOT semantic
    negatives — a batch containing both teaches the model a false
    distinction. Assignment: rank each sample within its host by a
    seeded md5 (skew-safe grouped_rank — a hot host never funnels one
    window task), offset by the host's own hash, and stripe:

        batch = (md5(host) + host_rank) mod n_batches

    Within a host the ranks are consecutive, so batches are provably
    DISTINCT while host_rank < n_batches; rows past that (host bigger
    than the batch count — the only case where a same-host pair is
    unavoidable) keep their striped batch but carry overflow = 1 so
    the trainer can drop or re-shard them. Host offsets make the
    striping start uniform across hosts, so batch sizes balance in
    expectation with zero coordination. One hash-agg + bounded
    windows; SQL-replayable end to end.

    Output: (key, host, host_rank, batch, overflow 0/1)."""
    from ..operators import sequencing

    okey = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(key).cast("string"))
    )
    base = df.select(
        F.col(key).alias(key), F.col(host).alias(host), okey.alias("_ok")
    )
    ranked = sequencing.grouped_rank(base, [host], "_ok", out_col="host_rank")
    hbase = F.pmod(
        F.conv(F.substring(F.md5(F.col(host)), 1, 15), 16, 10).cast("long"),
        F.lit(n_batches),
    )
    return ranked.select(
        key,
        host,
        "host_rank",
        F.pmod(hbase + F.col("host_rank"), F.lit(n_batches))
        .cast("long")
        .alias("batch"),
        (F.col("host_rank") >= n_batches).cast("long").alias("overflow"),
    )


def curriculum_plan(
    df: DataFrame,
    epochs: int,
    quality: str = "quality",
    key: str = "doc_id",
    num_partitions: int = 32,
):
    """Curriculum schedule — anneal from the cleanest data to the full
    corpus: epoch e (0-based, of E) trains on the top ceil(n·(e+1)/E)
    samples by quality, so the first epoch sees the best 1/E of the
    corpus and the last sees everything. The global quality ranking is
    the two-phase global_sequence (range partition + per-partition
    offsets — never a single-partition Window.orderBy), ranked by
    (quality DESC, key) so ties are deterministic. One ranking pass
    serves every epoch; the per-epoch keep is a pure comparison
    against the exact prefix size.

    Returns (plan_df, cache_handle) — plan rows (epoch:int, key,
    quality, q_rank, keep 0/1); caller unpersists the handle after
    consuming (registry queries park it in _ACTIVE_CACHES)."""
    from ..operators import sequencing

    ranked, total, cache = sequencing.global_sequence(
        df.select(
            F.col(key).alias(key), F.col(quality).cast("long").alias(quality)
        ),
        [F.col(quality).desc(), F.col(key)],
        num_partitions,
        seq_col="q_rank",
    )
    ep = F.explode(F.sequence(F.lit(0), F.lit(int(epochs) - 1))).alias("epoch")
    e = int(epochs)
    plan = ranked.select("*", ep).select(
        F.col("epoch").cast("int").alias("epoch"),
        key,
        quality,
        "q_rank",
        (
            F.col("q_rank")
            < F.ceil(
                (F.lit(total) * (F.col("epoch") + 1)) / F.lit(e)
            ).cast("long")
        )
        .cast("long")
        .alias("keep"),
    )
    return plan, cache


def reservoir_sample(
    df: DataFrame, n: int, key: str = "doc_id", seed: str = "rs"
) -> DataFrame:
    """Fixed-SIZE uniform sample without replacement (vs hash_sample's
    fixed-RATE): keep the n rows with the smallest md5(seed:key) — the
    same distribution a reservoir sample draws, but deterministic,
    engine-neutral, and mergeable (the union of two partitions'
    top-n IS computable from their individual top-ns, which is
    exactly what Spark's TakeOrdered does: per-partition heads, then
    one n-row merge on the driver — never a global sort). Changing
    `seed` redraws independently; growing the corpus only evicts
    boundary rows."""
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(key).cast("string")))
    return df.withColumn("_rk", h).orderBy("_rk").limit(n).drop("_rk")


def weighted_sample(
    df: DataFrame, n: int, weight: str, key: str = "doc_id", seed: str = "ws"
) -> DataFrame:
    """Fixed-size probability-proportional-to-size sample WITHOUT
    replacement: sequential Poisson sampling (Ohlsson 1998; the
    priority-sampling family of Duffield-Lund-Thorup) — keep the n rows
    with the smallest u/w, where u is the deterministic 60-bit
    md5(seed:key) uniform and w the row's positive integer weight.
    Higher-weight rows draw systematically smaller priorities, so
    inclusion probability grows ~ proportionally to weight, yet the
    draw is fully deterministic and engine-neutral: u and w are exact
    integers, and IEEE double division is correctly rounded, so every
    engine computes the bit-identical priority. Scale path is the same
    as reservoir_sample: TakeOrdered = per-partition heads + one n-row
    driver merge, never a global sort; the union of two shards' top-n
    is computable from their individual top-ns, so the sample is
    mergeable across snapshots. Redraw with a new `seed`; scaling all
    weights by any constant leaves the selection unchanged (only
    weight RATIOS matter)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(key).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    pri = h.cast("double") / F.col(weight).cast("double")
    return (
        df.withColumn("_pri", pri).orderBy("_pri", key).limit(n).drop("_pri")
    )
