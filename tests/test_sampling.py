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


# ---------------------------------------------------------------- mixture


def _mixture_brute(rows, weights):
    """Sequential reimplementation of the all-integer mixture plan:
    rows = [(doc_id, source, n_tokens)]."""
    import hashlib

    W = sum(weights.values())
    avail = {}
    for _, s, t in rows:
        if s in weights:
            avail[s] = avail.get(s, 0) + t
    T = min(a * W // weights[s] for s, a in avail.items())
    budget = {s: weights[s] * T // W for s in avail}
    out = {}
    for s in avail:
        docs = sorted(
            (r for r in rows if r[1] == s),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        cum = 0
        for doc_id, _, t in docs:
            if cum < budget[s]:
                out[doc_id] = (s, t, cum, budget[s])
            cum += t
    return out


def test_mixture_plan_matches_brute_force(docs):
    weights = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
    d = docs.withColumn("n_tokens", textkit.token_count(F.col("text")))
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_before, r.budget)
        for r in sampling.mixture_plan(d, weights).collect()
    }
    rows = [
        (r.doc_id, r.source, r.n_tokens)
        for r in d.select("doc_id", "source", "n_tokens").collect()
    ]
    assert got == _mixture_brute(rows, weights)
    # non-vacuous: some source truncated, unweighted sources dropped
    kept_sources = {v[0] for v in got.values()}
    assert kept_sources == set(weights)
    n_src1 = sum(1 for r in rows if r[1] == "src1")
    assert sum(1 for v in got.values() if v[0] == "src1") < n_src1


def test_mixture_plan_no_upsampling_and_proportions(docs):
    weights = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
    d = docs.withColumn("n_tokens", textkit.token_count(F.col("text")))
    out = sampling.mixture_plan(d, weights)
    per = {
        r.source: (r.tok, r.budget)
        for r in out.groupBy("source", "budget")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    W = sum(weights.values())
    budgets = {s: b for s, (_, b) in per.items()}
    for s, (tok, b) in per.items():
        # greedy prefix: overshoot bounded by one doc; never upsampled
        avail = (
            d.filter(F.col("source") == s).agg(F.sum("n_tokens")).first()[0]
        )
        assert tok <= avail
        assert tok >= b  # budget met (binding source: tok == avail == b)
        # realized share within one max-doc of the target share
        assert abs(b * W - weights[s] * sum(budgets.values())) <= W * max(
            budgets.values()
        )


def test_mixture_plan_deterministic_across_partitionings(docs):
    weights = {"src0": 5, "src1": 3}
    d = docs.withColumn("n_tokens", textkit.token_count(F.col("text")))
    a = {r.doc_id for r in sampling.mixture_plan(d.repartition(2), weights).collect()}
    b = {r.doc_id for r in sampling.mixture_plan(d.repartition(16), weights).collect()}
    assert a == b and a


# ---------------------------------------------------------- trigram LM


def test_trigram_familiarity_matches_brute_force(spark):
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "zzqqxx"),   # rare trigrams → low score
        (4, "ab"),       # shorter than one trigram → zeros
        (5, ""),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tri, r.sum_freq, r.familiarity_x1000)
        for r in textkit.trigram_familiarity(df).collect()
    }
    from collections import Counter

    freq = Counter()
    tris = {}
    for doc_id, t in corpus:
        tris[doc_id] = [t[i : i + 3] for i in range(len(t) - 2)]
        freq.update(tris[doc_id])
    for doc_id, _ in corpus:
        ts = tris[doc_id]
        n = len(ts)
        s = sum(freq[x] for x in ts)
        assert got[doc_id] == (n, s, (s * 1000 // n) if n else 0)
    # the common-text doc outscores the gibberish doc
    assert got[1][2] > got[3][2]


def test_hash_split_partitions_exactly_and_stably(spark, docs):
    # every row gets exactly one split; the assignment is a pure
    # function of the row's own key (stable when the corpus grows);
    # ratios land near 90/5/5
    from ccbot_spark.functions import sampling

    full = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, "doc_id").collect()
    }
    assert set(full.values()) == {"train", "val", "test"}
    n = len(full)
    counts = {s: sum(1 for v in full.values() if v == s) for s in ("train", "val", "test")}
    assert counts["train"] > 0.8 * n and counts["val"] > 0 and counts["test"] > 0
    # growth stability: the half-corpus assignment agrees row for row
    import pyspark.sql.functions as SF

    half = {
        r.doc_id: r.split
        for r in sampling.hash_split(
            docs.filter(SF.col("doc_id") % 2 == 0), "doc_id"
        ).collect()
    }
    assert all(full[d] == s for d, s in half.items())
    import pytest as _pt

    with _pt.raises(ValueError):
        sampling.hash_split(docs, "doc_id", cuts=(50,), names=("a", "b", "c"))


def test_temperature_plan_matches_python(spark):
    """temperature_plan == an independent math.isqrt recomputation,
    and the damping actually bites: the largest source's sampling
    share (rate_ppm) sits strictly below its availability share."""
    import math

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
    got = {
        r.source: (r.avail_tokens, r.weight, r.rate_ppm, r.take_tokens)
        for r in sampling.temperature_plan(docs, budget=50000).collect()
    }
    avail = {}
    for r in docs.select("source", "n_tokens").collect():
        avail[r.source] = avail.get(r.source, 0) + r.n_tokens
    tw = sum(math.isqrt(a) for a in avail.values())
    n_tot = sum(avail.values())
    for s, a in avail.items():
        w = math.isqrt(a)
        assert got[s] == (a, w, w * 10**6 // tw, w * 50000 // tw), s
    big = max(avail, key=avail.get)
    assert got[big][2] < avail[big] * 10**6 // n_tot


def test_leakfree_split_zero_leakage_by_construction(spark):
    """leakfree_split: every near-dup component is split-PURE (the
    img_split_leakage audit re-run on the new assignment is empty),
    singletons keep the plain hash_split label, and a planted
    cross-split pair under plain hash_split is healed."""
    from ccbot_spark.functions import dedup as _dedup
    from pyspark.sql import functions as F

    items = spark.createDataFrame(
        [(f"img-{i}",) for i in range(400)], "image_id string"
    )
    # near-dup graph: chains of 3 (3k, 3k+1, 3k+2) for k < 40
    pair_rows = []
    for k in range(40):
        pair_rows += [
            (f"img-{3*k}", f"img-{3*k+1}"),
            (f"img-{3*k+1}", f"img-{3*k+2}"),
        ]
    pairs = spark.createDataFrame(pair_rows, "img_a string, img_b string")
    got = sampling.leakfree_split(items, "image_id", pairs).collect()
    sp = {r.image_id: r.split for r in got}
    grp = {r.image_id: r.group_key for r in got}
    assert len(sp) == 400

    # 1) audit on the new assignment: empty
    leaks = [(a, b) for a, b in pair_rows if sp[a] != sp[b]]
    assert leaks == []
    # component-transitive purity too (not just edge-adjacent)
    for k in range(40):
        trio = {sp[f"img-{3*k+j}"] for j in range(3)}
        assert len(trio) == 1
        assert {grp[f"img-{3*k+j}"] for j in range(3)} == {
            min(f"img-{3*k+j}" for j in range(3))
        }

    # 2) singletons: identical to plain hash_split
    plain = {
        r.image_id: r.split
        for r in sampling.hash_split(items, "image_id").collect()
    }
    linked = {x for ab in pair_rows for x in ab}
    for i in range(400):
        key = f"img-{i}"
        if key not in linked:
            assert sp[key] == plain[key]

    # 3) the fixture is non-vacuous: plain hash_split DOES leak on
    # at least one planted pair
    assert any(plain[a] != plain[b] for a, b in pair_rows)
    _dedup.clear_caches()


def test_epoch_shuffle_plan_permutation_properties(spark):
    # each epoch's global_pos is a permutation of 0..n-1; epochs give
    # DIFFERENT permutations; the plan is parallelism-independent; and
    # a shard's internal order is unaffected by other shards' content
    from ccbot_spark.functions import sampling

    df = spark.createDataFrame(
        [(f"s-{i:03d}", i % 5) for i in range(200)],
        "image_id string, shard int",
    )
    plan = sampling.epoch_shuffle_plan(df, epochs=3).collect()
    n = 200
    by_epoch = {}
    for r in plan:
        by_epoch.setdefault(r.epoch, {})[r.image_id] = r
    assert set(by_epoch) == {0, 1, 2}
    for ep, rows in by_epoch.items():
        assert sorted(r.global_pos for r in rows.values()) == list(range(n))
        # global_pos consistent with (shard_rank, pos_in_shard) order
        order_a = [k for k, r in sorted(rows.items(), key=lambda kv: kv[1].global_pos)]
        order_b = [
            k for k, r in sorted(
                rows.items(), key=lambda kv: (kv[1].shard_rank, kv[1].pos_in_shard)
            )
        ]
        assert order_a == order_b
    perms = [
        tuple(sorted(rows, key=lambda k: rows[k].global_pos))
        for rows in by_epoch.values()
    ]
    assert len(set(perms)) == 3, "epochs must permute differently"
    # parallelism-independent
    again = {
        (r.epoch, r.image_id): (r.shard_rank, r.pos_in_shard, r.global_pos)
        for r in sampling.epoch_shuffle_plan(df.repartition(7), epochs=3).collect()
    }
    want = {
        (r.epoch, r.image_id): (r.shard_rank, r.pos_in_shard, r.global_pos)
        for r in plan
    }
    assert again == want
    # growth stability: dropping shard 4 leaves every other shard's
    # within-shard order untouched (pos depends only on own members)
    sub = sampling.epoch_shuffle_plan(
        df.filter("shard < 4"), epochs=3
    ).collect()
    sub_pos = {(r.epoch, r.image_id): r.pos_in_shard for r in sub}
    for (ep, iid), (_, pos, _g) in want.items():
        if int(iid[2:]) % 5 < 4:
            assert sub_pos[(ep, iid)] == pos


def test_contrastive_batch_plan_no_same_host_pairs(spark):
    # the core guarantee: within a batch, non-overflow rows have
    # DISTINCT hosts; ranks are a permutation per host; grouped_rank
    # (md5-prefix buckets) == plain window rank at two parallelisms
    from pyspark.sql import functions as F
    from ccbot_spark.functions import sampling
    from pyspark.sql.window import Window

    rows = [
        (f"s-{i:03d}", f"h{i % 9}") for i in range(150)
    ] + [(f"big-{i:03d}", "hot") for i in range(40)]
    df = spark.createDataFrame(rows, "image_id string, host string")
    B = 16
    for parts in (1, 8):
        plan = sampling.contrastive_batch_plan(
            df.repartition(parts), n_batches=B
        ).collect()
        by_host = {}
        seen_batches = {}
        for r in plan:
            by_host.setdefault(r.host, []).append(r.host_rank)
            assert r.overflow == (1 if r.host_rank >= B else 0)
            if not r.overflow:
                k_ = (r.batch, r.host)
                assert k_ not in seen_batches, k_
                seen_batches[k_] = r.image_id
        for host, ranks in by_host.items():
            assert sorted(ranks) == list(range(len(ranks))), host
        # "hot" host (40 > B) must raise overflow on exactly 40 - B rows
        assert sum(1 for r in plan if r.host == "hot" and r.overflow) == 40 - B
        # grouped_rank == the naive window form
        okey = F.md5(F.concat_ws(":", F.lit("cb"), F.col("image_id")))
        w = Window.partitionBy("host").orderBy(okey)
        want = {
            r.image_id: r.rk
            for r in df.withColumn(
                "rk", (F.row_number().over(w) - 1).cast("long")
            ).collect()
        }
        assert {r.image_id: r.host_rank for r in plan} == want


def test_curriculum_plan_prefixes_grow_and_nest(spark):
    # epoch prefixes are exact sizes ceil(n(e+1)/E), nested (epoch e's
    # keep set ⊆ epoch e+1's), the last epoch keeps everything, and
    # ranks match a brute sort; parallelism-independent
    from ccbot_spark.functions import sampling

    rows = [(i, (i * 31) % 50) for i in range(97)]  # heavy quality ties
    df = spark.createDataFrame(rows, "doc_id long, quality long")
    E = 3
    for parts in (1, 8):
        plan, cache = sampling.curriculum_plan(
            df.repartition(parts), epochs=E, num_partitions=8
        )
        got = plan.collect()
        cache.unpersist()
        import math

        n = 97
        brute = sorted(rows, key=lambda r: (-r[1], r[0]))
        rank = {doc: i for i, (doc, _q) in enumerate(brute)}
        by_epoch = {}
        for r in got:
            assert r.q_rank == rank[r.doc_id]
            if r.keep:
                by_epoch.setdefault(r.epoch, set()).add(r.doc_id)
        prev = set()
        for e in range(E):
            want_sz = math.ceil(n * (e + 1) / E)
            assert len(by_epoch[e]) == want_sz, e
            assert prev <= by_epoch[e]
            prev = by_epoch[e]
        assert by_epoch[E - 1] == {d for d, _ in rows}


def test_weighted_sample_matches_python_reference(docs):
    # sequential Poisson: top-n by md5-uniform / weight must equal the
    # pure-python draw with the identical hash construction
    import hashlib

    rows = docs.select("doc_id", "n_chars").collect()
    pri = {
        r.doc_id: int(hashlib.md5(f"ws:{r.doc_id}".encode()).hexdigest()[:15], 16)
        / float(r.n_chars)
        for r in rows
    }
    want = set(sorted(pri, key=lambda d: (pri[d], d))[:60])
    got = {
        r.doc_id
        for r in sampling.weighted_sample(docs, n=60, weight="n_chars").collect()
    }
    assert got == want


def test_weighted_sample_scale_invariant_and_partition_stable(docs):
    # only weight RATIOS matter: w -> 7w leaves the selection unchanged;
    # and the draw is a pure function of the data, not the partitioning
    base = {
        r.doc_id
        for r in sampling.weighted_sample(
            docs.repartition(3), n=40, weight="n_chars"
        ).collect()
    }
    scaled = {
        r.doc_id
        for r in sampling.weighted_sample(
            docs.repartition(16).withColumn("w7", F.col("n_chars") * 7),
            n=40,
            weight="w7",
        ).collect()
    }
    assert base == scaled and len(base) == 40


def test_weighted_sample_skews_toward_weight(docs):
    # the selected set's mean weight must exceed the corpus mean — the
    # whole point of probability-proportional-to-size
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    picked_mean = (
        sampling.weighted_sample(docs, n=60, weight="n_chars")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert picked_mean > corpus_mean
