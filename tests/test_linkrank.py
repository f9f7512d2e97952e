"""Integer-exact PageRank (functions/linkrank.py): Spark result ==
pure-python reference on arbitrary small graphs, deterministic across
partition counts, and sane on canonical shapes.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccbot_spark.functions import linkrank


def _spark_ranks(spark, edges, iterations=3, parts=4):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = linkrank.pagerank_int(df, iterations=iterations)
    return {r.node: r.rank_micro for r in out.collect()}


edge_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(edge_st)
def test_matches_python_reference(spark, edges):
    assert _spark_ranks(spark, edges) == linkrank.pagerank_int_py(edges)


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(200)] + [
        (i, (i * 13 + 1) % 50) for i in range(0, 200, 2)
    ]
    a = _spark_ranks(spark, edges, parts=2)
    b = _spark_ranks(spark, edges, parts=16)
    assert a == b


def test_cycle_is_uniform_and_sink_gets_more():
    # 3-cycle: perfect symmetry, every node keeps exactly SCALE
    ranks = linkrank.pagerank_int_py([(0, 1), (1, 2), (2, 0)])
    assert set(ranks.values()) == {linkrank.SCALE}
    # star into a sink: the sink must outrank the sources
    ranks = linkrank.pagerank_int_py([(1, 0), (2, 0), (3, 0)])
    assert ranks[0] > ranks[1] == ranks[2] == ranks[3]


def test_repeated_edges_count_once(spark):
    once = _spark_ranks(spark, [(0, 1), (1, 0)])
    dup = _spark_ranks(spark, [(0, 1), (0, 1), (1, 0)])
    assert once == dup


# ---------------------------------------------------------------- HITS

def _spark_hits(spark, edges, iterations=2, parts=4):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = linkrank.hits_int(df, iterations=iterations)
    rows = {r.node: (r.hub_micro, r.auth_micro) for r in out.collect()}
    linkrank.clear_caches()
    return rows


@settings(max_examples=12, deadline=None)
@given(edge_st)
def test_hits_matches_python_reference(spark, edges):
    assert _spark_hits(spark, edges) == linkrank.hits_int_py(edges)


def test_hits_deterministic_across_partitionings(spark):
    edges = [(i % 40, (i * 7 + 3) % 50) for i in range(200)] + [
        (i % 50, (i * 13 + 1) % 40) for i in range(0, 200, 2)
    ]
    assert _spark_hits(spark, edges, parts=2) == _spark_hits(
        spark, edges, parts=16
    )


def test_hits_hub_authority_roles():
    # one hub linking to three authorities: the hub holds all hub
    # mass, the authorities split the authority mass evenly
    r = linkrank.hits_int_py([(9, 1), (9, 2), (9, 3)])
    hub, auth = r[9]
    assert auth == 0 and hub == linkrank.SCALE
    a_vals = {r[v][1] for v in (1, 2, 3)}
    assert len(a_vals) == 1 and a_vals.pop() > 0
    assert all(r[v][0] == 0 for v in (1, 2, 3))


def test_hits_norm_is_exact_floor():
    # the decomposed normalization == true floor(raw*S/tot) on values
    # near the int64-safety boundary (python bigints give the truth)
    S = linkrank.SCALE
    for raw, tot in [(1, 3), (2, 3), (10**12, 3 * 10**12),
                     (9_200_000_000_000 - 1, 9_200_000_000_000)]:
        got = (raw // tot) * S + ((raw % tot) * S) // tot
        assert got == (raw * S) // tot


def test_hits_repeated_edges_count_once(spark):
    once = _spark_hits(spark, [(0, 1), (1, 0)])
    dup = _spark_hits(spark, [(0, 1), (0, 1), (1, 0)])
    assert once == dup


# ---------------------------------------------------------------- triangles


def _spark_tri(spark, edges, parts=4):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = linkrank.triangle_stats(df)
    return {r.node: (r.degree, r.triangles, r.clus_milli) for r in out.collect()}


@settings(max_examples=10, deadline=None)
@given(edge_st)
def test_triangles_match_python_reference(spark, edges):
    got = _spark_tri(spark, edges)
    want = linkrank.triangle_stats_py(edges)
    assert got == want


def test_triangles_k4_and_orientation_invariance(spark):
    # K4: every node has degree 3, sits in 3 triangles, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _spark_tri(spark, k4)
    assert got == {n: (3, 3, 1000) for n in range(4)}
    # duplicated + reversed edges count once; result partition-invariant
    noisy = k4 + [(b, a) for a, b in k4] + k4
    assert _spark_tri(spark, noisy, parts=2) == got
    assert _spark_tri(spark, noisy, parts=16) == got


def test_triangles_star_has_none(spark):
    star = [(0, i) for i in range(1, 8)]
    got = _spark_tri(spark, star)
    assert got[0] == (7, 0, 0)
    for i in range(1, 8):
        assert got[i] == (1, 0, 0)


# ---------------------------------------------------------------- k-core


def _spark_kcore(spark, edges, k, parts=4):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = linkrank.kcore_members(df, k=k)
    got = {r.node: r.core_degree for r in out.collect()}
    linkrank.clear_caches()
    return got


@settings(max_examples=8, deadline=None)
@given(edge_st, st.integers(1, 4))
def test_kcore_matches_python_reference(spark, edges, k):
    assert _spark_kcore(spark, edges, k) == linkrank.kcore_members_py(edges, k)


def test_kcore_peels_tree_keeps_ring(spark):
    # ring-with-chords (3-core) + binary-tree tails that peel off
    edges = (
        [(i, (i + 1) % 50) for i in range(50)]
        + [(i, (i + 2) % 50) for i in range(50)]
        + [(i, i // 2) for i in range(50, 500)]
    )
    got = _spark_kcore(spark, edges, k=3)
    assert got == {i: 4 for i in range(50)}
    # partition-invariant
    assert _spark_kcore(spark, edges, k=3, parts=16) == got
    # k above the max coreness: empty
    assert _spark_kcore(spark, edges, k=5) == {}


def _spark_resolve(spark, edges, parts=4, **kw):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = {
        r.src: (r.dst, r.hops)
        for r in linkrank.resolve_redirects(df, **kw).collect()
    }
    linkrank.clear_caches()
    return out


def test_resolve_redirects_matches_python_walk(spark):
    """Pointer jumping == a direct per-chain python walk on a random
    functional DAG (every dst < src ⇒ acyclic), including a planted
    300-hop chain that needs ~9 shortcut rounds."""
    import random

    rng = random.Random(5)
    edges = []
    for s in range(2, 400):
        if rng.random() < 0.7:
            edges.append((s, rng.randrange(0, s)))
    # planted long chain: 1000 → 1001 → … → 1300 (ids disjoint)
    edges += [(1000 + i, 1001 + i) for i in range(300)]
    want = linkrank.resolve_redirects_py(edges)
    assert _spark_resolve(spark, edges) == want
    assert want[1000] == (1300, 300)  # the long chain resolved exactly


def test_resolve_redirects_cycle_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="cycle"):
        linkrank.resolve_redirects(df, max_rounds=6).collect()
    linkrank.clear_caches()


# ------------------------------------------------------------ LPA
def _lpa_py(edges, iterations=3):
    """Pure-python synchronous majority LPA, (count desc, label asc)
    tie-break — the label_propagation contract."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = {s for s, _ in und}
    nbrs = {n: [] for n in nodes}
    for s, d in und:
        nbrs[d].append(s)  # votes flow src -> dst
    labels = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            votes = {}
            for m in nbrs[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            if votes:
                new[n] = min(votes, key=lambda l: (-votes[l], l))
            else:
                new[n] = labels[n]
        labels = new
    return labels


@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_lpa_matches_python_reference(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    got = {
        r.node: r.community
        for r in linkrank.label_propagation(df, iterations=3).collect()
    }
    assert got == _lpa_py(edges)


def test_lpa_two_cliques_with_bridge(spark):
    # two 4-cliques joined by one bridge edge: LPA must keep them as
    # two communities labeled by each clique's smallest node id
    def clique(ns):
        return [(a, b) for a in ns for b in ns if a < b]

    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = linkrank.label_propagation(df, iterations=3).collect()
    comm = {r.node: r.community for r in out}
    assert {comm[0], comm[1], comm[2]} == {0}
    assert {comm[11], comm[12], comm[13]} == {10}
    sizes = {r.node: r.community_size for r in out}
    assert sizes[1] == sum(1 for n in comm if comm[n] == comm[1])


def test_lpa_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(60)]
    a = {
        (r.node, r.community)
        for r in linkrank.label_propagation(
            spark.createDataFrame(edges, "src long, dst long").repartition(2),
            iterations=3,
        ).collect()
    }
    b = {
        (r.node, r.community)
        for r in linkrank.label_propagation(
            spark.createDataFrame(edges, "src long, dst long").repartition(16),
            iterations=3,
        ).collect()
    }
    assert a == b


# ------------------------------------------------------------ PPR
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_ppr_matches_python_reference(spark, edges):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    got = {
        r.node: r.rank_micro
        for r in linkrank.ppr_int(
            df, is_seed=F.col("node") < 5, iterations=3
        ).collect()
    }
    want = linkrank.ppr_int_py(edges, seeds=set(range(5)), iterations=3)
    linkrank.clear_caches()
    assert got == want


def test_ppr_mass_stays_near_seeds(spark):
    # chain 0→1→2→…→9 seeded at {0}: rank must be strictly decreasing
    # along the chain and 0 on nodes unreachable from the seed side
    from pyspark.sql import functions as F

    edges = [(i, i + 1) for i in range(9)] + [(20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {
        row.node: row.rank_micro
        for row in linkrank.ppr_int(
            df, is_seed=F.col("node") == 0, iterations=4
        ).collect()
    }
    linkrank.clear_caches()
    assert r[0] > r[1] > r[2] > r[3]
    assert r[20] == 0 and r[21] == 0


# ------------------------------------------------------------ BFS depth
def test_bfs_depth_matches_python(spark):
    import __spark_entry__ as entry

    got = {
        r.node: r.depth
        for r in entry.queries()["link_bfs_depth"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    entry.clear_caches()
    # python BFS over the same synthetic graph, 3 levels, seeds < 40
    edges = set()
    for d in range(500):
        for t in ((d * 2 + 1) % 500, (d * 3 + 2) % 500):
            edges.add((d, t))
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    depth = {n: (0 if n < 40 else None) for n in range(500)}
    frontier = {n for n in depth if depth[n] == 0}
    for lvl in (1, 2, 3):
        nxt = set()
        for s in frontier:
            for t in adj.get(s, []):
                if depth[t] is None:
                    depth[t] = lvl
                    nxt.add(t)
        frontier = nxt
    want = {n: (d if d is not None else -1) for n, d in depth.items()}
    assert got == want
    assert any(v == 3 for v in got.values()) or any(
        v == -1 for v in got.values()
    )
