"""Link-graph priority recompute (frontier priority scoring family,
SURVEY.md §2.2 u_priority / §2.4): an iterative PageRank over the
page link graph, the standard crawl-ordering signal (OPIC / PageRank
frontier prioritization per the Mercator/IRLbot line of crawlers).

Integer-exact by construction — the house oracle discipline: ranks
live in int64 micro-units (1.0 == 10^6) and every
update uses only integer division and integer sums, so the result is
bit-identical regardless of aggregation order or engine (Spark `div`
and DuckDB `//` both truncate; all values here are non-negative, so
truncation == floor on both). Float PageRank would hash-mismatch the
oracle on summation order alone.

Update rule (damping d = num/den, default 85/100):

    contrib(u)   = rank(u) div outdeg(u)          # u with outdeg >= 1
    rank'(v)     = base + (num * sum contrib(u->v)) div den
    base         = (scale * (den - num)) div den

Dangling nodes (outdeg 0) keep receiving the base term but their mass
is not redistributed — the "sink loses mass" PageRank variant, chosen
because it needs no global dangling-sum reduction per iteration (one
fewer all-to-one aggregate at 10^10-edge scale) and stays exactly
SQL-expressible for the oracle.

Scale posture: each iteration is one equi-join (edges ⨝ ranks, shuffle
on src) + one sum-agg (shuffle on dst) — 8 bytes of rank per node on
the wire, no driver-side state. The loop localCheckpoints per round
(eager) so the logical plan stays O(1) deep; persist alone would let
Catalyst analysis grow exponentially with iterations (same pattern as
dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import storagekit

SCALE = 1_000_000

# The returned ranks frame is a localCheckpoint whose blocks stay
# executor-resident until explicitly freed (DataFrame.unpersist is a
# no-op for checkpoint blocks — see storagekit). Long sessions running
# many queries (bench.py, notebooks) call clear_caches() once the
# result is consumed; intermediates are freed inside pagerank_int
# itself, round by round.
_ACTIVE_CHECKPOINTS: list[DataFrame] = []


def clear_caches() -> None:
    """Free the checkpoint blocks of every ranks frame returned by
    pagerank_int (safe once no returned DataFrame is still in use)."""
    while _ACTIVE_CHECKPOINTS:
        storagekit.release(_ACTIVE_CHECKPOINTS.pop())


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """DF[node long, rank_micro long] after `iterations` rounds of the
    integer-exact update above, starting every node at SCALE.

    Nodes are the union of both endpoint columns; edges are directed
    and deduplicated (a repeated (src,dst) pair counts once, matching
    a link-graph's set semantics)."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e0 = storagekit.local_checkpoint(e0)  # reused below: truncate lineage once
    nodes = storagekit.local_checkpoint(
        e0.select(F.col("src").alias("node"))
        .unionByName(e0.select(F.col("dst").alias("node")))
        .distinct()
    )
    # outdeg is loop-invariant: join it onto the edges ONCE, so each
    # iteration is a single equi-join + one agg instead of two joins
    e = storagekit.local_checkpoint(
        e0.join(e0.groupBy("src").agg(F.count("*").alias("outdeg")), "src")
    )
    storagekit.release(e0)  # nodes and e are materialized; e0 is done
    base = (SCALE * (damping_den - damping_num)) // damping_den

    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("long"))
    prev = None
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = storagekit.local_checkpoint(  # eager: constant-depth plan
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(in_sum, 0L)) div {damping_den}"
                    )
                ).cast("long").alias("rank_micro"),
            )
        )
        storagekit.release(prev)  # prior round's blocks, no longer referenced
        prev = ranks
    storagekit.release(e)
    if iterations > 0:  # 0 rounds: ranks still reads from the nodes blocks
        storagekit.release(nodes)
    _ACTIVE_CHECKPOINTS.append(ranks)  # final result: freed by clear_caches()
    return ranks


def pagerank_int_py(
    edge_list: list[tuple],
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> dict:
    """Pure-python reference of the same integer update rule, over any
    orderable node ids (ints in the property tests, url strings in the
    oracle crawler's re-prioritization) — the property-test oracle
    (tests/test_linkrank.py) AND the normative rank the crawl oracle
    uses when rank_every is on."""
    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg: dict[int, int] = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (SCALE * (damping_den - damping_num)) // damping_den
    rank = {n: SCALE for n in nodes}
    for _ in range(iterations):
        in_sum = {n: 0 for n in nodes}
        for u, v in e:
            in_sum[v] += rank[u] // outdeg[u]
        rank = {n: base + (damping_num * in_sum[n]) // damping_den for n in nodes}
    return rank


def host_authority(host_edges: DataFrame, micro: int = 1_000_000) -> DataFrame:
    """Seed-ranking authority over the HOST graph (the Common Crawl
    host-webgraph consumption step): every source host splits one unit
    of endorsement across its out-edges in proportion to link counts —

        authority(h) = Σ_src (n_edges(src→h) · micro) div outdeg(src)

    with outdeg(src) = Σ n_edges(src→*). Integer micro-units
    throughout (div truncation is part of the contract), so the score
    is engine-exact and SQL-replayable. Input: the g_hostgraph rollup
    (src_host, dst_host, n_edges). Shape: one outdeg hash-agg (rows =
    #hosts — broadcastable), one equi-join, one hash-agg on dst_host;
    at 10^8 hosts everything stays host-cardinality-sized, orders of
    magnitude below the page graph."""
    outdeg = host_edges.groupBy("src_host").agg(
        F.sum("n_edges").alias("_out")
    )
    contrib = host_edges.join(F.broadcast(outdeg), "src_host").select(
        "dst_host",
        F.expr(f"(CAST(n_edges AS BIGINT) * {int(micro)}) div _out").alias(
            "_c"
        ),
    )
    return contrib.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("_c").alias("authority_micro"),
        F.count("*").alias("n_in_hosts"),
    )

def _norm_expr(raw: str, total: str, scale: int) -> str:
    """SQL for the exact integer normalization floor(raw·scale/total)
    decomposed so no intermediate exceeds raw·scale:

        (raw div total)·scale + ((raw % total)·scale) div total

    (write raw = total·q + r: raw·scale/total = q·scale + r·scale/total
    and q·scale is integral, so floor distributes). raw ≤ total always
    holds here (raw is one non-negative summand of total), so q ∈
    {0, 1} and the largest intermediate is raw·scale — int64-safe
    while raw < 2^63/scale ≈ 9.2e12 at the default SCALE, i.e. per-node
    in-degree below ~9.2e6 at unit mass. Hotter nodes than that mean
    the page graph is the wrong granularity: run HITS on the host
    graph (10^8 nodes, like host_authority) or move these two ops to
    decimal(38,0)/HUGEINT at a constant-factor cost."""
    return (
        f"(({raw}) div ({total})) * {scale}"
        f" + ((({raw}) % ({total})) * {scale}) div ({total})"
    )


def hits_int(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
    scale: int = SCALE,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs & authorities) — the other
    classic crawl-ordering signal next to PageRank: a page is a good
    HUB if it links to good authorities, a good AUTHORITY if good hubs
    link to it. Frontier schedulers use the hub score to prioritize
    link-rich index pages and the authority score for content pages.

    House oracle discipline: all arithmetic is int64 with truncating
    division, so the result is bit-identical regardless of aggregation
    order or engine. Per iteration (mirrored CTE-for-CTE by the
    DuckDB oracle):

        a_raw(v) = Σ_{u→v} hub(u)            # one shuffle on dst
        A        = Σ_v a_raw(v)              # exact global int sum
        auth(v)  = floor(a_raw(v)·scale / A) # _norm_expr, no overflow
        h_raw(u) = Σ_{u→v} auth(v)           # one shuffle on src
        H        = Σ_u h_raw(u)
        hub(u)   = floor(h_raw(u)·scale / H)

    The L1 normalization (sum, not the float L2 of the original
    paper) keeps total mass ≈ scale each half-round — deterministic
    and SQL-replayable where sqrt is not. Nodes with no in-edges have
    auth 0; no out-edges, hub 0; every node starts at hub = scale.

    Returns DF[node long, hub_micro long, auth_micro long].

    Scale posture: each iteration is two equi-joins + two hash-aggs
    (shuffles keyed on dst then src — the same two partitionings every
    round, so AQE reuses exchange layouts), plus two single-row global
    sums that broadcast back via crossJoin (no driver collect). Ranks
    are 16 bytes/node on the wire; the loop localCheckpoints per
    round so the plan stays O(1) deep, and intermediate blocks are
    released round-by-round (same lifecycle as pagerank_int)."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = storagekit.local_checkpoint(e0)
    nodes = storagekit.local_checkpoint(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.withColumn("hub", F.lit(scale).cast("long"))
    prev = None
    prev_auths = None
    auths = None
    for _ in range(iterations):
        storagekit.release(prev_auths)  # prior round's auths, superseded
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_tot = a_raw.agg(F.sum("a_raw").alias("a_tot"))
        auths = storagekit.local_checkpoint(
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                F.expr(
                    _norm_expr("coalesce(a_raw, 0L)", "a_tot", scale)
                ).cast("long").alias("auth"),
            )
        )
        h_raw = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        h_tot = h_raw.agg(F.sum("h_raw").alias("h_tot"))
        new_hubs = storagekit.local_checkpoint(
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                F.expr(
                    _norm_expr("coalesce(h_raw, 0L)", "h_tot", scale)
                ).cast("long").alias("hub"),
            )
        )
        storagekit.release(prev)
        hubs = new_hubs
        prev = new_hubs
        prev_auths = auths
    out = storagekit.local_checkpoint(
        hubs.join(auths, "node").select(
            "node",
            F.col("hub").alias("hub_micro"),
            F.col("auth").alias("auth_micro"),
        )
    )
    storagekit.release(prev)
    storagekit.release(auths)
    storagekit.release(e)
    storagekit.release(nodes)
    _ACTIVE_CHECKPOINTS.append(out)
    return out


def hits_int_py(
    edge_list: list[tuple], iterations: int = 2, scale: int = SCALE
) -> dict:
    """Pure-python reference of the same integer HITS rule (the
    property-test oracle in tests/test_linkrank.py)."""
    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw: int, total: int) -> int:
        return (raw // total) * scale + ((raw % total) * scale) // total

    for _ in range(iterations):
        a_raw = {n: 0 for n in nodes}
        for u, v in e:
            a_raw[v] += hub[u]
        a_tot = sum(a_raw.values())
        auth = {n: norm(a_raw[n], a_tot) for n in nodes}
        h_raw = {n: 0 for n in nodes}
        for u, v in e:
            h_raw[u] += auth[v]
        h_tot = sum(h_raw.values())
        hub = {n: norm(h_raw[n], h_tot) for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ord_base: int = 1_000_000_000,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph given as (possibly directed / duplicated) edges —
    the standard webgraph cohesion signal (link-farm and mirror-cluster
    detection read high clustering; bridge hubs read low).

    Degree-ordered orientation (Suri & Vassilvitskii, WWW'11 MapReduce
    triangle counting): canonicalize each edge, compute degrees, orient
    every edge from the endpoint with the smaller (degree, id) key to
    the larger. Each triangle is then counted exactly once at its
    lowest-key corner, and — the scale property — the maximum oriented
    out-degree is O(sqrt(m)), so the wedge self-join (the only
    superlinear step) is bounded by m^1.5 TOTAL and no single hot node
    (a celebrity page with 10^7 in-links) can create a 10^14-row wedge
    partition: a hub's edges orient INTO it, not out of it.

    Integer-exact output: (node, degree, triangles, clus_milli) with
    clus_milli = (2000·triangles) div (degree·(degree-1)) for
    degree ≥ 2, else 0 — div truncation contractual, SQL-replayable.

    ord_base must exceed every node id so ordkey = degree·ord_base + id
    is a strict total order packed in one int64 (degree < 2^29 at the
    default; beyond that pass a bigger base or go to the struct
    comparator). Shape: one distinct (canon), one hash-agg (degrees),
    two equi-joins to attach keys, the wedge self-join on the low
    endpoint, one closing equi-join, one explode + hash-agg. All
    shuffles are on node ids; nothing is collected on the driver."""
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(
            F.least(a, b).alias("ca"), F.greatest(a, b).alias("cb")
        )
        .where(F.col("ca") != F.col("cb"))
        .distinct()
    )
    deg = (
        canon.select(F.col("ca").alias("node"))
        .unionAll(canon.select(F.col("cb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    keyed = (
        canon.join(deg.withColumnRenamed("node", "ca"), "ca")
        .withColumnRenamed("degree", "da")
        .join(deg.withColumnRenamed("node", "cb"), "cb")
        .withColumnRenamed("degree", "db")
        .select(
            (F.col("da") * ord_base + F.col("ca")).alias("ka"),
            (F.col("db") * ord_base + F.col("cb")).alias("kb"),
            "ca",
            "cb",
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("ca")).otherwise(F.col("cb")).alias("lo"),
        F.when(F.col("ka") < F.col("kb"), F.col("cb")).otherwise(F.col("ca")).alias("hi"),
        F.greatest("ka", "kb").alias("hi_key"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, "lo").where(F.col("e1.hi_key") < F.col("e2.hi_key")).select(
        F.col("lo").alias("w0"),
        F.col("e1.hi").alias("w1"),
        F.col("e2.hi").alias("w2"),
    )
    tri = wedges.join(
        oriented.select(F.col("lo").alias("w1"), F.col("hi").alias("w2")),
        ["w1", "w2"],
    )
    per_node = (
        tri.select(F.explode(F.array("w0", "w1", "w2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2000 * coalesce(triangles, 0))"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clus_milli"),
        )
    )


def triangle_stats_py(edge_list):
    """Pure-python oracle twin of triangle_stats (set intersection)."""
    e = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    adj: dict = {}
    for u, v in e:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    # each triangle contributes 1 to each corner; canonical u < v < w
    # counts it exactly once at its (min, mid) edge
    for u, v in e:
        common = adj[u] & adj[v]
        for w in common:
            if w > v:  # canonical u < v < w counts once
                for n in (u, v, w):
                    tri[n] += 1
    out = {}
    for n, d in ((n, len(adj[n])) for n in adj):
        t = tri[n]
        out[n] = (d, t, (2000 * t) // (d * (d - 1)) if d >= 2 else 0)
    return out


def kcore_members(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """DF[node long, core_degree long]: the k-core of the undirected
    graph — the maximal subgraph where every node keeps degree ≥ k —
    via Matula–Beck iterative peeling: drop nodes with degree < k,
    recompute degrees in the induced subgraph, repeat to fixpoint.
    core_degree is the node's degree WITHIN the core.

    The crawl read: a host/page's coreness separates densely
    interlinked regions (directories, link farms, genuine hub
    communities — high core) from tendrils and tree-shaped spam chains
    (peel off in the first rounds), a standard webgraph
    decomposition signal next to PageRank/HITS.

    Shape per round: one degree hash-agg + two semi-joins (both ends
    of each edge must survive) — all shuffles on node ids, no driver
    state beyond one count per round for the fixpoint test. Rounds are
    bounded by the peeling depth (the graph's degeneracy ordering
    height), typically O(log n) on web graphs — NOT by n: each
    localCheckpoint keeps the plan O(1) deep and prior rounds' blocks
    are released eagerly (same discipline as pagerank_int).

    Raises RuntimeError if the peel hasn't converged after max_rounds
    — a diverging peel means pathological chain structure; raise
    max_rounds or pre-trim leaves with a cheaper degree filter."""
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    cur = storagekit.local_checkpoint(
        edges.select(
            F.least(a, b).alias("ca"), F.greatest(a, b).alias("cb")
        )
        .where(F.col("ca") != F.col("cb"))
        .distinct()
    )
    n_edges = cur.count()
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("ca").alias("node"))
            .unionAll(cur.select(F.col("cb").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("core_degree"))
        )
        keep = deg.where(F.col("core_degree") >= k)
        if n_edges == 0:
            break
        nxt = storagekit.local_checkpoint(
            cur.join(
                keep.select(F.col("node").alias("ca")), "ca", "left_semi"
            ).join(
                keep.select(F.col("node").alias("cb")), "cb", "left_semi"
            )
        )
        n_next = nxt.count()
        if n_next == n_edges:
            storagekit.release(nxt)
            break
        storagekit.release(cur)
        cur = nxt
        n_edges = n_next
    else:
        raise RuntimeError(f"k-core peel did not converge in {max_rounds} rounds")
    # fixpoint: every surviving node has core_degree >= k already
    out = storagekit.local_checkpoint(keep)
    storagekit.release(cur)
    _ACTIVE_CHECKPOINTS.append(out)
    return out


def kcore_members_py(edge_list, k):
    """Pure-python oracle twin of kcore_members."""
    e = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    while True:
        deg: dict = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = {(u, v) for u, v in e if u in keep and v in keep}
        if e2 == e:
            return {n: deg[n] for n in keep}
        e = e2


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """DF[src long, dst long, hops long]: resolve every redirecting
    URL's 301 chain to its TERMINAL target (a node with no outgoing
    redirect) plus the exact hop count — the canonicalization pass a
    crawler runs over its accumulated redirect records before link
    analysis, so that PageRank/HITS/anchor aggregation credit the
    final URL rather than each hop of the chain.

    Input is a functional graph (≤ 1 outgoing redirect per src — the
    crawler stores the latest observed Location per URL) and must be
    acyclic; a redirect LOOP that survives `max_rounds` pointer-jump
    rounds raises rather than silently emitting a non-terminal.

    Pointer jumping: each round rewrites next(x) ← next(next(x)) and
    hops(x) ← hops(x) + hops(next(x)) via ONE self equi-join on the
    next-pointer, so a chain of length L resolves in ⌈log2 L⌉ rounds
    (max_rounds = 30 covers 10^9-hop chains — i.e. any real crawl).
    Every shuffle moves 3 longs per unresolved row; resolved rows
    drop out of the join via the left join's null side. Same
    localCheckpoint-per-round + eager-release discipline as
    pagerank_int/kcore (plan stays O(1) deep, blocks freed)."""
    m = storagekit.local_checkpoint(
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("nxt"),
            F.lit(1).cast("long").alias("hops"),
        )
    )
    for _ in range(max_rounds):
        step = m.select(
            F.col("src").alias("k"),
            F.col("nxt").alias("k_nxt"),
            F.col("hops").alias("k_hops"),
        )
        open_rows = m.join(step, m.nxt == step.k, "left_semi")
        if open_rows.isEmpty():
            break
        nxt = storagekit.local_checkpoint(
            m.join(step, m.nxt == step.k, "left").select(
                "src",
                F.coalesce("k_nxt", "nxt").alias("nxt"),
                (
                    F.col("hops") + F.coalesce("k_hops", F.lit(0))
                ).alias("hops"),
            )
        )
        storagekit.release(m)
        m = nxt
    else:
        raise RuntimeError(
            f"redirect chains did not resolve in {max_rounds} rounds "
            "(cycle in the redirect graph?)"
        )
    out = m.select("src", F.col("nxt").alias("dst"), "hops")
    _ACTIVE_CHECKPOINTS.append(m)
    return out


def resolve_redirects_py(edge_list):
    """Pure-python oracle twin of resolve_redirects (direct walk)."""
    nxt = dict(edge_list)
    out = {}
    for s in nxt:
        cur, hops, seen = s, 0, set()
        while cur in nxt:
            if cur in seen:
                raise RuntimeError("cycle")
            seen.add(cur)
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops)
    return out


def cocitation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_out: int = 16,
    min_cocite: int = 2,
) -> DataFrame:
    """Co-citation counts — the classic relatedness signal (Small
    1973): two targets are related when the same sources link to
    both. Pair generation is a self-equi-join on the SOURCE, so a
    source of out-degree d contributes d·(d−1)/2 pairs: unbounded,
    that's the super-node blowup (a links-to-everything hub page), so
    sources with out-degree > `max_out` are dropped FIRST — the same
    df-cap discipline the n-gram dedup applies to stop-shingles, and
    at web scale the hubs a cap drops are exactly the navigational
    pages whose co-citations carry no signal. One degree hash-agg +
    one equi-join keyed on src + one pair hash-agg; pairs ordered
    (a < b) so each pair counts once. Pairs below `min_cocite` are
    noise and are dropped in the final agg's HAVING.

    Output: (dst_a, dst_b, cocite) with dst_a < dst_b."""
    deg = edges.groupBy(src).agg(F.count("*").alias("_d"))
    kept = edges.join(
        deg.filter(F.col("_d") <= max_out).select(src), src
    )
    ea = kept.select(F.col(src).alias("_s"), F.col(dst).alias("dst_a"))
    eb = kept.select(F.col(src).alias("_s"), F.col(dst).alias("dst_b"))
    return (
        ea.join(eb, "_s")
        .filter(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        .agg(F.count("*").alias("cocite"))
        .filter(F.col("cocite") >= min_cocite)
    )


def label_propagation(
    edges: DataFrame, iterations: int = 3, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Synchronous majority label propagation (Raghavan-Albert-Kumara
    2007) — the near-linear community-detection baseline a crawler
    uses to group pages/hosts into link neighborhoods (site sections,
    mirror families, topic clusters) without the quadratic costs of
    modularity methods.

    Deterministic by construction: updates are SYNCHRONOUS (every
    node's round-t+1 label reads only round-t labels — the async
    variant is processing-order-dependent and unreproducible across
    partitionings) and ties break (count DESC, label ASC) via the
    house min(struct(-count, label)) winner idiom. Labels start as the
    node's own id.

    Scale shape: the graph is symmetrized + de-duplicated once; each
    round is ONE equi-join of the (node,label) frame against the edge
    list plus two hash aggregates — all shuffles keyed on node id, the
    label frame is two longs per node, and nothing ever collects. A
    fixed small iteration count is the web-scale norm (LPA ~converges
    in <5 sweeps; later sweeps mostly oscillate on bipartite-ish
    subgraphs, which synchronous updates make visible and a fixed
    cutoff makes reproducible).

    Output: (node, community, community_size); isolated nodes never
    appear (they have no edges to propagate over)."""
    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = (
        und.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        votes = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        winners = votes.groupBy("node").agg(
            F.min(
                F.struct(
                    (-F.col("c")).alias("nc"), F.col("label").alias("lab")
                )
            ).alias("w")
        )
        labels = labels.join(winners, "node", "left").select(
            "node",
            F.coalesce(F.col("w.lab"), F.col("label")).alias("label"),
        )
    sizes = labels.groupBy("label").agg(
        F.count("*").alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node",
        F.col("label").alias("community"),
        "community_size",
    )


def ppr_int(
    edges: DataFrame,
    is_seed,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank — Haveliwala 2002 — the
    seed-expansion scorer for focused crawling: teleport mass returns
    ONLY to the seed set, so rank measures link-graph proximity to the
    seeds rather than global authority (which pages should a topical
    crawl reach next, given the seed list it started from?).

    Same integer micro-unit update as pagerank_int, with the teleport
    restricted:  rank₀(n) = SCALE·[seed(n)],  and per round

        rank(n) = [seed(n)]·(SCALE·(den−num)) div den
                  + (num · Σ_in rank(u) div outdeg(u)) div den

    `is_seed` is a Column PREDICATE over `node` (e.g. a bounded id
    range, a broadcast-joined membership flag) — kept as a JVM
    expression so seed membership never leaves the plan; non-seed
    nodes unreachable from seeds stay exactly 0. Outdeg is pre-joined
    once, every round is one equi-join + one hash-agg, rounds are
    localCheckpointed and released like pagerank_int."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e0 = storagekit.local_checkpoint(e0)
    nodes = storagekit.local_checkpoint(
        e0.select(F.col("src").alias("node"))
        .unionByName(e0.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = storagekit.local_checkpoint(
        e0.join(e0.groupBy("src").agg(F.count("*").alias("outdeg")), "src")
    )
    storagekit.release(e0)
    base = (SCALE * (damping_den - damping_num)) // damping_den
    seed_base = F.when(is_seed, F.lit(base)).otherwise(F.lit(0)).cast("long")

    ranks = nodes.withColumn(
        "rank_micro",
        F.when(is_seed, F.lit(SCALE)).otherwise(F.lit(0)).cast("long"),
    )
    prev = None
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = storagekit.local_checkpoint(
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    seed_base
                    + F.expr(
                        f"({damping_num} * coalesce(in_sum, 0L)) div {damping_den}"
                    )
                ).cast("long").alias("rank_micro"),
            )
        )
        storagekit.release(prev)
        prev = ranks
    storagekit.release(e)
    if iterations > 0:
        storagekit.release(nodes)
    _ACTIVE_CHECKPOINTS.append(ranks)
    return ranks


def ppr_int_py(
    edge_list: list[tuple],
    seeds: set,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> dict:
    """Pure-python reference of the ppr_int update rule."""
    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg: dict = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (SCALE * (damping_den - damping_num)) // damping_den
    rank = {n: (SCALE if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        in_sum = {n: 0 for n in nodes}
        for u, v in e:
            in_sum[v] += rank[u] // outdeg[u]
        rank = {
            n: (base if n in seeds else 0)
            + (damping_num * in_sum[n]) // damping_den
            for n in nodes
        }
    return rank
