"""Politeness operators: robots dimension table, allow/deny, per-host
top-k generate + crawl-delay schedule (SURVEY.md §2.3 j_robots_bcast,
§2.5 w_generate_topk / w_schedule, §2.7 u_robots_parse / u_robots_allow).

Design: the robots table is a small-by-construction dimension (one row
per distinct host in the pending frontier) built DISTRIBUTED via
mapInPandas — never collected to the driver — then broadcast-joined
onto candidates (explicit ``F.broadcast``: at any scale the robots dim
is orders of magnitude smaller than the frontier).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import robots as robots_mod
from .. import schemas, synthweb
from . import urlops

def _cand_order(df: DataFrame | None = None):
    """Candidate ranking keys. When the engine attaches an `_eff`
    column (priority + age_boost × cycles-waited — starvation-free
    scheduling), the window ranks on it; the stored priority column
    is untouched and still flows to the frontier merge."""
    pri = (
        F.col("_eff")
        if df is not None and "_eff" in df.columns
        else F.col("priority")
    )
    return [
        pri.desc(),
        F.col("dt_cycle").asc(),
        F.col("dt_seq").asc(),
        F.col("url_norm").asc(),
    ]


def build_robots_table(
    hosts: DataFrame, cfg: synthweb.WebConfig, ver: int = 0
) -> DataFrame:
    """hosts: DF[host] → ROBOTS-schema DF, built executor-side.

    In production the fetch of /robots.txt is a real HTTP call inside
    the same batch function; here it is the deterministic synthetic web.
    `ver` is the robots epoch (synthweb.robots_version): the engine
    rebuilds this table every cycle, so passing the current epoch makes
    the crawl follow mid-crawl robots.txt edits — rules and
    crawl-delays both shift when the epoch rolls.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host in pdf["host"]:
                if synthweb.robots_unreachable(cfg, host):
                    # RFC 9309 §2.3.1.4: robots.txt unreachable due to
                    # server error ⇒ complete disallow (unlike 404,
                    # which means allow-all). No Sitemap discovery
                    # either — the file was never read.
                    rules = robots_mod.RobotsRules(disallow=["/"])
                else:
                    rules = robots_mod.parse_robots(
                        synthweb.robots_txt(cfg, host, ver)
                    )
                rows.append(rules.to_row(host, synthweb.host_budget(cfg, host)))
            yield pd.DataFrame(
                rows,
                columns=["host", "allow", "disallow", "crawl_delay_ms", "budget_per_cycle"],
            )

    return hosts.mapInPandas(gen, schema=schemas.ROBOTS)


def _compile_rules(allow: tuple, disallow: tuple):
    """Precompile one host's rule list into (pattern, specificity-len,
    is_allow, matcher-kind) tuples, ordered disallow-then-allow like
    robots_mod.allowed's scan order. Plain prefixes stay prefixes
    (vectorized str.startswith); wildcard/$ rules become anchored
    regexes (vectorized str.match)."""
    import re as _re

    rules = []
    for pats, is_allow in ((disallow, False), (allow, True)):
        for pat in pats:
            plen = robots_mod._pattern_len(pat)
            if "*" not in pat and not pat.endswith("$"):
                rules.append((pat, plen, is_allow, False))
            else:
                rx = _re.escape(pat).replace(r"\*", ".*")
                if rx.endswith(r"\$"):
                    rx = rx[:-2] + "$"
                rules.append((rx, plen, is_allow, True))
    return rules


def _allowed_block(rules, paths: pd.Series):
    """Vectorized RFC 9309 longest-match over one host's URL block:
    one pandas str pass per RULE instead of one python call per URL.
    Verdict-identical to robots_mod.allowed (tests/test_robots.py):
    scanning disallow-then-allow with (> / >=) specificity updates
    reproduces the tie→Allow rule exactly."""
    import numpy as np

    best_len = np.full(len(paths), -1, dtype=np.int64)
    best_allow = np.ones(len(paths), dtype=bool)
    for pat, plen, is_allow, is_rx in rules:
        m = (
            paths.str.match(pat).to_numpy(dtype=bool)
            if is_rx
            else paths.str.startswith(pat).to_numpy(dtype=bool)
        )
        upd = m & ((best_len <= plen) if is_allow else (best_len < plen))
        best_len[upd] = plen
        best_allow[upd] = is_allow
    return best_allow


@F.pandas_udf(T.BooleanType())
def robots_allow_udf(
    allow: pd.Series, disallow: pd.Series, url_norm: pd.Series
) -> pd.Series:
    """Vectorized RFC 9309 allow/deny (Arrow batch; rules arrive as
    lists). Candidates arrive host-clustered, so the batch groups by
    rule-set, compiles each distinct set once, and matches each group
    with per-RULE pandas str passes — no per-URL python call in the
    hot loop (the round-3 ADVICE cleanup)."""
    import numpy as np

    n = len(url_norm)
    out = np.ones(n, dtype=bool)
    if n == 0:
        return pd.Series(out)
    # path+query portion (robots_mod.path_of, vectorized): everything
    # from the first '/' after '://'; hostname-only URLs match '/'
    paths = url_norm.str.replace(
        r"^[^/]*//[^/]*", "", regex=True, n=1
    ).where(lambda s: s != "", "/")
    # robots_mod.allowed prepends '/' when missing; normalized URLs
    # always carry one, but keep the standalone-operator contract exact
    no_slash = ~paths.str.startswith("/")
    if no_slash.any():
        paths = paths.where(~no_slash, "/" + paths)
    # group rows by identical rule-set (tuple key); each group = one or
    # more hosts sharing a robots policy
    groups: dict[tuple, list[int]] = {}
    for i, (a, d) in enumerate(zip(allow, disallow)):
        key = (
            tuple(a) if a is not None else (),
            tuple(d) if d is not None else (),
        )
        groups.setdefault(key, []).append(i)
    for (a_key, d_key), idxs in groups.items():
        if not a_key and not d_key:
            continue  # no rules → allowed (the default)
        rules = _compile_rules(a_key, d_key)
        out[idxs] = _allowed_block(rules, paths.iloc[idxs])
    return pd.Series(out)


def generate(
    pending: DataFrame,
    robots_df: DataFrame,
    skew_safe: bool = False,
    domain_budget: int = 0,
    ip_pool: int = 0,
    ip_resolver: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The crawl GENERATE step (§3.1 step 1).

    Returns dict with:
      denied  — robots-denied candidates (removed from frontier)
      fetch   — per-host top-budget allowed candidates with
                sched_slot / sched_time (slot * crawl_delay_ms)
      skipped — allowed candidates beyond the per-host budget
      domain_skipped — (only when domain_budget > 0) allowed candidates
                beyond the per-REGISTERED-DOMAIN cap, applied across
                all of a domain's hosts BEFORE per-host slotting — the
                subdomain-spam defense: a thousand *.spam.test hosts
                share ONE budget of `domain_budget` URLs per cycle.
                Ranked by the same candidate order as the host window
                (aging-aware priority, then discovery time, then url),
                so the kept set is deterministic and oracle-mirrorable.

    ip_pool > 0: IP-LEVEL politeness (the Heritrix "one queue per
    server" / IRLbot per-IP rule — vhosts co-hosted on one address
    must share one courtesy schedule). Host-level semantics (robots,
    per-host budget, sched_slot, 429 slot caps) are UNCHANGED; only
    sched_time is recomputed over the selected fetch set: rows group
    by server address — ip_resolver (a host→ip dimension DataFrame,
    broadcast; the deployment's DNS-resolver cache) when provided,
    falling back to urlops.ip_key(host, ip_pool) — and each row's
    sched_time is the
    cumulative sum of the PRECEDING rows' crawl_delay_ms within its
    IP, in the global candidate order — i.e. after fetching from host
    h, wait h's crawl-delay before touching the same server again,
    regardless of which vhost is next. One extra window, and its
    partitions are bounded by the BUDGETED fetch set (Σ host budgets
    per IP per cycle), never the frontier — so no skew-safe variant is
    needed: at 10^10 frontier rows the window input is still only
    budget × hosts. The fetch output gains an `ip` column so the
    engine can group the fetch stage by server instead of host.

    skew_safe: two-phase per-host top-k for pathological frontier skew.
    The default path ranks with ONE Window.partitionBy(host) — a host
    holding 30% of a 10^10-row frontier would funnel 30% of all rows
    through one window task (AQE cannot split a window partition).
    The two-phase form first keeps the top-budget rows per host WITHIN
    each input partition (window keyed by (spark_partition_id, host) —
    the hot host splits across its input partitions, every window
    group ≤ its partition's rows), then ranks exactly over the
    survivors (≤ budget × n_partitions rows per host). Any global
    top-B row is in its partition's top-B, so fetch/sched_slot are
    IDENTICAL to the single-window plan (trace-equality enforced);
    skipped is recovered by anti-join.
    """
    cand = pending.join(F.broadcast(robots_df), on="host", how="left")
    cand = cand.withColumn(
        "allowed",
        robots_allow_udf(F.col("allow"), F.col("disallow"), F.col("url_norm")),
    )
    denied = cand.filter(~F.col("allowed"))
    ok = cand.filter(F.col("allowed"))
    keep = ["url_norm", "host", "priority", "dt_cycle", "dt_seq", "retries"]
    # revisit-policy + status passthrough (present when the engine
    # calls us; the standalone operator accepts minimal candidate
    # frames without them). status rides to the fetch stage so a
    # 429-deferred attempt can restore it unchanged at merge time.
    keep += [
        c for c in ("last_cycle", "interval", "unchanged", "status", "depth")
        if c in pending.columns
    ]
    dom_skipped = None
    if domain_budget > 0:
        okd = ok.withColumn(
            "_dom", urlops.registered_domain(F.col("host"))
        )
        wd = Window.partitionBy("_dom").orderBy(*_cand_order(cand))
        if skew_safe:
            # same two-phase discipline as the host window: a spam
            # domain can dominate the frontier exactly like a hot host
            wd1 = Window.partitionBy("_pid", "_dom").orderBy(*_cand_order(cand))
            surv = (
                okd.withColumn("_pid", F.spark_partition_id())
                .withColumn("_rn0", F.row_number().over(wd1))
                .filter(F.col("_rn0") <= F.lit(domain_budget))
                .drop("_pid", "_rn0")
            )
            kept = (
                surv.withColumn("_rnd", F.row_number().over(wd))
                .filter(F.col("_rnd") <= F.lit(domain_budget))
                .drop("_rnd")
            )
            dom_skipped = okd.join(
                kept.select(F.col("url_norm").alias("_ku")),
                on=F.col("url_norm") == F.col("_ku"),
                how="left_anti",
            )
        else:
            okd = okd.withColumn("_rnd", F.row_number().over(wd))
            kept = okd.filter(F.col("_rnd") <= F.lit(domain_budget)).drop("_rnd")
            dom_skipped = okd.filter(F.col("_rnd") > F.lit(domain_budget))
        ok = kept.drop("_dom")
    w = Window.partitionBy("host").orderBy(*_cand_order(cand))
    if skew_safe:
        w1 = Window.partitionBy("_pid", "host").orderBy(*_cand_order(cand))
        survivors = (
            ok.withColumn("_pid", F.spark_partition_id())
            .withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= F.col("budget_per_cycle"))
            .drop("_pid", "_rn1")
        )
        ranked = survivors.withColumn(
            "sched_slot", (F.row_number().over(w) - 1).cast("int")
        )
        fetch = ranked.filter(
            F.col("sched_slot") < F.col("budget_per_cycle")
        ).withColumn(
            "sched_time",
            (F.col("sched_slot") * F.col("crawl_delay_ms")).cast("long"),
        )
        skipped = ok.join(
            fetch.select(F.col("url_norm").alias("_fu")),
            on=F.col("url_norm") == F.col("_fu"),
            how="left_anti",
        )
    else:
        ok = ok.withColumn("sched_slot", (F.row_number().over(w) - 1).cast("int"))
        fetch = ok.filter(
            F.col("sched_slot") < F.col("budget_per_cycle")
        ).withColumn(
            "sched_time",
            (F.col("sched_slot") * F.col("crawl_delay_ms")).cast("long"),
        )
        skipped = ok.filter(F.col("sched_slot") >= F.col("budget_per_cycle"))
    fetch_cols = [*keep, "sched_slot", "sched_time", "crawl_delay_ms"]
    if ip_pool > 0:
        # Server address: an explicit resolver cache (host → ip dim,
        # what a deployment's DNS layer would publish) wins when
        # provided; unmapped hosts fall back to the urlops.ip_key hash
        # stub. The resolver dim is host-cardinality-sized, so it
        # always broadcasts — the budgeted fetch set never shuffles to
        # learn its addresses. Twin of urlkit.resolve_ip.
        if ip_resolver is not None:
            rdim = ip_resolver.select(
                F.col("host"), F.col("ip").alias("_rip")
            )
            fetch = fetch.join(F.broadcast(rdim), on="host", how="left")
            ip_col = F.coalesce(
                F.col("_rip"), urlops.ip_key(F.col("host"), ip_pool)
            )
        else:
            ip_col = urlops.ip_key(F.col("host"), ip_pool)
        wip = (
            Window.partitionBy("ip")
            .orderBy(*_cand_order(cand))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        fetch = fetch.withColumn("ip", ip_col).withColumn(
            "sched_time",
            F.coalesce(F.sum("crawl_delay_ms").over(wip), F.lit(0)).cast("long"),
        )
        fetch_cols = fetch_cols + ["ip"]
    out = {
        "denied": denied.select(*keep),
        "fetch": fetch.select(*fetch_cols),
        "skipped": skipped.select(*keep),
    }
    if dom_skipped is not None:
        out["domain_skipped"] = dom_skipped.select(*keep)
    return out


def topk_hosts(pending: DataFrame, k: int = 16, min_count: int = 1000) -> list[str]:
    """Heavy-hitter hosts feeding the fetch-stage salting decision
    (SURVEY.md §2.4 a_topk_hosts). Driver-side collect of ≤k rows."""
    rows = (
        pending.groupBy("host")
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("host"))
        .limit(k)
        .collect()
    )
    return [r["host"] for r in rows]


def byte_budget_plan(
    cand: DataFrame,
    budget_bytes: int,
    host: str = "host",
    est_bytes: str = "est_bytes",
    priority: str = "priority",
    url: str = "url",
) -> DataFrame:
    """Per-host BYTE-budgeted fetch plan — the bandwidth sibling of the
    slot-count budget (a_host_budget caps requests; this caps payload:
    ten 50 MB PDFs cost what a thousand HTML pages cost). Candidates
    are ranked per host by (priority DESC, url ASC) — the generate
    window's order — and kept while the running byte total INCLUDING
    the candidate stays within budget; the top-ranked candidate is
    always kept (a host whose best page alone exceeds budget still
    makes progress, so the plan can never starve a host). Greedy by
    rank, not knapsack — deterministic, one window, and the order a
    priority frontier must respect anyway.

    Returns (host, url, priority, est_bytes, cum_bytes, rnk) for kept
    rows. One shuffle on host (the same partitioning the politeness
    scheduler already imposes — in-engine this window rides the
    GENERATE exchange for free); all column arithmetic, no Python."""
    w = Window.partitionBy(host).orderBy(
        F.col(priority).desc(), F.col(url).asc()
    )
    ranked = cand.withColumn("rnk", F.row_number().over(w).cast("long")).withColumn(
        "cum_bytes",
        F.sum(F.col(est_bytes)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return ranked.filter(
        (F.col("cum_bytes") <= F.lit(int(budget_bytes))) | (F.col("rnk") == 1)
    ).select(host, url, priority, est_bytes, "cum_bytes", "rnk")
