"""Single-threaded oracle crawler — the spec-as-code (SURVEY.md §5 item 2).

The reference checkout is empty (SURVEY.md §0), so THIS module defines
the reference semantics the Spark engine must reproduce exactly:
crawl-order trace, URL-seen membership, and stored image+caption rows
(BASELINE.json north_rule). It is deliberately simple: dict frontier,
set seen, sequential loops, sharing the exact same pure-Python cores
(urlkit / robots / parsekit / synthweb / codecs / phash) as the Spark
engine's vectorized UDFs.

Deterministic semantics (normative):

  * priorities: seeds = 1000; discovered = max(parent_priority) - 10,
    clamped at 0. Rediscovery of an already-seen URL never updates
    priority (it only emits a 'dup' trace event, once per cycle).
  * discovery_time = (cycle_added, dt_seq); dt_seq = seed index for
    seeds, 0 for discovered links. All orderings end with url_norm as
    the final tie-break (SURVEY.md §7.5) — a total order with no
    global counter, which is what makes it scale.
  * per cycle, per host: pending candidates ordered by
    (priority DESC, dt_cycle ASC, dt_seq ASC, url_norm ASC);
    robots-denied candidates are removed (traced 'robots_denied');
    the first `budget_per_cycle` allowed ones are fetched at
    sched_time = slot * crawl_delay_ms; the rest are traced
    'budget_skipped' and stay pending.
  * within a cycle, trace events are globally ordered by
    (phase, sched_time, host, url_norm); phase: robots_denied=0,
    budget_skipped=1, fetched=2, dup=3. `seq` is a running counter
    across cycles.
  * images are processed in fetched-event order, then document order;
    an image whose phash is already stored (or seen earlier in the
    same cycle) is a dedup hit and is not stored.
  * 'dup' = a discovered outlink already in the seen set; traced at
    most once per (cycle, url).
  * redirects (synthweb.redirect_of, enabled by WebConfig.redirect_pct):
    a redirected fetch consumes its politeness slot, parses nothing,
    is traced 'redirect' (phase 2, same sched keys as 'fetched'), and
    reaches terminal frontier status 'redirect' (never refetched). The
    normalized Location target joins the discovered-link pool with the
    redirecting page's priority (so the standard -10 decay applies) and
    the standard seen/dup handling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from . import codecs, parsekit, phash, robots, synthweb, urlkit

SEED_PRIORITY = 1000
PRIORITY_DECAY = 10
MAX_RETRIES = 2  # an errored URL is retried in later cycles up to this cap

# Adaptive revisit-interval bounds (Cho & Garcia-Molina-style
# multiplicative policy): an unchanged revisit (304) doubles the
# page's interval up to ADAPT_MAX; a changed revisit halves it down to
# ADAPT_MIN. First fetches keep the base interval (recrawl_every).
ADAPT_MIN = 1
ADAPT_MAX = 64

_PHASE = {"robots_denied": 0, "budget_skipped": 1, "fetched": 2, "dup": 3}


@dataclass
class FrontierEntry:
    url_norm: str
    host: str
    priority: int
    dt_cycle: int
    dt_seq: int
    status: str  # pending | fetched | denied | error
    cycle_added: int
    retries: int = 0
    last_cycle: int = -1  # cycle of last successful fetch (revisit clock)
    interval: int = 0  # per-URL revisit interval in cycles (adaptive policy)
    not_before: int = 0  # 429 Retry-After deferral: earliest eligible cycle
    depth: int = 0  # link-hops from the nearest seed (insert-only, like dt)


@dataclass
class OracleResult:
    trace: list[tuple] = field(default_factory=list)  # TRACE schema tuples
    seen: set = field(default_factory=set)
    images: list[dict] = field(default_factory=list)  # IMAGES schema dicts
    frontier: dict = field(default_factory=dict)      # url_norm → FrontierEntry
    metrics: list[dict] = field(default_factory=list)  # METRICS schema dicts
    blocked_images: int = 0  # phash-blocklist moderation drops
    anchors: list[tuple] = field(default_factory=list)  # ANCHORS tuples
    # (cycle, target, term, cnt) when anchor_texts=True


def crawl(
    cfg: synthweb.WebConfig,
    seeds: list[str],
    cycles: int,
    rank_every: int = 0,
    sitemap_seeds: bool = False,
    trap_filter: bool = False,
    deny_patterns: list[str] | None = None,
    max_depth: int = 0,
    recrawl_every: int = 0,
    adaptive_recrawl: bool = False,
    sitemap_lastmod: bool = False,
    etag_revalidate: bool = False,
    honor_max_age: bool = False,
    content_dedup: bool = False,
    age_boost: int = 0,
    canonical_dedup: bool = False,
    soft404_detect: bool = False,
    meta_robots: bool = False,
    anchor_texts: bool = False,
    focus_terms: list[str] | None = None,
    focus_boost: int = 50,
    content_boost: int = 0,
    content_cap: int = 5,
    max_body_bytes: int = 0,
    dead_host_backoff: int = 0,
    error_backoff: int = 0,
    domain_budget: int = 0,
    ip_pool: int = 0,
    ip_resolver: dict[str, str] | None = None,
    phash_blocklist: frozenset[int] | set[int] = frozenset(),
    blocklist_ham: int = 0,
) -> OracleResult:
    """rank_every > 0 enables dynamic frontier re-prioritization: every
    K cycles, integer-exact PageRank (linkrank.pagerank_int_py, 3
    rounds) over the accumulated page→link graph replaces the priority
    of every frontier URL the graph ranks (priority = rank_micro //
    1000). The OPIC/PageRank crawl-ordering policy of the
    Mercator/IRLbot line — still fully deterministic, because the rank
    is a pure integer function of the edge set."""
    res = OracleResult()
    frontier = res.frontier
    seen = res.seen
    phashes: set[int] = set()
    edges_acc: set[tuple[str, str]] = set()
    content_digests: set[str] = set()  # md5 hex of stored page bodies
    seq = 0

    # cycle 0: seed the frontier (first occurrence wins; seed order = dt_seq)
    idx = 0
    for raw in seeds:
        u = urlkit.normalize_url(raw)
        if u is None or u in seen:
            continue
        seen.add(u)
        frontier[u] = FrontierEntry(
            u, urlkit.host_of(u), SEED_PRIORITY, 0, idx, "pending", 0, 0,
            interval=recrawl_every,
        )
        idx += 1

    # sitemap expansion (normative): each seed host's /sitemap.xml is
    # fetched once; its URLs append to the seed list AFTER the explicit
    # seeds, hosts in sorted order, sitemap document order within a
    # host, dt_seq continuing — same priority/seen rules as seeds.
    if sitemap_seeds:
        # sitemap_seeds=True: every seed host's conventional
        # /sitemap.xml. sitemap_seeds="robots": only sitemaps DECLARED
        # by a `Sitemap:` directive in the host's robots.txt (the
        # spec-compliant discovery path), fetched in declared order.
        for host in sorted({e.host for e in frontier.values()}):
            if sitemap_seeds == "robots":
                declared = (
                    []
                    if synthweb.robots_unreachable(cfg, host)
                    else robots.parse_robots(
                        synthweb.robots_txt(cfg, host)
                    ).sitemaps
                )
                xmls = [
                    synthweb.sitemap_xml(cfg, urlkit.host_of(sm) or host)
                    for sm in declared
                ]
            else:
                xmls = [synthweb.sitemap_xml(cfg, host)]
            for xml in xmls:
                # index-aware: a <sitemapindex> fetches its child
                # shards (one level) — synthweb.expand_sitemap_entries
                # is the same helper the engine's seeding task runs.
                # A declared <priority> 0.p seeds the frontier at
                # SEED_PRIORITY − (10 − p)·10 (below explicit seeds,
                # ranked by the site's own declaration); undeclared
                # keeps SEED_PRIORITY — the engine's exact mapping.
                for u, pri in synthweb.expand_sitemap_entries(cfg, xml):
                    if u in seen:
                        continue
                    seen.add(u)
                    p0 = (
                        SEED_PRIORITY
                        if pri is None
                        else SEED_PRIORITY - (10 - pri) * 10
                    )
                    frontier[u] = FrontierEntry(
                        u, urlkit.host_of(u), p0, 0, idx,
                        "pending", 0, 0, interval=recrawl_every,
                    )
                    idx += 1

    # cache keyed on (host, robots epoch): with robots_change_every the
    # rules a cycle must follow are the CURRENT epoch's (the engine
    # rebuilds its robots table every cycle with the same epoch)
    robots_cache: dict[tuple[str, int], tuple[robots.RobotsRules, int]] = {}

    def host_rules(host: str, rob_ver: int) -> tuple[robots.RobotsRules, int]:
        key = (host, rob_ver)
        if key not in robots_cache:
            if synthweb.robots_unreachable(cfg, host):
                # RFC 9309 §2.3.1.4: 5xx robots ⇒ complete disallow
                rules = robots.RobotsRules(disallow=["/"])
            else:
                rules = robots.parse_robots(
                    synthweb.robots_txt(cfg, host, rob_ver)
                )
            robots_cache[key] = (rules, synthweb.host_budget(cfg, host))
        return robots_cache[key]

    # dead-host circuit breaker: host → first eligible cycle again
    dead_until: dict[str, int] = {}

    # URL deny-list (scope rules): one compiled alternation; a
    # DISCOVERED candidate matching it is never enqueued. Mirrors the
    # engine's pre-shuffle rlike filter; seeds are exempt.
    deny_re = (
        re.compile("|".join(f"(?:{p})" for p in deny_patterns))
        if deny_patterns
        else None
    )

    def denied_scope(u: str) -> bool:
        return deny_re is not None and deny_re.search(u) is not None

    def lastmod_skips(e: FrontierEntry, cycle: int) -> bool:
        """sitemap_lastmod: a due revisit of a sitemap-LISTED page is
        skipped (no slot, no trace) while the urlset's declared
        <lastmod> — the content-epoch clock — says the page has not
        changed since our last fetch; the conditional GET that would
        have answered 304 is never issued. Unlisted pages keep the
        revisit policy unchanged. Mirrors the engine's JVM sha2
        membership + epoch test exactly."""
        if not sitemap_lastmod or e.status != "fetched":
            return False
        parts = e.url_norm.split("/")
        if len(parts) != 5 or parts[3] != "p":
            return False
        if (
            synthweb._digest(f"map:{cfg.seed}:{e.host}:{parts[4]}")[0] % 4
            != 0
        ):
            return False  # not in the host's urlset — no lastmod known
        return synthweb.content_version(
            cfg, e.last_cycle
        ) == synthweb.content_version(cfg, cycle)

    for cycle in range(1, cycles + 1):
        # ---- GENERATE: per-host candidate ordering + robots + budget
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in frontier.values():
            # 429 Retry-After deferral: not eligible again until
            # not_before (regardless of status branch)
            if e.not_before > cycle:
                continue
            # dead-host circuit breaker: a host-wide not_before —
            # deferred hosts' candidates are invisible, no trace
            if dead_host_backoff and dead_until.get(e.host, 0) > cycle:
                continue
            # candidates: pending, plus errored entries with retry
            # budget left (transient-failure recrawl)
            if (
                e.status == "pending"
                or (e.status == "error" and e.retries < MAX_RETRIES)
                or (
                    recrawl_every
                    and e.status == "fetched"
                    # per-URL due check: e.interval == recrawl_every
                    # unless the adaptive policy has moved it
                    and e.last_cycle <= cycle - e.interval
                    and not lastmod_skips(e, cycle)
                )
            ):
                by_host.setdefault(e.host, []).append(e)

        events: list[tuple] = []  # (phase, sched_time, host, url_norm, slot, action)
        fetch_list: list[tuple] = []  # (sched_time, host, url_norm, slot, entry)
        rob_ver = synthweb.robots_version(cfg, cycle)
        # domain_budget pre-pass: across ALL hosts of a registered
        # domain (urlkit.registered_domain — the eTLD+1 stub), only the
        # top `domain_budget` ALLOWED candidates (same aging-aware
        # order the host ranking uses) stay eligible this cycle; the
        # rest trace 'domain_skipped' (phase 1) and remain pending
        # without consuming a politeness slot. Mirrors the engine's
        # pre-slotting domain window in politeness.generate.
        dom_skip: set[str] = set()
        if domain_budget > 0:
            by_dom: dict[str, list[FrontierEntry]] = {}
            for host, entries in by_host.items():
                rules, _budget = host_rules(host, rob_ver)
                for e in entries:
                    path = robots.path_of(e.url_norm)
                    if robots.allowed(rules.allow, rules.disallow, path):
                        by_dom.setdefault(
                            urlkit.registered_domain(host), []
                        ).append(e)
            for es in by_dom.values():
                es.sort(
                    key=lambda e: (
                        -(e.priority + age_boost * (cycle - e.cycle_added)),
                        e.dt_cycle, e.dt_seq, e.url_norm,
                    )
                )
                for e in es[domain_budget:]:
                    dom_skip.add(e.url_norm)
                    events.append(
                        (1, 0, e.host, e.url_norm, -1, "domain_skipped")
                    )
        for host, entries in by_host.items():
            rules, budget = host_rules(host, rob_ver)
            # age_boost > 0: starvation-free scheduling — a candidate's
            # effective priority grows by age_boost per cycle it has
            # waited since discovery, so budget-skipped URLs on busy
            # hosts eventually outrank fresh high-priority ones. The
            # stored priority is NEVER mutated (aging is sort-time
            # only); age_boost=0 is the historical order exactly.
            entries.sort(
                key=lambda e: (
                    -(e.priority + age_boost * (cycle - e.cycle_added)),
                    e.dt_cycle, e.dt_seq, e.url_norm,
                )
            )
            slot = 0
            for e in entries:
                path = robots.path_of(e.url_norm)
                if not robots.allowed(rules.allow, rules.disallow, path):
                    e.status = "denied"
                    e.not_before = 0  # terminal: any stale deferral clears
                    events.append((0, 0, host, e.url_norm, -1, "robots_denied"))
                elif e.url_norm in dom_skip:
                    continue  # event emitted by the domain pre-pass;
                    # no slot consumed, stays pending
                elif slot < budget:
                    st = slot * rules.crawl_delay_ms
                    # phase-2 event emitted by the fetch loop below
                    # ('fetched' or 'fetch_error' per outcome)
                    fetch_list.append((st, host, e.url_norm, slot, e))
                    slot += 1
                else:
                    events.append((1, 0, host, e.url_norm, -1, "budget_skipped"))

        # IP-level politeness (ip_pool > 0): host-level selection and
        # slots above are untouched; the SCHEDULE is recomputed per
        # server — entries group by urlkit.resolve_ip(host, ip_pool,
        # ip_resolver) (explicit host→ip map wins, ip_key hash
        # fallback), order
        # by the global candidate order (aging-aware priority, dt keys,
        # url), and each entry's sched_time is the cumulative sum of
        # the PRECEDING entries' host crawl-delays within its IP.
        # Mirrors politeness.generate(ip_pool=P) exactly.
        if ip_pool > 0:
            by_ip: dict[str, list[int]] = {}
            for i, (_st, host, _url, _slot, e) in enumerate(fetch_list):
                by_ip.setdefault(
                    urlkit.resolve_ip(host, ip_pool, ip_resolver), []
                ).append(i)
            relisted = []
            for _ip, idxs in by_ip.items():
                idxs.sort(
                    key=lambda i: (
                        -(
                            fetch_list[i][4].priority
                            + age_boost
                            * (cycle - fetch_list[i][4].cycle_added)
                        ),
                        fetch_list[i][4].dt_cycle,
                        fetch_list[i][4].dt_seq,
                        fetch_list[i][4].url_norm,
                    )
                )
                acc = 0
                for i in idxs:
                    _st, host, url, slot, e = fetch_list[i]
                    relisted.append((acc, host, url, slot, e))
                    acc += host_rules(host, rob_ver)[0].crawl_delay_ms
            fetch_list = relisted

        # ---- FETCH + PARSE in event order
        fetch_list.sort(key=lambda t: (t[0], t[1], t[2]))
        host_metrics: dict[str, dict] = {}

        def hm(host: str) -> dict:
            if host not in host_metrics:
                host_metrics[host] = dict(
                    fetched=0, parsed_links=0, stored_images=0,
                    dedup_hits=0, errors=0, bytes=0, redirects=0,
                    not_modified=0, rate_limited=0, content_dup=0,
                    canonicals=0, soft404s=0, oversized=0,
                    noindexed=0, nofollowed=0,
                )
            return host_metrics[host]

        discovered: dict[str, int] = {}  # url_norm → max parent priority
        disc_depth: dict[str, int] = {}  # url_norm → min(parent depth) + 1
        anchor_cnt: dict[tuple, int] = {}  # (target, term) → occurrences
        dup_this_cycle: set[str] = set()
        cur_ver = synthweb.content_version(cfg, cycle)

        def _revisit_interval(e, url, unchanged):
            # one revisit-interval policy for every served response:
            # a declared Cache-Control max-age pins the interval
            # (honor_max_age; RFC 9111 freshness — clamped to the
            # adaptive bounds), else the Cho & Garcia-Molina
            # multiplicative rule (adaptive_recrawl), else unchanged.
            ma = synthweb.max_age_of(cfg, url) if honor_max_age else None
            if ma is not None:
                e.interval = min(max(ma, ADAPT_MIN), ADAPT_MAX)
            elif adaptive_recrawl:
                if unchanged:
                    e.interval = min(e.interval * 2, ADAPT_MAX)
                elif e.last_cycle >= 0:
                    e.interval = max(e.interval // 2, ADAPT_MIN)

        for st, host, url, slot, e in fetch_list:
            m = hm(host)
            # HTTP 429: a rate-limiting host refuses every request at
            # slot >= its per-cycle cap — BEFORE it could answer 304 or
            # fail (the server never serves the request at all). Slot
            # consumed, no body, status/retries untouched; the URL is
            # deferred to cycle + Retry-After (synthweb.rate_limit_of).
            rl = synthweb.rate_limit_of(cfg, host)
            if rl is not None and slot >= rl[0]:
                e.not_before = cycle + rl[1]
                m["rate_limited"] += 1
                events.append((2, st, host, url, slot, "rate_limited"))
                continue
            # any served attempt (200/304/301/error/...) clears a stale
            # expired deferral — mirrors the engine's merge branches,
            # which all write not_before = 0 except the 429 one
            e.not_before = 0
            # conditional GET: a recrawl candidate whose last fetch is
            # in the current content epoch answers 304 — slot consumed,
            # no body, revisit clock advanced (mirrors the engine's
            # JVM-side `unchanged` verdict)
            if e.status == "fetched" and (
                cfg.change_every == 0
                or e.last_cycle // cfg.change_every == cur_ver
            ):
                _revisit_interval(e, url, True)
                e.last_cycle = cycle
                m["not_modified"] += 1
                events.append((2, st, host, url, slot, "not_modified"))
                continue
            if not synthweb.fetch_ok(cfg, url, e.retries):
                # failed fetch: slot consumed, no parse, error status;
                # retried until MAX_RETRIES — next cycle by default, or
                # (error_backoff=CAP > 0) after an exponential cooldown
                # of min(2^retries, CAP) cycles through the same
                # not_before gate the 429 deferral uses
                e.status = "error"
                e.retries += 1
                if error_backoff:
                    e.not_before = cycle + min(1 << e.retries, error_backoff)
                m["errors"] += 1
                events.append((2, st, host, url, slot, "fetch_error"))
                continue
            tgt_raw = synthweb.redirect_of(cfg, url)
            if tgt_raw is not None:
                # 301: slot consumed, no body parsed, terminal status;
                # the Location target joins the discovered pool with
                # the page's own priority (same decay rule as links)
                e.status = "redirect"
                m["redirects"] += 1
                events.append((2, st, host, url, slot, "redirect"))
                tgt = urlkit.normalize_url(tgt_raw)
                if tgt is not None and trap_filter and urlkit.is_trap(tgt):
                    tgt = None
                if tgt is not None and denied_scope(tgt):
                    tgt = None  # scope deny-list, pre-seen like traps
                if tgt is not None and max_depth and e.depth + 1 > max_depth:
                    # depth gate (max-hops): dropped pre-seen, like
                    # traps — no dup event, never enqueued
                    tgt = None
                if tgt is not None:
                    if tgt in seen:
                        if tgt not in dup_this_cycle:
                            dup_this_cycle.add(tgt)
                            events.append(
                                (3, 0, urlkit.host_of(tgt), tgt, -1, "dup")
                            )
                    else:
                        prev = discovered.get(tgt)
                        if prev is None or e.priority > prev:
                            discovered[tgt] = e.priority
                        dprev = disc_depth.get(tgt)
                        if dprev is None or e.depth + 1 < dprev:
                            disc_depth[tgt] = e.depth + 1
                continue
            html = synthweb.fetch(cfg, url, cur_ver)
            # strong-validator conditional GET (If-None-Match): the
            # entity's bytes equal the validator stored at the last
            # 200 → 304, body withheld. Decided by the server BEFORE
            # any body gate (a 304 has no body to size/sniff), and
            # only on the success path (fail/redirect already branched
            # above). Mirrors fetchparse.fetch's worker-side compare.
            if (
                etag_revalidate
                and e.status == "fetched"
                and e.last_cycle >= 0
                and html
                == synthweb.fetch(
                    cfg,
                    url,
                    e.last_cycle // cfg.change_every
                    if cfg.change_every
                    else 0,
                )
            ):
                _revisit_interval(e, url, True)
                e.last_cycle = cycle
                m["not_modified"] += 1
                events.append((2, st, host, url, slot, "not_modified"))
                continue
            if (
                max_body_bytes
                and len(html.encode("utf-8")) > max_body_bytes
            ):
                # oversize gate (FIRST among the body gates — a
                # transfer aborted at the cap has no trustworthy body
                # for any later sniff): slot consumed, cap bytes
                # transferred, terminal status, never parsed/archived.
                e.status = "oversize"
                m["fetched"] += 1
                m["oversized"] += 1
                m["bytes"] += max_body_bytes
                events.append((2, st, host, url, slot, "oversize"))
                continue
            if synthweb.content_type_of(cfg, url) != "text/html":
                # content-type gate: non-HTML payload — slot consumed,
                # bytes transferred, terminal fetched status, never
                # parsed (no canonical scan, no content-seen digest,
                # no links, no images). Mirrors the engine's pre-parse
                # content_type filter exactly.
                e.status = "fetched"
                _revisit_interval(e, url, False)
                e.last_cycle = cycle
                m["fetched"] += 1
                m["bytes"] += len(html.encode("utf-8"))
                events.append((2, st, host, url, slot, "binary"))
                continue
            if soft404_detect and parsekit.is_soft404(html):
                # soft-404 gate (before the canonical scan and the
                # content-seen test): an error page dressed as content
                # — slot consumed, bytes transferred, terminal status,
                # never parsed (no canonical, no digest, no links, no
                # images). Mirrors the engine's JVM soft404_col filter.
                e.status = "soft404"
                m["fetched"] += 1
                m["soft404s"] += 1
                m["bytes"] += len(html.encode("utf-8"))
                events.append((2, st, host, url, slot, "soft404"))
                continue
            if canonical_dedup:
                # rel=canonical alias (before the content-seen test: a
                # canonicalized page is never parsed, and its digest
                # never enters the stored set). Slot consumed, body
                # counted in bytes (it WAS transferred), terminal
                # status; the target joins the discovered pool with
                # the page's own priority — redirect-target rules.
                canon = parsekit.extract_canonical(url, html)
                if canon is not None and canon != url:
                    e.status = "canonical"
                    m["fetched"] += 1
                    m["canonicals"] += 1
                    m["bytes"] += len(html.encode("utf-8"))
                    events.append((2, st, host, url, slot, "canonical"))
                    if trap_filter and urlkit.is_trap(canon):
                        continue
                    if denied_scope(canon):
                        continue  # scope deny-list, pre-seen
                    if max_depth and e.depth + 1 > max_depth:
                        continue
                    if canon in seen:
                        if canon not in dup_this_cycle:
                            dup_this_cycle.add(canon)
                            events.append(
                                (3, 0, urlkit.host_of(canon), canon, -1, "dup")
                            )
                    else:
                        prev = discovered.get(canon)
                        if prev is None or e.priority > prev:
                            discovered[canon] = e.priority
                        dprev = disc_depth.get(canon)
                        if dprev is None or e.depth + 1 < dprev:
                            disc_depth[canon] = e.depth + 1
                    continue
            if content_dedup:
                # content-seen test (Mercator): an already-stored body
                # digest consumes its slot but is never parsed — the
                # fetch-list order (sched_time, host, url) elects the
                # within-cycle winner, exactly like the engine's window
                import hashlib as _hl

                dig = _hl.md5(html.encode("utf-8")).hexdigest()
                if dig in content_digests:
                    e.status = "fetched"
                    _revisit_interval(e, url, False)
                    e.last_cycle = cycle
                    m["fetched"] += 1
                    m["content_dup"] += 1
                    m["bytes"] += len(html.encode("utf-8"))
                    events.append((2, st, host, url, slot, "content_dup"))
                    continue
                content_digests.add(dig)
            e.status = "fetched"
            # changed revisit: declared freshness pins, else the page
            # moved epochs since the last fetch — tighten the interval
            _revisit_interval(e, url, False)
            e.last_cycle = cycle
            m["fetched"] += 1
            m["bytes"] += len(html.encode("utf-8"))
            events.append((2, st, host, url, slot, "fetched"))
            # page-level robots meta gate (LAST among the body gates —
            # an alias, error template, or content dup is never parsed,
            # so its directives are never read). noindex keeps the page
            # out of the STORE path only; nofollow keeps it out of the
            # PARSE path only. Slot, bytes, status, trace unchanged —
            # mirrors the engine's JVM meta_robots_cols filters.
            page_ni = page_nf = False
            if meta_robots:
                # read from the BODY (parsekit twin of the JVM regexp),
                # like the soft-404 / canonical gates — a directive only
                # exists if the served page actually declared it
                page_ni, page_nf = parsekit.meta_robots(html)
                if page_ni:
                    m["noindexed"] += 1
                if page_nf:
                    m["nofollowed"] += 1
            # anchor-text aggregation (anchor_texts=True): occurrence
            # counts per (resolved target, lowercased term) — same
            # parse_src as links, so page-level nofollow excludes the
            # whole page (mirrors the engine's anchors sink exactly)
            if anchor_texts and not page_nf:
                for tgt, text in parsekit.extract_anchor_pairs(url, html):
                    for term in text.lower().split():
                        k = (tgt, term)
                        anchor_cnt[k] = anchor_cnt.get(k, 0) + 1
            # focused crawling: targets whose anchor text contains a
            # focus term get parent_priority + focus_boost at
            # discovery (per page — mirrors the engine's pre-dedup
            # boost join exactly)
            boosted_targets: set[str] = set()
            if focus_terms and not page_nf:
                fset = {t.lower() for t in focus_terms}
                for tgt, text in parsekit.extract_anchor_pairs(url, html):
                    if fset & set(text.lower().split()):
                        boosted_targets.add(tgt)
            # shark-search content relevance: every link from this
            # page inherits min(tf, cap)·content_boost, where tf
            # counts focus-term tokens in the extracted text — the
            # exact arithmetic of the engine's wet_text token filter
            # (extract_text == textkit.wet_text byte-for-byte)
            page_rel = 0
            if content_boost and focus_terms and not page_nf:
                _fset = {t.lower() for t in focus_terms}
                _tf = sum(
                    1
                    for t in parsekit.extract_text(html).lower().split(" ")
                    if t in _fset
                )
                page_rel = min(_tf, content_cap) * content_boost
            # links
            for link in [] if page_nf else parsekit.extract_links(url, html):
                m["parsed_links"] += 1
                if rank_every:
                    edges_acc.add((url, link))
                if trap_filter and urlkit.is_trap(link):
                    # parsed (metric + edge log above), never enqueued —
                    # mirrors the engine's pre-shuffle filter_traps
                    continue
                if denied_scope(link):
                    # scope deny-list: parsed, never enqueued
                    continue
                if max_depth and e.depth + 1 > max_depth:
                    # depth gate: parsed, never enqueued (like traps)
                    continue
                if link in seen:
                    if link not in dup_this_cycle:
                        dup_this_cycle.add(link)
                        events.append(
                            (3, 0, urlkit.host_of(link), link, -1, "dup")
                        )
                else:
                    eff = e.priority + (
                        focus_boost if link in boosted_targets else 0
                    ) + page_rel
                    prev = discovered.get(link)
                    if prev is None or eff > prev:
                        discovered[link] = eff
                    dprev = disc_depth.get(link)
                    if dprev is None or e.depth + 1 < dprev:
                        disc_depth[link] = e.depth + 1
            # images
            for img_url, caption in (
                [] if page_ni else parsekit.extract_images(url, html)
            ):
                data, w, h, fmt = synthweb.fetch_image(cfg, img_url)
                px = codecs.decode(data, fmt)
                ph = phash.phash64(px)
                # moderation gate BEFORE the dedup insert: a blocked
                # image is never stored and never enters the phash set
                # (so its exact/near twins stay blockable, not "dups").
                # Mirrors the engine's phash_blocklist filter exactly.
                if phash_blocklist and any(
                    bin(ph ^ b).count("1") <= blocklist_ham
                    for b in phash_blocklist
                ):
                    res.blocked_images += 1
                    continue
                if ph in phashes:
                    m["dedup_hits"] += 1
                else:
                    phashes.add(ph)
                    m["stored_images"] += 1
                    m["bytes"] += len(data)
                    res.images.append(
                        dict(
                            image_id=img_url, bytes=data, w=w, h=h,
                            fmt=fmt, caption=caption, phash=ph,
                        )
                    )

        # ---- UPDATE: new frontier entries + seen
        for link in sorted(discovered):
            pri = max(discovered[link] - PRIORITY_DECAY, 0)
            seen.add(link)
            frontier[link] = FrontierEntry(
                link, urlkit.host_of(link), pri, cycle, 0, "pending", cycle,
                0, interval=recrawl_every, depth=disc_depth[link],
            )

        # ---- RANK: dynamic re-prioritization from the link graph
        if rank_every and cycle % rank_every == 0 and edges_acc:
            from .functions.linkrank import pagerank_int_py

            rank = pagerank_int_py(sorted(edges_acc), iterations=3)
            for e in frontier.values():
                if e.url_norm in rank:
                    e.priority = rank[e.url_norm] // 1000

        # ---- RECORD: global per-cycle event order → trace seq
        events.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        for ph_, st, host, url, slot, action in events:
            res.trace.append((seq, cycle, url, host, slot, action))
            seq += 1
        for tgt, term in sorted(anchor_cnt):
            res.anchors.append((cycle, tgt, term, anchor_cnt[(tgt, term)]))
        for host in sorted(host_metrics):
            m = host_metrics[host]
            res.metrics.append(dict(cycle=cycle, partition_id=-1, host=host, **m))
            if (
                dead_host_backoff
                and m["errors"] >= 2
                and m["fetched"] == 0
                and m["redirects"] == 0
                and m["not_modified"] == 0
                and m["rate_limited"] == 0
            ):
                # every attempt on this host errored — the server is
                # down; defer the host for the next K cycles (mirrors
                # the engine's host_backoff table append)
                dead_until[host] = cycle + dead_host_backoff + 1

    return res
