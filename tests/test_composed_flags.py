"""The all-flags composition gate: a production crawl runs MANY
features at once, and pairwise tests can miss cross-feature
interactions (e.g. a 429 deferral racing an adaptive-recrawl clock
under a domain budget). One web plants every synthetic hazard —
transient failures, redirects, traps, mirror pages, canonical aliases,
rate-limiting hosts, mid-crawl robots changes, content epochs,
subdomain spam — and one engine runs with the full feature set on:
IP-level politeness, domain budgets, priority aging, content-seen
dedup, canonical aliasing, trap filtering, adaptive recrawl, error
backoff, frontier eviction, sharded cuckoo seen-filter. The trace,
seen set, frontier statuses, and stored images must equal the oracle
crawler with the same knobs, byte for byte. Eviction and the seen-
filter flavor have no oracle knob because they are result-invariant —
this test is exactly what proves that invariance under composition.
"""

from __future__ import annotations

import pytest

from ccbot_spark import oracle, synthweb
from ccbot_spark.engine import CrawlEngine

CFG = synthweb.WebConfig(
    n_hosts=6,
    pages_per_host=30,
    hot_frac_pct=20,
    fail_pct=10,
    redirect_pct=15,
    trap_pct=10,
    # epochs must outlast the revisit interval or no revisit can ever
    # answer 304 (every recrawl would land in a fresh epoch)
    change_every=3,
    nofollow_pct=10,
    mirror_pct=25,
    canonical_pct=15,
    robots_change_every=2,
    rate_limit_pct=30,
    domain_groups=2,
    binary_pct=15,
    soft404_pct=15,
    robots_5xx_pct=20,
    dead_host_pct=15,
    # 40%: enough directive pages survive the earlier body gates
    # (binary/soft404/canonical/content-dup all bite first) for BOTH
    # directive kinds to fire non-vacuously under composition
    meta_robots_pct=40,
)
SEEDS = synthweb.seed_urls(CFG, 30)  # 18→30 when meta_robots joined:
# page-level nofollow thins discovery; a fatter seed list keeps the
# per-host and per-domain budget hazards binding
CYCLES = 4
# oversize cap: the 90th-percentile body length of the composed web,
# derived from the fixture itself so the gate binds without starving
# the crawl (epoch 0 lengths; later epochs vary but stay in range)
_LENS = sorted(
    len(synthweb.fetch(CFG, f"http://{CFG.host(k)}/p/{j}").encode())
    for k in range(CFG.n_hosts)
    for j in range(CFG.pages_per_host)
)
MAX_BODY = _LENS[int(len(_LENS) * 0.9)]

KNOBS = dict(
    trap_filter=True,
    recrawl_every=2,
    adaptive_recrawl=True,
    content_dedup=True,
    age_boost=1,
    canonical_dedup=True,
    soft404_detect=True,
    max_body_bytes=MAX_BODY,
    dead_host_backoff=2,
    error_backoff=1,
    # 12→8 when meta_robots joined the composition: page-level nofollow
    # thins discovery enough that a 12-slot domain cap never binds on
    # this web — 8 keeps the domain_skipped hazard firing
    domain_budget=8,
    ip_pool=3,
    meta_robots=True,
    # round-5 parse-layer features compose too: the anchors sink and
    # anchor-driven focus boosts must not perturb any other feature's
    # verdicts (and vice versa — nofollow/meta-robots/binary/soft404
    # pages all shape what the anchor scan sees)
    anchor_texts=True,
    focus_terms=["3"],
)


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, **KNOBS)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory, oracle_res):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("composed")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        seen_filter="cuckoo", evict_every=2, **KNOBS,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_composed_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)
    # every planted hazard actually fired — the composition is
    # non-vacuous across ALL features, not a subset that happened
    # to be reachable
    actions = {t[5] for t in want}
    for must in (
        "fetched", "fetch_error", "redirect", "budget_skipped",
        "domain_skipped", "rate_limited", "not_modified",
        "content_dup", "canonical", "robots_denied", "binary",
        "soft404", "oversize",
    ):
        assert must in actions, f"hazard never fired: {must}"


def test_composed_seen_and_images(engine_res, oracle_res):
    seen = {
        r.url_norm for r in engine_res.seen.read().select("url_norm").collect()
    }
    assert seen == oracle_res.seen
    imgs = {
        r.image_id
        for r in engine_res.images.read().select("image_id").collect()
    }
    assert imgs == {r["image_id"] for r in oracle_res.images}
    # the meta-robots directives (no trace action of their own — slot
    # and status are unchanged) fired under composition too
    assert sum(m["noindexed"] for m in oracle_res.metrics) > 0
    assert sum(m["nofollowed"] for m in oracle_res.metrics) > 0
    # ... and so did the anchors sink and the focus boost
    got_anchors = sorted(
        (r.cycle, r.target, r.term, r.cnt)
        for r in engine_res.anchors.read().collect()
    )
    assert got_anchors == sorted(oracle_res.anchors) and got_anchors
    # the focus term is reachable in the anchor stream (the boost
    # itself is pinned by trace equality against the boosting oracle)
    assert any(t == "3" for _, _, t, _ in got_anchors)


def test_composed_frontier_hot_cold(engine_res, oracle_res):
    hot = {r.url_norm: r.status for r in engine_res.frontier.read().collect()}
    cold = {
        r.url_norm: r.status
        for r in engine_res.frontier_cold.read().collect()
    }
    assert cold, "eviction never fired under composition"
    assert not (hot.keys() & cold.keys())
    assert {**hot, **cold} == {
        u: e.status for u, e in oracle_res.frontier.items()
    }
