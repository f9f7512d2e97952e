"""Registered-domain (eTLD+1) budget politeness: across all hosts of a
registered domain, at most `domain_budget` URLs are fetched per cycle —
the subdomain-spam defense. Gates:

  * urlops.registered_domain (pure JVM) == urlkit.registered_domain
    (python) on a host grid;
  * engine crawl with domain_budget on a subdomained web reproduces the
    oracle crawler exactly (trace incl. 'domain_skipped' events, seen
    set, frontier statuses), non-vacuously;
  * the skew-safe two-phase domain window is trace-identical to the
    single-window plan;
  * domain_budget=0 (default) is byte-identical to the historical
    behavior on the same web.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccbot_spark import oracle, synthweb, urlkit
from ccbot_spark.engine import CrawlEngine
from ccbot_spark.operators import urlops

CFG = synthweb.WebConfig(n_hosts=6, pages_per_host=40, domain_groups=2)
SEEDS = synthweb.seed_urls(CFG, 18)
CYCLES = 2
DBUDGET = 9


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_registered_domain_jvm_python_twin(spark):
    hosts = (
        [CFG.host(k) for k in range(6)]
        + ["h3.test", "a.example.co.uk", "example.co.uk", "x.y.z.co.jp",
           "localhost", "a.b.gov.uk", "www.example.com", "sub.deep.example.org"]
        # r5 PSL expansion: one host per ccTLD family, exercising pairs
        # whose sld is NOT a generic MULTIPART_SLDS label — these split
        # at 3 labels only via the explicit PSL_2LABEL set — plus
        # near-misses (same sld under an unlisted TLD) that must NOT.
        + ["a.news.go.jp", "w.x.gob.mx", "beehive.govt.nz", "fan.idv.tw",
           "shop.or.kr", "blog.in.th", "cdn.web.za", "tv.mil.br",
           "a.k12.tr", "uni.muni.il", "r.waw.pl", "biz.go.id",
           "go.jp", "x.go.com", "y.gob.test", "deep.a.news.go.jp"]
    )
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", urlops.registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == {h: urlkit.registered_domain(h) for h in hosts}


@pytest.fixture(scope="module")
def oracle_res():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, domain_budget=DBUDGET)


@pytest.fixture(scope="module")
def engine_res(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("dom")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        domain_budget=DBUDGET,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    return eng


def test_domain_budget_trace_exact(engine_res, oracle_res):
    got = _trace(engine_res)
    want = oracle_res.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)
    # non-vacuous: the cap actually bit, and it bit across subdomains
    skipped = [t for t in want if t[5] == "domain_skipped"]
    assert skipped, "fixture produced no domain_skipped events"
    assert len({t[3] for t in skipped}) >= 2, "cap never spanned hosts"


def test_domain_budget_seen_exact(engine_res, oracle_res):
    got = {r.url_norm for r in engine_res.seen.read().select("url_norm").collect()}
    assert got == oracle_res.seen


def test_domain_cap_enforced_per_cycle(oracle_res):
    """In every cycle, fetch-phase events per registered domain ≤ cap."""
    per: dict[tuple[int, str], int] = {}
    for seq, cycle, url, host, slot, action in oracle_res.trace:
        if slot >= 0:  # phase-2: a consumed politeness slot
            key = (cycle, urlkit.registered_domain(host))
            per[key] = per.get(key, 0) + 1
    assert per and all(v <= DBUDGET for v in per.values()), per


def test_skew_safe_domain_window_identical(spark, tmp_path, oracle_res, engine_res):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "skew"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        domain_budget=DBUDGET, skew_safe_generate=True,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    assert _trace(eng) == oracle_res.trace


def test_domain_budget_off_is_historical(spark, tmp_path):
    """Same subdomained web, cap off: engine == oracle with no
    domain_skipped events anywhere (the default path is untouched)."""
    want = oracle.crawl(CFG, SEEDS, cycles=1)
    assert not any(t[5] == "domain_skipped" for t in want.trace)
    eng = CrawlEngine(
        spark, CFG, str(tmp_path / "off"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
    )
    eng.crawl(SEEDS, cycles=1)
    assert _trace(eng) == want.trace


def test_hot_domain_flips_skew_safe_plan(spark, tmp_path):
    """A spam domain spread over many small subdomains trips no
    per-host threshold; with domain_budget on, the auto-skew
    observation measures the top DOMAIN share and flips the two-phase
    plan — and the trace stays oracle-exact (plan choice only).
    Cycle 1: 20 seeds over 10 hosts = 10% per host (under the 20%
    host trigger), but domain d0 owns 50% → domain trigger fires.
    The same web without domain_budget keeps the single-window plan."""
    cfg = synthweb.WebConfig(n_hosts=10, pages_per_host=30, domain_groups=2)
    seeds = synthweb.seed_urls(cfg, 20)
    want = oracle.crawl(cfg, seeds, cycles=1, domain_budget=6)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "dom"), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        domain_budget=6,
    )
    out = eng.crawl(seeds, cycles=1)
    assert out[0]["skew_safe"] is True
    assert _trace(eng) == want.trace

    eng_off = CrawlEngine(
        spark, cfg, str(tmp_path / "off"), n_buckets=8,
        record_trace=False, hot_host_min=10, bloom_min_seen=0,
    )
    out_off = eng_off.crawl(seeds, cycles=1)
    assert out_off[0]["skew_safe"] is False
