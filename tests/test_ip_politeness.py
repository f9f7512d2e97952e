"""IP-level politeness (ip_pool > 0): vhosts co-hosted on one server
address share ONE courtesy schedule — the Heritrix "queue per server" /
IRLbot per-IP rule. Gates:

  * urlops.ip_key (pure JVM md5/conv/pmod) == urlkit.ip_key (python)
    on a host grid;
  * politeness.generate(ip_pool=P): host-level selection (fetch set,
    sched_slot) is UNCHANGED; sched_time within each IP is the exact
    cumulative sum of the preceding requests' crawl delays, first
    request at t=0;
  * engine crawl with ip_pool on a web where several hosts share each
    IP reproduces the oracle crawler exactly (trace, seen set),
    non-vacuously: co-hosting actually reorders the schedule vs the
    host-politeness run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccbot_spark import oracle, synthweb, urlkit
from ccbot_spark.engine import CrawlEngine
from ccbot_spark.operators import politeness, urlops

CFG = synthweb.WebConfig(n_hosts=8, pages_per_host=30)
SEEDS = synthweb.seed_urls(CFG, 24)
CYCLES = 2
POOL = 3


def _trace(eng):
    rows = eng.trace.read().orderBy("seq").collect()
    return [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action) for r in rows]


def test_ip_key_jvm_python_twin(spark):
    hosts = [CFG.host(k) for k in range(8)] + [
        "www.example.com", "a.b.co.uk", "localhost", "h100.test",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    for pool in (1, 3, 7, 64):
        got = {
            r["host"]: r["ip"]
            for r in df.select(
                "host", urlops.ip_key(F.col("host"), pool).alias("ip")
            ).collect()
        }
        assert got == {h: urlkit.ip_key(h, pool) for h in hosts}


@pytest.fixture(scope="module")
def pending(spark):
    rows = [
        (f"http://{CFG.host(k)}/p/{j}", CFG.host(k), 100 - j, 0, k * 40 + j,
         "pending", 0, 0)
        for k in range(CFG.n_hosts)
        for j in range(12)
    ]
    return spark.createDataFrame(
        rows,
        "url_norm string, host string, priority int, dt_cycle int, "
        "dt_seq long, status string, cycle_added int, retries int",
    )


def test_ip_schedule_cumulative_and_slots_unchanged(spark, pending):
    robots = politeness.build_robots_table(
        pending.select("host").distinct(), CFG
    )
    base = politeness.generate(pending, robots)["fetch"].collect()
    ipd = politeness.generate(pending, robots, ip_pool=POOL)["fetch"].collect()
    # host-level selection identical: same fetch set, same host slots
    assert {(r.url_norm, r.sched_slot) for r in ipd} == {
        (r.url_norm, r.sched_slot) for r in base
    }
    # per-IP cumulative-delay schedule, first request at t=0
    by_ip: dict[str, list] = {}
    for r in ipd:
        assert r.ip == urlkit.ip_key(r.host, POOL)
        by_ip.setdefault(r.ip, []).append(r)
    multi = 0
    for ip, rows in by_ip.items():
        # the schedule accumulates in CANDIDATE order (priority desc,
        # discovery keys, url) — not sched_time order, which ties when
        # a 0-delay host is co-hosted with others
        rows.sort(key=lambda r: (-r.priority, r.dt_cycle, r.dt_seq, r.url_norm))
        acc = 0
        for r in rows:
            assert r.sched_time == acc, (ip, r.url_norm, r.sched_time, acc)
            acc += r.crawl_delay_ms
        if len({r.host for r in rows}) >= 2:
            multi += 1
    assert multi >= 1, "fixture never co-hosted two hosts on one IP"


@pytest.fixture(scope="module")
def oracle_ip():
    return oracle.crawl(CFG, SEEDS, cycles=CYCLES, ip_pool=POOL)


def test_ip_trace_exact_vs_oracle(spark, tmp_path_factory, oracle_ip):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("ip")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        ip_pool=POOL,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    got = _trace(eng)
    want = oracle_ip.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)
    seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert seen == oracle_ip.seen


def test_ip_politeness_actually_reorders(oracle_ip):
    """Non-vacuous: the per-IP schedule interleaves vhosts, so the
    fetch-event order differs from host-level politeness on the same
    web — while the SET of fetched URLs stays identical (budgets and
    robots are host-level in both modes)."""
    base = oracle.crawl(CFG, SEEDS, cycles=CYCLES)
    ips = {urlkit.ip_key(CFG.host(k), POOL) for k in range(CFG.n_hosts)}
    assert len(ips) < CFG.n_hosts, "pool too large: no host shares an IP"
    base_fetch = [t for t in base.trace if t[4] >= 0]
    ip_fetch = [t for t in oracle_ip.trace if t[4] >= 0]
    assert {t[2] for t in base_fetch} == {t[2] for t in ip_fetch}
    assert [t[2] for t in base_fetch] != [t[2] for t in ip_fetch]


def test_ip_wallclock_sleeps_follow_server_schedule(spark):
    """With enforce_delay_wallclock, the fetch worker owning an IP
    group sleeps out the PER-SERVER cumulative schedule — consecutive
    requests to one server are spaced by the schedule gap even when
    they target different vhosts. The fetcher seam timestamps each
    request (the wall time rides back in the html column)."""
    import time as _time

    from ccbot_spark.operators import fetchparse

    # one server, two vhosts, interleaved 120 ms schedule
    rows = []
    st = 0
    for j in range(3):
        for k in (0, 1):
            rows.append(
                (f"http://h{k}.test/p/{j}", f"h{k}.test", 10, j * 2 + k,
                 st, 0, "ip-0")
            )
            st += 120
    batch = spark.createDataFrame(
        rows,
        "url_norm string, host string, priority int, sched_slot int, "
        "sched_time long, retries int, ip string",
    )

    def clock_fetcher(url, retries):
        return True, None, repr(_time.monotonic())

    out = fetchparse.fetch(
        batch, synthweb.WebConfig(n_hosts=2, pages_per_host=4),
        enforce_delay_wallclock=True, delay_scale=1.0,
        fetcher=clock_fetcher, group_col="ip",
    ).select("url_norm", "sched_time", "html").collect()
    got = sorted((r.sched_time, float(r.html)) for r in out)
    assert len(got) == 6
    for (st0, t0), (st1, t1) in zip(got, got[1:]):
        want_gap = (st1 - st0) / 1000.0
        assert t1 - t0 >= want_gap * 0.85, (st0, st1, t1 - t0, want_gap)


# ---- pluggable resolver (r5): an explicit host→address map (the
# deployment's DNS-resolver cache) replaces the ip_key hash wherever it
# is provided; unmapped hosts keep the hash fallback. Co-hosts h0 with
# h2 — a grouping the POOL=3 hash never produces (h0→ip-1, h2→ip-2) —
# so the map is provably load-bearing in every test below.
RESOLVER = {CFG.host(0): "203.0.113.9", CFG.host(2): "203.0.113.9"}


def test_resolve_ip_map_wins_hash_falls_back():
    assert urlkit.resolve_ip(CFG.host(0), POOL, RESOLVER) == "203.0.113.9"
    assert urlkit.resolve_ip(CFG.host(1), POOL, RESOLVER) == urlkit.ip_key(
        CFG.host(1), POOL
    )
    assert urlkit.resolve_ip(CFG.host(0), POOL, None) == urlkit.ip_key(
        CFG.host(0), POOL
    )
    assert urlkit.resolve_ip(None, POOL, RESOLVER) is None


def test_generate_ip_resolver_column_twin(spark, pending):
    """The generate step's ip column under a resolver dim equals the
    python twin (coalesce of broadcast-join hit and hash fallback), and
    the per-IP cumulative-delay invariant holds over the REMAPPED
    groups."""
    robots = politeness.build_robots_table(
        pending.select("host").distinct(), CFG
    )
    rdf = spark.createDataFrame(
        sorted(RESOLVER.items()), "host string, ip string"
    )
    got = politeness.generate(
        pending, robots, ip_pool=POOL, ip_resolver=rdf
    )["fetch"].collect()
    assert got, "empty fetch set"
    for r in got:
        assert r.ip == urlkit.resolve_ip(r.host, POOL, RESOLVER)
    by_ip: dict[str, list] = {}
    for r in got:
        by_ip.setdefault(r.ip, []).append(r)
    assert len({r.host for r in by_ip["203.0.113.9"]}) == 2
    for rows in by_ip.values():
        rows.sort(key=lambda r: (-r.priority, r.dt_cycle, r.dt_seq, r.url_norm))
        acc = 0
        for r in rows:
            assert r.sched_time == acc, (r.ip, r.url_norm, r.sched_time, acc)
            acc += r.crawl_delay_ms


@pytest.fixture(scope="module")
def oracle_ip_resolver():
    return oracle.crawl(
        CFG, SEEDS, cycles=CYCLES, ip_pool=POOL, ip_resolver=RESOLVER
    )


def test_ip_resolver_trace_exact_vs_oracle(
    spark, tmp_path_factory, oracle_ip, oracle_ip_resolver
):
    eng = CrawlEngine(
        spark, CFG, str(tmp_path_factory.mktemp("ipr")), n_buckets=8,
        record_trace=True, hot_host_min=10, bloom_min_seen=0,
        ip_pool=POOL, ip_resolver=RESOLVER,
    )
    eng.crawl(SEEDS, cycles=CYCLES)
    got = _trace(eng)
    want = oracle_ip_resolver.trace
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)
    seen = {r.url_norm for r in eng.seen.read().select("url_norm").collect()}
    assert seen == oracle_ip_resolver.seen
    # non-vacuous: the explicit map actually changed the schedule vs
    # the hash-fallback run on the same web — while the fetched SET is
    # identical (budgets and robots are host-level in both).
    assert got != oracle_ip.trace
    f_map = [t for t in got if t[4] >= 0]
    f_hash = [t for t in oracle_ip.trace if t[4] >= 0]
    assert {t[2] for t in f_map} == {t[2] for t in f_hash}
    assert [t[2] for t in f_map] != [t[2] for t in f_hash]


def test_ip_resolver_loopback_http(spark, tmp_path):
    """Explicit co-hosting map + REAL loopback transport: the urllib
    fetcher does the transfers while two vhosts the hash would separate
    share one wall-clock server schedule — trace/seen still equal the
    oracle given the same map."""
    import threading
    from http.server import ThreadingHTTPServer

    import test_http_fetch as lh

    cfg2 = lh.CFG
    rmap = {cfg2.host(0): "198.51.100.7", cfg2.host(1): "198.51.100.7"}
    assert urlkit.ip_key(cfg2.host(0), 2) != urlkit.ip_key(cfg2.host(1), 2)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), lh._Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        want = oracle.crawl(
            cfg2, synthweb.seed_urls(cfg2, 12), cycles=2,
            ip_pool=2, ip_resolver=rmap,
        )
        eng = CrawlEngine(
            spark, cfg2, str(tmp_path / "iprh"), n_buckets=8,
            bloom_min_seen=0, record_trace=True, hot_host_min=10,
            fetcher=lh.make_http_fetcher(srv.server_address[1]),
            enforce_delay_wallclock=True, delay_scale=0.02,
            ip_pool=2, ip_resolver=rmap,
        )
        eng.crawl(synthweb.seed_urls(cfg2, 12), cycles=2)
        assert _trace(eng) == want.trace
        assert {
            r.url_norm for r in eng.seen.read().collect()
        } == set(want.seen)
    finally:
        srv.shutdown()
