from __future__ import annotations

from ccbot_spark import oracle, synthweb

CFG = synthweb.WebConfig(n_hosts=10, pages_per_host=200)
SEEDS = synthweb.seed_urls(CFG, 100)


def test_deterministic():
    a = oracle.crawl(CFG, SEEDS, cycles=3)
    b = oracle.crawl(CFG, SEEDS, cycles=3)
    assert a.trace == b.trace
    assert a.seen == b.seen
    assert [(r["image_id"], r["phash"]) for r in a.images] == [
        (r["image_id"], r["phash"]) for r in b.images
    ]


def test_trace_wellformed():
    res = oracle.crawl(CFG, SEEDS, cycles=3)
    seqs = [t[0] for t in res.trace]
    assert seqs == list(range(len(seqs)))  # dense, increasing
    cycles = [t[1] for t in res.trace]
    assert cycles == sorted(cycles)  # cycle-monotone
    actions = {t[5] for t in res.trace}
    assert actions <= {"fetched", "robots_denied", "budget_skipped", "dup"}
    # fetched rows carry non-negative slots; others carry -1
    for t in res.trace:
        assert (t[4] >= 0) == (t[5] == "fetched")


def test_budget_respected():
    res = oracle.crawl(CFG, SEEDS, cycles=3)
    per_cycle_host: dict = {}
    for _, cycle, _, host, _, action in res.trace:
        if action == "fetched":
            per_cycle_host[(cycle, host)] = per_cycle_host.get((cycle, host), 0) + 1
    for (cycle, host), n in per_cycle_host.items():
        assert n <= synthweb.host_budget(CFG, host)


def test_seen_superset_of_frontier_and_no_refetch():
    res = oracle.crawl(CFG, SEEDS, cycles=3)
    assert set(res.frontier) <= res.seen
    fetched = [t[2] for t in res.trace if t[5] == "fetched"]
    assert len(fetched) == len(set(fetched))  # a URL is fetched at most once


def test_image_phashes_unique():
    res = oracle.crawl(CFG, SEEDS, cycles=3)
    phs = [r["phash"] for r in res.images]
    assert len(phs) == len(set(phs))  # dedup by phash is exact


def test_growth_across_cycles():
    r1 = oracle.crawl(CFG, SEEDS, cycles=1)
    r3 = oracle.crawl(CFG, SEEDS, cycles=3)
    assert len(r3.seen) > len(r1.seen)
    assert len(r3.images) >= len(r1.images)
    # cycle-1 prefix of the 3-cycle trace equals the 1-cycle trace
    prefix = [t for t in r3.trace if t[1] == 1]
    assert prefix == r1.trace
