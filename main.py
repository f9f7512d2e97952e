"""spark-submit entry point (BASELINE.json north_rule: "run via
spark-submit --py-files").

Cluster usage:
    python -c "from ccbot_spark.shipping import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/ccbot_spark_pyfiles.zip main.py \
        --hosts 200 --pages 300 --seeds 400 --cycles 3 --workdir /data/crawl

Local usage (this sandbox): python main.py --master 'local[32]' ...

Prints one JSON line with per-cycle counts and urls/sec throughput.
"""

from __future__ import annotations

import argparse
import json
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--master", default=None, help="override master (else spark-submit's)")
    p.add_argument("--hosts", type=int, default=200)
    p.add_argument("--pages", type=int, default=300)
    p.add_argument("--hot-pct", type=int, default=15)
    p.add_argument("--seeds", type=int, default=400)
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--workdir", required=True)
    p.add_argument("--shuffle-partitions", type=int, default=32)
    p.add_argument("--no-coalesce", action="store_true",
                   help="disable AQE partition coalescing (keep many small "
                        "fetch tasks balanced across cores — AQE only sees "
                        "bytes, not the politeness sleep a task carries)")
    p.add_argument("--fetch-partitions", type=int, default=None,
                   help="explicit fetch-stage parallelism (delay-bound stage "
                        "wants many more partitions than cores; other "
                        "shuffles keep spark.sql.shuffle.partitions)")
    p.add_argument("--no-trace", action="store_true")
    p.add_argument("--enforce-delay", action="store_true",
                   help="sleep out per-host crawl-delay in the fetch stage "
                        "(the delay/IO-bound workload shape of a real crawl)")
    p.add_argument("--delay-scale", type=float, default=1.0,
                   help="compress the politeness clock by this factor")
    p.add_argument("--skew-safe", action="store_true",
                   help="force the two-phase per-host top-k in GENERATE on "
                        "every cycle (default: AUTO — the engine flips it on "
                        "when the pending host histogram shows one host "
                        "holding >= 20%% of candidates)")
    p.add_argument("--fetch-checkpoint", action="store_true",
                   help="snapshot the fetch output mid-cycle so a crash "
                        "after FETCH resumes at PARSE without re-spending "
                        "politeness slots (doubles fetch-stage write IO)")
    p.add_argument("--seen-filter", choices=("bloom", "cuckoo"), default="bloom",
                   help="URL-seen prefilter flavor (cuckoo adds deletion "
                        "support at the same memory budget)")
    p.add_argument("--compact-every", type=int, default=0,
                   help="compact frontier/seen data files every K cycles "
                        "(0 = off); bounds COW small-file growth on long "
                        "crawls")
    p.add_argument("--fail-pct", type=int, default=0,
                   help="%% of fetches that deterministically error (retried)")
    p.add_argument("--redirect-pct", type=int, default=0,
                   help="%% of odd pages that 301 to the prior page")
    p.add_argument("--sitemap-shards", type=int, default=0,
                   help="fixture: /sitemap.xml becomes a <sitemapindex> "
                        "over this many shard urlsets (0 = flat urlset)")
    p.add_argument("--sitemap-from-robots", action="store_true",
                   help="spec-compliant sitemap discovery: expand only "
                        "hosts whose robots.txt declares a Sitemap: "
                        "directive")
    p.add_argument("--sitemap-seeds", action="store_true",
                   help="expand the seed list from each seed host's sitemap.xml")
    p.add_argument("--max-depth", type=int, default=0,
                   help="Heritrix max-hops: drop discovered URLs more "
                        "than K link-hops from every seed (0 = unlimited)")
    p.add_argument("--rank-every", type=int, default=0,
                   help="every K cycles, re-prioritize the frontier by "
                        "integer-exact PageRank over the accumulated link "
                        "graph (0 = static decay priorities)")
    p.add_argument("--age-boost", type=int, default=0,
                   help="starvation-free scheduling: candidates rank on "
                        "priority + K x cycles-waited (stored priority "
                        "untouched)")
    p.add_argument("--content-dedup", action="store_true",
                   help="content-seen test: skip parsing pages whose "
                        "body digest was already stored (mirror sites)")
    p.add_argument("--mirror-pct", type=int, default=0,
                   help="synthetic-web knob: %% of non-h0 pages that "
                        "mirror their h0 twin's body byte-for-byte")
    p.add_argument("--binary-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages serving a "
                        "non-HTML payload (application/octet-stream) — "
                        "fetched + archived, never parsed")
    p.add_argument("--canonical", action="store_true",
                   help="rel=canonical handling: a page declaring a "
                        "different canonical URL is a terminal alias — "
                        "never parsed/stored; the target is enqueued")
    p.add_argument("--canonical-pct", type=int, default=0,
                   help="synthetic-web knob: %% of odd pages declaring "
                        "their even twin canonical")
    p.add_argument("--soft404-detect", action="store_true",
                   help="content-based soft-404 detection: an HTTP-200 "
                        "response with an error-template body is a "
                        "terminal error — never parsed/stored")
    p.add_argument("--soft404-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages answering 200 "
                        "with an error-template body")
    p.add_argument("--meta-robots", action="store_true",
                   help="honor page-level <meta name=\"robots\"> "
                        "directives: noindex pages are never stored, "
                        "nofollow pages' outlinks are never followed")
    p.add_argument("--meta-robots-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages declaring a "
                        "robots meta directive (noindex/nofollow/both)")
    p.add_argument("--honor-max-age", action="store_true",
                   help="honor declared Cache-Control max-age as the "
                        "revisit interval (RFC 9111 freshness; clamped "
                        "to the adaptive bounds)")
    p.add_argument("--cache-control-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages declaring a "
                        "Cache-Control max-age (in cycles)")
    p.add_argument("--etag-revalidate", action="store_true",
                   help="strong-validator conditional GET: revisits "
                        "whose entity bytes match the stored ETag "
                        "answer 304 even when the content clock says "
                        "stale")
    p.add_argument("--etag-stable-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages whose body "
                        "never re-renders across content epochs")
    p.add_argument("--sitemap-priority", action="store_true",
                   help="synthetic-web knob: urlsets declare a "
                        "<priority> per URL (the engine always honors "
                        "declared priorities when seeding)")
    p.add_argument("--og-pct", type=int, default=0,
                   help="synthetic-web knob: %% of pages declaring "
                        "og:image + og:title (the parse layer always "
                        "honors OpenGraph image+caption pairs)")
    p.add_argument("--focus-terms", type=str, default=None,
                   help="comma-separated anchor-text terms: links "
                        "described by these words get a priority boost "
                        "(focused/topical crawling)")
    p.add_argument("--focus-boost", type=int, default=50,
                   help="priority boost for focus-term matches")
    p.add_argument("--content-boost", type=int, default=0,
                   help="shark-search content relevance: links from a "
                        "page whose extracted text mentions the focus "
                        "terms inherit min(tf, cap) * this boost")
    p.add_argument("--content-cap", type=int, default=5,
                   help="cap on the per-page focus-term tf used by "
                        "--content-boost")
    p.add_argument("--anchor-texts", action="store_true",
                   help="aggregate anchor-text terms per link target "
                        "into an 'anchors' table while parsing")
    p.add_argument("--max-body-bytes", type=int, default=0,
                   help="abort transfers longer than this many bytes "
                        "(terminal 'oversize', never parsed)")
    p.add_argument("--dead-host-backoff", type=int, default=0,
                   help="circuit breaker: a host whose attempts all "
                        "errored in one cycle is deferred this many "
                        "cycles (host-wide not_before)")
    p.add_argument("--dead-host-pct", type=int, default=0,
                   help="synthetic-web knob: %% of hosts that are down "
                        "(every fetch fails)")
    p.add_argument("--robots-5xx-pct", type=int, default=0,
                   help="synthetic-web knob: %% of hosts whose "
                        "robots.txt request answers 5xx — RFC 9309: "
                        "complete disallow for those hosts")
    p.add_argument("--recrawl-every", type=int, default=0,
                   help="revisit policy: re-enqueue fetched pages every "
                        "K cycles (0 = crawl each page once)")
    p.add_argument("--adaptive-recrawl", action="store_true",
                   help="per-URL adaptive revisit intervals: 304 doubles "
                        "a page's interval, a changed revisit halves it")
    p.add_argument("--deny-pattern", action="append", default=[],
                   help="scope deny-list regex (repeatable): discovered "
                        "URLs matching any pattern are never enqueued")
    p.add_argument("--sitemap-lastmod", action="store_true",
                   help="honor sitemap <lastmod>: skip due revisits of "
                        "sitemap-listed pages the declared lastmod proves "
                        "unchanged (saves even the conditional GET)")
    p.add_argument("--warc-dir", default=None,
                   help="also archive each cycle's stored images as "
                        "WARC segment files under this directory "
                        "(cycle=NNNNN/segment-*.warc.gz)")
    p.add_argument("--warc-segments", type=int, default=4,
                   help="segment files per cycle (rotation width; "
                        "~1 GiB per segment at scale)")
    p.add_argument("--warc-cdx", action="store_true",
                   help="index the WARC archive into a cdx table: one "
                        "row per record with seekable (path, offset, "
                        "length), SURT key, and payload digest")
    p.add_argument("--warc-wet", action="store_true",
                   help="also write WET companion segments (one "
                        "'conversion' record per fetched page, body = "
                        "extracted page text) under each cycle dir")
    p.add_argument("--wds-dir", default=None,
                   help="also export each cycle's stored image+caption "
                        "pairs as WebDataset tar shards under this "
                        "directory (cycle=NNNNN/shard-*.tar)")
    p.add_argument("--wds-target-bytes", type=int, default=1 << 20,
                   help="declared-cost target size per WDS shard")
    p.add_argument("--wds-grouped", action="store_true",
                   help="group-pure WDS shards: no shard mixes aspect "
                        "buckets (fixed-tensor-shape training export)")
    p.add_argument("--domain-budget", type=int, default=0,
                   help="cap > 0: at most N URLs per REGISTERED DOMAIN "
                        "(eTLD+1) per cycle across all its subdomain "
                        "hosts (subdomain-spam defense)")
    p.add_argument("--domain-groups", type=int, default=0,
                   help="synthetic-web knob: hosts become subdomains "
                        "of this many registered domains "
                        "(h{k}.d{k%%g}.test)")
    p.add_argument("--error-backoff", type=int, default=0,
                   help="cap > 0: errored URLs cool down min(2^retries, "
                        "cap) cycles before a retry (exponential backoff)")
    p.add_argument("--rate-limit-pct", type=int, default=0,
                   help="percent of hosts that answer HTTP 429 past a "
                        "per-cycle request cap; refused URLs defer to "
                        "cycle + Retry-After (1-2 cycles)")
    p.add_argument("--robots-change-every", type=int, default=0,
                   help="robots.txt epoch length in cycles: rules and "
                        "crawl-delays re-render every K cycles and the "
                        "crawl follows the current epoch (0 = static)")
    p.add_argument("--evict-every", type=int, default=0,
                   help="every K cycles, archive terminal frontier rows "
                        "to frontier_cold and rewrite the hot frontier "
                        "(0 = never; results unaffected)")
    p.add_argument("--ip-pool", type=int, default=0,
                   help="IP-level politeness: hosts hash into this many "
                        "server addresses sharing one cumulative-delay "
                        "schedule and one fetch worker (0 = per-host)")
    p.add_argument("--ip-resolver", default=None, metavar="JSON",
                   help="explicit host→address map for --ip-pool (path "
                        "to a JSON object file — the deployment's DNS "
                        "cache); unmapped hosts keep the hash fallback")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--warmup", action="store_true",
                   help="run a tiny crawl first to spin up UDF workers")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("ccbot-spark-crawl")
    if args.master:
        b = b.master(args.master)
    spark = (
        b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.enabled",
            "false" if args.no_coalesce else "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ccbot_spark import synthweb
    from ccbot_spark.engine import CrawlEngine

    if args.warmup:
        import tempfile

        warm = synthweb.WebConfig(n_hosts=8, pages_per_host=40)
        with tempfile.TemporaryDirectory() as wd:
            CrawlEngine(spark, warm, wd, n_buckets=8, hot_host_min=500).crawl(
                synthweb.seed_urls(warm, 16), cycles=1
            )

    cfg = synthweb.WebConfig(
        n_hosts=args.hosts, pages_per_host=args.pages, hot_frac_pct=args.hot_pct,
        fail_pct=args.fail_pct, redirect_pct=args.redirect_pct,
        mirror_pct=args.mirror_pct,
        binary_pct=args.binary_pct,
        canonical_pct=args.canonical_pct,
        soft404_pct=args.soft404_pct,
        meta_robots_pct=args.meta_robots_pct,
        etag_stable_pct=args.etag_stable_pct,
        cache_control_pct=args.cache_control_pct,
        sitemap_priority=args.sitemap_priority,
        og_pct=args.og_pct,
        robots_5xx_pct=args.robots_5xx_pct,
        dead_host_pct=args.dead_host_pct,
        robots_change_every=args.robots_change_every,
        rate_limit_pct=args.rate_limit_pct,
        domain_groups=args.domain_groups,
        sitemap_shards=args.sitemap_shards,
    )
    eng = CrawlEngine(
        spark,
        cfg,
        args.workdir,
        n_buckets=args.buckets,
        record_trace=not args.no_trace,
        hot_host_min=500,
        enforce_delay_wallclock=args.enforce_delay,
        delay_scale=args.delay_scale,
        fetch_partitions=args.fetch_partitions,
        skew_safe_generate=True if args.skew_safe else None,
        fetch_checkpoint=args.fetch_checkpoint,
        seen_filter=args.seen_filter,
        compact_every=args.compact_every,
        rank_every=args.rank_every,
        max_depth=args.max_depth,
        recrawl_every=args.recrawl_every,
        adaptive_recrawl=args.adaptive_recrawl,
        sitemap_lastmod=args.sitemap_lastmod,
        deny_patterns=args.deny_pattern,
        error_backoff=args.error_backoff,
        domain_budget=args.domain_budget,
        ip_pool=args.ip_pool,
        ip_resolver=(
            json.load(open(args.ip_resolver)) if args.ip_resolver else None
        ),
        evict_every=args.evict_every,
        wds_dir=args.wds_dir,
        wds_grouped=args.wds_grouped,
        wds_target_bytes=args.wds_target_bytes,
        content_dedup=args.content_dedup,
        canonical_dedup=args.canonical,
        soft404_detect=args.soft404_detect,
        meta_robots=args.meta_robots,
        etag_revalidate=args.etag_revalidate,
        honor_max_age=args.honor_max_age,
        anchor_texts=args.anchor_texts,
        focus_terms=(
            args.focus_terms.split(",") if args.focus_terms else None
        ),
        focus_boost=args.focus_boost,
        content_boost=args.content_boost,
        content_cap=args.content_cap,
        max_body_bytes=args.max_body_bytes,
        dead_host_backoff=args.dead_host_backoff,
        age_boost=args.age_boost,
        warc_dir=args.warc_dir,
        warc_segments=args.warc_segments,
        warc_wet=args.warc_wet,
        warc_cdx=args.warc_cdx,
    )
    seeds = synthweb.seed_urls(cfg, args.seeds)

    t0 = time.time()
    if args.resume:
        start = eng.resume()
        out = eng.crawl(seeds, cycles=args.cycles, start_cycle=start)
    else:
        sm = "robots" if args.sitemap_from_robots else args.sitemap_seeds
        out = eng.crawl(seeds, cycles=args.cycles, sitemap_seeds=sm)
    dt = time.time() - t0
    fetched = sum(c["fetched"] for c in out)
    stored = sum(c["stored_images"] for c in out)
    print(
        json.dumps(
            {
                "cycles": out,
                "wall_sec": round(dt, 2),
                "fetched": fetched,
                "stored_images": stored,
                "urls_per_sec": round((fetched + stored) / dt, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
