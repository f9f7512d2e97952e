"""The crawl engine: iterative micro-batch cycle loop (SURVEY.md §3.1).

Each cycle is one batch job over the frontier:

  1. GENERATE   pending frontier × broadcast(robots) → per-host top-k
                by (priority DESC, discovery_time, url_norm) within the
                politeness budget; crawl-delay schedule per host
  2. PARTITION  repartition by host-salt key (hot hosts fan out)
  3. FETCH      groupBy(salt).applyInPandas — Arrow batch boundary
  4. PARSE      mapInPandas link + image extraction
  5. IMAGES     mapInPandas decode+phash → exact phash dedup → sink
  6. UPDATE     links → Bloom prefilter → exact seen anti-join →
                priority scoring → frontier MERGE INTO; seen append
  7. RECORD     metrics aggregation; deterministic trace; checkpoint tag

Determinism (SURVEY.md §7.5): every ordering is by explicit keys
(priority, logical discovery_time, url_norm, sched_time) — never by
partition/arrival order — so the same seed list + politeness budget
reproduces the oracle crawler's trace, seen-set, and stored rows at
any parallelism (local[8] == local[32] == a 1000-executor cluster).

Scale posture: no driver-side collect of any large set (seeds and
hot-host top-k only); frontier/seen are hash-bucket partitioned tables
with touched-partition copy-on-write merges; the Bloom prefilter keeps
the seen anti-join's left side small; AQE handles residual join skew.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from . import schemas, storagekit, synthweb, urlkit
from .oracle import (
    ADAPT_MAX,
    ADAPT_MIN,
    MAX_RETRIES,
    PRIORITY_DECAY,
    SEED_PRIORITY,
)
from .operators import cuckoo as cuckooops
from .operators import fetchparse, images as imageops, politeness, seen as seenops
from .operators import sequencing, urlops
from .iceberg import make_table_store


def _with_bucket(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField("bucket", T.IntegerType(), False)])


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: synthweb.WebConfig,
        workdir: str,
        n_buckets: int = 32,
        use_bloom: bool = True,
        record_trace: bool = True,
        salt_fanout: int = 8,
        hot_host_min: int = 2000,
        bloom_bits: int = 1 << 22,
        bloom_min_seen: int = 50_000,
        bloom_sharded: bool | None = None,
        bloom_broadcast_max_bytes: int = 256 << 20,
        seen_filter: str = "bloom",
        skew_safe_generate: bool | None = None,
        auto_skew_pct: int = 20,
        enforce_delay_wallclock: bool = False,
        delay_scale: float = 1.0,
        fetch_partitions: int | None = None,
        compact_every: int = 0,
        record_lineage: bool = True,
        rank_every: int = 0,
        trap_filter: bool = False,
        deny_patterns: list[str] | None = None,
        max_depth: int = 0,
        recrawl_every: int = 0,
        adaptive_recrawl: bool = False,
        sitemap_lastmod: bool = False,
        content_dedup: bool = False,
        age_boost: int = 0,
        warc_dir: str | None = None,
        warc_segments: int = 4,
        warc_wet: bool = False,
        warc_cdx: bool = False,
        warc_revisit: bool = True,
        fetcher=None,
        fetch_checkpoint: bool = False,
        etag_revalidate: bool = False,
        honor_max_age: bool = False,
        wds_dir: str | None = None,
        wds_target_bytes: int = 1 << 20,
        wds_grouped: bool = False,
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
        evict_every: int = 0,
        phash_blocklist: list[int] | None = None,
        blocklist_ham: int = 0,
    ):
        from .shipping import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.cfg = cfg
        self.workdir = workdir
        self.n_buckets = n_buckets
        self.use_bloom = use_bloom
        self.record_trace = record_trace
        self.salt_fanout = salt_fanout
        self.hot_host_min = hot_host_min
        self.bloom_bits = bloom_bits
        self.bloom_min_seen = bloom_min_seen
        # Sharded (bucket-routed) seen filter when the merged array
        # would exceed one sane broadcast — at 10^10 URLs a merged
        # 8-bits/key filter is 10+ GB, so the shards stay distributed
        # (one per pmod(url_hash, P) bucket) and membership checks
        # route by bucket. Auto-selected from bloom_bits; tests force
        # it with bloom_sharded=True.
        self.bloom_sharded = (
            bloom_sharded
            if bloom_sharded is not None
            else bloom_bits // 8 > bloom_broadcast_max_bytes
        )
        self.bloom_shard_bits = seenops.shard_bits_for(bloom_bits, n_buckets)
        # URL-seen prefilter flavor (north_star: "partitioned
        # Bloom/cuckoo filters"). "cuckoo" sizes the filter to the SAME
        # memory budget as the Bloom (bloom_bits bits total → 16-bit
        # fingerprints, 4-slot buckets) and adds deletion support; the
        # prefilter-exactness contract is identical (overflow degrades
        # to all-maybe, never a false negative). The phash image-dedup
        # prefilter stays Bloom in both modes — it is append-only, so
        # deletion buys nothing there.
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be bloom|cuckoo, got {seen_filter!r}")
        self.seen_filter = seen_filter
        self.cuckoo_m = cuckooops.cuckoo_m_for(bloom_bits // 16)
        self.cuckoo_shard_m = cuckooops.shard_m_for(bloom_bits // 16, n_buckets)
        # two-phase per-host top-k in GENERATE (politeness.generate
        # skew_safe): identical output, no single window task holding a
        # pathological host's whole frontier share. Default None = AUTO:
        # each cycle's pending host histogram (computed anyway for the
        # salting decision) flips it on when the top host holds ≥
        # auto_skew_pct % of pending candidates (and ≥ hot_host_min
        # rows); likewise fetch_partitions=None auto-selects the LPT
        # range-partitioned fetch width under detected skew. Both paths
        # are trace-identical to the defaults (pytest-enforced), so
        # auto-selection changes plans only, never results.
        self.skew_safe_generate = skew_safe_generate
        self.auto_skew_pct = auto_skew_pct
        # trap-aware frontier ingest: drop calendar-loop/maze URLs from
        # the discovered pool BEFORE the dedup shuffle and seen joins —
        # a trap family never costs more than the one codegen scan that
        # rejects it (urlops.filter_traps; oracle.crawl mirrors with
        # urlkit.is_trap so traces stay byte-identical)
        self.trap_filter = trap_filter
        # URL deny-list (Heritrix-style scope rules): user-supplied
        # regexes; a DISCOVERED candidate (link, redirect target,
        # rel=canonical target) matching any pattern is never enqueued
        # — dropped pre-shuffle next to the trap gate, parsed_links
        # metrics and rank edges stay pre-filter. Seeds are exempt
        # (operators seed what they mean to crawl). Patterns must be
        # Java/Python-regex compatible (no backreferences) so the
        # engine's JVM rlike and oracle.crawl(deny_patterns=...)'s
        # `re` agree. One alternation, one codegen scan.
        self.deny_patterns = list(deny_patterns or [])
        self._deny_re = (
            "|".join(f"(?:{p})" for p in self.deny_patterns)
            if self.deny_patterns
            else None
        )
        # max_depth = K > 0: Heritrix max-hops — discovered URLs more
        # than K link-hops from every seed are dropped at extraction
        # time (pre-shuffle; they never enter seen/frontier/dup-trace).
        # 0 = unlimited.
        self.max_depth = max_depth
        # revisit policy: every fetched page is re-enqueued once its
        # last fetch is ≥ recrawl_every cycles old; the conditional-GET
        # check (content_version epochs) turns unchanged revisits into
        # 304s that cost a politeness slot but no parse/store work.
        # Mirrors oracle.crawl(recrawl_every=K) exactly.
        self.recrawl_every = recrawl_every
        # adaptive revisit intervals (Cho & Garcia-Molina multiplicative
        # policy): every URL carries its own interval (= recrawl_every
        # at insert); an unchanged revisit (304) doubles it (≤
        # oracle.ADAPT_MAX), a changed revisit halves it (≥
        # oracle.ADAPT_MIN). Pure integer column arithmetic on the
        # frontier merge — no extra shuffle; the due-check reads the
        # per-row interval either way. Mirrors
        # oracle.crawl(adaptive_recrawl=True) exactly.
        if adaptive_recrawl and not recrawl_every:
            raise ValueError("adaptive_recrawl requires recrawl_every > 0")
        self.adaptive_recrawl = adaptive_recrawl
        # sitemap <lastmod> honored (sitemaps.org): a due revisit of a
        # sitemap-LISTED page is skipped — no slot, no trace — while
        # the urlset's declared lastmod (the content-epoch clock) says
        # the page hasn't changed since our last fetch, so even the
        # conditional GET that would 304 is saved. Membership is the
        # pure sha2 slice _sitemap_pages defines, evaluated as a JVM
        # expression in the due-check (pre-shuffle drop — skipped
        # revisits never reach GENERATE). Unlisted pages keep the
        # revisit policy unchanged. Mirrors
        # oracle.crawl(sitemap_lastmod=True) exactly.
        if sitemap_lastmod and not recrawl_every:
            raise ValueError("sitemap_lastmod requires recrawl_every > 0")
        self.sitemap_lastmod = sitemap_lastmod
        # optional WARC archive sink: every cycle's stored images also
        # land as {warc_dir}/cycle=NNNNN/segment-*.warc.gz (one gzip
        # member per record, JVM-built records, caption/fmt carried as
        # WARC headers — the archive round-trips without the table).
        # Byte-deterministic: record id is md5(uri, date), date is a
        # pure function of the cycle, segment bytes are parallelism-
        # independent (ccbot_spark.warc; tested in test_crawl_engine).
        # content-seen test (Mercator): dedupe fetched pages by body
        # digest — a page whose md5(html) is already in the digests
        # table (or elected earlier in this cycle's politeness order)
        # consumes its slot, is traced 'content_dup', and is never
        # parsed. Mirrors oracle.crawl(content_dedup=True) exactly.
        self.content_dedup = content_dedup
        # starvation-free scheduling: candidates rank on
        # priority + age_boost × (cycle − cycle_added), so
        # budget-skipped URLs on busy hosts eventually win a slot. The
        # stored priority never changes (aging is sort-time only, one
        # extra projected column — zero shuffles); age_boost=0 is the
        # historical order exactly. Mirrors oracle.crawl(age_boost=K).
        self.age_boost = age_boost
        self.warc_dir = warc_dir
        self.warc_segments = warc_segments
        self.warc_wet = warc_wet
        # CDX capture index over the WARC archive: the segment writer
        # emits one (path, offset, length) row per gzip member, which
        # lands (with SURT key + payload digest) in a `cdx` table —
        # any archived record is then retrievable by seek+read+gunzip.
        if warc_cdx and not warc_dir:
            raise ValueError("warc_cdx requires warc_dir")
        self.warc_cdx = warc_cdx
        # revisit records: with content_dedup on, a duplicate page is
        # archived as a body-less WARC `revisit` record (payload digest
        # only) instead of being silently dropped from the archive —
        # the archive then explains every consumed politeness slot.
        self.warc_revisit = warc_revisit
        # optional WebDataset training-export sink: every cycle's
        # stored image+caption pairs also land as size-balanced
        # {wds_dir}/cycle=NNNNN/shard-*.tar (ccbot_spark.wds — the
        # loader-ready corpus a crawl exists to produce). Shards are
        # planned by declared cost (metadata only) and written
        # byte-deterministically.
        self.wds_dir = wds_dir
        self.wds_target_bytes = wds_target_bytes
        # wds_grouped: shards never mix aspect buckets (group-pure
        # planning over the bucket ladder — the fixed-shape contract a
        # loader batching resized tensors needs; plan_shards_grouped)
        self.wds_grouped = wds_grouped
        self.enforce_delay_wallclock = enforce_delay_wallclock
        self.delay_scale = delay_scale
        self.fetch_partitions = fetch_partitions
        # transport seam (fetchparse.fetch fetcher): None = the
        # deterministic synthetic-web pure function; a picklable
        # (url, retries) -> (ok, redirect, html) callable swaps in a
        # real HTTP client (loopback-tested in tests/test_http_fetch.py)
        self.fetcher = fetcher
        # strong-validator conditional GET (If-None-Match): the epoch
        # precheck stays as the Last-Modified fast path; the fetch
        # worker additionally 304s revisits whose entity bytes equal
        # the validator stored at the last 200 — the etag_stable_pct
        # slice the epoch clock would needlessly re-download. Mirrored
        # by oracle.crawl(etag_revalidate=True).
        self.etag_revalidate = etag_revalidate
        # RFC 9111 freshness: a response declaring Cache-Control
        # max-age pins that URL's revisit interval to the DECLARED
        # lifetime (clamped to [ADAPT_MIN, ADAPT_MAX]) at every served
        # response — the server knows its own change rate better than
        # the client's multiplicative guess. Undeclared pages keep the
        # adaptive (or fixed) policy. Mirrored by
        # oracle.crawl(honor_max_age=True).
        self.honor_max_age = honor_max_age
        # mid-cycle checkpoint: at 100 TB a cycle is hours and FETCH is
        # the stage that consumes politeness slots — a crash after it
        # must NOT re-fetch. With fetch_checkpoint on, the fetch output
        # (attempts + the generate verdicts that feed trace/merge) is
        # snapshotted to the workdir as soon as it materializes; a
        # resumed run finds the snapshot and re-enters the cycle at
        # PARSE, byte-identical to the uninterrupted run (pytest-gated
        # kill-after-fetch test). Off by default: it doubles the fetch
        # stage's write IO.
        self.fetch_checkpoint = fetch_checkpoint
        self._crash_after_fetch = False  # test hook: die post-snapshot
        # rel=canonical handling: a fetched page declaring a canonical
        # target other than itself is an alias — slot consumed, body
        # never parsed/stored (no links, no images, no digest), status
        # 'canonical' terminal, and the target joins the discovered
        # pool with the page's own priority (a parse-time soft
        # redirect; mirrors oracle.crawl(canonical_dedup=True))
        self.canonical_dedup = canonical_dedup
        # soft-404 detection: a page answering 200 with an error-
        # template body (fetchparse.soft404_col content markers) is an
        # error dressed as content — slot consumed, body never parsed
        # or stored, terminal status 'soft404', traced 'soft404'
        # (mirrors oracle.crawl(soft404_detect=True))
        self.soft404_detect = soft404_detect
        # page-level robots meta gate (REP <meta name="robots">):
        # noindex = the page's content must not enter the index —
        # images/captions are never stored (WARC/WET stay archival);
        # nofollow = the page endorses none of its outlinks — nothing
        # is extracted, discovered, or enqueued from it. Slot consumed,
        # status 'fetched', trace unchanged; verdicts are one JVM
        # regexp_extract over the cached fetch output
        # (mirrors oracle.crawl(meta_robots=True))
        self.meta_robots = meta_robots
        # max_body_bytes = CAP > 0 (the Heritrix maxLength rule): a
        # response longer than CAP is aborted at the cap — slot
        # consumed, CAP bytes counted, terminal status 'oversize',
        # never parsed/archived (mirrors oracle.crawl(max_body_bytes))
        self.max_body_bytes = max_body_bytes
        # dead-host circuit breaker (= K > 0): a host whose attempts
        # this cycle ALL errored (≥ 2 of them — one failure might be a
        # URL-level transient) is deferred for the next K cycles: its
        # candidates are invisible to GENERATE, like a host-wide
        # not_before. Deferrals live in the bucketless host_backoff
        # TABLE (appended per cycle, read per cycle, tagged/rolled
        # back with every other table) — never driver state, so the
        # dead set can be millions of hosts at 10^10 scale.
        self.dead_host_backoff = dead_host_backoff
        # error_backoff = CAP > 0: an errored URL cools down for
        # min(2^retries, CAP) cycles through the frontier's not_before
        # gate instead of retrying next cycle (exponential backoff on
        # transient failures; mirrors oracle.crawl(error_backoff=CAP))
        self.error_backoff = error_backoff
        # domain_budget = D > 0: at most D URLs per REGISTERED DOMAIN
        # (urlkit.registered_domain — eTLD+1 stub) per cycle, across
        # all of the domain's hosts, applied to allowed candidates
        # BEFORE per-host slotting. The subdomain-spam defense: a
        # thousand *.spam.test hosts share one budget. Over-cap
        # candidates trace 'domain_skipped' and stay pending (mirrors
        # oracle.crawl(domain_budget=D)).
        self.domain_budget = domain_budget
        # ip_pool = P > 0: IP-LEVEL politeness — hosts resolve (via the
        # urlops.ip_key hash stub for a resolver cache) into P server
        # addresses, and each server gets ONE courtesy schedule:
        # sched_time becomes the per-IP cumulative sum of preceding
        # requests' crawl delays (politeness.generate ip_pool), and the
        # fetch stage groups by IP so one worker owns each server's
        # clock. Host-level budgets / robots / 429 caps are unchanged.
        # Mirrors oracle.crawl(ip_pool=P) exactly (trace equality).
        # ip_resolver: optional explicit host→address map (the
        # deployment's DNS-resolver cache). Broadcast as a dimension
        # into the schedule; unmapped hosts keep the ip_key hash, so
        # the synthetic world needs no map. Mirrors
        # oracle.crawl(ip_resolver=...) via urlkit.resolve_ip.
        self.ip_pool = ip_pool
        self.ip_resolver = dict(ip_resolver or {})
        self._ip_resolver_df = (
            spark.createDataFrame(
                sorted(self.ip_resolver.items()), "host string, ip string"
            )
            if self.ip_resolver
            else None
        )
        # phash_blocklist: known-bad perceptual hashes (the PhotoDNA-
        # style moderation gate). A matching decoded image (exact, or
        # Hamming ≤ blocklist_ham — complete prefilter for ≤ 3) is
        # dropped BEFORE the dedup insert: never stored, never in the
        # phash set, so its twins stay blockable. The list is tiny by
        # construction (hash lists are 10^5–10^7 × 8 bytes) and
        # broadcasts; mirrors oracle.crawl(phash_blocklist=...).
        self.phash_blocklist = sorted(int(b) for b in (phash_blocklist or []))
        self.blocklist_ham = blocklist_ham
        self._blocklist_df = (
            spark.createDataFrame(
                [(b,) for b in self.phash_blocklist], "bad_phash long"
            )
            if self.phash_blocklist
            else None
        )
        os.makedirs(workdir, exist_ok=True)
        # factory: real Iceberg tables when CCBOT_ICEBERG_CATALOG is
        # configured (cluster), Parquet-emulated store here (§7.3)
        self.frontier = make_table_store(
            spark, workdir, "frontier", _with_bucket(schemas.FRONTIER), ("bucket",)
        )
        self.seen = make_table_store(
            spark, workdir, "seen", _with_bucket(schemas.SEEN), ("bucket",)
        )
        self.images = make_table_store(spark, workdir, "images", schemas.IMAGES)
        self.trace = make_table_store(spark, workdir, "trace", schemas.TRACE)
        self.metrics = make_table_store(spark, workdir, "metrics", schemas.METRICS)
        self._tables = [self.frontier, self.seen, self.images, self.trace, self.metrics]
        # frontier_cold joins the tagged/rolled-back set below (created
        # in the maintenance-knobs block); hot and cold must snapshot
        # together or resume could duplicate evicted rows
        # maintenance / observability knobs
        self.compact_every = compact_every
        # evict_every = K > 0: every K cycles, move TERMINAL frontier
        # rows (denied / redirect / canonical / retry-exhausted errors,
        # plus fetched pages when no revisit policy is on) into the
        # frontier_cold archive table and rewrite the hot frontier with
        # only live rows. At 10^10 URLs most of a mature frontier is
        # terminal — evicting it shrinks every cycle's pending scan to
        # the rows that can still become candidates, without losing
        # lineage (hot ∪ cold is exactly the unevicted table; the seen
        # set is a separate table, so rediscovered links still dedup).
        # Crawl results are PROVABLY unaffected: terminal rows can never
        # re-enter GENERATE (tests/test_eviction.py trace equality).
        self.evict_every = evict_every
        self.frontier_cold = make_table_store(
            spark, workdir, "frontier_cold",
            T.StructType(
                list(_with_bucket(schemas.FRONTIER).fields)
                + [T.StructField("evicted_cycle", T.IntegerType(), False)]
            ),
            ("bucket",),
        )
        self._tables.append(self.frontier_cold)
        self.record_lineage_flag = record_lineage
        # dynamic re-prioritization: every K cycles, integer-exact
        # PageRank over the accumulated link graph replaces frontier
        # priorities (priority = rank_micro // 1000) — mirrors
        # oracle.crawl(rank_every=K) exactly (same integer update
        # rule, linkrank.pagerank_int == pagerank_int_py)
        self.rank_every = rank_every
        if rank_every:
            self.edges = make_table_store(spark, workdir, "edges", schemas.EDGES)
            self._tables.append(self.edges)
        # anchor-text aggregation sink: per cycle, (target, term, cnt)
        # over every followed anchor on every parsed page — the words
        # OTHER pages use to describe a target (mirrors
        # oracle.crawl(anchor_texts=True)). Element scan + nofollow
        # filter + term split are JVM; only the short href string
        # crosses to Python for RFC-3986 resolution (the canonical-
        # link seam). Page-level nofollow (meta_robots) excludes the
        # whole page — anchors ride the same parse_src as links.
        self.anchor_texts = anchor_texts
        if anchor_texts:
            self.anchors = make_table_store(
                spark, workdir, "anchors", schemas.ANCHORS
            )
            self._tables.append(self.anchors)
        # focused (topical) crawling: a discovered link whose anchor
        # text contains a focus term enters the pool with
        # parent_priority + focus_boost — the crawl gravitates toward
        # pages the web itself describes as on-topic (the classic
        # focused-crawler shape; mirrors oracle.crawl(focus_terms=…)).
        # Matching is one JVM arrays_overlap on the split anchor; only
        # the short href crosses to Python for resolution.
        self.focus_terms = [t.lower() for t in focus_terms] if focus_terms else None
        self.focus_boost = focus_boost
        # shark-search content relevance (Hersovici et al. 1998 line):
        # with content_boost > 0, every link discovered on a page whose
        # extracted TEXT contains focus terms inherits
        # min(tf, content_cap)·content_boost extra priority — the
        # page-is-on-topic signal, complementing the per-LINK anchor
        # boost above. Computed as one JVM expression over the same
        # wet_text extraction the WET sink uses (textkit.wet_text ==
        # parsekit.extract_text byte-for-byte, so the oracle mirrors
        # exactly); mirrors oracle.crawl(content_boost=…).
        self.content_boost = content_boost
        self.content_cap = content_cap
        if content_dedup:
            self.digests = make_table_store(
                spark, workdir, "digests", _with_bucket(schemas.DIGESTS), ("bucket",)
            )
            self._tables.append(self.digests)
        if warc_cdx:
            self.cdx = make_table_store(spark, workdir, "cdx", schemas.CDX)
            self._tables.append(self.cdx)
        if dead_host_backoff:
            self.host_backoff = make_table_store(
                spark, workdir, "host_backoff", schemas.HOST_BACKOFF
            )
            self._tables.append(self.host_backoff)
        if wds_dir:
            self.wds_manifest = make_table_store(
                spark, workdir, "wds_manifest", schemas.WDS_MANIFEST
            )
            self._tables.append(self.wds_manifest)
        # append-only per-partition snapshot lineage; deliberately NOT
        # in _tables — an audit log must survive checkpoint rollback
        self.lineage = make_table_store(spark, workdir, "lineage", schemas.LINEAGE)
        self.state_path = os.path.join(workdir, "state.json")
        self.trace_seq = 0
        self.last_cycle = 0
        # Engine-resident Bloom filters, maintained INCREMENTALLY: built
        # from the table once (lazily), then each cycle ORs in only that
        # cycle's delta — no per-cycle full-table scan. Exactness is
        # unaffected (prefilter-only: stale/extra bits can only create
        # false positives, which the exact join resolves). Reset to None
        # on resume → rebuilt from the rolled-back table.
        # Merged form: one np array + ONE broadcast handle per filter
        # (destroyed when the array changes — re-broadcasting per call
        # would leak n_bits/8 bytes per cycle). Sharded form: a P-row
        # (bucket, bits) DataFrame kept executor-resident via
        # localCheckpoint (lineage-truncated so cycle-over-cycle OR
        # chains never grow), no driver-resident filter at all.
        self._seen_bloom = None
        self._seen_bloom_bc = None
        self._seen_shards = None
        self._phash_bloom = None
        self._phash_bloom_bc = None
        self._phash_shards = None

    # ------------------------------------------------------------ state

    def _reset_blooms(self) -> None:
        """Drop every engine-resident filter and its cluster-side
        resources (broadcasts destroyed, shard table unpersisted) —
        required whenever the seen/images tables change under us
        (seed overwrite, checkpoint rollback): stale bits could MISS
        keys, the one direction the prefilter contract cannot absorb."""
        self._seen_bloom = None
        self._phash_bloom = None
        for attr in ("_seen_bloom_bc", "_phash_bloom_bc"):
            bc = getattr(self, attr, None)
            if bc is not None:
                bc.destroy()
                setattr(self, attr, None)
        if self._seen_shards is not None:
            storagekit.release(self._seen_shards)
            self._seen_shards = None
        if self._phash_shards is not None:
            storagekit.release(self._phash_shards)
            self._phash_shards = None

    def _seen_bc(self):
        """The (cached) broadcast of the merged seen filter; re-made
        only when the array object changed since the last cycle."""
        if self._seen_bloom_bc is None:
            self._seen_bloom_bc = self.spark.sparkContext.broadcast(self._seen_bloom)
        return self._seen_bloom_bc

    def _phash_bc(self):
        if self._phash_bloom_bc is None:
            self._phash_bloom_bc = self.spark.sparkContext.broadcast(self._phash_bloom)
        return self._phash_bloom_bc

    # seen-filter flavor dispatch (self.seen_filter: bloom | cuckoo).
    # _seen_bloom / _seen_shards hold either flavor's state; the four
    # helpers below are the only places that care which.

    def _build_seen_filter(self, df: DataFrame):
        if self.seen_filter == "cuckoo":
            return cuckooops.build_cuckoo(df, self.cuckoo_m)
        return seenops.build_bloom(df, self.bloom_bits)

    def _split_seen_merged(self, cand: DataFrame):
        if self.seen_filter == "cuckoo":
            return cuckooops.split_by_cuckoo(cand, self._seen_bc(), self.spark)
        return seenops.split_by_bloom(cand, self._seen_bc(), self.bloom_bits, self.spark)

    def _build_seen_shards(self, df: DataFrame) -> DataFrame:
        if self.seen_filter == "cuckoo":
            return cuckooops.build_cuckoo_shards(df, self.n_buckets, self.cuckoo_shard_m)
        return seenops.build_bloom_shards(df, self.n_buckets, self.bloom_shard_bits)

    def _split_seen_shards(self, cand: DataFrame):
        if self.seen_filter == "cuckoo":
            return cuckooops.split_by_cuckoo_shards(cand, self._seen_shards, self.n_buckets)
        return seenops.split_by_bloom_shards(
            cand, self._seen_shards, self.bloom_shard_bits, self.n_buckets
        )

    def _merge_seen_delta(self, new_seen: DataFrame) -> None:
        """Fold the cycle's new-key delta into the engine-resident seen
        filter (merged array/filter or shard table), flavor-agnostic."""
        import numpy as np

        if self._seen_bloom is not None:
            if self.seen_filter == "cuckoo":
                self._seen_bloom = self._seen_bloom.merge(
                    cuckooops.build_cuckoo(new_seen, self.cuckoo_m)
                )
            else:
                self._seen_bloom = np.bitwise_or(
                    self._seen_bloom,
                    seenops.build_bloom(new_seen, self.bloom_bits),
                )
            if self._seen_bloom_bc is not None:
                self._seen_bloom_bc.destroy()
                self._seen_bloom_bc = None
        if self._seen_shards is not None:
            delta = self._build_seen_shards(new_seen)
            if self.seen_filter == "cuckoo":
                merged = cuckooops.merge_cuckoo_shards(self._seen_shards, delta)
            else:
                merged = seenops.or_merge_shards(self._seen_shards, delta)
            # eager: materialized before the old checkpoint is
            # released, lineage truncated so the merge chain never
            # deepens across cycles; storagekit so the old blocks are
            # actually freed (plain unpersist is a no-op for them)
            merged = storagekit.local_checkpoint(merged)
            storagekit.release(self._seen_shards)
            self._seen_shards = merged

    # ------------------------------------------------- fetch snapshot

    def _fetch_snap_dir(self) -> str:
        return os.path.join(self.workdir, "fetch_snapshot")

    def _write_fetch_snapshot(self, cycle: int, attempts, parts) -> None:
        """Persist the fetch stage's output mid-cycle: attempts (every
        consumed politeness slot, html attached) plus the GENERATE
        verdicts the rest of the cycle needs (denied → trace + merge,
        skipped → trace). Parquet writes are the materializing action —
        the wall-clock politeness sleeps happen here — and the marker
        lands atomically last, so a crash mid-write leaves no usable
        snapshot (the resumed run simply re-fetches)."""
        import shutil

        d = self._fetch_snap_dir()
        if os.path.isdir(d):
            shutil.rmtree(d)
        frames = {"attempts": attempts, "denied": parts["denied"],
                  "skipped": parts["skipped"]}
        if "domain_skipped" in parts:
            frames["domain_skipped"] = parts["domain_skipped"]
        schemas_json = {}
        for name, df in frames.items():
            df.write.mode("overwrite").parquet(os.path.join(d, name))
            # stored schema: an empty frame writes no part files, and
            # only an explicit schema lets the read return it as empty
            schemas_json[name] = df.schema.json()
        tmp = os.path.join(d, "marker.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"cycle": cycle, "schemas": schemas_json}, f)
        os.replace(tmp, os.path.join(d, "marker.json"))

    def _load_fetch_snapshot(self, cycle: int):
        """The cycle's committed fetch snapshot, or None. Stale markers
        (different cycle) are ignored; resume() prunes them."""
        if not self.fetch_checkpoint:
            return None
        marker = os.path.join(self._fetch_snap_dir(), "marker.json")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            m = json.load(f)
        if m["cycle"] != cycle:
            return None
        out = {}
        for name, sj in m["schemas"].items():
            schema = T.StructType.fromJson(json.loads(sj))
            out[name] = self.spark.read.schema(schema).parquet(
                os.path.join(self._fetch_snap_dir(), name)
            )
        return out

    def _drop_fetch_snapshot(self) -> None:
        import shutil

        d = self._fetch_snap_dir()
        if os.path.isdir(d):
            shutil.rmtree(d)

    def _save_state(self, cycle: int) -> None:
        for t in self._tables:
            t.tag(f"cycle-{cycle}")
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_cycle": cycle, "trace_seq": self.trace_seq}, f)
        os.replace(tmp, self.state_path)

    def _recompute_priorities(self) -> None:
        """PageRank the accumulated link graph and MERGE the new
        priorities into the frontier (update-only: URLs the graph
        doesn't rank keep their decay-based priority). Integer-exact
        (linkrank.pagerank_int), so it reproduces the oracle's
        pagerank_int_py bit-for-bit and the crawl trace stays exact.
        COW cost: the merge touches only buckets holding ranked URLs —
        at scale that is the actively-crawled slice, not the table."""
        from .functions import linkrank

        ranks = linkrank.pagerank_int(
            self.edges.read(), iterations=3, src="src_url", dst="dst_url"
        )
        src = (
            ranks.select(
                F.col("node").alias("url_norm"),
                F.expr("rank_micro div 1000").cast("long").alias("priority"),
            )
            .withColumn(
                "host", F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST")))
            )
            .select(
                "url_norm",
                "host",
                "priority",
                F.lit(None).cast("int").alias("dt_cycle"),
                F.lit(None).cast("long").alias("dt_seq"),
                F.lit(None).cast("string").alias("status"),
                F.lit(None).cast("int").alias("cycle_added"),
                F.lit(None).cast("int").alias("retries"),
                F.lit(None).cast("int").alias("last_cycle"),
                F.lit(None).cast("int").alias("interval"),
                F.lit(None).cast("int").alias("not_before"),
                F.lit(None).cast("int").alias("depth"),
            )
            .withColumn("bucket", urlops.host_bucket(F.col("host"), self.n_buckets))
        )
        self.frontier.merge_into(
            src, on=["url_norm"], update_cols=["priority"], insert=False
        )

    def _record_lineage(self, cycle: int) -> None:
        """One lineage row per (table, partition) for this cycle's
        committed snapshots — manifest/metadata reads only, zero data
        scans; the driver-side loop is O(#files), bounded like the
        other manifest reads."""
        if not self.record_lineage_flag:
            return
        rows = []
        for t in self._tables:
            stats_fn = getattr(t, "partition_file_stats", None)
            if stats_fn is None:
                continue
            tname = getattr(t, "name", None) or getattr(t, "ident", "?")
            v = int(t.version())
            for s in stats_fn():
                part = ",".join(f"{k}={v2}" for k, v2 in sorted(s["parts"].items()))
                rows.append((cycle, tname, v, part, int(s["n_files"]), int(s["n_rows"])))
        if not rows:
            return
        append_rows = getattr(self.lineage, "append_rows", None)
        if append_rows is not None:  # Parquet store: zero Spark jobs
            append_rows(rows)
        else:  # Iceberg backend: a tiny append job
            self.lineage.append(
                self.spark.createDataFrame(rows, schemas.LINEAGE).coalesce(1)
            )

    def evict_terminal(self, cycle: int) -> int:
        """Move terminal frontier rows to the frontier_cold archive and
        rewrite the hot frontier with live rows only; returns the
        evicted-row count. Terminal = a status the GENERATE candidate
        predicate can never select again: denied, redirect, canonical,
        error with retries exhausted — and fetched, but ONLY when no
        revisit policy is configured (with recrawl_every the fetched
        rows are the revisit clock and stay hot). 429-deferred rows
        keep their pre-429 live status and are never evicted.

        Scale shape: one pinned-snapshot frontier read split two ways —
        terminal rows append to the cold table (same bucket
        partitioning), live rows rewrite the hot table (COW: the old
        snapshot stays readable for resume/rollback until
        expire_snapshots). This is the Iceberg `DELETE WHERE status IN
        (...)` maintenance job; run every evict_every cycles so a
        mature 10^10-row frontier's per-cycle pending scan only reads
        rows that can still become candidates. Lineage is preserved:
        hot ∪ cold (minus evicted_cycle) is exactly the unevicted
        table, and the SEEN set is separate, so rediscovered links
        still dedup. Crawl results are provably unaffected
        (tests/test_eviction.py: traces byte-identical)."""
        f = self.frontier.read()
        term = F.col("status").isin(
            "denied", "redirect", "canonical", "soft404", "oversize"
        ) | (
            (F.col("status") == "error") & (F.col("retries") >= MAX_RETRIES)
        )
        if not self.recrawl_every:
            term = term | (F.col("status") == "fetched")
        cold = f.filter(term).withColumn(
            "evicted_cycle", F.lit(cycle).cast("int")
        )
        n_before = self.frontier.row_count()
        self.frontier_cold.append(cold)
        self.frontier.overwrite(
            f.filter(~term),
            sort_within_partitions_by=["priority", "dt_cycle", "dt_seq"],
        )
        # manifest row counts are exact and metadata-only: the evicted
        # count costs no extra Spark job
        return int(n_before - self.frontier.row_count())

    def resume(self) -> int:
        """Roll every table back to the last completed cycle's snapshot
        and return that cycle number (SURVEY.md §2.1 snk_checkpoint)."""
        if not os.path.exists(self.state_path):
            return 0
        with open(self.state_path) as f:
            st = json.load(f)
        cycle = st["last_cycle"]
        self.trace_seq = st["trace_seq"]
        self.last_cycle = cycle
        self._reset_blooms()
        for t in self._tables:
            v = t.tagged_version(f"cycle-{cycle}")
            if v is not None:
                t.rollback(v)
        # prune a fetch snapshot the committed state already covers
        # (crash between commit and snapshot cleanup); a snapshot for
        # cycle+1 is the crash-after-FETCH case and stays
        marker = os.path.join(self._fetch_snap_dir(), "marker.json")
        if os.path.exists(marker):
            with open(marker) as f:
                if json.load(f)["cycle"] <= cycle:
                    self._drop_fetch_snapshot()
        return cycle

    # ------------------------------------------------------------ seeding

    def seed(self, seeds: list[str], sitemap_seeds: bool | str = False) -> None:
        """Cycle 0: normalize the (small, driver-resident by definition)
        seed list preserving order; dt_seq = seed index (§7.5).

        sitemap_seeds: each seed host's /sitemap.xml is fetched+parsed
        DISTRIBUTED (one task per host slice — sitemaps can carry 50k
        URLs each, so their contents never touch the driver) and its
        URLs append after the explicit seeds: hosts in sorted order,
        sitemap document order within a host, dt_seq continuing via the
        two-phase global_sequence operator (no single-partition
        window). Mirrors oracle.crawl(sitemap_seeds=True) exactly.

        sitemap_seeds="robots": spec-compliant discovery — only
        sitemaps DECLARED by a `Sitemap:` directive in the host's
        robots.txt are fetched (in declared order); undeclaring hosts
        are never expanded. Mirrors oracle.crawl(sitemap_seeds="robots")."""
        rows, dedup = [], set()
        idx = 0
        for raw in seeds:
            u = urlkit.normalize_url(raw)
            if u is None or u in dedup:
                continue
            dedup.add(u)
            rows.append(
                (u, urlkit.host_of(u), SEED_PRIORITY, 0, idx, "pending",
                 0, 0, -1, self.recrawl_every, 0, 0)
            )
            idx += 1
        df = self.spark.createDataFrame(rows, schemas.FRONTIER)
        sm_cache = None
        if sitemap_seeds:
            import pandas as pd

            from . import parsekit

            cfg = self.cfg
            hosts = sorted({r[1] for r in rows})

            def gen(batches):
                from . import robots as robots_mod

                for pdf in batches:
                    hs, us, ps, prs = [], [], [], []
                    for h in pdf["host"]:
                        if sitemap_seeds == "robots":
                            declared = (
                                []
                                if synthweb.robots_unreachable(cfg, h)
                                else robots_mod.parse_robots(
                                    synthweb.robots_txt(cfg, h)
                                ).sitemaps
                            )
                            xmls = [
                                synthweb.sitemap_xml(
                                    cfg, urlkit.host_of(sm) or h
                                )
                                for sm in declared
                            ]
                        else:
                            xmls = [synthweb.sitemap_xml(cfg, h)]
                        pos = 0
                        for xml in xmls:
                            # index-aware (sitemap_shards): shared
                            # helper with oracle.crawl — a
                            # <sitemapindex> expands its child shards.
                            # Declared <priority> (sitemaps.org, ×10
                            # integer) rides along; -1 = undeclared.
                            for u, pri in synthweb.expand_sitemap_entries(
                                cfg, xml
                            ):
                                hs.append(h)
                                us.append(u)
                                ps.append(pos)
                                prs.append(-1 if pri is None else pri)
                                pos += 1
                    yield pd.DataFrame(
                        {"host": hs, "url_norm": us, "pos": ps, "pri": prs}
                    )

            sm = (
                self.spark.createDataFrame([(h,) for h in hosts], "host string")
                .repartition(max(1, min(len(hosts), self.n_buckets)))
                .mapInPandas(
                    gen, "host string, url_norm string, pos long, pri long"
                )
                .join(df.select("url_norm"), "url_norm", "left_anti")
            )
            numbered, _, sm_cache = sequencing.global_sequence(
                sm, ["host", "pos"], self.n_buckets, seq_col="_seq", offset=idx
            )
            # declared sitemap priority seeds the frontier priority:
            # 0.p maps to SEED_PRIORITY − (10 − p)·10, so declared URLs
            # rank below explicit seeds and above each other exactly by
            # their site's own ranking; undeclared keeps SEED_PRIORITY
            # (mirrors oracle.crawl — same integer mapping)
            sm_pri = F.when(
                F.col("pri") >= 0,
                F.lit(SEED_PRIORITY) - (F.lit(10) - F.col("pri")) * 10,
            ).otherwise(F.lit(SEED_PRIORITY))
            sm_rows = numbered.select(
                "url_norm",
                "host",
                sm_pri.cast("long").alias("priority"),
                F.lit(0).cast("int").alias("dt_cycle"),
                F.col("_seq").cast("long").alias("dt_seq"),
                F.lit("pending").alias("status"),
                F.lit(0).cast("int").alias("cycle_added"),
                F.lit(0).cast("int").alias("retries"),
                F.lit(-1).cast("int").alias("last_cycle"),
                F.lit(self.recrawl_every).cast("int").alias("interval"),
                F.lit(0).cast("int").alias("not_before"),
                F.lit(0).cast("int").alias("depth"),
            )
            df = df.unionByName(sm_rows)
        df = df.withColumn(
            "bucket", urlops.host_bucket(F.col("host"), self.n_buckets)
        )
        self.frontier.overwrite(df)
        seen_df = df.select(
            "url_norm",
            urlops.url_hash(F.col("url_norm")).alias("url_hash"),
            F.lit(0).cast("int").alias("cycle_added"),
        ).withColumn("bucket", urlops.url_bucket(F.col("url_hash"), self.n_buckets))
        self.seen.overwrite(seen_df)
        if sm_cache is not None:
            # both overwrites above executed the numbered plan; safe now
            sm_cache.unpersist()
        # overwrite invalidates the incremental filters (stale blooms
        # would MISS the new seed urls)
        self._reset_blooms()
        self._drop_fetch_snapshot()  # a reseed invalidates mid-cycle state
        self._save_state(0)

    # ------------------------------------------------------------ cycle

    def run_cycle(self, cycle: int) -> dict:
        cfg = self.cfg
        # opt-in phase timing (CCBOT_CYCLE_TIMINGS=1): records the
        # wall time of each ACTION group into counts["timings"] —
        # the per-cycle fixed-cost diagnostic for operators tuning a
        # deployment (lazy construction costs nothing; actions carry
        # the time).
        import time as _time

        _timing = os.environ.get("CCBOT_CYCLE_TIMINGS") == "1"
        _t: dict[str, float] = {}
        _t0 = _time.time()

        def _mark(name: str) -> None:
            nonlocal _t0
            if _timing:
                now = _time.time()
                _t[name] = round(now - _t0, 2)
                _t0 = now
        # ---- mid-cycle resume: a committed fetch snapshot for this
        # cycle means a prior run crashed after FETCH — re-enter at
        # PARSE with the snapshotted politeness outcomes so no slot
        # is consumed twice (fetch_checkpoint).
        snap = self._load_fetch_snapshot(cycle)
        if snap is not None:
            attempts = snap["attempts"]
            fetched_raw = attempts
            parts = {"denied": snap["denied"], "skipped": snap["skipped"]}
            if "domain_skipped" in snap:
                parts["domain_skipped"] = snap["domain_skipped"]
            skew_safe, fetch_parts = False, None  # bookkeeping only
            _mark("generate_topk")
        else:
            # candidates: pending, plus errored entries with retry budget
            # left (transient-failure recrawl; mirrors oracle.MAX_RETRIES),
            # plus — when the revisit policy is on — fetched pages due for
            # a recrawl (last successful fetch ≥ recrawl_every cycles ago)
            cand_pred = (F.col("status") == "pending") | (
                (F.col("status") == "error") & (F.col("retries") < MAX_RETRIES)
            )
            if self.recrawl_every:
                # per-row due check: interval == recrawl_every unless the
                # adaptive policy has moved it
                revisit_due = (F.col("status") == "fetched") & (
                    F.col("last_cycle") + F.col("interval") <= F.lit(cycle)
                )
                if self.sitemap_lastmod:
                    # sitemap <lastmod> skip, all-JVM: listed = the
                    # _sitemap_pages sha2 slice of /p/N pages; declared
                    # lastmod unchanged = same content epoch as our
                    # last fetch (static web: never changes). The
                    # whole predicate folds into the frontier scan.
                    jcol = F.regexp_extract(
                        F.col("url_norm"), r"^https?://[^/]+/p/([0-9]+)$", 1
                    )
                    listed = (jcol != "") & (
                        F.conv(
                            F.substring(
                                F.sha2(
                                    F.concat(
                                        F.lit(f"map:{cfg.seed}:"),
                                        F.col("host"),
                                        F.lit(":"),
                                        jcol,
                                    ),
                                    256,
                                ),
                                1,
                                2,
                            ),
                            16,
                            10,
                        ).cast("int")
                        % 4
                        == 0
                    )
                    if cfg.change_every:
                        lastmod_unchanged = F.expr(
                            f"last_cycle div {cfg.change_every}"
                        ) == F.lit(synthweb.content_version(cfg, cycle))
                    else:
                        lastmod_unchanged = F.lit(True)
                    revisit_due = revisit_due & ~(listed & lastmod_unchanged)
                cand_pred = cand_pred | revisit_due
            # 429 Retry-After deferral: a deferred URL is invisible to
            # GENERATE (any status branch) until not_before is reached
            cand_pred = cand_pred & (F.col("not_before") <= F.lit(cycle))
            pending = self.frontier.read().filter(cand_pred)
            if self.dead_host_backoff:
                # dead-host circuit breaker: hosts with an active
                # deferral are invisible to GENERATE this cycle (a
                # host-wide not_before; no trace events, exactly like
                # the per-URL deferral). One anti-join against the
                # small active slice of the host_backoff table.
                active_backoff = (
                    self.host_backoff.read()
                    .filter(F.col("until_cycle") > F.lit(cycle))
                    .select("host")
                    .dropDuplicates(["host"])
                )
                pending = pending.join(active_backoff, "host", "left_anti")
            # conditional-GET verdict, decided JVM-side before the fetch:
            # a recrawl candidate whose last fetch falls in the current
            # content epoch will answer 304 (slot consumed, no body)
            cur_ver = synthweb.content_version(cfg, cycle)
            if self.recrawl_every:
                if cfg.change_every:
                    unchanged = (F.col("status") == "fetched") & (
                        F.expr(f"last_cycle div {cfg.change_every}") == F.lit(cur_ver)
                    )
                else:
                    unchanged = F.col("status") == "fetched"  # static web
            else:
                unchanged = F.lit(False)
            pending = pending.withColumn("unchanged", unchanged)
            if self.age_boost:
                pending = pending.withColumn(
                    "_eff",
                    F.col("priority")
                    + F.lit(self.age_boost)
                    * (F.lit(cycle) - F.col("cycle_added")),
                )
            robots_df = politeness.build_robots_table(
                pending.select("host").distinct(), cfg,
                ver=synthweb.robots_version(cfg, cycle),
            )
            # ---- skew observation (one pending scan, three tiny jobs on
            # the cached |hosts|-row histogram): feeds the hot-host salt
            # list AND the auto skew decision. When the top host holds ≥
            # auto_skew_pct % of pending candidates, the cycle flips to the
            # two-phase GENERATE (no single window task owns the hot host's
            # whole frontier share) and the LPT range-partitioned fetch
            # (no hash-collision sleep stacking) — unless the user forced
            # either flag. Output is identical on every path; this picks
            # the plan a 100×-scale operator would have picked by hand.
            host_counts = (
                pending.groupBy("host")
                .agg(F.count("*").alias("n"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            stats = host_counts.agg(
                F.sum("n").alias("total"),
                F.max("n").alias("top"),
                F.count("*").alias("n_hosts"),
            ).first()
            total_pending = int(stats["total"] or 0)
            top_host_n = int(stats["top"] or 0)
            n_hosts = int(stats["n_hosts"] or 0)
            hot = [
                r["host"]
                for r in host_counts.filter(F.col("n") >= self.hot_host_min)
                .orderBy(F.col("n").desc(), F.col("host"))
                .limit(16)
                .collect()
            ]
            # with domain budgets on, the GENERATE plan also runs a
            # per-REGISTERED-DOMAIN window — and a spam domain spread
            # over many small subdomains trips NO per-host threshold,
            # so measure the top domain's share too (one more tiny agg
            # on the cached |hosts|-row histogram, still zero extra
            # pending scans). Plan choice only: output is identical.
            top_dom_n = 0
            if self.domain_budget > 0:
                top_dom_n = int(
                    (
                        host_counts.groupBy(
                            urlops.registered_domain(F.col("host")).alias("_d")
                        )
                        .agg(F.sum("n").alias("dn"))
                        .agg(F.max("dn"))
                        .first()[0]
                    )
                    or 0
                )
            host_counts.unpersist()
            skew_detected = (
                total_pending > 0
                and top_host_n >= self.hot_host_min
                and top_host_n * 100 >= self.auto_skew_pct * total_pending
            ) or (
                total_pending > 0
                and top_dom_n >= self.hot_host_min
                and top_dom_n * 100 >= self.auto_skew_pct * total_pending
            )
            skew_safe = (
                self.skew_safe_generate
                if self.skew_safe_generate is not None
                else skew_detected
            )
            fetch_parts = self.fetch_partitions
            # LPT fetch partitioning is picked automatically in TWO
            # situations, because they have different failure modes:
            #   * skew_detected — one hot host's salt fan-out must not
            #     hash-collide into a neighbor's sleeps;
            #   * wall-clock politeness with more groups than the
            #     default fetch width — hash partitioning stacks ~
            #     groups/width politeness schedules per task and the
            #     slowest task serializes their sleeps (measured: a
            #     480-host wall-clock crawl at local[32] lost 26% N→4N
            #     efficiency to stacking alone, no skew needed).
            # Both pick the same width: ≥ one whole politeness group
            # per task (hosts with candidates + the hot host's salt
            # fan-out), above the 4×buckets threshold so downstream
            # byte-bound stages re-coalesce, capped so the task count
            # stays sane when the frontier spans millions of hosts.
            delay_stacking = (
                self.enforce_delay_wallclock
                and n_hosts + self.salt_fanout > 4 * self.n_buckets
            )
            if fetch_parts is None and (skew_detected or delay_stacking):
                fetch_parts = int(
                    min(
                        max(n_hosts + self.salt_fanout, 4 * self.n_buckets + 1),
                        32 * self.n_buckets,
                    )
                )
            parts = politeness.generate(
                pending, robots_df, skew_safe=skew_safe,
                domain_budget=self.domain_budget,
                ip_pool=self.ip_pool,
                ip_resolver=self._ip_resolver_df,
            )
            # denied feeds both the trace and the frontier merge; persist so
            # the robots-UDF + window stage runs once
            parts["denied"] = parts["denied"].persist(StorageLevel.MEMORY_AND_DISK)

            _mark("generate_topk")
            # IP politeness: the fetch-stage grouping unit is the
            # server, not the vhost — hot HOSTS map to their IPs so
            # the salt fan-out follows the actual schedule owner.
            fetch_group_col = "ip" if self.ip_pool > 0 else None
            if self.ip_pool > 0 and hot:
                hot = sorted({
                    urlkit.resolve_ip(h, self.ip_pool, self.ip_resolver)
                    for h in hot
                })
            fetched = fetchparse.fetch(
                parts["fetch"], cfg, hot_hosts=hot, salt_fanout=self.salt_fanout,
                enforce_delay_wallclock=self.enforce_delay_wallclock,
                delay_scale=self.delay_scale,
                fetch_partitions=fetch_parts,
                content_ver=cur_ver,
                fetcher=self.fetcher,
                cycle=cycle,
                group_col=fetch_group_col,
                etag_revalidate=self.etag_revalidate,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            fetched_raw = fetched
            if fetch_parts and fetch_parts > 4 * self.n_buckets:
                # the fetch stage over-partitions for delay balance; bring
                # the (byte-bound) downstream stages back to normal width
                fetched = fetched.repartition(self.n_buckets).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
            attempts = fetched  # every consumed slot (ok + redirected + errored)
            if self.fetch_checkpoint:
                self._write_fetch_snapshot(cycle, attempts, parts)
                if self._crash_after_fetch:
                    raise RuntimeError("test hook: crash after fetch snapshot")
        fetched = attempts.filter(
            F.col("ok")
            & F.col("redirect").isNull()
            & ~F.col("not_modified")
            & ~F.col("rate_limited")
        )
        notmods = attempts.filter(F.col("ok") & F.col("not_modified"))
        redirs = attempts.filter(F.col("ok") & F.col("redirect").isNotNull())
        errs = attempts.filter(~F.col("ok"))
        # 429 deferrals: slot consumed, nothing served; the frontier
        # entry keeps its pre-fetch status and gains a not_before gate
        rls = attempts.filter(F.col("rate_limited"))

        # ---- content-type gate (before the canonical scan: rel=
        # canonical is an HTML feature). A non-HTML payload consumes
        # its slot, counts as fetched in the metrics, reaches terminal
        # 'fetched' status and (optionally) the WARC archive — but is
        # never parsed: no canonical scan, no content-seen digest, no
        # links, no images. Filter runs over the cached fetch output;
        # at 100 TB this prunes the parse stages' input before any
        # html-width shuffle.
        # ---- oversize gate (FIRST among the body gates: a transfer
        # aborted at the cap has no trustworthy body for any later
        # sniff — content-type, soft-404, canonical, digest all skip).
        # One JVM octet_length comparison over the cached fetch output.
        overs = None
        if self.max_body_bytes:
            big = F.octet_length(F.col("html")) > self.max_body_bytes
            overs = fetched.filter(big)
            fetched = fetched.filter(~big)

        bins = None
        if self.cfg.binary_pct:
            bins = fetched.filter(F.col("content_type") != "text/html")
            fetched = fetched.filter(F.col("content_type") == "text/html")

        # ---- soft-404 gate (before the canonical scan and the
        # content-seen test: an error page's canonical declaration must
        # not enqueue anything and its template body must never enter
        # the digests table). The verdict is one JVM lower+rlike over
        # the cached fetch output — detected rows consume their slot,
        # count as fetched in the metrics, reach terminal 'soft404'
        # status, and are never parsed.
        soft404s = None
        if self.soft404_detect:
            s4 = fetchparse.soft404_col("html")
            soft404s = fetched.filter(s4)
            fetched = fetched.filter(~s4)

        # ---- rel=canonical aliases (before the content-seen test: a
        # canonicalized page is never parsed, so its digest must not
        # enter the digests table or the within-cycle election). The
        # html scan is one JVM regexp; only the extracted href crosses
        # to Python for RFC-3986 resolution.
        canons = None
        canon_cache = None
        if self.canonical_dedup:
            fc = fetchparse.with_canonical(fetched).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            canon_cache = fc
            is_canon = F.col("canonical").isNotNull() & (
                F.col("canonical") != F.col("url_norm")
            )
            canons = fc.filter(is_canon)
            fetched = fc.filter(
                F.col("canonical").isNull()
                | (F.col("canonical") == F.col("url_norm"))
            ).drop("canonical")

        # ---- content-seen test (Mercator): a fetched page whose body
        # digest was already stored (mirror site / duplicated content)
        # consumes its slot but is never parsed — no links, no images.
        # Shape: digest + within-cycle winner election run over a thin
        # (url, host, sched_time, digest) projection — the window
        # shuffle moves 16-byte digests, never page bodies — then the
        # boolean verdict joins back onto the cached fetch output. The
        # cross-cycle check is a left join against the digests table,
        # the same bucket-keyed membership shape as the URL-seen join.
        # Within-cycle ties elect the FIRST page in the politeness
        # order (sched_time, host, url_norm) — exactly the order the
        # oracle processes fetches, so traces stay byte-identical.
        content_dups = None
        cdup_cache = None
        if self.content_dedup:
            fd = fetched.withColumn("digest", F.md5(F.col("html")))
            known = (
                self.digests.read()
                .select("digest")
                .dropDuplicates(["digest"])
                .withColumn("_known", F.lit(True))
            )
            wdg = Window.partitionBy("digest").orderBy(
                "sched_time", "host", "url_norm"
            )
            verdict = (
                fd.select("url_norm", "host", "sched_time", "digest")
                .join(known, "digest", "left")
                .withColumn("_rn", F.row_number().over(wdg))
                .select(
                    "url_norm",
                    (
                        F.col("_known").isNotNull() | (F.col("_rn") > 1)
                    ).alias("is_cdup"),
                )
            )
            fd = fd.join(verdict, "url_norm").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            cdup_cache = fd
            content_dups = fd.filter(F.col("is_cdup"))
            fetched = fd.filter(~F.col("is_cdup"))

        # ---- page-level robots meta gate (REP <meta name="robots">,
        # LAST among the body gates: an alias, error template, or
        # content dup is never parsed, so its directives are never
        # read). noindex keeps the page out of the STORE path only
        # (WARC/WET stay archival — archiving is not indexing);
        # nofollow keeps it out of the PARSE path only (no links, no
        # rank edges, no discovery). Both verdicts are one JVM
        # regexp_extract over the cached fetch output; slot, bytes,
        # 'fetched' status and trace are unchanged in both engines.
        parse_src = fetched
        store_src = fetched
        noindexed = nofollowed = None
        if self.meta_robots:
            mr_ni, mr_nf = fetchparse.meta_robots_cols("html")
            noindexed = fetched.filter(mr_ni)
            nofollowed = fetched.filter(mr_nf)
            parse_src = fetched.filter(~mr_nf)
            store_src = fetched.filter(~mr_ni)

        # ---- links path (§3.1 step 6)
        links = fetchparse.extract_links(parse_src).persist(StorageLevel.MEMORY_AND_DISK)
        # cand feeds BOTH the new-link chain and the dup-trace chain —
        # persist so neither recomputes the links aggregation
        # redirect Location targets join the same discovered pool as
        # parsed outlinks (normalized in the fetch stage), carrying the
        # redirecting page's priority — identical decay/seen/dup rules
        redir_tgts = redirs.select(
            F.col("redirect").alias("url_norm"),
            F.col("priority").cast("long").alias("parent_priority"),
            F.col("depth").cast("int").alias("parent_depth"),
        )
        if self.focus_terms is not None:
            # focused crawling: (page, target) pairs whose anchor text
            # contains a focus term (JVM arrays_overlap on the split
            # anchor; resolution through the same seam as links) lift
            # that link's pool entry by focus_boost BEFORE the
            # max-priority dedup — so the boost survives exactly when
            # a boosted parent wins, like the oracle's per-occurrence
            # effective priority. Redirect/canonical targets carry no
            # anchor and are never boosted.
            ap = fetchparse.extract_anchor_texts(parse_src, url_col="url_norm")
            matched = (
                ap.filter(
                    F.arrays_overlap(
                        F.split(F.lower(F.col("anchor")), r"\s+"),
                        F.array(*[F.lit(t) for t in self.focus_terms]),
                    )
                )
                .select(
                    "page_url",
                    fetchparse._resolve_one_udf(
                        F.col("page_url"), F.col("href")
                    ).alias("url_norm"),
                )
                .filter(F.col("url_norm").isNotNull())
                .dropDuplicates(["page_url", "url_norm"])
                .withColumn("_focus", F.lit(True))
            )
            link_pool = (
                links.select(
                    "page_url", "url_norm", "parent_priority", "parent_depth"
                )
                .join(matched, ["page_url", "url_norm"], "left")
                .select(
                    "page_url",
                    "url_norm",
                    (
                        F.col("parent_priority")
                        + F.when(
                            F.col("_focus").isNotNull(),
                            F.lit(self.focus_boost),
                        ).otherwise(F.lit(0))
                    ).cast("long").alias("parent_priority"),
                    "parent_depth",
                )
            )
        else:
            link_pool = links.select(
                "page_url", "url_norm", "parent_priority", "parent_depth"
            )
        if self.content_boost and self.focus_terms is not None:
            # shark-search content relevance: every link from a page
            # whose extracted text mentions the focus terms inherits
            # min(tf, cap)·content_boost — one JVM wet_text + token
            # filter per parsed page (no Python), joined back on the
            # page url BEFORE the max-priority dedup. Redirect and
            # canonical targets carry no content signal, like anchors.
            from .functions import textkit as _tk

            rel = parse_src.select(
                F.col("url_norm").alias("page_url"),
                (
                    F.least(
                        F.size(
                            F.filter(
                                F.split(
                                    F.lower(_tk.wet_text(F.col("html"))), " "
                                ),
                                lambda t: t.isin(*self.focus_terms),
                            )
                        ),
                        F.lit(self.content_cap),
                    )
                    * F.lit(self.content_boost)
                ).cast("long").alias("_rel"),
            )
            link_pool = (
                link_pool.join(rel, "page_url", "left")
                .withColumn(
                    "parent_priority",
                    (
                        F.col("parent_priority")
                        + F.coalesce(F.col("_rel"), F.lit(0))
                    ).cast("long"),
                )
                .drop("_rel")
            )
        link_pool = link_pool.drop("page_url")
        pool = link_pool.unionByName(redir_tgts)
        if canons is not None:
            # canonical targets: same discovered-pool rules as redirect
            # Location targets (already normalized in the resolve UDF)
            pool = pool.unionByName(
                canons.select(
                    F.col("canonical").alias("url_norm"),
                    F.col("priority").cast("long").alias("parent_priority"),
                    F.col("depth").cast("int").alias("parent_depth"),
                )
            )
        if self.max_depth:
            # depth gate (Heritrix max-hops): a link whose depth would
            # exceed the cap never reaches the dedup groupBy, the seen
            # joins, or the frontier — dropped pre-shuffle like traps
            # (parsed_links metrics and rank edges stay pre-filter).
            pool = pool.filter(
                F.col("parent_depth") + 1 <= F.lit(self.max_depth)
            )
        if self.trap_filter:
            # pre-shuffle: trap URLs never reach the dedup groupBy, the
            # seen joins, or the frontier merge (parsed_links metrics
            # and the rank edge log stay pre-filter, like the oracle)
            pool = urlops.filter_traps(pool, url_col="url_norm")
        if self._deny_re is not None:
            # scope deny-list, same pre-shuffle position as traps
            pool = pool.filter(~F.col("url_norm").rlike(self._deny_re))
        cand = (
            pool
            .groupBy("url_norm")
            .agg(
                F.max("parent_priority").alias("pp"),
                # first-insert depth = min over this cycle's parents
                # (shortest-hops semantics; independent of which parent
                # won the priority max — the oracle mirrors both)
                F.min("parent_depth").alias("pdm"),
            )
            .withColumn("url_hash", urlops.url_hash(F.col("url_norm")))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        seen_df = self.seen.read()
        # The Bloom prefilter pays off when seen ≫ per-cycle candidates
        # (its job is shrinking the anti-join's left side); below the
        # threshold the build costs more than the join it saves. The
        # result is identical either way (§7.4 item 2: the filter is a
        # prefilter, never the decider).
        # manifest-recorded row count: a metadata read, not a per-cycle
        # full scan of a 10^10-row table
        split_cache = None
        if self.use_bloom and self.seen.row_count() >= self.bloom_min_seen:
            if self.bloom_sharded:
                # bucket-routed shards: no merged filter, no broadcast;
                # each probe task holds one bucket's shard only
                if self._seen_shards is None:  # first use / post-resume
                    self._seen_shards = storagekit.local_checkpoint(
                        self._build_seen_shards(seen_df)
                    )
                _mark("seen_bloom_build")
                sure_new, maybe, split_cache = self._split_seen_shards(cand)
            else:
                if self._seen_bloom is None:  # first use / post-resume
                    self._seen_bloom = self._build_seen_filter(seen_df)
                _mark("seen_bloom_build")
                sure_new, maybe = self._split_seen_merged(cand)
            new = sure_new.unionByName(seenops.anti_join_seen(maybe, seen_df))
            dup = seenops.semi_join_seen(maybe, seen_df)
        else:
            new = seenops.anti_join_seen(cand, seen_df)
            dup = seenops.semi_join_seen(cand, seen_df)

        new_rows = new.select(
            F.col("url_norm"),
            F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST"))).alias("host"),
            F.greatest(F.col("pp") - PRIORITY_DECAY, F.lit(0)).cast("long").alias("priority"),
            F.lit(cycle).cast("int").alias("dt_cycle"),
            F.lit(0).cast("long").alias("dt_seq"),
            F.lit("pending").alias("status"),
            F.lit(cycle).cast("int").alias("cycle_added"),
            F.lit(0).cast("int").alias("retries"),
            F.lit(-1).cast("int").alias("last_cycle"),
            F.lit(self.recrawl_every).cast("int").alias("interval"),
            F.lit(0).cast("int").alias("not_before"),
            (F.col("pdm") + 1).cast("int").alias("depth"),
        ).withColumn("bucket", urlops.host_bucket(F.col("host"), self.n_buckets))
        new_rows = new_rows.persist(StorageLevel.MEMORY_AND_DISK)

        # ---- images path (§3.1 step 5)
        decoded = imageops.fetch_decode_phash(
            fetchparse.extract_images(store_src), cfg
        ).persist(StorageLevel.MEMORY_AND_DISK)
        blocked_n = None
        if self._blocklist_df is not None:
            from .functions import multimodal as mm

            blf = mm.phash_blocklist_filter(
                decoded, self._blocklist_df, max_ham=self.blocklist_ham
            )
            blocked_n = blf["flagged"].count()
            decoded = blf["kept"]
        # Same pay-off threshold as the seen Bloom: below it the filter
        # build/maintenance jobs cost more than the join they shrink
        # (metadata row count — no scan). Result identical either way.
        use_phash_bloom = (
            self.use_bloom and self.images.row_count() >= self.bloom_min_seen
        )
        # phash filter flavor follows the seen set's: merged broadcast
        # while broadcastable, bucket-routed shards at 10^10 stored
        # images (bloom_sharded — same auto-threshold)
        if use_phash_bloom and not self.bloom_sharded and self._phash_bloom is None:
            # first use / post-resume: one full phash-column scan
            self._phash_bloom = seenops.build_bloom(
                self.images.read().select("phash"), self.bloom_bits, col="phash"
            )
        if use_phash_bloom and self.bloom_sharded and self._phash_shards is None:
            self._phash_shards = storagekit.local_checkpoint(
                seenops.build_bloom_shards(
                    self.images.read().select("phash"),
                    self.n_buckets,
                    self.bloom_shard_bits,
                    col="phash",
                )
            )
        dd = imageops.dedup_by_phash(
            decoded,
            self.images.read().select("phash"),
            bloom=(
                self._phash_bc()
                if use_phash_bloom and not self.bloom_sharded
                else None
            ),
            bloom_bits=self.bloom_bits,
            spark=self.spark,
            shards=self._phash_shards if use_phash_bloom and self.bloom_sharded else None,
            shard_bits=self.bloom_shard_bits,
            n_buckets=self.n_buckets,
        )
        store = dd["store"].persist(StorageLevel.MEMORY_AND_DISK)
        dups = dd["dups"]
        phash_split_cache = dd["cache"]

        # ---- metrics (§3.1 step 7) — per host over all attempts
        # (errored fetches carry html="" so the byte sum is ok-only)
        m_fetch = attempts.groupBy("host").agg(
            F.sum(
                (
                    F.col("ok")
                    & F.col("redirect").isNull()
                    & ~F.col("not_modified")
                    & ~F.col("rate_limited")
                ).cast("long")
            ).alias("fetched"),
            F.sum((~F.col("ok")).cast("long")).alias("errors"),
            F.sum((F.col("ok") & F.col("redirect").isNotNull()).cast("long")).alias("redirects"),
            F.sum((F.col("ok") & F.col("not_modified")).cast("long")).alias("not_modified"),
            F.sum(F.col("rate_limited").cast("long")).alias("rate_limited"),
            F.sum(
                F.least(
                    F.octet_length(F.col("html")),
                    F.lit(self.max_body_bytes),
                )
                if self.max_body_bytes
                else F.octet_length(F.col("html"))
            ).alias("html_bytes"),
        )
        m_links = links.groupBy(F.col("page_host").alias("host")).agg(
            F.count("*").alias("parsed_links")
        )
        m_store = store.groupBy(F.col("page_host").alias("host")).agg(
            F.count("*").alias("stored_images"),
            F.sum(F.octet_length(F.col("bytes"))).alias("img_bytes"),
        )
        m_dups = dups.groupBy(F.col("page_host").alias("host")).agg(
            F.count("*").alias("dedup_hits")
        )
        if content_dups is not None:
            m_cdup = content_dups.groupBy("host").agg(
                F.count("*").alias("content_dup")
            )
        else:
            m_cdup = self.spark.createDataFrame(
                [], "host string, content_dup long"
            )
        if canons is not None:
            m_canon = canons.groupBy("host").agg(
                F.count("*").alias("canonicals")
            )
        else:
            m_canon = self.spark.createDataFrame(
                [], "host string, canonicals long"
            )
        if soft404s is not None:
            m_s404 = soft404s.groupBy("host").agg(
                F.count("*").alias("soft404s")
            )
        else:
            m_s404 = self.spark.createDataFrame(
                [], "host string, soft404s long"
            )
        if overs is not None:
            m_over = overs.groupBy("host").agg(
                F.count("*").alias("oversized")
            )
        else:
            m_over = self.spark.createDataFrame(
                [], "host string, oversized long"
            )
        if noindexed is not None:
            m_mrni = noindexed.groupBy("host").agg(
                F.count("*").alias("noindexed")
            )
            m_mrnf = nofollowed.groupBy("host").agg(
                F.count("*").alias("nofollowed")
            )
        else:
            m_mrni = self.spark.createDataFrame(
                [], "host string, noindexed long"
            )
            m_mrnf = self.spark.createDataFrame(
                [], "host string, nofollowed long"
            )
        metrics_df = (
            m_fetch.join(m_links, "host", "left")
            .join(m_store, "host", "left")
            .join(m_dups, "host", "left")
            .join(m_cdup, "host", "left")
            .join(m_canon, "host", "left")
            .join(m_s404, "host", "left")
            .join(m_over, "host", "left")
            .join(m_mrni, "host", "left")
            .join(m_mrnf, "host", "left")
            .select(
                F.lit(cycle).cast("int").alias("cycle"),
                urlops.host_bucket(F.col("host"), self.n_buckets).alias("partition_id"),
                F.col("host"),
                F.col("fetched").cast("long"),
                F.coalesce(F.col("parsed_links"), F.lit(0)).cast("long").alias("parsed_links"),
                F.coalesce(F.col("stored_images"), F.lit(0)).cast("long").alias("stored_images"),
                F.coalesce(F.col("dedup_hits"), F.lit(0)).cast("long").alias("dedup_hits"),
                F.col("errors").cast("long"),
                (
                    F.coalesce(F.col("html_bytes"), F.lit(0))
                    + F.coalesce(F.col("img_bytes"), F.lit(0))
                ).cast("long").alias("bytes"),
                F.col("redirects").cast("long"),
                F.col("not_modified").cast("long"),
                F.col("rate_limited").cast("long"),
                F.coalesce(F.col("content_dup"), F.lit(0))
                .cast("long")
                .alias("content_dup"),
                F.coalesce(F.col("canonicals"), F.lit(0))
                .cast("long")
                .alias("canonicals"),
                F.coalesce(F.col("soft404s"), F.lit(0))
                .cast("long")
                .alias("soft404s"),
                F.coalesce(F.col("oversized"), F.lit(0))
                .cast("long")
                .alias("oversized"),
                F.coalesce(F.col("noindexed"), F.lit(0))
                .cast("long")
                .alias("noindexed"),
                F.coalesce(F.col("nofollowed"), F.lit(0))
                .cast("long")
                .alias("nofollowed"),
            )
        )

        # ---- trace (§3.1 step 7; phases: denied=0 skipped=1
        #      fetched/fetch_error/redirect=2 dup=3)
        n_trace = 0
        trace_df = None
        trace_cache = None
        events = None
        if self.record_trace:
            ev_cols = ["url_norm", "host", "sched_slot", "sched_time", "phase", "action"]

            def evt(df: DataFrame, phase: int, action: str, slot=None, sched=None):
                return df.select(
                    "url_norm",
                    "host",
                    (F.col("sched_slot") if slot else F.lit(-1)).cast("int").alias("sched_slot"),
                    (F.col("sched_time") if sched else F.lit(0)).cast("long").alias("sched_time"),
                    F.lit(phase).alias("phase"),
                    F.lit(action).alias("action"),
                ).select(*ev_cols)

            dup_ev = dup.select(
                "url_norm",
                F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST"))).alias("host"),
                F.lit(-1).cast("int").alias("sched_slot"),
                F.lit(0).cast("long").alias("sched_time"),
                F.lit(3).alias("phase"),
                F.lit("dup").alias("action"),
            ).select(*ev_cols)
            events = (
                evt(parts["denied"], 0, "robots_denied")
                .unionByName(evt(parts["skipped"], 1, "budget_skipped"))
            )
            if "domain_skipped" in parts:
                events = events.unionByName(
                    evt(parts["domain_skipped"], 1, "domain_skipped")
                )
            events = (
                events
                .unionByName(evt(fetched, 2, "fetched", slot=True, sched=True))
                .unionByName(evt(errs, 2, "fetch_error", slot=True, sched=True))
                .unionByName(evt(redirs, 2, "redirect", slot=True, sched=True))
                .unionByName(evt(notmods, 2, "not_modified", slot=True, sched=True))
                .unionByName(evt(rls, 2, "rate_limited", slot=True, sched=True))
                .unionByName(dup_ev)
            )
            if bins is not None:
                events = events.unionByName(
                    evt(bins, 2, "binary", slot=True, sched=True)
                )
            if content_dups is not None:
                events = events.unionByName(
                    evt(content_dups, 2, "content_dup", slot=True, sched=True)
                )
            if canons is not None:
                events = events.unionByName(
                    evt(canons, 2, "canonical", slot=True, sched=True)
                )
            if soft404s is not None:
                events = events.unionByName(
                    evt(soft404s, 2, "soft404", slot=True, sched=True)
                )
            if overs is not None:
                events = events.unionByName(
                    evt(overs, 2, "oversize", slot=True, sched=True)
                )
        # ---- frontier MERGE INTO: status updates + new-link inserts
        bucket = urlops.host_bucket(F.col("host"), self.n_buckets)
        # fetched ∪ not_modified both end the cycle as status 'fetched'
        # with the revisit clock advanced to this cycle. Adaptive
        # policy: 304 → interval doubles (≤ ADAPT_MAX); changed revisit
        # (pre-fetch last_cycle ≥ 0, re-fetched) → halves (≥ ADAPT_MIN);
        # first fetch keeps the base. Mirrors oracle.crawl.
        if self.adaptive_recrawl:
            iv = F.col("interval")
            _iv_policy = (
                F.when(
                    F.col("not_modified"),
                    F.least(iv * 2, F.lit(ADAPT_MAX)),
                )
                .when(
                    F.col("last_cycle") >= 0,
                    F.greatest(F.expr("interval div 2"), F.lit(ADAPT_MIN)),
                )
                .otherwise(iv)
            )
        else:
            _iv_policy = F.col("interval")
        if self.honor_max_age:
            # declared freshness wins over the adaptive guess
            _iv_policy = F.when(
                F.col("max_age").isNotNull(),
                F.least(
                    F.greatest(F.col("max_age"), F.lit(ADAPT_MIN)),
                    F.lit(ADAPT_MAX),
                ),
            ).otherwise(_iv_policy)
        new_iv = _iv_policy.cast("int").alias("interval")
        # depth is insert-only (first-discovery value, like dt_*): the
        # update branches carry a dummy that merge_into never applies
        _dep0 = F.lit(0).cast("int").alias("depth")
        upd_base = attempts.filter(
            F.col("ok") & F.col("redirect").isNull() & ~F.col("rate_limited")
        )
        if canons is not None:
            # canonicalized pages leave the 'fetched' update path (they
            # get their own terminal status below); anti-join on the
            # small canons side (AQE broadcasts it)
            upd_base = upd_base.join(
                canons.select("url_norm"), "url_norm", "left_anti"
            )
        if soft404s is not None:
            # soft-404 pages get their own terminal status below
            upd_base = upd_base.join(
                soft404s.select("url_norm"), "url_norm", "left_anti"
            )
        if overs is not None:
            # oversize pages get their own terminal status below
            upd_base = upd_base.join(
                overs.select("url_norm"), "url_norm", "left_anti"
            )
        upd_fetched = upd_base.select(
            "url_norm", "host", "priority",
            F.lit(0).cast("int").alias("dt_cycle"),  # ignored on update
            F.lit(0).cast("long").alias("dt_seq"),
            F.lit("fetched").alias("status"),
            F.lit(0).cast("int").alias("cycle_added"),
            F.col("retries").cast("int"),
            F.lit(cycle).cast("int").alias("last_cycle"),
            new_iv,
            F.lit(0).cast("int").alias("not_before"),
            _dep0,
        ).withColumn("bucket", bucket)
        upd_redir = redirs.select(
            "url_norm", "host", "priority",
            F.lit(0).cast("int").alias("dt_cycle"),
            F.lit(0).cast("long").alias("dt_seq"),
            F.lit("redirect").alias("status"),  # terminal: never refetched
            F.lit(0).cast("int").alias("cycle_added"),
            F.col("retries").cast("int"),
            F.col("last_cycle").cast("int"),
            F.col("interval").cast("int"),
            F.lit(0).cast("int").alias("not_before"),
            _dep0,
        ).withColumn("bucket", bucket)
        if self.error_backoff:
            # post-increment retries r: cool down min(2^r, CAP) cycles
            err_nb = (
                F.lit(cycle)
                + F.least(
                    F.expr("shiftleft(1, retries + 1)"),
                    F.lit(self.error_backoff),
                )
            ).cast("int")
        else:
            err_nb = F.lit(0).cast("int")
        upd_err = errs.select(
            "url_norm", "host", "priority",
            F.lit(0).cast("int").alias("dt_cycle"),
            F.lit(0).cast("long").alias("dt_seq"),
            F.lit("error").alias("status"),
            F.lit(0).cast("int").alias("cycle_added"),
            (F.col("retries") + 1).cast("int").alias("retries"),
            F.col("last_cycle").cast("int"),
            F.col("interval").cast("int"),
            err_nb.alias("not_before"),
            _dep0,
        ).withColumn("bucket", bucket)
        upd_denied = parts["denied"].select(
            "url_norm", "host", "priority",
            F.lit(0).cast("int").alias("dt_cycle"),
            F.lit(0).cast("long").alias("dt_seq"),
            F.lit("denied").alias("status"),
            F.lit(0).cast("int").alias("cycle_added"),
            F.col("retries").cast("int"),
            F.col("last_cycle").cast("int"),
            F.col("interval").cast("int"),
            F.lit(0).cast("int").alias("not_before"),
            _dep0,
        ).withColumn("bucket", bucket)
        # 429-deferred: everything restored from the pre-fetch row
        # (status passthrough via the fetch stage), only not_before
        # moves — to cycle + Retry-After, computed where the 429 was
        # observed (the fetch worker)
        upd_rl = rls.select(
            "url_norm", "host", "priority",
            F.lit(0).cast("int").alias("dt_cycle"),
            F.lit(0).cast("long").alias("dt_seq"),
            F.col("status"),
            F.lit(0).cast("int").alias("cycle_added"),
            F.col("retries").cast("int"),
            F.col("last_cycle").cast("int"),
            F.col("interval").cast("int"),
            F.col("not_before").cast("int"),
            _dep0,
        ).withColumn("bucket", bucket)
        merge_src = (
            upd_fetched.unionByName(upd_redir)
            .unionByName(upd_err)
            .unionByName(upd_denied)
            .unionByName(upd_rl)
            .unionByName(new_rows)
        )
        if canons is not None:
            upd_canon = canons.select(
                "url_norm", "host", "priority",
                F.lit(0).cast("int").alias("dt_cycle"),
                F.lit(0).cast("long").alias("dt_seq"),
                F.lit("canonical").alias("status"),  # terminal alias
                F.lit(0).cast("int").alias("cycle_added"),
                F.col("retries").cast("int"),
                F.col("last_cycle").cast("int"),
                F.col("interval").cast("int"),
                F.lit(0).cast("int").alias("not_before"),
                _dep0,
            ).withColumn("bucket", bucket)
            merge_src = merge_src.unionByName(upd_canon)
        if soft404s is not None:
            upd_s404 = soft404s.select(
                "url_norm", "host", "priority",
                F.lit(0).cast("int").alias("dt_cycle"),
                F.lit(0).cast("long").alias("dt_seq"),
                F.lit("soft404").alias("status"),  # terminal: an error
                F.lit(0).cast("int").alias("cycle_added"),
                F.col("retries").cast("int"),
                F.col("last_cycle").cast("int"),
                F.col("interval").cast("int"),
                F.lit(0).cast("int").alias("not_before"),
                _dep0,
            ).withColumn("bucket", bucket)
            merge_src = merge_src.unionByName(upd_s404)
        if overs is not None:
            upd_over = overs.select(
                "url_norm", "host", "priority",
                F.lit(0).cast("int").alias("dt_cycle"),
                F.lit(0).cast("long").alias("dt_seq"),
                F.lit("oversize").alias("status"),  # terminal
                F.lit(0).cast("int").alias("cycle_added"),
                F.col("retries").cast("int"),
                F.col("last_cycle").cast("int"),
                F.col("interval").cast("int"),
                F.lit(0).cast("int").alias("not_before"),
                _dep0,
            ).withColumn("bucket", bucket)
            merge_src = merge_src.unionByName(upd_over)

        new_seen = new_rows.select(
            "url_norm",
            urlops.url_hash(F.col("url_norm")).alias("url_hash"),
            F.lit(cycle).cast("int").alias("cycle_added"),
        ).withColumn("bucket", urlops.url_bucket(F.col("url_hash"), self.n_buckets))

        # Materialize the SHARED caches single-threaded first (fetch,
        # links, cand — every downstream chain reads them; racing
        # threads could otherwise compute a cached partition twice,
        # fatal for the wall-clock-delayed fetch), then run the three
        # independent materialization chains concurrently: new-link
        # count, image-store count, and the trace two-phase numbering.
        from concurrent.futures import ThreadPoolExecutor

        if use_phash_bloom and self._phash_bloom is not None:
            _mark("phash_bloom_build")
        # All per-cycle observability counters come from ONE agg over
        # the cached attempts frame (sums of the same boolean gate
        # predicates the downstream filters use) — at 10^4 cycles the
        # old one-job-per-counter shape was 10^5 scheduler round-trips
        # of pure latency. Only the canonical / content-dedup verdicts
        # aren't attempts-level predicates (python href resolve; digest
        # election join), so when either flag is on ONE more agg runs
        # over its cached frame (fd, falling back to fc) to produce the
        # final fetched + content_dup counts. This first action also
        # plays the counts' old role of materializing the shared fetch
        # caches single-threaded.
        _base = (
            F.col("ok")
            & F.col("redirect").isNull()
            & ~F.col("not_modified")
            & ~F.col("rate_limited")
        )
        _p = _base
        _aggs = []
        if self.recrawl_every:
            _aggs.append(
                F.sum((F.col("ok") & F.col("not_modified")).cast("long")).alias(
                    "not_modified"
                )
            )
        if cfg.rate_limit_pct:
            _aggs.append(
                F.sum(F.col("rate_limited").cast("long")).alias("rate_limited")
            )
        if overs is not None:
            _big = F.octet_length(F.col("html")) > self.max_body_bytes
            _aggs.append(F.sum((_p & _big).cast("long")).alias("oversized"))
            _p = _p & ~_big
        if bins is not None:
            _p = _p & (F.col("content_type") == "text/html")
        if soft404s is not None:
            _s4 = fetchparse.soft404_col("html")
            _aggs.append(F.sum((_p & _s4).cast("long")).alias("soft404"))
            _p = _p & ~_s4
        # meta-robots verdicts are attempts-level predicates too (one
        # regexp over html) — exact via _p when no later gate exists;
        # when canonical / content-dedup runs they fold into that
        # gate's second agg instead (same job, post-gate exactness).
        _mr_ni = _mr_nf = None
        if self.meta_robots:
            _mr_ni, _mr_nf = fetchparse.meta_robots_cols("html")
            if cdup_cache is None and canon_cache is None:
                _aggs.append(
                    F.sum((_p & _mr_ni).cast("long")).alias("noindexed")
                )
                _aggs.append(
                    F.sum((_p & _mr_nf).cast("long")).alias("nofollowed")
                )
        _aggs.append(F.sum(_p.cast("long")).alias("prefetched"))
        _row = attempts.agg(*_aggs).first().asDict()
        counts = {"cycle": cycle, "fetched": int(_row.pop("prefetched") or 0)}
        if cdup_cache is not None:
            _is_cdup = F.col("is_cdup")
            _aggs2 = [
                F.sum((~_is_cdup).cast("long")).alias("fetched"),
                F.sum(_is_cdup.cast("long")).alias("content_dup"),
            ]
            if _mr_ni is not None:
                _aggs2.append(
                    F.sum((~_is_cdup & _mr_ni).cast("long")).alias("noindexed")
                )
                _aggs2.append(
                    F.sum((~_is_cdup & _mr_nf).cast("long")).alias("nofollowed")
                )
            _r2 = cdup_cache.agg(*_aggs2).first()
            counts["fetched"] = int(_r2["fetched"] or 0)
            counts["content_dup"] = int(_r2["content_dup"] or 0)
            if _mr_ni is not None:
                counts["noindexed"] = int(_r2["noindexed"] or 0)
                counts["nofollowed"] = int(_r2["nofollowed"] or 0)
        elif canon_cache is not None:
            _is_canon = F.col("canonical").isNotNull() & (
                F.col("canonical") != F.col("url_norm")
            )
            _aggs2 = [F.sum((~_is_canon).cast("long")).alias("fetched")]
            if _mr_ni is not None:
                _aggs2.append(
                    F.sum((~_is_canon & _mr_ni).cast("long")).alias("noindexed")
                )
                _aggs2.append(
                    F.sum((~_is_canon & _mr_nf).cast("long")).alias("nofollowed")
                )
            _r2 = canon_cache.agg(*_aggs2).first()
            counts["fetched"] = int(_r2["fetched"] or 0)
            if _mr_ni is not None:
                counts["noindexed"] = int(_r2["noindexed"] or 0)
                counts["nofollowed"] = int(_r2["nofollowed"] or 0)
        counts.update({k: int(v or 0) for k, v in _row.items()})
        if blocked_n is not None:
            counts["blocked_images"] = blocked_n
        # observability: which skew plan this cycle actually ran
        counts["skew_safe"] = bool(skew_safe)
        if fetch_parts:
            counts["fetch_partitions"] = int(fetch_parts)
        _mark("fetch")
        links.count()
        cand.count()
        _mark("links_cand")

        def build_trace():
            if events is None:
                return 0
            nonlocal trace_df, trace_cache
            numbered, n, trace_cache = sequencing.global_sequence(
                events,
                keys=["phase", "sched_time", "host", "url_norm"],
                num_partitions=self.n_buckets,
                offset=self.trace_seq,
            )
            trace_df = numbered.select(
                "seq",
                F.lit(cycle).cast("int").alias("cycle"),
                "url_norm",
                "host",
                "sched_slot",
                "action",
            ).persist(StorageLevel.MEMORY_AND_DISK)
            return n

        with ThreadPoolExecutor(max_workers=3) as ex:
            fut_new = ex.submit(new_rows.count)
            fut_store = ex.submit(store.count)
            fut_trace = ex.submit(build_trace)
            counts["new_links"] = fut_new.result()
            counts["stored_images"] = fut_store.result()
            n_trace = fut_trace.result()
        counts["trace_events"] = n_trace
        self.trace_seq += n_trace
        _mark("chains")

        sinks = [
            lambda: self.images.append(
                store.select(*[f.name for f in schemas.IMAGES.fields])
            ),
            lambda: self.metrics.append(metrics_df),
            lambda: self.frontier.merge_into(
                merge_src, on=["url_norm"],
                update_cols=["status", "retries", "last_cycle", "interval", "not_before"]
            ),
            lambda: self.seen.append(new_seen),
        ]
        if self.content_dedup:
            # winners' digests are unique by construction (row_number 1
            # per digest ∧ not already known)
            new_digests = fetched.select(
                "digest", F.lit(cycle).cast("int").alias("cycle_added")
            ).withColumn(
                "bucket",
                F.pmod(F.xxhash64(F.col("digest")), F.lit(self.n_buckets)).cast(
                    "int"
                ),
            )
            sinks.append(lambda: self.digests.append(new_digests))
        if trace_df is not None:
            sinks.append(lambda: self.trace.append(trace_df))
        if self.dead_host_backoff:
            # detection from the per-host attempt sums already computed
            # for the metrics: every attempt errored (≥ 2 of them) and
            # no response of any kind ⇒ the SERVER is down, defer the
            # host for the next K cycles
            dead_hosts_df = m_fetch.filter(
                (F.col("errors") >= 2)
                & (F.col("fetched") == 0)
                & (F.col("redirects") == 0)
                & (F.col("not_modified") == 0)
                & (F.col("rate_limited") == 0)
            ).select(
                "host",
                F.lit(cycle + self.dead_host_backoff + 1)
                .cast("int")
                .alias("until_cycle"),
            )
            sinks.append(lambda: self.host_backoff.append(dead_hosts_df))
        if self.warc_dir:
            from . import warc as warcmod
            from .functions import textkit

            cyc_dir = os.path.join(self.warc_dir, f"cycle={cycle:05d}")
            # deterministic logical timestamp: one second per cycle from
            # a fixed epoch, rolled through full ISO fields so day-long
            # crawls (cycle ≥ 3600) never emit an invalid :60+: minute
            # (r3 ADVICE fix). datetime arithmetic caps/rolls days too.
            import datetime as _dt

            _d = _dt.datetime(2026, 1, 1) + _dt.timedelta(seconds=cycle)
            warc_date = _d.strftime("%Y-%m-%dT%H:%M:%SZ")
            if self.warc_wet:
                # WET companion: one "conversion" record per fetched
                # page, body = JVM-extracted page text (textkit.wet_text
                # — codegen regexp chain over the already-cached html)
                sinks.append(
                    lambda: warcmod.write_segments(
                        fetched.select(
                            F.col("url_norm").alias("uri"),
                            F.lit(warc_date).alias("warc_date"),
                            F.encode(
                                textkit.wet_text(F.col("html")), "UTF-8"
                            ).alias("payload"),
                        ),
                        os.path.join(cyc_dir, "wet"),
                        n_segments=self.warc_segments,
                        warc_type="conversion",
                        content_type="text/plain",
                    ).collect()
                )
            if bins is not None:
                # non-HTML payloads: archived as WARC `resource`
                # records in their own segment set ({cycle}/binary/) —
                # a real crawl keeps the PDFs/archives it fetched even
                # though it never parses them
                bin_src = bins.select(
                    F.col("url_norm").alias("uri"),
                    F.lit(warc_date).alias("warc_date"),
                    F.encode(F.col("html"), "UTF-8").alias("payload"),
                )
                sinks.append(
                    lambda: warcmod.write_segments(
                        bin_src,
                        os.path.join(cyc_dir, "binary"),
                        n_segments=self.warc_segments,
                        warc_type="resource",
                        content_type="application/octet-stream",
                    ).collect()
                )
            warc_src = store.select(
                F.col("image_id").alias("uri"),
                F.lit(warc_date).alias("warc_date"),
                F.col("bytes").alias("payload"),
                "caption",
                "fmt",
                F.md5(F.col("bytes")).alias("digest"),
            )
            warc_out = warcmod.write_segments(
                warc_src,
                cyc_dir,
                n_segments=self.warc_segments,
                content_type="image/x-synthetic",
                extra=[
                    ("X-Image-Fmt", F.col("fmt")),
                    ("X-Caption", F.col("caption")),
                ],
                record_index=self.warc_cdx,
                carry_cols=("digest",) if self.warc_cdx else (),
            )
            if self.warc_cdx:
                cdx_rows = warc_out.select(
                    F.lit(cycle).cast("int").alias("cycle"),
                    urlops.surt_key(F.col("uri")).alias("surt"),
                    "uri",
                    "digest",
                    "path",
                    F.col("offset").cast("long"),
                    F.col("length").cast("long"),
                )
                sinks.append(lambda: self.cdx.append(cdx_rows))
            else:
                sinks.append(lambda: warc_out.collect())
            if self.warc_revisit and content_dups is not None:
                # WARC `revisit` records (Common Crawl / Heritrix
                # semantics): a fetched page whose payload digest was
                # already captured is archived as a body-less revisit
                # record carrying WARC-Payload-Digest instead of the
                # duplicate bytes — at 100 TB with mirror-heavy webs
                # this is the difference between archiving the corpus
                # once and archiving it per mirror. Separate segment
                # set ({cycle}/revisit/) so the response stream stays
                # contiguous; the digest links back to the original
                # capture via the cdx table.
                rev_src = content_dups.select(
                    F.col("url_norm").alias("uri"),
                    F.lit(warc_date).alias("warc_date"),
                    F.lit(b"").alias("payload"),
                    "digest",
                )
                rev_out = warcmod.write_segments(
                    rev_src,
                    os.path.join(cyc_dir, "revisit"),
                    n_segments=self.warc_segments,
                    warc_type="revisit",
                    content_type="message/http",
                    extra=[
                        ("WARC-Profile", F.lit(warcmod.REVISIT_PROFILE)),
                        (
                            "WARC-Payload-Digest",
                            F.concat(F.lit("md5:"), F.col("digest")),
                        ),
                    ],
                )
                sinks.append(lambda: rev_out.collect())
        if self.wds_dir:
            from . import wds as wdsmod

            wds_cyc = os.path.join(self.wds_dir, f"cycle={cycle:05d}")
            wds_src = store.select(
                "image_id", "bytes", "fmt", "caption", "w", "h"
            ).withColumn(
                "plan_cost",
                wdsmod.sample_cost(F.col("w"), F.col("h"), F.col("caption")),
            )

            if self.wds_grouped:
                from .functions import multimodal as _mm

                wds_src = wds_src.withColumn(
                    "bucket", _mm.aspect_bucket_col("w", "h")
                )

            def _wds_sink():
                if self.wds_grouped:
                    assigned, cache = wdsmod.plan_shards_grouped(
                        wds_src,
                        self.wds_target_bytes,
                        "bucket",
                        num_partitions=self.n_buckets,
                    )
                else:
                    assigned, cache = wdsmod.plan_shards(
                        wds_src,
                        self.wds_target_bytes,
                        num_partitions=self.n_buckets,
                    )
                try:
                    # materializing the manifest IS the write; the rows
                    # then land in the wds_manifest table (the loader's
                    # index + the export's lineage record). Bounded:
                    # one row per shard.
                    rows = wdsmod.write_shards(assigned, wds_cyc).collect()
                finally:
                    cache.unpersist()
                self.wds_manifest.append_rows(
                    [
                        (
                            cycle,
                            r["shard_id"],
                            r["path"],
                            r["n_samples"],
                            r["n_bytes"],
                            r["key_min"],
                            r["key_max"],
                        )
                        for r in rows
                    ]
                )

            sinks.append(_wds_sink)
        if self.rank_every:
            sinks.append(
                lambda: self.edges.append(
                    links.select(
                        F.col("page_url").alias("src_url"),
                        F.col("url_norm").alias("dst_url"),
                    )
                )
            )
        if self.anchor_texts:
            def _anchors_sink():
                ap = fetchparse.extract_anchor_texts(
                    parse_src, url_col="url_norm"
                )
                resolved = ap.select(
                    fetchparse._resolve_one_udf(
                        F.col("page_url"), F.col("href")
                    ).alias("target"),
                    "anchor",
                ).filter(F.col("target").isNotNull())
                terms = resolved.select(
                    "target",
                    F.explode(
                        F.filter(
                            F.split(F.lower(F.col("anchor")), r"\s+"),
                            lambda w: w != "",
                        )
                    ).alias("term"),
                )
                self.anchors.append(
                    terms.groupBy("target", "term")
                    .agg(F.count("*").alias("cnt"))
                    .select(
                        F.lit(cycle).cast("int").alias("cycle"),
                        "target",
                        "term",
                        F.col("cnt").cast("long").alias("cnt"),
                    )
                )

            sinks.append(_anchors_sink)
        with ThreadPoolExecutor(max_workers=len(sinks)) as ex:
            for fut in [ex.submit(s) for s in sinks]:
                fut.result()  # surface the first failure
        _mark("sinks")

        # ---- RANK: dynamic re-prioritization from the link graph
        # (post-merge, so this cycle's discoveries are rankable; the
        # same integer rank the oracle computes → trace-exact)
        if self.rank_every and cycle % self.rank_every == 0:
            self._recompute_priorities()
            _mark("rank")

        # OR the cycle deltas into the engine-resident filters (small
        # jobs over the cached cycle outputs — never a table scan).
        # The cycle's jobs are all complete here (sinks done), so the
        # old broadcasts can be destroyed before re-broadcasting.
        import numpy as np

        self._merge_seen_delta(new_seen)
        if self._phash_bloom is not None:
            self._phash_bloom = np.bitwise_or(
                self._phash_bloom,
                seenops.build_bloom(
                    store.select("phash"), self.bloom_bits, col="phash"
                ),
            )
            if self._phash_bloom_bc is not None:
                self._phash_bloom_bc.destroy()
                self._phash_bloom_bc = None
        if self._phash_shards is not None:
            delta = seenops.build_bloom_shards(
                store.select("phash"),
                self.n_buckets,
                self.bloom_shard_bits,
                col="phash",
            )
            merged = storagekit.local_checkpoint(
                seenops.or_merge_shards(self._phash_shards, delta)
            )
            storagekit.release(self._phash_shards)
            self._phash_shards = merged

        for df in (attempts, fetched_raw, links, cand, decoded, store,
                   new_rows, parts["denied"]):
            df.unpersist()
        if cdup_cache is not None:
            cdup_cache.unpersist()
        if canon_cache is not None:
            canon_cache.unpersist()
        if phash_split_cache is not None:
            phash_split_cache.unpersist()
        if split_cache is not None:
            split_cache.unpersist()
        if trace_df is not None:
            trace_df.unpersist()
            trace_cache.unpersist()
        _mark("bloom_deltas")
        if self.evict_every and (cycle + 1) % self.evict_every == 0:
            # BEFORE _save_state so the cycle's snapshot tags capture a
            # consistent (hot, cold) frontier pair — resume lands on
            # the evicted state, never a duplicated hot∪cold
            counts["evicted"] = self.evict_terminal(cycle)
        self.last_cycle = cycle
        self._save_state(cycle)
        if self.fetch_checkpoint:
            # the cycle is committed; its mid-cycle snapshot is spent
            self._drop_fetch_snapshot()
        self._record_lineage(cycle)
        if self.compact_every and (cycle + 1) % self.compact_every == 0:
            # bound the COW small-file growth on the churned tables;
            # results are unaffected (new snapshot, same rows — every
            # consumer orders by explicit keys, never file order)
            self.frontier.compact()
            self.seen.compact()
        _mark("checkpoint")
        if _timing:
            counts["timings"] = _t
        return counts

    # ------------------------------------------------------------ driver

    def crawl(
        self,
        seeds: list[str],
        cycles: int,
        start_cycle: int = 0,
        sitemap_seeds: bool | str = False,
    ) -> list[dict]:
        if start_cycle == 0:
            self.seed(seeds, sitemap_seeds=sitemap_seeds)
        out = []
        for c in range(start_cycle + 1, cycles + 1):
            out.append(self.run_cycle(c))
        return out
