"""Explicit StructTypes for every table (SURVEY.md §1.3 — never rely on
schema inference; the DuckDB oracle compares schemas).

Central contract schema (BASELINE.json input_hint):
    image_id:string, bytes:binary, w:int32, h:int32,
    fmt:string, caption:string, phash:int64
"""

from __future__ import annotations

from pyspark.sql import types as T

# The authoritative image+caption table (BASELINE.json input_hint).
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# Priority frontier (FIXTURES.md §2.3). discovery_time is a logical
# counter (dt_cycle, dt_seq), never wall clock (SURVEY.md §7.5):
# dt_seq = seed-list index for seeds, 0 for discovered links (ties are
# broken by url_norm — total order without a global row_number).
FRONTIER = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("dt_cycle", T.IntegerType(), False),
        T.StructField("dt_seq", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # pending|fetched|denied|error
        T.StructField("cycle_added", T.IntegerType(), False),
        T.StructField("retries", T.IntegerType(), False),  # failed attempts so far
        # cycle of the last successful fetch (−1 = never fetched) —
        # the revisit-policy clock: recrawl_every re-enqueues fetched
        # pages, content_version(last_cycle) vs the current epoch
        # decides 304 vs re-fetch
        T.StructField("last_cycle", T.IntegerType(), False),
        # per-URL revisit interval in cycles (= recrawl_every at insert;
        # the adaptive policy doubles it on unchanged revisits and
        # halves it on changed ones, bounded by oracle.ADAPT_MIN/MAX)
        T.StructField("interval", T.IntegerType(), False),
        # earliest cycle this URL may be scheduled again (HTTP 429
        # Retry-After deferral; 0 = no deferral). A deferred URL is
        # simply not a GENERATE candidate until cycle >= not_before.
        T.StructField("not_before", T.IntegerType(), False),
        # link-hops from the nearest seed (Heritrix max-hops): seeds
        # and sitemap-seeded URLs are 0; a discovered URL is
        # min(parent depth) + 1 at first insert (never updated — the
        # first-discovery depth, like dt). CrawlEngine(max_depth=K)
        # drops candidates whose depth would exceed K pre-shuffle.
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# Dead-host circuit-breaker deferrals (engine dead_host_backoff=K):
# one row per (host, first-eligible-cycle) appended when every attempt
# on a host errored in one cycle; hosts with an active row are
# invisible to GENERATE — a host-wide not_before.
HOST_BACKOFF = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("until_cycle", T.IntegerType(), False),
    ]
)

# Exact URL-seen set (FIXTURES.md §2.4).
SEEN = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("cycle_added", T.IntegerType(), False),
    ]
)

# Per-host politeness rules (FIXTURES.md §2.5).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("allow", T.ArrayType(T.StringType()), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("budget_per_cycle", T.IntegerType(), False),
    ]
)

# Golden crawl trace (FIXTURES.md §2.7). Event order within a cycle:
# (phase, sched_time_ms, host, url_norm); phase:
# 0=robots_denied, 1=budget_skipped, 2=fetched|fetch_error|redirect, 3=dup.
TRACE = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("sched_slot", T.IntegerType(), False),  # -1 if n/a
        T.StructField("action", T.StringType(), False),
    ]
)

# Per-partition lineage/metrics (FIXTURES.md §2.8).
METRICS = T.StructType(
    [
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("parsed_links", T.LongType(), False),
        T.StructField("stored_images", T.LongType(), False),
        T.StructField("dedup_hits", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("redirects", T.LongType(), False),
        T.StructField("not_modified", T.LongType(), False),  # 304 recrawls
        # requests the host refused with HTTP 429 (slot consumed, URL
        # deferred to cycle + Retry-After)
        T.StructField("rate_limited", T.LongType(), False),
        # pages whose body digest was already seen (content-seen test)
        T.StructField("content_dup", T.LongType(), False),
        # pages that declared rel="canonical" to a DIFFERENT url
        # (canonical_dedup=True): slot consumed, never parsed/stored
        T.StructField("canonicals", T.LongType(), False),
        # HTTP-200 responses whose body is an error template
        # (soft404_detect=True): slot consumed, never parsed/stored
        T.StructField("soft404s", T.LongType(), False),
        # transfers aborted at max_body_bytes (the Heritrix maxLength
        # rule): slot consumed, cap bytes counted, never parsed
        T.StructField("oversized", T.LongType(), False),
        # pages whose <meta name="robots"> declared noindex
        # (meta_robots=True): fetched + parsed, content never stored
        T.StructField("noindexed", T.LongType(), False),
        # pages whose <meta name="robots"> declared nofollow
        # (meta_robots=True): fetched + stored, outlinks never followed
        T.StructField("nofollowed", T.LongType(), False),
    ]
)

# Content-seen digests (Mercator content-seen test, enabled by
# engine(content_dedup=True)): md5 hex of every DISTINCT page body
# stored so far. Bucketed by pmod(xxhash64(digest), P) — the per-cycle
# membership join routes by digest hash exactly like the URL-seen set.
DIGESTS = T.StructType(
    [
        T.StructField("digest", T.StringType(), False),
        T.StructField("cycle_added", T.IntegerType(), False),
    ]
)

# Intermediate: fetch attempt (engine-internal, SURVEY.md §3.1 step 3).
# ok=false → fetch error: slot consumed, html empty, no parse.
# redirect != null → 301: slot consumed, html empty, target (already
# normalized) feeds the discovered-link pool.
FETCHED = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("sched_slot", T.IntegerType(), False),
        T.StructField("sched_time", T.LongType(), False),
        T.StructField("html", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("redirect", T.StringType(), True),
        # 304: recrawled page unchanged since last_cycle's epoch — slot
        # consumed, html empty, no parse
        T.StructField("not_modified", T.BooleanType(), False),
        T.StructField("last_cycle", T.IntegerType(), False),  # pre-fetch value
        T.StructField("interval", T.IntegerType(), False),  # pre-fetch value
        # pre-fetch frontier status (pending|error|fetched): a
        # 429-deferred attempt must restore it unchanged at merge time
        T.StructField("status", T.StringType(), False),
        # 429: the host's per-cycle request cap refused this slot —
        # slot consumed, html empty, no parse, URL deferred
        T.StructField("rate_limited", T.BooleanType(), False),
        # cycle + Retry-After for rate-limited rows, else 0
        T.StructField("not_before", T.IntegerType(), False),
        # frontier depth passthrough (0 when the caller's candidate
        # frame has no depth column — the standalone-operator case)
        T.StructField("depth", T.IntegerType(), False),
        # response Content-Type ("text/html" unless the synthetic web's
        # binary_pct types this page binary): the engine parses only
        # text/html bodies — binary payloads are stored, never parsed
        T.StructField("content_type", T.StringType(), False),
        # Cache-Control max-age declared by the response, in crawl
        # cycles (NULL = none declared / no response served): the
        # server's freshness lifetime, honored by the revisit
        # scheduler when CrawlEngine(honor_max_age=True)
        T.StructField("max_age", T.IntegerType(), True),
    ]
)

# Per-partition snapshot lineage: which (table, version) each cycle
# committed, per partition value — files + rows from manifest metadata
# only (north rule: "resumable from checkpoint with per-partition
# lineage + metrics tables"). Append-only audit log: deliberately NOT
# rolled back on resume.
LINEAGE = T.StructType(
    [
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("part", T.StringType(), False),  # '' = unpartitioned
        T.StructField("n_files", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

# CDX capture index over the WARC archive (engine warc_cdx=True): one
# row per archived record with its seekable (path, offset, length)
# gzip-member span, SURT sort key, and payload digest — retrieval is
# seek+read+gunzip, never a segment scan.
CDX = T.StructType(
    [
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("surt", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
    ]
)

# Accumulated page→outlink graph (engine state when dynamic
# re-prioritization is on; one row per parsed link occurrence from a
# fetched page — PageRank dedups edges itself).
EDGES = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
    ]
)

# Anchor-text aggregation sink (engine state when anchor_texts=True):
# per cycle, how many followed anchors pointed at `target` using
# `term` — the search-index description/ranking signal a target's own
# body can't forge. Occurrence counts, no within-page dedup.
ANCHORS = T.StructType(
    [
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


# WebDataset export manifest (engine state when the wds_dir sink is
# on): one row per written shard per cycle — the loader's index and
# the lineage record for the training export. key_min/key_max are the
# shard's contiguous sample-key range (wds.lookup point reads).
WDS_MANIFEST = T.StructType(
    [
        T.StructField("cycle", T.IntegerType(), False),
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("key_min", T.StringType(), False),
        T.StructField("key_max", T.StringType(), False),
    ]
)
