"""Fetch + parse stages (SURVEY.md §2.7 u_fetch / u_extract_links /
u_extract_images, §3.1 steps 2-4).

The fetch stage is ``groupBy(salt_key).applyInPandas`` — each Python
worker owns disjoint host buckets (BASELINE.json north_star), fetches
that host's URLs in sched_time order, and (optionally, for a real
network) sleeps out the crawl-delay between requests. With the
synthetic web the fetch is a pure function of the URL, so wall-clock
enforcement is off by default and politeness is the *logical* schedule
(sched_time) that also defines the reproducible crawl order.

Hot-host skew: the salt key fans one hot host out to several groups
(urlops.host_salt). This is safe because sched_time was computed
per-host BEFORE salting (SURVEY.md §7.4 item 3) — salting parallelizes
execution, not the schedule.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import parsekit, schemas, synthweb
from . import urlops


def default_fetcher(cfg: synthweb.WebConfig, content_ver: int):
    """The synthetic-web fetcher: a pure function of the URL (the test
    oracle's twin). Returns the seam signature below."""

    def do_fetch(url: str, retries: int):
        from .. import urlkit

        ok = synthweb.fetch_ok(cfg, url, retries)
        if not ok:
            return False, None, ""
        tgt = synthweb.redirect_of(cfg, url)
        if tgt is not None:
            return True, urlkit.normalize_url(tgt), ""
        return True, None, synthweb.fetch(cfg, url, content_ver)

    return do_fetch


def fetch(
    batch: DataFrame,
    cfg: synthweb.WebConfig,
    hot_hosts: list[str] | None = None,
    salt_fanout: int = 8,
    enforce_delay_wallclock: bool = False,
    delay_scale: float = 1.0,
    fetch_partitions: int | None = None,
    content_ver: int = 0,
    fetcher=None,
    cycle: int = 0,
    group_col: str | None = None,
    etag_revalidate: bool = False,
    etag_prev_body=None,
) -> DataFrame:
    """batch: generate()['fetch'] → FETCHED DF (html attached).

    Shuffle boundary: one repartition by salt key; each group is one
    host (or one hot-host sub-bucket).

    fetch_partitions: explicit parallelism for the fetch stage only.
    The fetch is delay/IO-bound: a task's wall time is its groups'
    summed politeness spans, so placement is everything. Hash
    repartition stacks whole colliding groups into one task (birthday
    collisions: with G groups in N partitions a meaningful fraction
    share a task, and their sleeps serialize). Instead the batch is
    RANGE-partitioned by (group_span DESC, salt_key): every partition
    holds ⌈G/N⌉ whole groups (count-balanced by construction), and the
    longest-span groups land in the lowest partition ids — Spark
    launches tasks in partition order, so this is LPT scheduling: the
    straggler tail is one short group, not a long one scheduled last.
    The span column joins the groupBy key (constant within a group, so
    grouping is unchanged) to make the range partitioning satisfy the
    groupBy's clustering requirement — no second exchange (the window
    computing spans is one tiny extra shuffle of the schedule batch,
    paid in milliseconds to save a max-span straggler per cycle).
    Never coalesced by AQE; other shuffles stay at
    spark.sql.shuffle.partitions.

    fetcher: the transport seam — a picklable callable
    ``(url, retries) -> (ok, redirect_or_None, html)`` executed inside
    the Arrow worker. Defaults to the deterministic synthetic-web pure
    function; production swaps in a real HTTP client, and
    tests/test_http_fetch.py drives this exact seam over loopback
    stdlib http.server sockets (proving the applyInPandas stage,
    wall-clock politeness, and grouping survive a real transport).
    A returned redirect target must already be normalized.
    """
    from pyspark.sql.window import Window

    if fetcher is None:
        fetcher = default_fetcher(cfg, content_ver)

    # etag_revalidate: strong-validator conditional GET. The epoch
    # precheck (the Last-Modified model, decided JVM-side upstream)
    # already 304s same-epoch revisits; this seam catches the rest —
    # pages whose epoch moved but whose ENTITY BYTES did not
    # (synthweb.etag_stable_pct slice). etag_prev_body is the validator
    # source: ``(url, prev_ver) -> body`` whose bytes md5-equal the
    # validator stored at the last 200 (a deployment reads the stored
    # ETag from the frontier and lets the server compare via
    # If-None-Match; the synthetic server is a pure function, so the
    # worker reconstructs and compares locally — same observable).
    if etag_revalidate and etag_prev_body is None:
        def etag_prev_body(url, prev_ver, _cfg=cfg):
            return synthweb.fetch(_cfg, url, prev_ver)
    etag_check = etag_prev_body if etag_revalidate else None
    # A transport that accepts a third positional arg gets the stored
    # validator IN THE REQUEST (true If-None-Match: the server compares
    # and answers 304, signalled by a 4th tuple element) — the loopback
    # http.server test drives this. A 2-arg transport keeps the
    # worker-side compare above.
    fetcher_takes_etag = False
    if etag_check is not None:
        import inspect

        try:
            fetcher_takes_etag = (
                len(inspect.signature(fetcher).parameters) >= 3
            )
        except (TypeError, ValueError):
            fetcher_takes_etag = False

    # group_col: the politeness unit owning one worker's schedule.
    # Default is the host; IP-level politeness passes "ip" (from
    # politeness.generate ip_pool) so every vhost of one server lands
    # in one group and the wall-clock sleeps enforce the SERVER's
    # cumulative schedule. hot_hosts then holds hot group keys (IPs).
    unit = F.col(group_col) if group_col else F.col("host")
    salted = batch.withColumn(
        "salt_key",
        urlops.host_salt(unit, F.col("url_norm"), hot_hosts or [], salt_fanout),
    )
    group_keys = ["salt_key"]
    if fetch_partitions:
        span = F.max("sched_time").over(Window.partitionBy("salt_key"))
        salted = salted.withColumn("_span", span).repartitionByRange(
            fetch_partitions, F.col("_span").desc(), F.col("salt_key")
        )
        group_keys = ["salt_key", "_span"]

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # (sched_time, host, url) — the oracle's fetch-event order.
        # host is a no-op tie-break under host politeness (one host per
        # group); under IP politeness it pins the order of same-instant
        # rows from different vhosts (possible only with 0-ms delays).
        pdf = pdf.sort_values(
            ["sched_time", "host", "url_norm"], kind="mergesort"
        )
        unch_in = (
            pdf["unchanged"]
            if "unchanged" in pdf
            else pd.Series(False, index=pdf.index)
        )
        lc_in = (
            pdf["last_cycle"]
            if "last_cycle" in pdf
            else pd.Series(-1, index=pdf.index)
        )
        iv_in = (
            pdf["interval"]
            if "interval" in pdf
            else pd.Series(0, index=pdf.index)
        )
        st_in = (
            pdf["status"]
            if "status" in pdf
            else pd.Series("pending", index=pdf.index)
        )
        # HTTP 429 model: one rate_limit_of lookup per distinct host in
        # the group (one host per group under host politeness; several
        # vhosts when the group is a server IP). The verdict itself is
        # per-(host, slot) — slot >= the host's cap — so it is
        # identical across any grouping/salting of the host's URLs.
        rl_by_host = {
            h: synthweb.rate_limit_of(cfg, str(h))
            for h in pdf["host"].unique()
        }
        htmls, oks, redirs, nms, rls, nbs = [], [], [], [], [], []
        last = None
        for url, st, rt, unch, slot, rl, lc, stat in zip(
            pdf["url_norm"], pdf["sched_time"], pdf["retries"], unch_in,
            pdf["sched_slot"], pdf["host"].map(rl_by_host),
            lc_in, st_in,
        ):
            if enforce_delay_wallclock and last is not None:
                # delay_scale compresses the politeness clock for
                # benchmarks (the real crawl is delay/IO-bound; this
                # models it at a tunable time scale without changing
                # the logical schedule or the trace)
                delta_ms = (st - last) * delay_scale
                if delta_ms > 0:
                    time.sleep(delta_ms / 1000.0)
            last = st
            if rl is not None and int(slot) >= rl[0]:
                # HTTP 429: the host's per-cycle cap refuses this slot
                # BEFORE it could answer 304 or fail. Slot consumed
                # (the request was made), no body; the URL defers to
                # cycle + Retry-After. Mirrors oracle.crawl exactly.
                oks.append(True)
                redirs.append(None)
                htmls.append("")
                nms.append(False)
                rls.append(True)
                nbs.append(cycle + rl[1])
                continue
            rls.append(False)
            nbs.append(0)
            if bool(unch):
                # conditional GET answered 304: slot consumed, no body
                oks.append(True)
                redirs.append(None)
                htmls.append("")
                nms.append(True)
                continue
            # transport seam: synthetic pure function by default, real
            # sockets in production / the loopback test
            revisit = (
                etag_check is not None
                and str(stat) == "fetched"
                and int(lc) >= 0
            )
            prev_ver = (
                (int(lc) // cfg.change_every if cfg.change_every else 0)
                if revisit
                else 0
            )
            if revisit and fetcher_takes_etag:
                # true If-None-Match: the stored validator rides the
                # request header; the SERVER compares and answers 304
                # (4th tuple element) with no entity transferred.
                import hashlib

                presented = hashlib.md5(
                    etag_check(url, prev_ver).encode("utf-8")
                ).hexdigest()
                res = fetcher(url, int(rt), presented)
            else:
                res = fetcher(url, int(rt))
            ok, tgt, html = res[0], res[1], res[2]
            nm = len(res) > 3 and bool(res[3])
            oks.append(bool(ok))
            # 301: slot consumed, no body; normalized Location target
            # rides along for the discovered-link path
            redirs.append(tgt)
            body = html if ok and tgt is None and not nm else ""
            if (
                revisit
                and not fetcher_takes_etag
                and ok
                and tgt is None
            ):
                # 2-arg transport: the entity's strong validator equals
                # the one stored at the last 200 → 304, body withheld.
                # Runs BEFORE every body gate (a 304 has no body), and
                # only after the fail/redirect branches (a server
                # revalidates only what it would have served).
                if etag_check(url, prev_ver) == body:
                    nm = True
                    body = ""
            htmls.append(body)
            nms.append(nm)
        out = pdf[["url_norm", "host", "priority", "sched_slot", "sched_time", "retries"]].copy()
        out["html"] = htmls
        out["ok"] = pd.Series(oks, index=out.index, dtype=bool)
        out["redirect"] = pd.Series(redirs, index=out.index, dtype=object)
        out["not_modified"] = pd.Series(nms, index=out.index, dtype=bool)
        out["last_cycle"] = lc_in.loc[out.index].astype("int32")
        out["interval"] = iv_in.loc[out.index].astype("int32")
        out["status"] = st_in.loc[out.index].astype(str)
        out["rate_limited"] = pd.Series(rls, index=out.index, dtype=bool)
        out["not_before"] = pd.Series(nbs, index=out.index, dtype="int32")
        out["depth"] = (
            pdf["depth"].loc[out.index].astype("int32")
            if "depth" in pdf.columns
            else pd.Series(0, index=out.index, dtype="int32")
        )
        # Content-Type header (pure function of the URL, mirror-aware;
        # constant "text/html" when binary_pct is off). Bodyless rows
        # (429 / 304 / 301 / errors) carry it too but no consumer
        # reads it there — the engine gates only the parsed subset.
        out["content_type"] = (
            out["url_norm"]
            .map(lambda u: synthweb.content_type_of(cfg, u))
            .astype(str)
        )
        # Cache-Control max-age header: present on every SERVED
        # response (200 and 304 — RFC 9111: a 304 refreshes the stored
        # response's lifetime), absent on errors / redirects / 429s.
        out["max_age"] = pd.array(
            [
                synthweb.max_age_of(cfg, u)
                if (o and r is None and not rl)
                else None
                for u, o, r, rl in zip(out["url_norm"], oks, redirs, rls)
            ],
            dtype="Int32",
        )
        return out

    return salted.groupBy(*group_keys).applyInPandas(
        fetch_group, schema=schemas.FETCHED
    )


# ---------------------------------------------------------------- parse
#
# The regex scans run JVM-SIDE (regexp_extract_all inside whole-stage
# codegen over the html column); Python sees only the already-extracted
# href/src/caption strings, in ONE vectorized pandas_udf per stage that
# does what no JVM builtin can: RFC-3986 relative-URL resolution +
# normalization (urlkit) with order-preserving within-page dedup.
# Patterns mirror ccbot_spark.parsekit (the oracle crawler's parser)
# exactly; trace-equality tests enforce byte-identical extraction.

# <a ...> opening tags (parsekit._A_TAG_RE, Java-regex inline flags);
# rel="nofollow" anchors are filtered tag-level before href extraction
_A_TAG_PAT = r'(?is)<a\s[^>]*?href="[^"]*"[^>]*?>'
_NOFOLLOW_PAT = '(?i)rel="nofollow"'
_HREF_PAT = r'(?is)href="([^"]*)"'
# Image blocks in DOCUMENT ORDER via one alternation: a <figure> block
# (figcaption overrides alt) or a standalone <img alt>. The figure
# alternative consumes its inner <img>, which reproduces parsekit's
# span-exclusion rule (standalone imgs inside matched figures are
# skipped) without position bookkeeping.
_BLOCK_PAT = (
    r'(?is)(<figure>\s*<img\s[^>]*?src="[^"]*"[^>]*>\s*'
    r"<figcaption>.*?</figcaption>\s*</figure>"
    r'|<img\s[^>]*?src="[^"]*"[^>]*?alt="[^"]*")'
)
_FIG_SRC = r'(?is)<figure>\s*<img\s[^>]*?src="([^"]*)"'
_FIG_CAP = r"(?is)<figcaption>(.*?)</figcaption>"
_IMG_SRC = r'(?i)<img\s[^>]*?src="([^"]*)"'
_IMG_ALT = r'(?i)<img\s[^>]*?src="[^"]*"[^>]*?alt="([^"]*)"'


@F.pandas_udf(T.ArrayType(T.StringType()))
def _resolve_links_udf(page_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """href lists (JVM-extracted) → resolved+normalized outlinks,
    document order, within-page dedup (parsekit.extract_links
    semantics, minus the regex — that already ran JVM-side)."""
    from .. import urlkit

    out = []
    for pu, hs in zip(page_urls, hrefs):
        seen: set[str] = set()
        acc: list[str] = []
        for href in hs if hs is not None else []:
            u = urlkit.resolve_link(pu, href)
            if u is not None and u not in seen:
                seen.add(u)
                acc.append(u)
        out.append(acc)
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.ArrayType(T.StringType())))
def _resolve_imgs_udf(page_urls: pd.Series, pairs: pd.Series) -> pd.Series:
    """[src, rawcap] lists (JVM-extracted, document order) → resolved
    [img_url, stripped caption] pairs with within-page dedup by url
    (parsekit.extract_images semantics)."""
    from .. import urlkit

    out = []
    for pu, ps in zip(page_urls, pairs):
        seen: set[str] = set()
        acc: list[list[str]] = []
        for p in ps if ps is not None else []:
            u = urlkit.resolve_link(pu, p[0])
            if u is not None and u not in seen:
                seen.add(u)
                acc.append([u, (p[1] or "").strip()])
        out.append(acc)
    return pd.Series(out)


# rel=canonical declaration (parsekit._CANON_RE, Java-regex inline
# flags) — first declaration wins, like the python twin's .search()
_CANON_PAT = r'(?is)<link\s[^>]*?rel="canonical"[^>]*?href="([^"]*)"'


@F.pandas_udf(T.StringType())
def _resolve_one_udf(page_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Single JVM-extracted href per page → resolved+normalized URL (or
    None). Python sees one short string per page, never the html."""
    from .. import urlkit

    return pd.Series(
        [
            urlkit.resolve_link(pu, h) if h else None
            for pu, h in zip(page_urls, hrefs)
        ],
        dtype=object,
    )


def with_canonical(fetched: DataFrame) -> DataFrame:
    """`fetched` + a `canonical` column: the page's resolved+normalized
    rel=canonical target, NULL when the page declares none. The html
    scan is one JVM regexp_extract inside whole-stage codegen
    (parsekit.extract_canonical semantics); the Arrow UDF resolves only
    the already-extracted href."""
    href = F.regexp_extract(F.col("html"), _CANON_PAT, 1)
    href = F.when(href == "", F.lit(None).cast("string")).otherwise(href)
    return fetched.withColumn(
        "canonical", _resolve_one_udf(F.col("url_norm"), href)
    )


def soft404_col(html_col="html"):
    """JVM soft-404 verdict over the body — lower + one rlike inside
    whole-stage codegen, zero Python. The pattern is parsekit's
    SOFT404_PATTERN verbatim (backreference-free, so Java regex and
    python `re` agree byte-for-byte; three-way equality is pytest-
    gated like wet_text's pattern set)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.lower(c).rlike(parsekit.SOFT404_PATTERN)


def meta_robots_cols(html_col="html"):
    """JVM (noindex, nofollow) verdicts from the page-level
    ``<meta name="robots">`` directive — lower + one regexp_extract
    inside whole-stage codegen, zero Python. The pattern is parsekit's
    META_ROBOTS_PATTERN verbatim (backreference-free; leftmost match on
    both engines), so the python twin used by the oracle crawler agrees
    byte-for-byte (equality pytest-gated in tests/test_meta_robots.py)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    content = F.regexp_extract(
        F.lower(c), parsekit.META_ROBOTS_PATTERN, 1
    )
    return content.contains("noindex"), content.contains("nofollow")


def extract_links(fetched: DataFrame) -> DataFrame:
    """One row per extracted (already normalized) outlink occurrence.
    href scan = JVM regexp_extract_all over anchor tags, nofollow
    filter + href pick = JVM array lambdas; Python = URL resolution
    only."""
    tags = F.regexp_extract_all(F.col("html"), F.lit(_A_TAG_PAT), F.lit(0))
    hrefs = F.transform(
        F.filter(tags, lambda t: ~t.rlike(_NOFOLLOW_PAT)),
        lambda t: F.regexp_extract(t, _HREF_PAT, 1),
    )
    parent_depth = (
        F.col("depth") if "depth" in fetched.columns else F.lit(0)
    ).cast("int").alias("parent_depth")
    per_page = fetched.select(
        F.col("url_norm").alias("page_url"),
        F.col("host").alias("page_host"),
        F.col("priority").cast("long").alias("parent_priority"),
        parent_depth,
        _resolve_links_udf(F.col("url_norm"), hrefs).alias("_links"),
    )
    # explode_outer, NOT explode: for plain explode Catalyst inserts a
    # size(arr)>0 pre-filter that re-evaluates the resolve UDF a second
    # time per page (plan-tested). The UDF emits no null elements, so
    # dropping the outer-placeholder null rows afterwards is exact.
    return per_page.select(
        F.explode_outer("_links").alias("url_norm"),
        "page_url",
        "page_host",
        "parent_priority",
        "parent_depth",
    ).filter(F.col("url_norm").isNotNull())


# shared verbatim with the python twin parsekit.extract_anchor_pairs
_A_ELEM_PAT = parsekit.ANCHOR_ELEM_PATTERN


def extract_anchor_texts(
    pages: DataFrame,
    url_col: str = "page_url",
    html_col: str = "html",
    keep_cols: tuple = (),
) -> DataFrame:
    """One row per followed (raw href, anchor text) occurrence — the
    search-index staple: the words OTHER pages use to link to a target
    are a description/ranking signal the target's own body can't
    forge, so crawlers aggregate them per target at parse time.
    Whole-element scan + nofollow filter + href/text picks are all JVM
    regexps and array lambdas inside one codegen stage, zero Python
    (hrefs are returned RAW — resolution stays in extract_links'
    seam). Inner text is the no-markup case (`[^<]*`) — an anchor
    wrapping nested tags yields no row rather than a wrong one."""
    elems = F.regexp_extract_all(
        F.col(html_col), F.lit(_A_ELEM_PAT), F.lit(0)
    )
    kept = F.filter(elems, lambda t: ~t.rlike(_NOFOLLOW_PAT))
    pairs = F.transform(
        kept,
        lambda t: F.struct(
            F.regexp_extract(t, _HREF_PAT, 1).alias("href"),
            F.trim(
                F.regexp_extract(t, r"(?is)>([^<]*)</a>", 1)
            ).alias("anchor"),
        ),
    )
    keep = [F.col(c) for c in keep_cols]  # pass-through (e.g. a
    # streaming event-time column the watermark needs downstream)
    return (
        pages.select(
            F.col(url_col).alias("page_url"),
            *keep,
            F.explode_outer(pairs).alias("_a"),
        )
        .filter(F.col("_a").isNotNull() & (F.col("_a.href") != ""))
        .select(
            "page_url",
            *keep_cols,
            F.col("_a.href").alias("href"),
            F.col("_a.anchor").alias("anchor"),
        )
    )


def anchor_term_counts(pairs: DataFrame) -> DataFrame:
    """(target, term, cnt) from (href, anchor) pairs: lowercase,
    whitespace-split, one hash-shuffle on (target, term) with map-side
    combine — at 10^10 links the shuffle moves (url, word, partial
    count) triples, never pages. Empty anchors contribute nothing."""
    terms = F.explode(
        F.filter(
            F.split(F.lower(F.col("anchor")), r"\s+"),
            lambda w: w != "",
        )
    )
    return (
        pairs.select(F.col("href").alias("target"), terms.alias("term"))
        .groupBy("target", "term")
        .agg(F.count("*").alias("cnt"))
    )


def og_image_cols(html_col="html"):
    """(og_image, og_caption) from OpenGraph meta tags — the modern
    image+caption discovery channel next to <img alt>/<figcaption>:
    every social-shareable page declares its representative image as
    `og:image` and its caption text as `og:title`/`og:description`
    (title preferred). Three JVM regexp_extracts on the lowercase-
    insensitive attribute forms; empty → NULL."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col

    def meta(prop):
        return F.regexp_extract(
            c,
            r'(?is)<meta\s[^>]*?property="og:' + prop
            + r'"[^>]*?content="([^"]*)"',
            1,
        )

    img = meta("image")
    title = meta("title")
    desc = meta("description")
    cap = F.when(title != "", title).when(desc != "", desc)
    return (
        F.when(img != "", img).alias("og_image"),
        cap.alias("og_caption"),
    )


def srcset_best_col(srcset_col):
    """Highest-density candidate of an ``srcset`` attribute value —
    the variant a training crawl should fetch ("a.jpg 1x, b.jpg 2x" →
    b.jpg; width descriptors compare numerically too). Pure JVM array
    ops: split on commas, parse each candidate's descriptor into an
    integer sort key (w-descriptors count units, x-descriptors count
    per-mille so 1.5x orders between 1x and 2x; a bare candidate is
    1x), take the max by (key, url) — deterministic on ties."""
    c = F.col(srcset_col) if isinstance(srcset_col, str) else srcset_col
    cands = F.filter(
        F.transform(F.split(c, r","), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    url_of = lambda s: F.regexp_extract(s, r"^(\S+)", 1)  # noqa: E731
    wd = lambda s: F.regexp_extract(s, r"\s([0-9]+)w\s*$", 1)  # noqa: E731
    xd = lambda s: F.regexp_extract(  # noqa: E731
        s, r"\s([0-9]+(?:\.[0-9]+)?)x\s*$", 1
    )
    key = lambda s: (  # noqa: E731
        F.when(wd(s) != "", wd(s).cast("long") * 1000)
        .when(
            xd(s) != "",
            (xd(s).cast("double") * 1000).cast("long"),
        )
        .otherwise(F.lit(1000))
    )
    structs = F.transform(
        cands, lambda s: F.struct(key(s).alias("k"), url_of(s).alias("u"))
    )
    best = F.array_max(structs)
    return F.when(F.size(cands) > 0, best["u"]).alias("srcset_best")


def extract_images(fetched: DataFrame) -> DataFrame:
    """One row per (img_url, caption) pair with page-order keys for the
    deterministic phash-dedup tie-break (SURVEY.md §7.5). Block scan =
    JVM regexp_extract_all alternation; figcaption-over-alt selection =
    JVM per-element regexp_extract; Python = URL resolution + strip."""
    blocks = F.regexp_extract_all(F.col("html"), F.lit(_BLOCK_PAT), F.lit(1))
    is_fig = lambda x: F.lower(F.substring(x, 1, 7)) == "<figure"  # noqa: E731
    pairs = F.transform(
        blocks,
        lambda x: F.array(
            F.when(is_fig(x), F.regexp_extract(x, _FIG_SRC, 1)).otherwise(
                F.regexp_extract(x, _IMG_SRC, 1)
            ),
            F.when(is_fig(x), F.regexp_extract(x, _FIG_CAP, 1)).otherwise(
                F.regexp_extract(x, _IMG_ALT, 1)
            ),
        ),
    )
    # OpenGraph channel appended LAST (lowest precedence: the resolve
    # UDF dedups by url with first-wins, so a body reference keeps its
    # figure/alt caption) — mirrors parsekit.extract_images exactly
    ogi, ogc = og_image_cols("html")
    pairs = F.when(
        ogi.isNotNull(),
        F.concat(pairs, F.array(F.array(ogi, F.coalesce(ogc, F.lit(""))))),
    ).otherwise(pairs)
    per_page = fetched.select(
        F.col("host").alias("page_host"),
        F.col("url_norm").alias("page_url"),
        F.col("sched_time").cast("long").alias("sched_time"),
        _resolve_imgs_udf(F.col("url_norm"), pairs).alias("_imgs"),
    )
    # posexplode_outer + null-drop for the same single-UDF-eval reason
    # as extract_links
    return per_page.select(
        "page_host",
        "page_url",
        "sched_time",
        F.posexplode_outer("_imgs").alias("img_idx", "_pair"),
    ).filter(F.col("_pair").isNotNull()).select(
        F.col("_pair").getItem(0).alias("img_url"),
        F.col("_pair").getItem(1).alias("caption"),
        "page_host",
        "page_url",
        "sched_time",
        F.col("img_idx").cast("int").alias("img_idx"),
    )


#: <link rel="alternate" ...> tags — the hreflang declaration carrier.
_ALT_LINK_PAT = r'<link\b[^>]*rel="alternate"[^>]*>'


def extract_hreflang(
    pages: DataFrame, html_col: str = "html", url_col: str = "page_url"
) -> DataFrame:
    """One row per `<link rel="alternate" hreflang=...>` declaration:
    (page_url, hreflang, alt_url). Language-variant clusters are the
    crawl's third dedup axis after content digests and canonical tags
    — the en/de/fr editions of a page are distinct bytes but one
    logical document, and a training corpus usually wants them grouped
    (feed the edges to dedup.connected_components) rather than
    counted as independent pages. The whole scan is JVM regexp — tag
    harvest via regexp_extract_all, attribute picks via
    regexp_extract — no Python stage; tags missing either attribute
    are dropped (a declaration the parser can't prove is not an
    edge)."""
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(_ALT_LINK_PAT), F.lit(0)
    )
    per = pages.select(
        F.col(url_col).alias("page_url"), F.explode_outer(tags).alias("_tag")
    )
    lang = F.regexp_extract(F.col("_tag"), r'hreflang="([A-Za-z-]+)"', 1)
    href = F.regexp_extract(F.col("_tag"), r'href="([^"]+)"', 1)
    return per.select(
        "page_url", lang.alias("hreflang"), href.alias("alt_url")
    ).filter((F.col("hreflang") != "") & (F.col("alt_url") != ""))


def anchor_postings(pairs: DataFrame, k: int = 8) -> DataFrame:
    """Inverted posting lists over anchor terms — the search-index
    artifact one step past anchor_term_counts: per TERM, its document
    frequency and the top-`k` targets by anchor-count (ties broken by
    target asc), serialized as 'target:cnt' joined with '|'. Hot terms
    ('click', 'here') are the skewed keys, so the per-term top-k is
    the salted two-phase form (phase 1 ranks inside (term, salt)
    buckets — a 10^8-posting term costs k·16 survivors per map side —
    phase 2 ranks the survivors; top-k decomposes, so the result
    equals the single window exactly, which is the form the oracle
    states). df comes from the same counts via hash-agg, never a
    count window. Serializing the list keeps the driver compare
    engine-neutral (array columns hash differently across engines)."""
    counts = anchor_term_counts(pairs)
    salt = F.pmod(F.xxhash64(F.col("target")), F.lit(16))
    w1 = Window.partitionBy("term", "_salt").orderBy(
        F.col("cnt").desc(), F.col("target")
    )
    cand = (
        counts.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy("term").orderBy(F.col("cnt").desc(), F.col("target"))
    top = (
        cand.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .withColumn("_entry", F.concat_ws(":", "target", "cnt"))
    )
    df_ = counts.groupBy("term").agg(
        F.countDistinct("target").cast("long").alias("df")
    )
    postings = top.groupBy("term").agg(
        F.concat_ws(
            "|", F.array_sort(F.collect_list(F.struct("_r2", "_entry")))
            .getField("_entry")
        ).alias("postings")
    )
    return df_.join(postings, "term").select("term", "df", "postings")
