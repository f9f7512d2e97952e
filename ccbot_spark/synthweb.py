"""Deterministic synthetic web (FIXTURES.md §2.6, SURVEY.md §5.3).

No network in this sandbox, so the "fetch" of URL *u* is a pure
function of *u* (and a small picklable config): ``page(u) =
render(sha256(u))``. Both the single-threaded oracle crawler and the
Spark engine's `applyInPandas` fetch stage call the SAME functions in
this module, so their inputs are byte-identical — the precondition for
exact crawl-order / seen-set / stored-row equality.

Emits:
  * HTML pages with 0–8 ``<a href>`` outlinks (relative, absolute,
    cross-host, tracking-param'd duplicates, malformed) and 0–3
    image+caption pairs (``<img alt>`` and ``<figure><figcaption>``)
  * per-host robots.txt bodies (allow/disallow/wildcards/crawl-delay)
  * procedural images (gradient+sine RGB) encoded as ppm/png/qpng
  * a hot-host skew knob concentrating outlinks on host 0
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np

from . import codecs

_FMTS = ("ppm", "png", "qpng")


@dataclass(frozen=True)
class WebConfig:
    n_hosts: int = 10
    pages_per_host: int = 200
    hot_frac_pct: int = 0  # % of cross-host links redirected to host 0
    fail_pct: int = 0  # % of page fetches that deterministically fail
    redirect_pct: int = 0  # % of odd pages that 301 to the prior page
    trap_pct: int = 0  # % of pages that emit one calendar-loop trap link
    change_every: int = 0  # content epoch length in cycles (0 = static web)
    nofollow_pct: int = 0  # % of links carrying rel="nofollow" (never followed)
    mirror_pct: int = 0  # % of non-h0 pages that mirror their h0 twin's body
    canonical_pct: int = 0  # % of odd pages declaring rel=canonical → even twin
    robots_change_every: int = 0  # robots.txt epoch length in cycles (0 = static)
    rate_limit_pct: int = 0  # % of hosts that answer HTTP 429 past a slot cap
    domain_groups: int = 0  # >0: hosts become subdomains of this many
    # registered domains (h{k}.d{k%g}.test) — the domain-budget fixture
    sitemap_shards: int = 0  # >0: /sitemap.xml is a <sitemapindex> over
    # this many shard urlsets (/sitemap-{i}.xml) — the large-site form
    binary_pct: int = 0  # % of pages serving a non-HTML payload
    # (application/octet-stream): fetched + stored, never parsed
    soft404_pct: int = 0  # % of pages answering HTTP 200 with an
    # error template body (the misconfigured-server "soft 404")
    robots_5xx_pct: int = 0  # % of hosts whose /robots.txt request
    # answers a server error — RFC 9309 §2.3.1.4: complete disallow
    dead_host_pct: int = 0  # % of hosts that are DOWN: every page
    # fetch fails (the dead-host-circuit-breaker fixture)
    meta_robots_pct: int = 0  # % of pages declaring a page-level
    # <meta name="robots"> directive (noindex / nofollow / both)
    sitemap_priority: bool = False  # urlsets carry <priority>0.p</priority>
    # per URL (sitemaps.org), p = sitemap_priority_of — seeds frontier
    # priority when the engine honors it
    og_pct: int = 0  # % of pages declaring og:image + og:title — the
    # OpenGraph image+caption discovery channel (always honored by the
    # parse layer; the knob only plants the tags)
    cache_control_pct: int = 0  # % of pages declaring a Cache-Control
    # max-age (in CYCLES — the crawl's clock): the server's own
    # freshness lifetime, honored by the engine's revisit scheduler
    # when honor_max_age is on
    etag_stable_pct: int = 0  # % of pages whose body NEVER re-renders
    # across content epochs (boilerplate/landing pages): the slice the
    # ETag validator exists for — Last-Modified says "stale", the
    # entity bytes say "unchanged". 0 keeps every body byte-identical
    # to the historical fixtures.
    img_fmts: tuple = _FMTS  # image format cycle; the default 3-cycle
    # keeps every existing fixture byte-stable — pass
    # ("ppm", "png", "qpng", "jpeg") to put real JPEGs (pure-numpy
    # baseline T.81 codec) on the wire in the crawl loop
    seed: int = 42

    def host(self, k: int) -> str:
        if self.domain_groups > 0:
            return f"h{k}.d{k % self.domain_groups}.test"
        return f"h{k}.test"


def _digest(s: str) -> bytes:
    return hashlib.sha256(s.encode("utf-8")).digest()


def seed_urls(cfg: WebConfig, n_seeds: int) -> list[str]:
    """Fixed-order seed list: round-robin across hosts, ascending page no."""
    out = []
    for i in range(n_seeds):
        k = i % cfg.n_hosts
        j = i // cfg.n_hosts
        out.append(f"http://{cfg.host(k)}/p/{j}")
    return out


# ---------------------------------------------------------------- robots

def robots_version(cfg: WebConfig, cycle: int) -> int:
    """Robots epoch at a crawl cycle: robots.txt re-renders every
    `robots_change_every` cycles (0 = rules never change). Models a
    site editing its robots.txt mid-crawl — a polite crawler re-reads
    the rules each cycle and must follow the CURRENT epoch's rules
    (allow/deny sets AND crawl-delays shift between epochs)."""
    return cycle // cfg.robots_change_every if cfg.robots_change_every else 0


def robots_txt(cfg: WebConfig, host: str, ver: int = 0) -> str:
    """Deterministic robots.txt body for a host; exercises RFC 9309 edges.
    `ver` is the robots epoch (robots_version); ver=0 reproduces the
    static-web bytes exactly, so every existing trace is unchanged."""
    key = f"robots:{cfg.seed}:{host}"
    d = _digest(key if ver == 0 else f"{key}:v{ver}")
    kind = d[0] % 5
    delay_s = d[1] % 4  # 0..3 s
    lines = [f"# robots for {host}", "User-agent: *"]
    if kind == 0:
        lines.append("Disallow:")  # allow all
    elif kind == 1:
        lines.append(f"Disallow: /p/{d[2] % 10}")  # block one page prefix
    elif kind == 2:
        lines.append("Disallow: /p/")
        lines.append(f"Allow: /p/{d[3] % 10}")  # longest-match override
    elif kind == 3:
        lines.append(f"Disallow: /*/{d[4] % 10}$")  # wildcard + anchor
    else:
        lines.append("Disallow: /private/")
    if delay_s:
        lines.append(f"Crawl-delay: {delay_s}")
    if d[5] % 2 == 0:
        # half the hosts declare their sitemap (sitemaps.org directive;
        # group-independent) — exercised by sitemap_seeds="robots"
        lines.append(f"Sitemap: http://{host}/sitemap.xml")
    return "\n".join(lines) + "\n"


def robots_unreachable(cfg: WebConfig, host: str) -> bool:
    """Whether a host's /robots.txt request answers a server error
    (enabled by robots_5xx_pct; a static property of the host — the
    endpoint is broken, not flaky). RFC 9309 §2.3.1.4: a crawler that
    cannot reach robots.txt due to 5xx MUST assume complete disallow —
    the opposite of the 4xx case (absent file ⇒ allow all). Pure
    function of (cfg, host) so oracle and engine agree."""
    if cfg.robots_5xx_pct <= 0:
        return False
    return _digest(f"rob5xx:{cfg.seed}:{host}")[0] % 100 < cfg.robots_5xx_pct


def host_budget(cfg: WebConfig, host: str) -> int:
    """Per-host per-cycle fetch budget (politeness budget, BASELINE.json:2)."""
    d = _digest(f"budget:{cfg.seed}:{host}")
    return 5 + d[0] % 16  # 5..20


def rate_limit_of(cfg: WebConfig, host: str) -> tuple[int, int] | None:
    """HTTP 429 model: hash-selected hosts (rate_limit_pct) enforce a
    per-cycle request cap T below their robots budget — every request
    at slot >= T is answered 429 with a Retry-After of R cycles.
    Returns (T, R) for limiting hosts, None otherwise.

    Slot-deterministic by design: the verdict is a pure function of
    (host, sched_slot), so the engine's salted/partitioned fetch
    workers and the sequential oracle compute identical outcomes with
    no cross-worker state — the property every other synthetic-web
    behavior (fetch_ok, redirect_of, mirror_of) relies on too."""
    if cfg.rate_limit_pct <= 0:
        return None
    d = _digest(f"ratelimit:{cfg.seed}:{host}")
    if d[0] % 100 >= cfg.rate_limit_pct:
        return None
    return 2 + d[1] % 4, 1 + d[2] % 2  # cap 2..5 slots; Retry-After 1..2 cycles


# ---------------------------------------------------------------- pages

def render_page(cfg: WebConfig, url: str, ver: int = 0) -> str:
    """HTML body of a page URL — pure function of (cfg, url, ver).
    ver=0 keeps the historical digest seed (byte-identical pages)."""
    d = _digest(
        f"page:{cfg.seed}:{url}" if ver == 0 else f"page:{cfg.seed}:v{ver}:{url}"
    )
    host = url.split("/")[2]
    k = int(host[1:].split(".")[0])
    n_links = d[0] % 9
    n_imgs = d[1] % 4
    # rel=canonical (enabled by canonical_pct): a deterministic slice
    # of ODD /p/<j> pages declares the even twin /p/<j-1> canonical via
    # a RELATIVE href (exercises resolution). canonical_pct=0 keeps
    # pages byte-identical to the historical bodies.
    canon_tag = ""
    if cfg.canonical_pct:
        segs = url.split("/")
        if len(segs) == 5 and segs[3] == "p" and segs[4].isdigit():
            j = int(segs[4])
            if (
                j % 2 == 1
                and _digest(f"canon:{cfg.seed}:{url}")[0] % 100
                < cfg.canonical_pct
            ):
                canon_tag = f'<link rel="canonical" href="/p/{j - 1}">'
    # page-level robots meta (enabled by meta_robots_pct): render_page
    # always receives the mirror-canonical URL (synthweb.fetch resolves
    # mirrors before rendering), so the slice below and meta_robots_of
    # agree on every URL. meta_robots_pct=0 keeps bodies byte-identical.
    mr_tag = ""
    if cfg.meta_robots_pct:
        mr = meta_robots_of(cfg, url)
        if mr is not None:
            mr_tag = f'<meta name="robots" content="{mr}">'
    # OpenGraph image+caption (enabled by og_pct): a hash slice of
    # pages declares a representative image + title — the third
    # image-discovery channel next to <img alt> and <figure>. The og
    # image lives in the same /img/ namespace (fetchable like any
    # other), caption from the shared caption function.
    og_tag = ""
    if cfg.og_pct and d[6] % 100 < cfg.og_pct:
        dog = _digest(f"og:{cfg.seed}:{url}")
        og_fmt = cfg.img_fmts[dog[0] % len(cfg.img_fmts)]
        og_url = f"http://{host}/img/og{dog.hex()[:12]}.{og_fmt}"
        og_tag = (
            f'<meta property="og:image" content="{og_url}">'
            f'<meta property="og:title" content="{caption_of(cfg, og_url)}">'
        )
    parts = [
        f"<html><head><title>Page {url}</title>{canon_tag}{mr_tag}{og_tag}</head><body>",
        f"<h1>host {host}</h1><p>lorem {d.hex()[:16]}</p>",
    ]
    for i in range(n_links):
        b = d[2 + i]
        tgt_j = (d[10 + i] + 256 * d[18 + i]) % cfg.pages_per_host
        style = b % 6
        if style == 0:  # relative
            href = f"/p/{tgt_j}"
        elif style == 1:  # relative no leading slash (resolves vs page dir)
            href = f"p/{tgt_j}"
        elif style == 2:  # absolute same host
            href = f"http://{host}/p/{tgt_j}"
        elif style == 3:  # cross-host (hot-host skew applies)
            tgt_k = d[24 + i] % cfg.n_hosts
            if cfg.hot_frac_pct and (d[2 + i] % 100) < cfg.hot_frac_pct:
                tgt_k = 0
            href = f"http://{cfg.host(tgt_k)}/p/{tgt_j}"
        elif style == 4:  # tracking-param duplicate + fragment
            href = f"http://{host}/p/{tgt_j}?utm_source=x&utm_campaign={i}#frag"
        else:  # malformed / non-fetchable
            href = ["javascript:void(0)", "mailto:a@b.test", "#top", "data:text/plain,x"][b % 4]
        rel = ""
        if (
            cfg.nofollow_pct
            and _digest(f"nf:{cfg.seed}:{url}:{i}")[0] % 100 < cfg.nofollow_pct
        ):
            rel = ' rel="nofollow"'
        parts.append(f'<a href="{href}"{rel}>link {i}</a>')
    if cfg.trap_pct and d[30] % 100 < cfg.trap_pct:
        # calendar-loop trap: repeated /cal/<x>/ segments — fetchable
        # (render_page is total over URLs, like a real trap), but any
        # trap-aware frontier filter should refuse to enqueue it
        x = d[31] % 12
        tgt = (d[30] + 256 * d[31]) % cfg.pages_per_host
        parts.append(f'<a href="/cal/{x}/cal/{x}/cal/p{tgt}">calendar</a>')
    for i in range(n_imgs):
        di = _digest(f"img:{cfg.seed}:{url}:{i}")
        img_id = di.hex()[:12]
        fmt = cfg.img_fmts[di[0] % len(cfg.img_fmts)]
        img_url = f"http://{host}/img/{img_id}.{fmt}"
        cap = caption_of(cfg, img_url)
        if di[1] % 2 == 0:
            parts.append(f'<img src="{img_url}" alt="{cap}">')
        else:
            parts.append(
                f'<figure><img src="{img_url}" alt="ignored">'
                f"<figcaption>{cap}</figcaption></figure>"
            )
    parts.append(f"</body></html><!-- k={k} -->")
    return "\n".join(parts)


def caption_of(cfg: WebConfig, img_url: str) -> str:
    d = _digest(f"cap:{cfg.seed}:{img_url}")
    words = ["alpha", "béta", "gamma", "delta", "épsilon", "zeta", "eta", "theta"]
    picked = " ".join(words[b % len(words)] for b in d[:4])
    name = img_url.rsplit("/", 1)[-1]
    return f"caption {name}: {picked} [{d.hex()[:8]}]"


# ---------------------------------------------------------------- images

def image_pixels(cfg: WebConfig, img_url: str) -> np.ndarray:
    """Procedural (h, w, 3) uint8 pixels — gradient + sine, digest-param'd."""
    d = _digest(f"pix:{cfg.seed}:{img_url}")
    w = 16 + d[0] % 113  # 16..128
    h = 16 + d[1] % 113
    fx = 1 + d[2] % 7
    fy = 1 + d[3] % 7
    phase = d[4] / 255.0 * 2 * np.pi
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 127.5 + 127.5 * np.sin(2 * np.pi * fx * xx / w + phase)
    g = 127.5 + 127.5 * np.sin(2 * np.pi * fy * yy / h - phase)
    b = (xx / max(w - 1, 1) * 255.0 + yy / max(h - 1, 1) * 0.0)
    b = (b + d[5]) % 256.0
    img = np.stack([r, g, b], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def fetch_image(cfg: WebConfig, img_url: str) -> tuple[bytes, int, int, str]:
    """Encoded bytes + (w, h, fmt) for an image URL."""
    fmt = img_url.rsplit(".", 1)[-1]
    # every container ccbot_spark.codecs can encode goes on the wire
    # verbatim (gif joined in r5); unknown extensions serve ppm
    if fmt not in _FMTS and fmt not in ("bmp", "jpeg", "jpg", "gif"):
        fmt = "ppm"
    px = image_pixels(cfg, img_url)
    return codecs.encode(px, fmt), px.shape[1], px.shape[0], fmt


def host_dead(cfg: WebConfig, host: str) -> bool:
    """Whether a host is DOWN — every page fetch fails (enabled by
    dead_host_pct; the server, not the page, is broken). Pure function
    of (cfg, host); the dead-host circuit breaker's fixture."""
    if cfg.dead_host_pct <= 0:
        return False
    return _digest(f"dead:{cfg.seed}:{host}")[0] % 100 < cfg.dead_host_pct


def fetch_ok(cfg: WebConfig, url: str, attempt: int = 0) -> bool:
    """Deterministic fetch outcome: a fail_pct slice of fetches errors
    (connection reset / 5xx in a real crawl). Pure function of
    (url, attempt) so oracle and engine agree AND retries can succeed
    — transient-failure semantics. The failed fetch still consumed its
    politeness slot. Dead hosts (dead_host_pct) fail every attempt."""
    if cfg.dead_host_pct and host_dead(cfg, url.split("/")[2]):
        return False
    if not cfg.fail_pct:
        return True
    return _digest(f"fail:{cfg.seed}:{url}:{attempt}")[0] % 100 >= cfg.fail_pct


def _sitemap_pages(cfg: WebConfig, host: str) -> list[int]:
    """Pages a host lists in its sitemap(s): a deterministic ~1/4
    slice, ascending page order — pure function of (cfg, host)."""
    return [
        j
        for j in range(cfg.pages_per_host)
        if _digest(f"map:{cfg.seed}:{host}:{j}")[0] % 4 == 0
    ]


def sitemap_priority_of(cfg: WebConfig, url: str) -> int:
    """The ×10 integer priority a urlset declares for `url` (1..9 —
    never the 0.5 default, so honoring it is always observable). Pure
    function of (cfg, url) so oracle and engine agree."""
    return 1 + _digest(f"smpri:{cfg.seed}:{url}")[0] % 9


def _urlset(cfg: WebConfig, host: str, pages: list[int]) -> str:
    locs = []
    for j in pages:
        u = f"http://{host}/p/{j}"
        pri = (
            f"<priority>0.{sitemap_priority_of(cfg, u)}</priority>"
            if cfg.sitemap_priority
            else ""
        )
        locs.append(f"  <url><loc>{u}</loc>{pri}</url>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(locs)
        + "\n</urlset>"
    )


def sitemap_xml(cfg: WebConfig, host: str) -> str:
    """Deterministic /sitemap.xml body. sitemap_shards = 0: a plain
    urlset of the host's sitemap pages. sitemap_shards = S > 0: the
    large-site form — a <sitemapindex> whose entries point at S shard
    urlsets (/sitemap-{i}.xml, sitemaps.org index spec; real sites
    shard because one sitemap caps at 50k URLs). Shard i carries the
    pages at positions ≡ i (mod S) of the SAME page list, so the union
    across shards equals the unsharded urlset exactly."""
    if cfg.sitemap_shards > 0:
        entries = [
            f"  <sitemap><loc>http://{host}/sitemap-{i}.xml</loc></sitemap>"
            for i in range(cfg.sitemap_shards)
        ]
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(entries)
            + "\n</sitemapindex>"
        )
    return _urlset(cfg, host, _sitemap_pages(cfg, host))


def sitemap_shard_xml(cfg: WebConfig, host: str, i: int) -> str:
    """Shard i of a host's sitemap index: positions ≡ i (mod S) of the
    host's sitemap page list."""
    pages = _sitemap_pages(cfg, host)
    return _urlset(cfg, host, pages[i :: max(1, cfg.sitemap_shards)])


def sitemap_body(cfg: WebConfig, url: str) -> str | None:
    """Body of ANY sitemap URL on the synthetic web — /sitemap.xml
    (index or urlset per sitemap_shards) or a /sitemap-{i}.xml shard.
    None for non-sitemap paths (a malformed <loc> in an index)."""
    m = re.match(r"^https?://([^/]+)(/.*)$", url or "")
    if not m:
        return None
    host, path = m.group(1), m.group(2)
    if path == "/sitemap.xml":
        return sitemap_xml(cfg, host)
    sm = re.match(r"^/sitemap-(\d+)\.xml$", path)
    if sm and cfg.sitemap_shards > 0:
        i = int(sm.group(1))
        if i < cfg.sitemap_shards:
            return sitemap_shard_xml(cfg, host, i)
    return None


def expand_sitemap_urls(cfg: WebConfig, xml: str) -> list[str]:
    """Page URLs reachable from one fetched sitemap body, index-aware:
    a urlset yields its <loc>s directly; a <sitemapindex> fetches each
    child shard (ONE level — the spec forbids nested indexes) and
    concatenates the children's <loc>s in index order. Deduped,
    document order. Shared by the oracle crawler and the engine's
    distributed seeding task so both expand identically."""
    return [u for u, _ in expand_sitemap_entries(cfg, xml)]


def expand_sitemap_entries(
    cfg: WebConfig, xml: str
) -> list[tuple[str, int | None]]:
    """(url, declared priority×10 | None) pairs from one fetched
    sitemap body — expand_sitemap_urls plus the sitemaps.org
    <priority> each <url> block carries (None when undeclared). Same
    dedup/order rules; on a cross-shard dup the FIRST declaration
    wins, like the url itself."""
    from . import parsekit

    if not parsekit.is_sitemap_index(xml):
        return parsekit.extract_sitemap_entries(xml)
    out: list[tuple[str, int | None]] = []
    seen: set[str] = set()
    for sm_url in parsekit.extract_sitemap_urls(xml):
        body = sitemap_body(cfg, sm_url)
        if body is None or parsekit.is_sitemap_index(body):
            continue  # dangling loc / illegal nested index
        for u, pri in parsekit.extract_sitemap_entries(body):
            if u not in seen:
                seen.add(u)
                out.append((u, pri))
    return out


def redirect_of(cfg: WebConfig, url: str) -> str | None:
    """HTTP 301 simulation: a deterministic redirect_pct slice of
    ODD-numbered pages redirects to the previous (even) page on the
    same host — single-hop by construction (even pages never redirect),
    no loops. Pure function of (cfg, url) so oracle and engine agree.
    Returns the raw Location target (caller normalizes), or None."""
    if not cfg.redirect_pct:
        return None
    parts = url.split("/")
    if len(parts) < 5 or parts[3] != "p":
        return None  # only page URLs redirect
    try:
        j = int(parts[4].split("?")[0].split("#")[0])
    except ValueError:
        return None
    if j % 2 == 0:
        return None
    if _digest(f"redir:{cfg.seed}:{url}")[0] % 100 >= cfg.redirect_pct:
        return None
    return f"http://{parts[2]}/p/{j - 1}"


def content_version(cfg: WebConfig, cycle: int) -> int:
    """Content epoch at a crawl cycle: pages re-render every
    `change_every` cycles (0 = the web is static). The synthetic
    analog of a Last-Modified timestamp — a page fetched at epoch v
    and revisited at the same epoch answers 304."""
    return cycle // cfg.change_every if cfg.change_every else 0


def mirror_of(cfg: WebConfig, url: str) -> str | None:
    """Mirror-site injection (enabled by mirror_pct): a deterministic
    slice of non-h0 ``/p/N`` pages serves the byte-identical body of
    its h0 twin (``http://h0.test/p/N``) — the duplicated-content shape
    the Mercator content-seen test exists for. Returns the canonical
    URL whose body this URL mirrors, or None."""
    if not cfg.mirror_pct:
        return None
    parts = url.split("/")
    if len(parts) != 5 or parts[3] != "p":
        return None
    canon = f"http://{cfg.host(0)}/p/{parts[4]}"
    if canon == url:
        return None
    if _digest(f"mir:{cfg.seed}:{url}")[0] % 100 < cfg.mirror_pct:
        return canon
    return None


def content_type_of(cfg: WebConfig, url: str) -> str:
    """Content-Type of a page response (enabled by binary_pct): a
    deterministic slice of ``/p/N`` pages serves
    application/octet-stream — the PDFs/archives/media a real crawl
    must store-but-never-parse. Mirrors serve their canonical page's
    type (a mirror is the same resource at another URL). Pure function
    of (cfg, url) so oracle and engine agree; redirect sources are
    typed too but the 301 check runs first in both engines, so the
    type of a redirecting URL is never consulted."""
    if not cfg.binary_pct:
        return "text/html"
    canon = mirror_of(cfg, url)
    u = canon if canon is not None else url
    parts = u.split("/")
    if len(parts) != 5 or parts[3] != "p":
        return "text/html"
    if _digest(f"ctype:{cfg.seed}:{u}")[0] % 100 < cfg.binary_pct:
        return "application/octet-stream"
    return "text/html"


def soft404_of(cfg: WebConfig, url: str) -> bool:
    """Whether a page answers HTTP 200 with an error-template body — the
    misconfigured-server "soft 404" every production crawler must
    detect from content (enabled by soft404_pct). A deterministic hash
    slice of ``/p/N`` pages; mirrors follow their canonical page (same
    resource, same brokenness); independent of the content epoch (a
    404'd path stays 404 across re-renders). Pure function of
    (cfg, url) so oracle and engine agree."""
    if not cfg.soft404_pct:
        return False
    canon = mirror_of(cfg, url)
    u = canon if canon is not None else url
    parts = u.split("/")
    if len(parts) != 5 or parts[3] != "p":
        return False
    return _digest(f"s404:{cfg.seed}:{u}")[0] % 100 < cfg.soft404_pct


_META_ROBOTS_VALUES = ("noindex", "nofollow", "noindex, nofollow")


def meta_robots_of(cfg: WebConfig, url: str) -> str | None:
    """Page-level robots meta directive (enabled by meta_robots_pct):
    a deterministic slice of ``/p/N`` pages declares
    ``<meta name="robots" content="...">`` with one of noindex /
    nofollow / both (REP page-level directives every production
    indexer honors). Mirrors follow their canonical page (same body,
    same directives); independent of the content epoch. Pure function
    of (cfg, url) so oracle and engine agree."""
    if not cfg.meta_robots_pct:
        return None
    canon = mirror_of(cfg, url)
    u = canon if canon is not None else url
    parts = u.split("/")
    if len(parts) != 5 or parts[3] != "p":
        return None
    d = _digest(f"mrobots:{cfg.seed}:{u}")
    if d[0] % 100 >= cfg.meta_robots_pct:
        return None
    return _META_ROBOTS_VALUES[d[1] % 3]


def soft404_body(url: str) -> str:
    """The error-template body a soft-404 page serves: no outlinks, no
    images, recognizably an error page (title + h1 carry the markers
    parsekit.SOFT404_RE keys on). Per-URL text, so content-seen dedup
    and soft-404 detection stay orthogonal features."""
    return (
        "<html><head><title>404 Not Found</title></head><body>"
        "<h1>Page not found</h1>"
        f"<p>The requested URL {url} was not found on this server.</p>"
        "</body></html>"
    )


def fetch(cfg: WebConfig, url: str, ver: int = 0) -> str:
    """The synthetic 'network': fetch a page URL → HTML body.
    ver is the content epoch (content_version): epoch 0 renders the
    original page byte-for-byte, later epochs re-render with a new
    digest seed (different outlinks / image counts) — still a pure
    function of (cfg, url, ver)."""
    canon = mirror_of(cfg, url)
    u = canon if canon is not None else url
    if soft404_of(cfg, url):
        return soft404_body(u)
    if ver and etag_stable(cfg, u):
        # epoch-invariant page: every epoch serves the epoch-0 bytes
        ver = 0
    return render_page(cfg, u, ver)


def max_age_of(cfg: WebConfig, url: str) -> int | None:
    """Cache-Control max-age declared by this page's responses, in
    crawl cycles (1..6), or None when the page declares none. Decided
    on the mirror-canonical URL (headers describe the served resource).
    Pure function of (cfg, url) — oracle and engine agree."""
    if not cfg.cache_control_pct:
        return None
    canon = mirror_of(cfg, url)
    u = canon if canon is not None else url
    parts = u.split("/")
    if len(parts) != 5 or parts[3] != "p":
        return None
    d = _digest(f"maxage:{cfg.seed}:{u}")
    if d[0] % 100 >= cfg.cache_control_pct:
        return None
    return 1 + d[1] % 6


def etag_stable(cfg: WebConfig, url: str) -> bool:
    """True for the deterministic etag_stable_pct slice of pages whose
    body is EPOCH-INVARIANT: the content clock (Last-Modified model)
    marks them changed every epoch, but the served bytes — and so the
    strong validator — never move. Decided on the mirror-canonical URL
    so a mirror and its canonical stay in lockstep. Pure function of
    (cfg, url) — oracle and engine agree."""
    if not cfg.etag_stable_pct:
        return False
    return _digest(f"etstable:{cfg.seed}:{url}")[0] % 100 < cfg.etag_stable_pct
