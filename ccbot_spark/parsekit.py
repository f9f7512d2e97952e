"""HTML parsing: outlink and image+caption extraction (SURVEY.md §2.7
`u_extract_links` / `u_extract_images`).

Regex-based, deterministic, shared by the oracle crawler and the Spark
`mapInPandas` parse stage. Semantics:

  * links: every ``<a href="...">`` except ``rel="nofollow"`` anchors
    (never followed, never counted); resolved against the page URL and
    normalized via ``urlkit.resolve_link`` (drops mailto/js/data/#frag)
  * images: ``<figure><img src=X ...><figcaption>C</figcaption></figure>``
    yields (X, C) — figcaption overrides alt; standalone
    ``<img src=X alt=C>`` yields (X, C). Document order preserved.
"""

from __future__ import annotations

import re

from . import urlkit

_A_TAG_RE = re.compile(r'<a\s[^>]*?href="[^"]*"[^>]*?>', re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(r'href="([^"]*)"', re.IGNORECASE | re.DOTALL)
_NOFOLLOW_RE = re.compile(r'rel="nofollow"', re.IGNORECASE)
_FIGURE_RE = re.compile(
    r'<figure>\s*<img\s[^>]*?src="([^"]*)"[^>]*>\s*'
    r"<figcaption>(.*?)</figcaption>\s*</figure>",
    re.IGNORECASE | re.DOTALL,
)
_IMG_RE = re.compile(r'<img\s[^>]*?src="([^"]*)"[^>]*?alt="([^"]*)"', re.IGNORECASE)
_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)


_SITEMAPINDEX_RE = re.compile(r"<\s*sitemapindex\b", re.IGNORECASE)


def is_sitemap_index(xml: str) -> bool:
    """True for a <sitemapindex> document (child <loc>s are SITEMAP
    URLs to fetch, not page URLs to crawl — sitemaps.org index spec)."""
    return bool(_SITEMAPINDEX_RE.search(xml or ""))


def extract_sitemap_urls(xml: str) -> list[str]:
    """sitemap.xml ``<loc>`` entries → normalized URLs, document order,
    deduped. Non-URL / unfetchable locs drop out in normalization."""
    seen: set[str] = set()
    out: list[str] = []
    for m in _LOC_RE.finditer(xml or ""):
        u = urlkit.normalize_url(m.group(1))
        if u is not None and u not in seen:
            seen.add(u)
            out.append(u)
    return out


_URL_BLOCK_RE = re.compile(r"<url>(.*?)</url>", re.IGNORECASE | re.DOTALL)
_SM_PRI_RE = re.compile(
    r"<priority>\s*([01])\.([0-9])\s*</priority>", re.IGNORECASE
)


def extract_sitemap_entries(xml: str) -> list[tuple[str, int | None]]:
    """(url, priority×10 | None) per urlset ``<url>`` block, document
    order, deduped by url (first block wins — same rule as
    extract_sitemap_urls). The sitemaps.org priority is a 0.0–1.0
    decimal; it parses as an INTEGER x10 (0..10) so every downstream
    comparison stays engine-exact, never float-thresholded. A block
    without <priority> yields None (spec default is the CRAWLER's
    business, not the parser's)."""
    seen: set[str] = set()
    out: list[tuple[str, int | None]] = []
    for m in _URL_BLOCK_RE.finditer(xml or ""):
        block = m.group(1)
        lm = _LOC_RE.search(block)
        if lm is None:
            continue
        u = urlkit.normalize_url(lm.group(1))
        if u is None or u in seen:
            continue
        seen.add(u)
        pm = _SM_PRI_RE.search(block)
        pri = 10 * int(pm.group(1)) + int(pm.group(2)) if pm else None
        out.append((u, pri if pri is None or pri <= 10 else 10))
    return out


def extract_links(page_url: str, html: str) -> list[str]:
    """Resolved+normalized outlinks, document order, within-page dedup."""
    out: list[str] = []
    seen: set[str] = set()
    for tag in _A_TAG_RE.findall(html or ""):
        if _NOFOLLOW_RE.search(tag):
            continue
        href = _HREF_RE.search(tag).group(1)
        u = urlkit.resolve_link(page_url, href)
        if u is not None and u not in seen:
            seen.add(u)
            out.append(u)
    return out


_CANON_RE = re.compile(
    r'<link\s[^>]*?rel="canonical"[^>]*?href="([^"]*)"', re.IGNORECASE | re.DOTALL
)


def extract_canonical(page_url: str, html: str) -> str | None:
    """Resolved+normalized rel=canonical target (first declaration
    wins, per the common-crawler convention), or None. The JVM twin is
    fetchparse.with_canonical — same pattern, trace-equality-tested."""
    m = _CANON_RE.search(html or "")
    if not m:
        return None
    return urlkit.resolve_link(page_url, m.group(1))


# OpenGraph image+caption channel (og:image + og:title/og:description,
# title preferred): the SAME patterns as the JVM fetchparse.og_image_cols
# — case-insensitive attribute forms, leftmost declaration wins.
_OG_IMG_RE = re.compile(
    r'<meta\s[^>]*?property="og:image"[^>]*?content="([^"]*)"',
    re.IGNORECASE | re.DOTALL,
)
_OG_TITLE_RE = re.compile(
    r'<meta\s[^>]*?property="og:title"[^>]*?content="([^"]*)"',
    re.IGNORECASE | re.DOTALL,
)
_OG_DESC_RE = re.compile(
    r'<meta\s[^>]*?property="og:description"[^>]*?content="([^"]*)"',
    re.IGNORECASE | re.DOTALL,
)


def og_image_pair(html: str) -> tuple[str, str] | None:
    """(raw og:image url, caption) or None — python twin of the JVM
    og_image_cols (engine-equality carried by the crawl trace tests)."""
    if not html:
        return None
    m = _OG_IMG_RE.search(html)
    if m is None or not m.group(1):
        return None
    t = _OG_TITLE_RE.search(html)
    if t is not None and t.group(1):
        cap = t.group(1)
    else:
        d = _OG_DESC_RE.search(html)
        cap = d.group(1) if d is not None and d.group(1) else ""
    return m.group(1), cap


def extract_images(page_url: str, html: str) -> list[tuple[str, str]]:
    """(img_url, caption) pairs, document order, within-page dedup by
    url. The OpenGraph channel (og:image + og:title caption) appends
    LAST — lowest precedence, so a body reference to the same image
    keeps its figure/alt caption."""
    html = html or ""
    pairs: list[tuple[int, str, str]] = []
    spans: list[tuple[int, int]] = []
    for m in _FIGURE_RE.finditer(html):
        pairs.append((m.start(), m.group(1), m.group(2).strip()))
        spans.append(m.span())
    for m in _IMG_RE.finditer(html):
        if any(s <= m.start() < e for s, e in spans):
            continue  # already captured via its figure
        pairs.append((m.start(), m.group(1), m.group(2).strip()))
    pairs.sort(key=lambda t: t[0])
    og = og_image_pair(html)
    if og is not None:
        pairs.append((len(html), og[0], og[1].strip()))
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for _, src, cap in pairs:
        u = urlkit.resolve_link(page_url, src)
        if u is not None and u not in seen:
            seen.add(u)
            out.append((u, cap))
    return out


# WET-style text extraction (the web-archive "conversion" record body:
# page text with markup removed). Two explicit block passes (script,
# style) instead of a backreference so the same pattern set runs under
# Java regex (Spark), RE2 (DuckDB oracle), and Python `re` — the three
# engines must agree byte-for-byte (textkit.wet_text is the JVM twin).
_SCRIPT_RE = re.compile(r"<script[^>]*>.*?</script>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style[^>]*>.*?</style>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>", re.DOTALL)
_WS_RE = re.compile(r"\s+")


def extract_text(html: str) -> str | None:
    """Markup-stripped page text: script/style blocks dropped, tags →
    spaces, the five standard entities decoded (&amp; last, so
    double-encoded text decodes one level like a streaming decoder),
    whitespace collapsed, ends trimmed."""
    if html is None:
        return None
    t = _SCRIPT_RE.sub(" ", html)
    t = _STYLE_RE.sub(" ", t)
    t = _TAG_RE.sub(" ", t)
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = t.replace(ent, ch)
    return _WS_RE.sub(" ", t).strip()


# Soft-404 detection: content markers of an error page served with
# HTTP 200. ONE pattern string, backreference-free and applied to the
# LOWERCASED body, so Java regex (Spark, fetchparse.soft404_col) and
# python `re` (this twin, used by the oracle crawler) match the exact
# same byte sequences.
SOFT404_PATTERN = (
    r"<title>\s*404 not found\s*</title>"
    r"|<h1>\s*page not found\s*</h1>"
    r"|was not found on this server"
)
_SOFT404_RE = re.compile(SOFT404_PATTERN)


def is_soft404(html: str) -> bool:
    """Python twin of fetchparse.soft404_col (engine-equality tested)."""
    return html is not None and _SOFT404_RE.search(html.lower()) is not None


# Page-level robots meta directive (REP <meta name="robots">): ONE
# pattern string, backreference-free and applied to the LOWERCASED
# body, so Java regex (fetchparse.meta_robots_cols) and python `re`
# (this twin, used by the oracle crawler) extract the exact same
# content attribute. First tag wins on both engines (regexp_extract
# and re.search both take the leftmost match).
META_ROBOTS_PATTERN = r'<meta\s+name="robots"\s+content="([^"]*)"'
_META_ROBOTS_RE = re.compile(META_ROBOTS_PATTERN)


def meta_robots(html: str) -> tuple[bool, bool]:
    """(noindex, nofollow) verdicts from the page-level robots meta.
    Python twin of fetchparse.meta_robots_cols (equality tested)."""
    if not html:
        return (False, False)
    mm = _META_ROBOTS_RE.search(html.lower())
    if mm is None:
        return (False, False)
    content = mm.group(1)
    return ("noindex" in content, "nofollow" in content)


# Whole anchor ELEMENT (open tag + markup-free inner text + close):
# ONE pattern string shared verbatim with the JVM extractor
# (fetchparse.extract_anchor_texts) — an anchor wrapping nested markup
# matches neither engine, so both yield no row rather than a wrong one.
ANCHOR_ELEM_PATTERN = r'(?is)<a\s[^>]*?href="[^"]*"[^>]*?>[^<]*</a>'
_ANCHOR_ELEM_RE = re.compile(ANCHOR_ELEM_PATTERN)
_ANCHOR_TEXT_RE = re.compile(r"(?is)>([^<]*)</a>")
_NOFOLLOW_RE2 = re.compile('(?i)rel="nofollow"')


def extract_anchor_pairs(page_url: str, html: str) -> list[tuple[str, str]]:
    """(resolved target, anchor text) per followed anchor occurrence,
    document order, NO within-page dedup (occurrence counts are the
    point of anchor aggregation). Python twin of the engine's
    extract_anchor_texts + per-href resolve — same element pattern,
    same nofollow filter, same urlkit.resolve_link drop of
    non-fetchable schemes. Engine-equality tested on the anchors
    table."""
    out: list[tuple[str, str]] = []
    for el in _ANCHOR_ELEM_RE.findall(html or ""):
        if _NOFOLLOW_RE2.search(el):
            continue
        href = _HREF_RE.search(el).group(1)
        u = urlkit.resolve_link(page_url, href) if href else None
        if u is None:
            continue
        out.append((u, _ANCHOR_TEXT_RE.search(el).group(1).strip()))
    return out
