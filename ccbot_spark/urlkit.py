"""URL kit: normalization, host extraction, scheme filtering, hashing.

Pure-Python core functions (used verbatim by the oracle crawler,
``ccbot_spark.oracle``) plus vectorized pandas wrappers used by the
Spark engine through ``pandas_udf`` — both sides share ONE
implementation, which is what makes the exact seen-set / crawl-order
match achievable (SURVEY.md §7.4 item 1).

Normalization semantics (Mercator-style canonicalization, SURVEY.md
§2.2 `f_url_normalize`):
  * lowercase scheme and host
  * strip fragment
  * strip default port (:80 http, :443 https)
  * resolve '.' and '..' path segments
  * collapse '//' in path, ensure leading '/'
  * drop tracking query params (utm_*, fbclid, gclid), sort the rest
  * strip trailing '?' / lone '&'
Idempotence is property-tested (tests/test_urlkit.py).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_RE = re.compile(
    r"^(utm_|fbclid$|gclid$|msclkid$|phpsessid$|jsessionid$)"
)
# servlet-style path parameter (`/cart;jsessionid=ABC` — the session id
# lives in the PATH, not the query): the classic infinite-alias source
_JSESSIONID_PATH_RE = re.compile(r";jsessionid=[^/;?#]*", re.IGNORECASE)
_SCHEME_OK_RE = re.compile(r"^https?://", re.IGNORECASE)


def _normalize_path(path: str) -> str:
    if not path:
        return "/"
    # collapse repeated slashes, resolve . and ..
    segs = path.split("/")
    out: list[str] = []
    for seg in segs:
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/" + "/".join(out)
    if path.endswith("/") and norm != "/":
        norm += "/"
    return norm


def _normalize_query(query: str) -> str:
    if not query:
        return ""
    kept = []
    for pair in query.split("&"):
        if not pair:
            continue
        key = pair.split("=", 1)[0]
        if _TRACKING_RE.match(key.lower()):
            continue
        kept.append(pair)
    kept.sort()
    return "&".join(kept)


def normalize_url(url: str) -> str | None:
    """Canonicalize a single URL; return None if not a fetchable http(s) URL."""
    if url is None:
        return None
    url = url.strip()
    if not url or not _SCHEME_OK_RE.match(url):
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    # drop servlet session-id path parameters before segment cleanup —
    # every visitor gets a distinct alias of the same resource, the
    # canonical crawler-trap/dup source (query-side session keys are
    # handled by the tracking-param filter)
    path = _normalize_path(_JSESSIONID_PATH_RE.sub("", parts.path))
    query = _normalize_query(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str | None:
    """Registrable host of a (normalized) URL."""
    if url is None:
        return None
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower() if h else None


def resolve_link(base_url: str, href: str) -> str | None:
    """Resolve an extracted href against its page URL, then normalize."""
    if href is None:
        return None
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if low.startswith(("mailto:", "javascript:", "data:", "tel:", "ftp:")):
        return None
    try:
        absu = urljoin(base_url, href)
    except ValueError:
        return None
    return normalize_url(absu)


# Crawler-trap heuristics (single-sourced: operators/urlops.trap_features
# mirrors these thresholds JVM-side; oracle.crawl uses this python form).
TRAP_MAX_DEPTH = 8
TRAP_MAX_REPEAT = 1
TRAP_MAX_LEN = 160
_HOSTPART_RE = re.compile(r"^[a-z]+://[^/]+")


def trap_stats(url: str) -> tuple[int, int, int]:
    """(path depth, repeated-segment count, url length) — the exact
    integer triple urlops.trap_features computes JVM-side: segments are
    the non-empty '/'-split parts of the URL after the scheme+authority
    prefix; repeats are multiset-counted (depth − distinct)."""
    path = _HOSTPART_RE.sub("", url, count=1)
    parts = [p for p in path.split("/") if p != ""]
    return len(parts), len(parts) - len(set(parts)), len(url)


def is_trap(
    url: str,
    max_depth: int = TRAP_MAX_DEPTH,
    max_repeat: int = TRAP_MAX_REPEAT,
    max_len: int = TRAP_MAX_LEN,
) -> bool:
    depth, n_repeat, url_len = trap_stats(url)
    return depth > max_depth or n_repeat > max_repeat or url_len > max_len


def is_fetchable(url: str) -> bool:
    return url is not None and bool(_SCHEME_OK_RE.match(url))


# ----------------------------------------------------------------------
# SURT — Sort-friendly URI Reordering Transform (the web-archive
# canonical key: reversed host labels make all URLs of a domain
# contiguous under a plain lexicographic sort, which is what a CDX
# capture index range-partitions on).
# ----------------------------------------------------------------------

_SURT_URL_RE = re.compile(
    r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^?#]*)(?:\?([^#]*))?"
)
_SURT_PORT_RE = re.compile(r"(:[0-9]+)$")


def surt(url: str) -> str | None:
    """SURT key of a URL: lowercased host with a leading ``www.``
    stripped, labels reversed and joined with ``,``, explicit port
    kept, ``)`` separator, path (``/`` if empty), then ``?`` + the
    query pairs sorted.  ``https://www.news.example.com/a?z=1&a=2`` →
    ``com,example,news)/a?a=2&z=1``.

    Deliberately textual (regex, no urlsplit): the JVM form
    (operators/urlops.surt_key — regexp_extract + array ops inside
    whole-stage codegen) must produce the identical byte string, and
    both sides implementing the same textual rules is what makes that
    provable (hypothesis-tested in tests/test_urlkit.py).
    """
    if url is None:
        return None
    m = _SURT_URL_RE.match(url)
    if not m:
        return None
    hostport = m.group(1).lower()
    path = m.group(2)
    query = m.group(3) or ""
    pm = _SURT_PORT_RE.search(hostport)
    port = pm.group(1) if pm else ""
    host = hostport[: len(hostport) - len(port)]
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    if not path:
        path = "/"
    q = "&".join(sorted(s for s in query.split("&") if s))
    return rev + port + ")" + path + (("?" + q) if q else "")


def surt_series(urls: pd.Series) -> pd.Series:
    return urls.map(surt)


# ----------------------------------------------------------------------
# Vectorized pandas wrappers (Arrow batch path; no per-row Python seen by
# Spark — the loop lives inside one Python worker call per batch).
# ----------------------------------------------------------------------

def normalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(normalize_url)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


def resolve_series(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [resolve_link(b, h) for b, h in zip(bases, hrefs)], dtype=object
    )


# ----------------------------------------------------------------------
# Registered domain (eTLD+1-style grouping).
# ----------------------------------------------------------------------

#: Common second-level registry labels: when the second-to-last label is
#: one of these AND there are >= 3 labels, the registrable suffix is two
#: labels long (example.co.uk -> example.co.uk's registered domain is
#: itself; a.example.co.uk -> example.co.uk). A deliberate public-
#: suffix-list STUB: the real PSL is a data file a deployment would
#: broadcast; the GROUPING MECHANICS (and the Spark/python twin
#: equality) are what this repo tests. These generic labels apply under
#: ANY TLD (keeps rounds 1-4 traces byte-identical); country-specific
#: second labels that are NOT generic (go.jp, gob.mx, govt.nz, idv.tw,
#: ...) live in PSL_2LABEL below as explicit (sld, tld) pairs.
MULTIPART_SLDS = frozenset(
    {"co", "com", "net", "org", "ac", "gov", "edu"}
)

#: Well-known multi-part registrable suffixes by ccTLD family (public
#: knowledge from the Mozilla Public Suffix List — the stable, widely
#: documented entries only; no fetch, no private-section suffixes).
#: Round 5 expansion of the stub: an explicit "sld.tld" pair marks a
#: two-label registrable suffix even when the sld is not one of the
#: generic MULTIPART_SLDS labels above. The union rule is a strict
#: SUPERSET of the old behavior, so every existing trace / oracle /
#: budget grouping is unchanged; only previously-missplit hosts like
#: a.news.go.jp (was news.go.jp -> go.jp) gain the correct split.
_PSL_FAMILIES: dict[str, tuple[str, ...]] = {
    "uk": ("me", "ltd", "plc", "sch", "nhs", "police", "mod"),
    "jp": ("or", "ne", "ad", "ed", "go", "gr", "lg"),
    "au": ("asn", "id", "csiro"),
    "nz": ("govt", "school", "geek", "gen", "kiwi", "maori", "iwi",
           "mil", "health", "cri", "parliament"),
    "in": ("firm", "gen", "ind", "res", "mil", "nic"),
    "za": ("web", "nom", "alt", "law", "mil", "school"),
    "br": ("mil", "art", "blog", "eco", "emp", "far", "flog", "imb",
           "ind", "inf", "jus", "leg", "mp", "psi", "radio", "rec",
           "srv", "tur", "tv", "vlog", "wiki"),
    "cn": ("mil", "ah", "bj", "cq", "fj", "gd", "gs", "gx", "gz",
           "ha", "hb", "he", "hi", "hl", "hn", "jl", "js", "jx",
           "ln", "nm", "nx", "qh", "sc", "sd", "sh", "sn", "sx",
           "tj", "tw", "xj", "xz", "yn", "zj"),
    "kr": ("ne", "or", "re", "pe", "go", "mil", "hs", "ms", "es",
           "sc", "kg", "seoul", "busan", "daegu", "incheon"),
    "mx": ("gob",),
    "ar": ("gob", "int", "mil", "musica", "tur"),
    "tr": ("mil", "web", "gen", "tel", "bel", "pol", "bbs", "k12",
           "av", "dr", "info", "name", "tv", "biz"),
    "tw": ("idv", "game", "ebiz", "club", "mil"),
    "hk": ("idv",),
    "sg": ("per",),
    "il": ("muni", "idf", "k12"),
    "id": ("or", "web", "sch", "go", "mil", "my", "biz", "desa",
           "ponpes"),
    "th": ("or", "go", "in", "mi"),
    "my": ("mil", "name"),
    "vn": ("int", "biz", "info", "name", "pro", "health"),
    "ua": ("in", "biz"),
    "pl": ("info", "waw", "biz", "mil", "nom", "sklep", "tm",
           "gda", "krakow", "poznan", "wroc", "lodz", "lublin"),
    "ke": ("or", "ne", "go", "sc", "me", "mobi", "info"),
    "ng": ("mil", "mobi", "name", "sch", "i"),
}

PSL_2LABEL = frozenset(
    f"{sld}.{tld}"
    for tld, slds in _PSL_FAMILIES.items()
    for sld in slds
)


def registered_domain(host: str | None) -> str | None:
    """eTLD+1-style registered domain of a hostname: the unit sharing
    one crawl budget across subdomains (subdomain-spam defense — a
    thousand *.blogspot-style hosts must not get a thousand budgets).
    Suffix is two labels when the second-to-last label is a generic
    registry label (MULTIPART_SLDS, any TLD) OR the trailing pair is a
    known ccTLD suffix (PSL_2LABEL). Byte-identical twin of
    ``operators.urlops.registered_domain``."""
    if host is None:
        return None
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    k = (
        3
        if parts[-2] in MULTIPART_SLDS
        or f"{parts[-2]}.{parts[-1]}" in PSL_2LABEL
        else 2
    )
    return ".".join(parts[-k:])


def ip_key(host: str | None, pool: int) -> str | None:
    """Deterministic synthetic server IP of a hostname: hosts hash
    into `pool` shared addresses ("ip-N"). Stands in for a resolver
    cache — co-hosted vhosts (shared CDN edge / shared origin) map to
    one key and must share ONE politeness schedule (the Heritrix /
    IRLbot server-level courtesy rule). md5-of-host, first 15 hex
    chars as int (60 bits, sign-safe), mod pool — byte-identical twin
    of ``operators.urlops.ip_key`` and of the DuckDB Horner-fold
    oracle construction.
    """
    if host is None:
        return None
    import hashlib

    h = int(hashlib.md5(host.encode("utf-8")).hexdigest()[:15], 16)
    return f"ip-{h % pool}"


def resolve_ip(
    host: str | None, pool: int, resolver: dict[str, str] | None = None
) -> str | None:
    """Server address of a hostname under a pluggable resolver cache:
    an explicit host→address mapping (what a deployment's DNS-resolver
    table would broadcast) wins; unmapped hosts fall back to the
    deterministic ``ip_key`` hash so the synthetic world needs no map.
    Twin of the engine's coalesce(resolver-join, ip_key) column."""
    if host is None:
        return None
    if resolver:
        hit = resolver.get(host)
        if hit is not None:
            return hit
    return ip_key(host, pool)


def url_template(url: str) -> str:
    """Pure-python twin of ``operators.urlops.url_template`` (same
    rule, same order: strip scheme://host, strip query, hex>=16 ->
    {h}, digit runs -> {n}); grid-tested byte-identical."""
    path = re.sub(r"^[a-z]+://[^/]+", "", url)
    path = re.sub(r"\?.*$", "", path)
    path = re.sub(r"[0-9a-f]{16,}", "{h}", path)
    return re.sub(r"[0-9]+", "{n}", path)
