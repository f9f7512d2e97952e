from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ccbot_spark import urlkit


def test_basic_normalization():
    cases = {
        "HTTP://Ex.COM/a/b/../c?b=2&a=1#f": "http://ex.com/a/c?a=1&b=2",
        "http://ex.com:80/": "http://ex.com/",
        "https://ex.com:443/x": "https://ex.com/x",
        "http://ex.com:8080/x": "http://ex.com:8080/x",
        "http://ex.com": "http://ex.com/",
        "http://ex.com//a///b": "http://ex.com/a/b",
        "http://ex.com/a/./b/": "http://ex.com/a/b/",
        "http://ex.com/?utm_source=t&x=1&utm_campaign=c": "http://ex.com/?x=1",
        "http://ex.com/a?fbclid=123": "http://ex.com/a",
    }
    for raw, want in cases.items():
        assert urlkit.normalize_url(raw) == want, raw


def test_rejects_non_http():
    for bad in ["mailto:a@b", "javascript:void(0)", "ftp://x/y", "", None, "#f",
                "data:text/plain,x", "http://", "relative/path"]:
        assert urlkit.normalize_url(bad) is None


def test_resolve_link():
    base = "http://ex.com/a/b"
    assert urlkit.resolve_link(base, "/p/1") == "http://ex.com/p/1"
    assert urlkit.resolve_link(base, "p/1") == "http://ex.com/a/p/1"
    assert urlkit.resolve_link(base, "../z") == "http://ex.com/z"
    assert urlkit.resolve_link(base, "http://o.com/q?utm_source=1") == "http://o.com/q"
    assert urlkit.resolve_link(base, "#top") is None
    assert urlkit.resolve_link(base, "mailto:a@b") is None


_url_st = st.builds(
    lambda scheme, host, port, path, query, frag: (
        f"{scheme}://{host}{port}/{path}{query}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "Http"]),
    st.from_regex(r"[a-zA-Z0-9]{1,10}(\.[a-zA-Z]{2,4}){1,2}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[a-zA-Z0-9_\-./%]{0,30}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?utm_source=x&k=v"]),
    st.sampled_from(["", "#frag"]),
)


@given(_url_st)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(url):
    n1 = urlkit.normalize_url(url)
    if n1 is not None:
        assert urlkit.normalize_url(n1) == n1


def test_vectorized_matches_scalar():
    urls = pd.Series(
        ["HTTP://A.com:80/x/../y?utm_source=1&z=2#f", "bad", None, "https://B.io/"]
    )
    out = urlkit.normalize_series(urls)
    assert list(out) == [urlkit.normalize_url(u) if u else None for u in urls]
    hosts = urlkit.host_series(pd.Series(["http://A.com/x", None]))
    assert list(hosts) == ["a.com", None]


def test_extract_sitemap_urls():
    from ccbot_spark import parsekit

    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url><loc> http://H0.test/p/3 </loc></url>\n"
        "  <url><loc>http://h0.test/p/3</loc></url>\n"  # dup after norm
        "  <url><loc>http://h1.test/p/10?utm=x#f</loc></url>\n"
        "  <url><loc>mailto:a@b.test</loc></url>\n"  # unfetchable
        "</urlset>"
    )
    got = parsekit.extract_sitemap_urls(xml)
    assert got[0] == "http://h0.test/p/3"
    assert len(got) == 2 and got[1].startswith("http://h1.test/p/10")
    assert parsekit.extract_sitemap_urls("") == []


def test_sitemap_xml_deterministic():
    from ccbot_spark import synthweb, parsekit

    cfg = synthweb.WebConfig(n_hosts=2, pages_per_host=40)
    a = synthweb.sitemap_xml(cfg, cfg.host(0))
    assert a == synthweb.sitemap_xml(cfg, cfg.host(0))
    urls = parsekit.extract_sitemap_urls(a)
    assert urls and all(u.startswith("http://h0.test/p/") for u in urls)
    # ascending page order (document order == numeric order)
    nums = [int(u.rsplit("/", 1)[-1]) for u in urls]
    assert nums == sorted(nums)


def test_extract_links_skips_nofollow():
    from ccbot_spark import parsekit

    html = (
        '<a href="/a">a</a>'
        '<a href="/b" rel="nofollow">b</a>'
        '<A HREF="/c" REL="NOFOLLOW">c</A>'
        '<a rel="nofollow" href="/d">d</a>'
        '<a href="/e">e</a>'
    )
    got = parsekit.extract_links("http://h0.test/p/0", html)
    assert got == ["http://h0.test/a", "http://h0.test/e"]


def test_jvm_extract_links_matches_parsekit_nofollow(spark):
    from ccbot_spark import parsekit, synthweb
    from ccbot_spark.operators import fetchparse

    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=40, nofollow_pct=50)
    pages = [f"http://h{k}.test/p/{j}" for k in range(3) for j in range(12)]
    rows = [(u, u.split("/")[2], 5, 0, synthweb.fetch(cfg, u)) for u in pages]
    assert any('rel="nofollow"' in r[4] for r in rows), "fixture needs nofollow"
    df = spark.createDataFrame(
        rows,
        "url_norm string, host string, priority long, sched_time long,"
        " html string",
    )
    got: dict[str, list[str]] = {}
    for r in fetchparse.extract_links(df).collect():
        got.setdefault(r.page_url, []).append(r.url_norm)
    for u, _, _, _, html in rows:
        assert got.get(u, []) == parsekit.extract_links(u, html), u


def test_surt_basic():
    cases = {
        "https://www.news.example.com/a?z=1&a=2": "com,example,news)/a?a=2&z=1",
        "https://www.x.com:8080/a/b?z=1": "com,x:8080)/a/b?z=1",
        "http://example.com": "com,example)/",
        "https://host.co/p/q/": "co,host)/p/q/",
        "HTTPS://UP.Example.COM/Path?b=2&a=1": "com,example,up)/Path?a=1&b=2",
        "https://example.com/?": "com,example)/",
    }
    for raw, want in cases.items():
        assert urlkit.surt(raw) == want, raw
    assert urlkit.surt("not a url") is None
    assert urlkit.surt(None) is None


@given(_url_st)
@settings(max_examples=300, deadline=None)
def test_surt_domain_prefix_property(url):
    # every URL of a host shares the reversed-host prefix up to ')',
    # and the key never contains an unsorted query
    s = urlkit.surt(url)
    if s is None:
        return
    assert ")" in s
    q = s.split("?", 1)
    if len(q) == 2:
        pairs = q[1].split("&")
        assert pairs == sorted(pairs)


def test_registered_domain_psl_families():
    """r5 PSL expansion: explicit ccTLD pairs split at 3 labels; the
    same sld under an unlisted TLD stays a 2-label split; generic
    MULTIPART_SLDS behavior is unchanged (strict superset)."""
    cases = {
        # explicit pairs (sld not a generic label)
        "a.news.go.jp": "news.go.jp",
        "w.x.gob.mx": "x.gob.mx",
        "beehive.govt.nz": "beehive.govt.nz",   # already eTLD+1
        "fan.idv.tw": "fan.idv.tw",
        "shop.or.kr": "shop.or.kr",
        "blog.in.th": "blog.in.th",
        "cdn.web.za": "cdn.web.za",
        "tv.mil.br": "tv.mil.br",
        "site.k12.tr": "site.k12.tr",
        "uni.muni.il": "uni.muni.il",
        "r.waw.pl": "r.waw.pl",
        "biz.go.id": "biz.go.id",
        "deep.a.news.go.jp": "news.go.jp",
        # near-misses: listed sld, unlisted TLD -> plain 2-label rule
        "x.go.com": "go.com",
        "y.gob.test": "gob.test",
        "blog.in.test": "in.test",
        # two labels or fewer: the host itself
        "go.jp": "go.jp",
        "localhost": "localhost",
        # generic labels keep working under ANY TLD (old stub rule)
        "a.example.co.uk": "example.co.uk",
        "b.site.ac.test": "site.ac.test",
    }
    for host, want in cases.items():
        assert urlkit.registered_domain(host) == want, host
    assert urlkit.registered_domain(None) is None
    # the expansion is well-formed: every entry is exactly "sld.tld"
    for pair in urlkit.PSL_2LABEL:
        sld, tld = pair.split(".")
        assert sld and tld


def test_session_id_stripping():
    """Session identifiers are the canonical infinite-alias source: the
    servlet path parameter (;jsessionid=...) and the PHP/J2EE query
    keys must normalize away; lookalike keys must not."""
    from ccbot_spark import urlkit

    n = urlkit.normalize_url
    assert (
        n("http://h0.test/cart;jsessionid=ABC123?x=1")
        == "http://h0.test/cart?x=1"
    )
    assert (
        n("http://h0.test/a;JSESSIONID=zz/b") == "http://h0.test/a/b"
    )
    assert (
        n("http://h0.test/p/1?PHPSESSID=deadbeef&q=2")
        == "http://h0.test/p/1?q=2"
    )
    assert (
        n("http://h0.test/p/1?jsessionid=x") == "http://h0.test/p/1"
    )
    # lookalikes survive: a session key must match the WHOLE key
    assert n("http://h0.test/p?mysessionid=1") == "http://h0.test/p?mysessionid=1"
    assert n("http://h0.test/p?sid=1") == "http://h0.test/p?sid=1"
    # idempotent like every other normalization rule
    u = n("http://h0.test/cart;jsessionid=A?PHPSESSID=b&k=v")
    assert n(u) == u == "http://h0.test/cart?k=v"


def test_url_template_grid_jvm_matches_python(spark):
    """Spark urlops.url_template == urlkit.url_template byte-for-byte
    over a grid covering every collapse rule and its order."""
    from pyspark.sql import functions as F

    from ccbot_spark.operators import urlops

    urls = [
        "https://a.test/product/123/view",
        "https://a.test/u/00000000deadbeef/profile",       # 16 hex -> {h}
        "https://a.test/u/00000000deadbee/profile",        # 15 hex -> digits only
        "https://a.test/a9/b/77?ref=9#frag",
        "https://a.test/static/style.css",
        "http://b.test:8080/x123y456",
        "https://a.test/1234567890123456/x",               # 16 digits: hex wins
        "https://a.test/",
        "https://a.test",
        "https://a.test/abcdefabcdefabcdefX/t",            # broken hex run (X)
        "https://a.test/cal/2024/cal/2024/",
    ]
    want = [urlkit.url_template(u) for u in urls]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.t
        for r in df.select(
            urlops.url_template(F.col("url")).alias("t")
        ).collect()
    ]
    assert got == want
    assert urlkit.url_template("https://a.test/product/123/view") == "/product/{n}/view"
    assert urlkit.url_template("https://a.test/u/00000000deadbeef/profile") == "/u/{h}/profile"
    assert urlkit.url_template("https://a.test/1234567890123456/x") == "/{h}/x"


def test_url_class_first_match_and_plan(spark):
    # precedence: a search URL with page= stays 'search' (rule order);
    # media beats article slug; home only for bare root; all-JVM plan
    from pyspark.sql import functions as F

    from ccbot_spark.operators import urlops

    cases = [
        ("https://a.test/", "home"),
        ("https://a.test", "home"),
        ("https://a.test/x", "other"),
        ("https://a.test/search?page=2&q=x", "search"),  # search beats pagination
        ("https://a.test/my-nice-photo-set.JPG", "media"),  # media beats slug
        ("https://a.test/blog/page/9", "pagination"),
        ("https://a.test/tags/", "tag"),
        ("https://a.test/2023/heads-up", "article"),
        ("https://a.test/one-two-three", "article"),
        ("https://a.test/one-two", "other"),  # needs >= 2 hyphens
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    out = df.select("url", "want", urlops.url_class("url").alias("cls"))
    for r in out.collect():
        assert r.cls == r.want, (r.url, r.cls, r.want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert pynode not in plan, pynode
