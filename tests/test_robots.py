from __future__ import annotations

import urllib.robotparser

from hypothesis import example, given, settings
from hypothesis import strategies as st

from ccbot_spark import robots


ROBOTS_BODY = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: otherbot
Disallow: /
"""


def test_parse_groups():
    r = robots.parse_robots(ROBOTS_BODY)
    assert r.disallow == ["/private/"]
    assert r.allow == ["/private/ok"]
    assert r.crawl_delay_ms == 2000


def test_specific_agent_wins():
    body = "User-agent: ccbot-spark\nDisallow: /x\nUser-agent: *\nDisallow: /"
    r = robots.parse_robots(body)
    assert r.disallow == ["/x"]


def test_longest_match_and_tie():
    # longest match decides; tie → Allow wins (RFC 9309 §2.2.2)
    assert robots.allowed(["/private/ok"], ["/private/"], "/private/ok/page")
    assert not robots.allowed(["/private/ok"], ["/private/"], "/private/other")
    assert robots.allowed(["/p"], ["/p"], "/page")  # tie → allow
    assert robots.allowed([], [], "/anything")  # no rules → allow


def test_wildcards_and_anchor():
    assert not robots.allowed([], ["/*/secret$"], "/a/secret")
    assert robots.allowed([], ["/*/secret$"], "/a/secret/x")
    assert not robots.allowed([], ["/a*b"], "/aXXXb")


def test_empty_disallow_allows_all():
    r = robots.parse_robots("User-agent: *\nDisallow:")
    assert r.disallow == []
    assert robots.allowed(r.allow, r.disallow, "/x")


def test_path_of():
    assert robots.path_of("http://h.test/p/1?a=2") == "/p/1?a=2"
    assert robots.path_of("http://h.test") == "/"


def test_vectorized_block_matches_scalar_allowed():
    """The politeness UDF's per-rule vectorized matcher must be
    verdict-identical to robots.allowed on every rule shape (plain
    prefix, * wildcard, $ anchor, ties, empty sets) — it is the same
    semantics executed one-pass-per-rule instead of one-call-per-URL."""
    import pandas as pd

    from ccbot_spark.operators import politeness

    rule_sets = [
        ([], []),
        (["/private/ok"], ["/private/"]),
        (["/p"], ["/p"]),
        ([], ["/*/secret$"]),
        ([], ["/a*b"]),
        (["/a/*/c"], ["/a/"]),
        (["/x$"], ["/x"]),
    ]
    paths = [
        "/", "/private/ok/page", "/private/other", "/page", "/a/secret",
        "/a/secret/x", "/aXXXb", "/a/b/c", "/a/zz/c", "/x", "/x/y", "/xy",
    ]
    for allow, disallow in rule_sets:
        rules = politeness._compile_rules(tuple(allow), tuple(disallow))
        got = politeness._allowed_block(rules, pd.Series(paths))
        want = [robots.allowed(allow, disallow, p) for p in paths]
        assert list(got) == want, (allow, disallow)


@given(_rules := st.lists(
    st.from_regex(r"[a-z0-9*$/]{1,8}", fullmatch=True).map(lambda s: "/" + s),
    min_size=0, max_size=4,
), _rules, st.lists(
    st.from_regex(r"[a-z0-9/]{0,10}", fullmatch=True).map(lambda s: "/" + s),
    min_size=1, max_size=8,
))
@settings(max_examples=150, deadline=None)
def test_vectorized_block_property(allow, disallow, paths):
    import pandas as pd

    from ccbot_spark.operators import politeness

    rules = politeness._compile_rules(tuple(allow), tuple(disallow))
    got = politeness._allowed_block(rules, pd.Series(paths))
    want = [robots.allowed(allow, disallow, p) for p in paths]
    assert list(got) == want, (allow, disallow, paths)


_path_seg = st.from_regex(r"[a-z0-9]{1,6}", fullmatch=True)
_path_st = st.lists(_path_seg, min_size=0, max_size=4).map(
    lambda segs: "/" + "/".join(segs)
)
_rules_st = st.lists(_path_st, min_size=0, max_size=4)


@given(_rules_st, _rules_st, _path_st)
@settings(max_examples=200, deadline=None)
@example(allow=["/0"], disallow=["/00"], path="/00")
def test_matches_urllib_robotparser(allow, disallow, path):
    """Wildcard-free subset must agree with the stdlib parser.

    urllib.robotparser is first-match-in-file-order while we implement
    RFC 9309 longest-match (tie → Allow), so the two diverge when a
    shorter rule of one kind precedes a longer rule of the other (e.g.
    ``Allow: /0`` before ``Disallow: /00`` for path ``/00``). Feeding
    urllib the rules sorted longest-first — Allow before Disallow on
    equal length — makes its first-match scan compute exactly the RFC
    longest-match decision, so the property stays a true cross-check of
    the semantics we claim.
    """
    lines = ["User-agent: *"]
    ranked = sorted(
        [("Allow", p) for p in allow if p != "/"]
        + [("Disallow", p) for p in disallow],
        key=lambda kp: (-len(kp[1]), kp[0] != "Allow"),
    )
    lines += [f"{kind}: {p}" for kind, p in ranked]
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(lines)
    r = robots.parse_robots("\n".join(lines))
    want = rp.can_fetch("*", f"http://h.test{path}")
    got = robots.allowed(r.allow, r.disallow, path)
    assert got == want, (allow, disallow, path)


def test_robots_5xx_means_complete_disallow():
    """RFC 9309 §2.3.1.4: a host whose robots.txt request answers a
    server error is completely disallowed — the opposite of the absent-
    file (4xx) case. Pure-python layer: the unreachable set is a
    deterministic slice, and an unreachable host's rules deny every
    path while its declared sitemaps vanish."""
    from ccbot_spark import synthweb

    cfg = synthweb.WebConfig(n_hosts=20, robots_5xx_pct=40)
    hosts = [cfg.host(k) for k in range(20)]
    unreachable = [h for h in hosts if synthweb.robots_unreachable(cfg, h)]
    assert unreachable and len(unreachable) < len(hosts)
    off = synthweb.WebConfig(n_hosts=20)
    assert not any(synthweb.robots_unreachable(off, h) for h in hosts)
