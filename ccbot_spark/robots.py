"""robots.txt parsing and matching — RFC 9309 longest-match semantics.

Pure-Python core shared by the oracle crawler and the Spark engine's
vectorized UDF wrapper (SURVEY.md §2.7 `u_robots_parse` /
`u_robots_allow`). Supports the subset the synthetic web emits plus the
RFC 9309 essentials:

  * ``User-agent`` groups (we match group '*' or our agent 'ccbot-spark')
  * ``Allow`` / ``Disallow`` prefix rules with ``*`` wildcard and ``$``
    end-anchor
  * longest-match wins; tie → Allow wins (RFC 9309 §2.2.2)
  * empty Disallow ⇒ allow all
  * ``Crawl-delay`` (non-RFC but ubiquitous; milliseconds resolution here)

Property-tested against ``urllib.robotparser`` for the wildcard-free
subset (tests/test_robots.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

AGENT = "ccbot-spark"


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay_ms: int = 0
    # `Sitemap:` directives are group-independent per RFC 9309 §2.3/
    # sitemaps.org: they apply to every agent, wherever they appear
    sitemaps: list[str] = field(default_factory=list)

    def to_row(self, host: str, budget: int) -> dict:
        return {
            "host": host,
            "allow": list(self.allow),
            "disallow": list(self.disallow),
            "crawl_delay_ms": int(self.crawl_delay_ms),
            "budget_per_cycle": int(budget),
        }


def parse_robots(body: str) -> RobotsRules:
    """Parse a robots.txt body into rules for our agent ('*' fallback)."""
    groups: dict[str, RobotsRules] = {}
    current_agents: list[str] = []
    sitemaps: list[str] = []
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            # group-independent; may appear before any User-agent line
            if val:
                sitemaps.append(val)
            last_was_agent = False
            continue
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            agent = val.lower()
            groups.setdefault(agent, RobotsRules())
            current_agents.append(agent)
            last_was_agent = True
            continue
        last_was_agent = False
        if not current_agents:
            continue
        for agent in current_agents:
            g = groups[agent]
            if key == "disallow":
                if val:
                    g.disallow.append(val)
            elif key == "allow":
                if val:
                    g.allow.append(val)
            elif key == "crawl-delay":
                try:
                    g.crawl_delay_ms = int(float(val) * 1000)
                except ValueError:
                    pass
    # most-specific agent match: exact agent name, else '*'
    rules = groups.get(AGENT) or groups.get("*") or RobotsRules()
    rules.sitemaps = sitemaps
    return rules


def _pattern_len(pat: str) -> int:
    # wildcard chars do not count toward specificity length
    return len(pat.replace("*", "").replace("$", ""))


def _rule_matches(pattern: str, path: str) -> bool:
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    rx = re.escape(pattern).replace(r"\*", ".*")
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    return re.match(rx, path) is not None


def allowed(rules_allow: list[str], rules_disallow: list[str], path: str) -> bool:
    """RFC 9309 longest-match: most specific matching rule decides; tie → allow."""
    if not path.startswith("/"):
        path = "/" + path
    best_len = -1
    best_allow = True  # no rule matches ⇒ allowed
    for pat in rules_disallow or []:
        if _rule_matches(pat, path):
            plen = _pattern_len(pat)
            if plen > best_len:
                best_len, best_allow = plen, False
    for pat in rules_allow or []:
        if _rule_matches(pat, path):
            plen = _pattern_len(pat)
            if plen >= best_len:  # tie → Allow wins
                best_len, best_allow = plen, True
    return best_allow


def path_of(url_norm: str) -> str:
    """Path+query portion of a normalized URL (what robots rules match)."""
    # normalized form is scheme://host[:port]/path[?query]
    i = url_norm.find("/", url_norm.find("://") + 3)
    return url_norm[i:] if i >= 0 else "/"
