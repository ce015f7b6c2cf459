"""robots.txt rule evaluation + page-level robots directives.

The reference delegates to TurnerSoftware.RobotsExclusionTools
(fetch/parse at /root/reference/src/InfinityCrawler/Crawler.cs:49,
per-URI gate at Internal/CrawlRunner.cs:200, page rules at
CrawlRunner.cs:96-121). We re-implement the observable semantics:

- group selection: exact user-agent token match, else ``*`` group;
- path rules: RFC 9309 longest-match wins, Allow beats Disallow on tie;
- crawl-delay merge with the reference's units bug replicated behind a
  flag (Crawler.cs:81-93; bug at :88 — seconds used as milliseconds);
- page rules (X-Robots-Tag header + <meta name=robots>): optional
  ``agent:`` prefix scopes a rule; noindex/nofollow/none evaluated
  case-insensitively (CrawlRunner.cs:96-127).

Rules are carried as data (the broadcast ``robots_rules`` table, one row
per host+user_agent with allow/disallow arrays) so evaluation is a
vectorized operation over Arrow batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache


@lru_cache(maxsize=4096)
def _compiled_rule(rule: str):
    """Compile an RFC 9309 path rule with ``*`` (any sequence) and a
    trailing ``$`` (end anchor) into a start-anchored regex. Returns
    None for plain rules (prefix match is cheaper and equivalent)."""
    if "*" not in rule and not rule.endswith("$"):
        return None
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pattern = ".*".join(re.escape(piece) for piece in body.split("*"))
    return re.compile(pattern + ("$" if anchored else ""))


def rule_match_len(rule: str, path: str) -> int:
    """RFC 9309 §2.2.2 precedence: if ``rule`` matches ``path``, return
    its specificity (octet length of the rule, wildcards counted as
    written — the de-facto standard shared by Google's parser); -1 if it
    doesn't match. Plain rules are prefix matches; ``*`` matches any
    char sequence; a trailing ``$`` anchors the end of the path."""
    if not rule:
        return -1
    rx = _compiled_rule(rule)
    if rx is None:
        return len(rule) if path.startswith(rule) else -1
    return len(rule) if rx.match(path) else -1


class CompiledRuleset:
    """One host's (allow, disallow) rules compiled for per-row reuse:
    plain prefix rules go into a character trie (one O(len(path)) walk
    replaces n_rules startswith calls), wildcard/``$`` rules keep their
    compiled regexes in a side list (rare in real robots files). The
    decision is identical to the per-rule loop: longest matching rule
    wins, Allow beats Disallow on ties.

    Built once per host per executor (the matcher cache in
    operators/admission.py), so rule-heavy hosts (1k+ rules) cost
    compilation once instead of a full rule walk per candidate row."""

    __slots__ = ("trie", "wild", "empty")

    #: trie terminal markers (avoid clashing with path characters —
    #: paths never contain NUL)
    _A = "\0a"
    _D = "\0d"

    def __init__(self, allow, disallow):
        self.trie: dict = {}
        self.wild: list = []
        n = 0
        for rules, is_allow in ((allow, True), (disallow, False)):
            # rules may be a numpy array (Arrow batch) — no truthiness
            for rule in (rules if rules is not None else ()):
                if not rule:
                    continue
                n += 1
                rx = _compiled_rule(rule)
                if rx is not None:
                    self.wild.append((rx, len(rule), is_allow))
                    continue
                node = self.trie
                for ch in rule:
                    node = node.setdefault(ch, {})
                node[self._A if is_allow else self._D] = True
        self.empty = n == 0

    def is_allowed(self, path: str) -> bool:
        if self.empty:
            return True
        best, allowed = -1, True
        node = self.trie
        depth = 0
        for ch in path:
            node = node.get(ch)
            if node is None:
                break
            depth += 1
            if self._A in node:
                if depth > best or (depth == best and not allowed):
                    best, allowed = depth, True
            elif self._D in node:
                if depth > best:
                    best, allowed = depth, False
        for rx, rlen, is_allow in self.wild:
            if rx.match(path):
                if rlen > best or (rlen == best and is_allow and not allowed):
                    best, allowed = rlen, is_allow
        return allowed


@dataclass
class RobotsGroup:
    user_agent: str = "*"
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay_s: int | None = None


@dataclass
class RobotsFile:
    """Per-host parsed robots.txt: user-agent → group."""

    groups: dict[str, RobotsGroup] = field(default_factory=dict)

    def group_for(self, user_agent: str) -> RobotsGroup | None:
        ua = user_agent.lower()
        # exact product-token match first (reference lib matches the UA
        # string against group tokens), else the wildcard group
        for token, group in self.groups.items():
            if token != "*" and token.lower() in ua:
                return group
        return self.groups.get("*")

    def is_allowed(self, path: str, user_agent: str) -> bool:
        """RFC 9309 longest-match-wins with ``*``/``$`` wildcard rules
        (the reference's RobotsExclusionTools handles these; real
        robots.txt files use them constantly). Allow wins ties."""
        group = self.group_for(user_agent)
        if group is None:
            return True
        best_len = -1
        allowed = True
        for rule in group.allow:
            m = rule_match_len(rule, path)
            if m > best_len:
                best_len, allowed = m, True
        for rule in group.disallow:
            m = rule_match_len(rule, path)
            if m > best_len:  # tie → Allow wins (strict >)
                best_len, allowed = m, False
        return allowed

    def crawl_delay_for(self, user_agent: str) -> int | None:
        group = self.group_for(user_agent)
        return group.crawl_delay_s if group else None


def parse_robots_txt(text: str) -> RobotsFile:
    """Minimal RFC 9309 parser (enough for fixture + synthetic corpora)."""
    robots = RobotsFile()
    current: list[RobotsGroup] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_ua:
                current = []
            group = robots.groups.setdefault(value, RobotsGroup(user_agent=value))
            current.append(group)
            last_was_ua = True
            continue
        last_was_ua = False
        for group in current:
            if key == "allow":
                group.allow.append(value)
            elif key == "disallow":
                if value:
                    group.disallow.append(value)
            elif key == "crawl-delay":
                try:
                    group.crawl_delay_s = int(float(value))
                except ValueError:
                    pass
    return robots


def merged_crawl_delay_ms(
    crawl_delay_s: int | None,
    delay_between_request_start_ms: int,
    bug_compatible: bool = True,
) -> int:
    """Crawler.cs:81-93. With ``bug_compatible`` (default, matching the
    reference binary): `CrawlDelay ?? 0 * 1000` → the robots *seconds*
    value is used directly as *milliseconds*. Spec-correct mode
    multiplies by 1000."""
    if crawl_delay_s is None:
        robots_ms = 0
    elif bug_compatible:
        robots_ms = crawl_delay_s
    else:
        robots_ms = crawl_delay_s * 1000
    return max(robots_ms, delay_between_request_start_ms)


# ------------------------------------------------------------- page robots

def _rule_applies(rule: str, user_agent: str) -> str | None:
    """Return the directive part of a page-robots rule if it applies to
    this user agent, else None. Rules may be 'noindex' (global) or
    'botname: noindex' (agent-scoped)."""
    rule = rule.strip()
    if ":" in rule:
        agent, _, directive = rule.partition(":")
        agent = agent.strip().lower()
        # header values like "unavailable_after: ..." are directives, not
        # agent scopes; treat a prefix as an agent only if it has no space
        if " " not in agent and agent:
            if agent in user_agent.lower():
                return directive.strip().lower()
            return None
    return rule.lower()


def evaluate_page_robots(rules: list[str] | None, user_agent: str) -> tuple[bool, bool]:
    """(can_index, can_follow) per CrawlRunner.cs:96-127 semantics."""
    can_index = True
    can_follow = True
    for rule in rules or []:
        directive = _rule_applies(rule, user_agent)
        if directive is None:
            continue
        tokens = [t.strip() for t in directive.replace(";", ",").split(",")]
        for token in tokens:
            if token == "noindex":
                can_index = False
            elif token == "nofollow":
                can_follow = False
            elif token == "none":
                can_index = False
                can_follow = False
    return can_index, can_follow
