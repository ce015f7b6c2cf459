"""robots.txt + page-robots semantics (CrawlRunner.cs:96-127,200-213;
Crawler.cs:81-93 crawl-delay merge incl. the units bug)."""

from infinitycrawler_spark.functions.robots import (
    evaluate_page_robots,
    merged_crawl_delay_ms,
    parse_robots_txt,
)


def test_parse_and_match_basic_site():
    robots = parse_robots_txt("User-agent: *\nDisallow: /robots-blocked.html\n")
    assert not robots.is_allowed("/robots-blocked.html", "anybot")
    assert robots.is_allowed("/index.html", "anybot")
    assert robots.is_allowed("/", "anybot")


def test_longest_match_allow_wins():
    robots = parse_robots_txt(
        "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n")
    assert not robots.is_allowed("/private/x", "bot")
    assert robots.is_allowed("/private/public/x", "bot")


def test_agent_specific_group():
    robots = parse_robots_txt(
        "User-agent: goodbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n")
    assert robots.is_allowed("/x", "goodbot/1.0")
    assert not robots.is_allowed("/x", "otherbot")


def test_wildcard_star():
    # RFC 9309 §2.2.3: '*' matches any sequence of characters
    robots = parse_robots_txt("User-agent: *\nDisallow: /*.php\n")
    assert not robots.is_allowed("/index.php", "bot")
    assert not robots.is_allowed("/a/b/page.php?x=1", "bot")
    assert robots.is_allowed("/index.html", "bot")


def test_wildcard_end_anchor():
    robots = parse_robots_txt("User-agent: *\nDisallow: /*.php$\n")
    assert not robots.is_allowed("/index.php", "bot")
    assert robots.is_allowed("/index.php?x=1", "bot")  # not at end
    assert robots.is_allowed("/index.phpx", "bot")


def test_wildcard_longest_match_precedence():
    # fishery page: Allow '/fishery' (8 octets) beats Disallow '/fish'
    # (5); wildcard Disallow '/fish*.xml' (10) beats both where it hits
    robots = parse_robots_txt(
        "User-agent: *\nDisallow: /fish\nAllow: /fishery\n"
        "Disallow: /fishery*.xml\n")
    assert not robots.is_allowed("/fish/salmon", "bot")
    assert robots.is_allowed("/fishery/salmon", "bot")
    assert not robots.is_allowed("/fishery/feed.xml", "bot")


def test_wildcard_allow_wins_tie():
    robots = parse_robots_txt(
        "User-agent: *\nAllow: /p/*.html\nDisallow: /p/*.html\n")
    assert robots.is_allowed("/p/x.html", "bot")


def test_wildcard_mid_dollar_is_anchor_only_at_end():
    # '$' only anchors as the final char; leading '*' collapses
    robots = parse_robots_txt("User-agent: *\nDisallow: /**/private$\n")
    assert not robots.is_allowed("/a/private", "bot")
    assert robots.is_allowed("/a/private/x", "bot")


def test_crawl_delay_parse_and_merge():
    robots = parse_robots_txt("User-agent: *\nCrawl-delay: 5\nDisallow: /x\n")
    assert robots.crawl_delay_for("bot") == 5
    # reference bug (Crawler.cs:88): seconds used as ms → max(5, 1000) = 1000
    assert merged_crawl_delay_ms(5, 1000, bug_compatible=True) == 1000
    # spec-correct: 5000ms beats the 1000ms default
    assert merged_crawl_delay_ms(5, 1000, bug_compatible=False) == 5000
    assert merged_crawl_delay_ms(None, 700) == 700


def test_page_robots_evaluation():
    assert evaluate_page_robots(["noindex"], "bot") == (False, True)
    assert evaluate_page_robots(["nofollow"], "bot") == (True, False)
    assert evaluate_page_robots(["noindex, nofollow"], "bot") == (False, False)
    assert evaluate_page_robots(["none"], "bot") == (False, False)
    assert evaluate_page_robots([], "bot") == (True, True)
    assert evaluate_page_robots(None, "bot") == (True, True)


def test_page_robots_agent_scoped():
    # RobotsController.cs:34-61 header-bot-specific semantics
    rules = ["onebot: noindex", "twobot: nofollow"]
    assert evaluate_page_robots(rules, "onebot/2.1") == (False, True)
    assert evaluate_page_robots(rules, "twobot") == (True, False)
    assert evaluate_page_robots(rules, "threebot") == (True, True)


# ---------------------------------------------- compiled matcher parity

def _naive_is_allowed(allow, disallow, path):
    """The original per-rule scan (admission.py pre-r4) — the semantic
    reference for CompiledRuleset."""
    from infinitycrawler_spark.functions.robots import rule_match_len

    best, ok = -1, True
    for rule in allow:
        m = rule_match_len(rule, path)
        if m > best:
            best, ok = m, True
    for rule in disallow:
        m = rule_match_len(rule, path)
        if m > best:  # tie → Allow wins
            best, ok = m, False
    return ok


def test_compiled_ruleset_matches_naive_scan_property():
    import random

    from infinitycrawler_spark.functions.robots import CompiledRuleset

    rng = random.Random(5)
    segs = ["a", "bb", "ccc", "img", "x1", "private", "p"]

    def rand_rule():
        r = "/" + "/".join(rng.choice(segs)
                           for _ in range(rng.randrange(1, 4)))
        if rng.random() < 0.3:
            i = rng.randrange(1, len(r))
            r = r[:i] + "*" + r[i:]
        if rng.random() < 0.2:
            r += "$"
        return r

    for trial in range(60):
        allow = [rand_rule() for _ in range(rng.randrange(0, 8))]
        disallow = [rand_rule() for _ in range(rng.randrange(0, 8))]
        m = CompiledRuleset(allow, disallow)
        for _ in range(25):
            path = "/" + "/".join(rng.choice(segs)
                                  for _ in range(rng.randrange(0, 5)))
            want = _naive_is_allowed(allow, disallow, path)
            got = m.is_allowed(path)
            assert got == want, (allow, disallow, path, got, want)


def test_compiled_ruleset_directed_cases():
    from infinitycrawler_spark.functions.robots import CompiledRuleset

    # allow wins equal-length tie, trie vs trie
    m = CompiledRuleset(["/a/b"], ["/a/b"])
    assert m.is_allowed("/a/b/c")
    # longer disallow beats shorter allow
    m = CompiledRuleset(["/a"], ["/a/b"])
    assert m.is_allowed("/a/x") and not m.is_allowed("/a/b/x")
    # wildcard disallow vs plain allow, lengths counted as written
    m = CompiledRuleset(["/img"], ["/*.png$"])
    assert not m.is_allowed("/x.png")      # only wildcard matches
    # /img (len 4) < /*.png$ (len 7, wildcards counted as written) →
    # the disallow wins even though the allow also matches
    assert not m.is_allowed("/img.png")
    assert m.is_allowed("/img.png") == _naive_is_allowed(
        ["/img"], ["/*.png$"], "/img.png")
    # empty ruleset allows everything
    assert CompiledRuleset([], []).is_allowed("/anything")
    assert CompiledRuleset(None, None).is_allowed("/anything")
