"""Robots-as-data: admission gated by a broadcast ROBOTS_RULES table
must match the driver-dict path exactly (per-host, wildcards, UA group
selection) — the scale path for unbounded host counts."""

import pytest

from infinitycrawler_spark import golden
from infinitycrawler_spark.operators.admission import select_robots_group
from infinitycrawler_spark.plans.crawl_job import CrawlJob
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df, robots_rules_df
from infinitycrawler_spark.synth.fixtures import WebFixture, _link, _page


def _fixture() -> WebFixture:
    pages = [
        _page("http://a.shop/", links=[
            _link("/ok.html"), _link("/private/x.html"), _link("/p.php"),
            _link("http://b.shop/"), _link("http://b.shop/deny/z.html")]),
        _page("http://a.shop/ok.html"),
        _page("http://a.shop/private/x.html"),
        _page("http://a.shop/p.php"),
        _page("http://b.shop/"),
        _page("http://b.shop/deny/z.html"),
    ]
    return WebFixture(
        name="robots-table", pages=pages,
        robots_txt={
            "a.shop": ("User-agent: megabot\nDisallow: /private/\n"
                       "Disallow: /*.php$\n\nUser-agent: *\nDisallow: /\n"),
            "b.shop": "User-agent: *\nDisallow: /deny/\n",
        },
        sitemap_urls=[], seed_uri="http://a.shop/",
        host_aliases=["b.shop"])


def _settings():
    return CrawlSettings(
        user_agent="megabot/2.0",
        host_aliases=["b.shop"],
        request_processor_options=RequestProcessorOptions().no_delay())


@pytest.fixture(scope="module")
def table_crawl(spark, tmp_path_factory):
    fx = _fixture()
    from infinitycrawler_spark.functions.robots import parse_robots_txt

    rules = robots_rules_df(spark, fx)
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={}, robots_rules=rules, per_host_robots=True,
        sitemap_urls=[], seed_uri=fx.seed_uri, settings=_settings(),
        store_root=str(tmp_path_factory.mktemp("robots_table")))
    return job.run()


def test_group_selection_prefers_specific_token(spark):
    rules = robots_rules_df(spark, _fixture())
    sel = {r.host: r for r in
           select_robots_group(rules, "megabot/2.0").collect()}
    assert sel["a.shop"].user_agent == "megabot"   # specific beats '*'
    assert sel["b.shop"].user_agent == "*"
    other = {r.host: r.user_agent for r in
             select_robots_group(rules, "otherbot").collect()}
    assert other["a.shop"] == "*"


def test_table_robots_matches_dict_path(spark, table_crawl):
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import crawl_fixture

    dict_out = crawl_fixture(spark, _fixture(), _settings(),
                             per_host_robots=True)
    got_t = {(r.url, r.status, r.n_attempts)
             for r in table_crawl.results.collect()}
    got_d = {(r.url, r.status, r.n_attempts)
             for r in dict_out.results.collect()}
    assert got_t == got_d
    assert ({r.url for r in table_crawl.seen.collect()}
            == {r.url for r in dict_out.seen.collect()})
    assert table_crawl.enqueue_log == dict_out.enqueue_log


def test_table_robots_gating_semantics(table_crawl):
    by = {r.url: r.status for r in table_crawl.results.collect()}
    assert by["http://a.shop/ok.html"] == "Crawled"
    assert by["http://a.shop/private/x.html"] == "RobotsBlocked"
    assert by["http://a.shop/p.php"] == "RobotsBlocked"      # wildcard $
    assert by["http://b.shop/"] == "Crawled"                  # '*' group
    assert by["http://b.shop/deny/z.html"] == "RobotsBlocked"
