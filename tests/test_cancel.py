"""O24 cancellation (DefaultRequestProcessor.cs:50,54,94 token checks;
DefaultRequestProcessorTests.cs:72-110): cancel() stops the crawl —
gracefully at a round boundary or by killing the in-flight job group —
and the committed snapshot always resumes to the exact golden result."""

import threading
import time

from infinitycrawler_spark import golden
from infinitycrawler_spark.functions.robots import parse_robots_txt
from infinitycrawler_spark.plans.crawl_job import CrawlCancelled, CrawlJob
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import basic_site


def _settings():
    return CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())


def _job(spark, store_root) -> CrawlJob:
    fx = basic_site()
    return CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=_settings(), store_root=store_root)


def _result_set(out):
    return {(r.url, r.status, r.n_attempts) for r in out.results.collect()}


def test_pre_set_cancel_stops_at_first_boundary(spark, tmp_path):
    job = _job(spark, str(tmp_path / "state"))
    job.cancel()
    out = job.run()  # graceful: behaves like max_rounds at the boundary
    g = golden.crawl(basic_site(), _settings())
    assert out.rounds == 0  # stopped before fetching anything
    # resume on a fresh job completes to the exact golden result
    resumed = _job(spark, str(tmp_path / "state")).run(resume=True)
    assert _result_set(resumed) == {(r.url, r.status, r.n_attempts)
                                    for r in g.results}
    assert {r.url for r in resumed.seen.collect()} == g.seen


def test_mid_run_cancel_then_resume_is_exact(spark, tmp_path):
    """Cancel from another thread at an arbitrary point. Whatever the
    interruption point, resume must converge to the golden result."""
    job = _job(spark, str(tmp_path / "state"))
    outcome = {}

    def run():
        try:
            outcome["out"] = job.run()
        except CrawlCancelled:
            outcome["cancelled"] = True

    t = threading.Thread(target=run)
    t.start()
    time.sleep(4.0)  # somewhere inside the crawl (rounds take seconds)
    job.cancel()
    t.join(timeout=300)
    assert not t.is_alive()
    g = golden.crawl(basic_site(), _settings())
    resumed = _job(spark, str(tmp_path / "state")).run(resume=True)
    assert _result_set(resumed) == {(r.url, r.status, r.n_attempts)
                                    for r in g.results}
    assert {r.url for r in resumed.seen.collect()} == g.seen
    assert resumed.enqueue_log == g.enqueue_order
