"""Distributed max-pages budget (VERDICT r2 §wrong 1): in scale mode
the ``==``-quirk fold (CrawlRunner.cs:154-162) runs as a closed form
over distributed prefix sums — no candidate-proportional driver
collect — and must agree with the literal sequential fold on every
input shape, including the overshoot-via-redirect bug."""

import random

from pyspark.sql import functions as F

from infinitycrawler_spark.operators import admission
from infinitycrawler_spark.operators.admission import (
    _budget_admit_distributed,
    _budget_fold,
)
from infinitycrawler_spark.plans.crawl_job import CrawlJob
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import basic_site


def _cands_df(spark, flags):
    rows = [(i // 7, i % 7, skip, short, short)  # has_state=short for short-circuit
            for i, (skip, short) in enumerate(flags)]
    return spark.createDataFrame(
        rows, "parent_seq long, child_pos int, skip_budget boolean,"
              " has_state boolean, eff_success boolean")


def _check(spark, flags, base, max_pages):
    df = _cands_df(spark, flags)
    got = {(r.parent_seq, r.child_pos)
           for r in _budget_admit_distributed(df, base, max_pages).collect()}
    admitted = _budget_fold(flags, base, max_pages)
    want = {(i // 7, i % 7) for i, a in enumerate(admitted) if a}
    assert got == want, (flags, base, max_pages)


def test_distributed_fold_matches_sequential_fold(spark):
    rng = random.Random(7)
    # directed shapes: saturation, overshoot via skip, shorts at the
    # boundary, skip-only stream past the limit (== never fires)
    shaped = [
        ([(False, False)] * 10, 0, 5),
        ([(False, False)] * 3 + [(True, False)] * 3 + [(False, False)] * 4, 0, 3),
        ([(False, True)] * 4 + [(False, False)] * 6, 0, 3),
        ([(True, False)] * 6 + [(False, False)] * 4, 2, 4),
        ([(False, False), (True, True), (False, True), (True, False)] * 5, 1, 6),
        ([], 0, 3),
        ([(False, False)] * 4, 4, 4),   # already saturated at entry
        ([(True, False)] * 4, 4, 4),    # saturated but only skips → all pass
    ]
    for flags, base, max_pages in shaped:
        _check(spark, flags, base, max_pages)
    for trial in range(12):
        n = rng.randrange(0, 40)
        flags = [(rng.random() < 0.3, rng.random() < 0.2) for _ in range(n)]
        base = rng.randrange(0, 5)
        max_pages = rng.randrange(1, 12)
        _check(spark, flags, base, max_pages)


def test_scale_mode_budget_no_driver_fold(spark, tmp_path, monkeypatch):
    """Scale-mode budget crawls must not touch the driver-side fold
    (the candidate-set collect); the budget still binds exactly."""
    def _boom(*a, **kw):
        raise AssertionError("driver-side budget fold used in scale mode")

    monkeypatch.setattr(admission, "_budget_fold", _boom)
    for max_pages in (2, 4):
        fx = basic_site()
        from infinitycrawler_spark.functions.robots import parse_robots_txt

        job = CrawlJob(
            spark=spark, pages=pages_df(spark, fx),
            robots_map={h: parse_robots_txt(t)
                        for h, t in fx.robots_txt.items()},
            sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
            settings=CrawlSettings(
                max_number_of_pages_to_crawl=max_pages,
                request_processor_options=RequestProcessorOptions().no_delay()),
            store_root=str(tmp_path / f"state{max_pages}"),
            collect_enqueue_log=False, exact_order=False,
            snapshot_every=100, eager_checkpoint=False)
        out = job.run()
        n = out.results.count()
        assert n == max_pages, (max_pages, n)
        # results-unique invariant survives the budget path
        assert (out.results.groupBy("url").count()
                .filter(F.col("count") > 1).count()) == 0
