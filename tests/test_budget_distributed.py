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


def _cands_df(spark, flags, keys=None):
    # url is the deterministic tiebreaker in the distributed key; i is
    # zero-padded so lexicographic url order == list order
    keys = keys or [(i // 7, i % 7) for i in range(len(flags))]
    rows = [(ps, cp, f"u{i:04d}", skip, short, short)
            for i, ((skip, short), (ps, cp)) in enumerate(zip(flags, keys))]
    return spark.createDataFrame(
        rows, "parent_seq long, child_pos int, url string,"
              " skip_budget boolean, has_state boolean, eff_success boolean")


def _check(spark, flags, base, max_pages, keys=None):
    df = _cands_df(spark, flags, keys)
    got = {r.url
           for r in _budget_admit_distributed(df, base, max_pages).collect()}
    admitted = _budget_fold(flags, base, max_pages)
    want = {f"u{i:04d}" for i, a in enumerate(admitted) if a}
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


def test_distributed_fold_cross_host_seq_ties(spark):
    """Scale mode assigns enqueue_seq per host, so two parents on
    different hosts can share (parent_seq, child_pos). The url
    tiebreaker must keep the boundary predicates exact when the budget
    saturates exactly between two tied rows (ADVICE r3)."""
    rng = random.Random(11)
    # every row shares the same (parent_seq, child_pos) — only the url
    # tiebreaker orders them
    for n, base, max_pages in [(6, 0, 3), (8, 2, 5), (10, 0, 1)]:
        flags = [(False, False)] * n
        keys = [(5, 2)] * n
        _check(spark, flags, base, max_pages, keys)
    # mixed: tied groups with skips/shorts at the saturation boundary
    for trial in range(8):
        n = rng.randrange(2, 30)
        flags = [(rng.random() < 0.3, rng.random() < 0.2) for _ in range(n)]
        # few distinct keys → lots of ties; keys nondecreasing so list
        # order == (key, url) order
        keys, k = [], (0, 0)
        for _ in range(n):
            if rng.random() < 0.3:
                k = (k[0] + rng.randrange(0, 2), rng.randrange(0, 3))
            keys.append(k)
        keys.sort()
        _check(spark, flags, rng.randrange(0, 4), rng.randrange(1, 10), keys)


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
