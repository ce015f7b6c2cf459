"""The mapInArrow parse engine (zero-copy payload slices) must be
row-for-row identical to the mapInPandas fallback — including payload
validation outputs, nested links, robots rules, and raw-bytes mode."""

import os

import pytest

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.fetch import fetch_round, split_attempts
from infinitycrawler_spark.operators.parse import parse_round
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import basic_site


def _successes(spark, fx):
    pages = pages_df(spark, fx)
    frontier = pages.selectExpr(
        "url", "host",
        "row_number() over (order by url) as enqueue_seq",
        "cast(0 as int) as depth")
    attempts = fetch_round(
        frontier, pages.select(*schemas.PAGES_META_COLS),
        spark.createDataFrame([], schema=schemas.HOST_STATE),
        RequestProcessorOptions().no_delay())
    rows, _ = split_attempts(attempts, None)
    return rows.filter("error is null and status_code between 200 and 299"), pages


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        d["robots_rules"] = tuple(d["robots_rules"] or [])
        d["links"] = tuple(tuple(sorted(l.items())) for l in (d["links"] or []))
        out.append(tuple(sorted(d.items())))
    return sorted(out)


@pytest.mark.parametrize("validate", [True, False])
def test_arrow_engine_matches_pandas_engine(spark, monkeypatch, validate):
    fx = basic_site()
    settings = CrawlSettings(
        validate_payload=validate,
        request_processor_options=RequestProcessorOptions().no_delay())
    successes, pages = _successes(spark, fx)
    successes = successes.cache()
    try:
        monkeypatch.setenv("SPARK_GRAFT_PARSE", "arrow")
        arrow = _rows(parse_round(successes, pages, settings))
        monkeypatch.setenv("SPARK_GRAFT_PARSE", "pandas")
        pandas = _rows(parse_round(successes, pages, settings))
    finally:
        successes.unpersist()
    assert len(arrow) > 0
    assert arrow == pandas


def test_arrow_engine_bytes_mode(spark, monkeypatch):
    """Raw-HTML body pages through the arrow engine: extract + raw
    content decode identical to the pandas engine."""
    fx = basic_site()
    for p in fx.pages:
        # synthesize a body for every page; html extraction overrides
        # the structured columns, so both engines must agree on it
        p["body"] = (b"<html><head><meta name='robots' content='all'>"
                     b"</head><body><a href='x.html' rel='me'>X</a>"
                     b"</body></html>")
        p["links"] = None
        p["base_href"] = None
        p["robots_meta"] = None
    settings = CrawlSettings(
        validate_payload=False,
        request_processor_options=RequestProcessorOptions().no_delay())
    successes, pages = _successes(spark, fx)
    successes = successes.cache()
    try:
        monkeypatch.setenv("SPARK_GRAFT_PARSE", "arrow")
        arrow = _rows(parse_round(successes, pages, settings))
        monkeypatch.setenv("SPARK_GRAFT_PARSE", "pandas")
        pandas = _rows(parse_round(successes, pages, settings))
    finally:
        successes.unpersist()
    assert len(arrow) > 0
    assert arrow == pandas
    # raw_content survived the zero-copy path
    assert any(dict(r).get(("raw_content"))  # noqa: SIM118
               for r in [dict(t) for t in arrow])


def test_pandas_is_default_engine():
    # default chosen by interleaved A/B at the bench payload size
    # (BENCH/BASELINE.md §3); arrow stays available for large payloads
    assert os.environ.get("SPARK_GRAFT_PARSE", "pandas") == "pandas"
