"""Physical-plan invariants: the frontier/fetch path must never read
the payload from parquet (column pruning down to PAGES_META_COLS), and
predicate pushdown must reach the scan. This is the load-bearing
optimization at 100 TB — `bytes` is ~95% of the table."""

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.fetch import fetch_round
from infinitycrawler_spark.settings import RequestProcessorOptions
from infinitycrawler_spark.sources.web import write_fixture_parquet
from infinitycrawler_spark.synth.fixtures import basic_site


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("webpq")
    paths = write_fixture_parquet(spark, basic_site(), str(out))
    return spark.read.parquet(paths["crawl_pages"])


def test_fetch_scan_prunes_payload_columns(spark, pages_parquet):
    frontier = spark.createDataFrame(
        [("http://localhost/", "localhost", 1, 1, 0, 0)],
        schema="url string, host string, url_key long, enqueue_seq long, "
               "depth int, round_enqueued int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    attempts = fetch_round(frontier, pages_parquet, host_state,
                           RequestProcessorOptions().no_delay())
    plan = attempts._jdf.queryExecution().executedPlan().toString()
    read_schemas = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read_schemas, "no parquet scan in the fetch plan"
    for line in read_schemas:
        assert "bytes" not in line, f"payload column read on fetch path: {line}"
        assert "caption" not in line


def test_filter_pushdown_reaches_scan(spark, pages_parquet):
    q = pages_parquet.filter(F.col("host") == "localhost").select("url", "status_code")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "host" in pushed and "IsNotNull" in pushed or "EqualTo" in pushed


def test_meta_projection_reads_four_columns(spark, pages_parquet):
    q = pages_parquet.select(*schemas.PAGES_META_COLS)
    plan = q._jdf.queryExecution().executedPlan().toString()
    line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in schemas.PAGES_META_COLS:
        assert col in line
    assert "bytes" not in line and "links" not in line


def test_host_scope_uses_broadcast_semi_join_not_isin(spark):
    """Large alias sets must plan as a broadcast LeftSemi join, not an
    |hosts|-literal In predicate: isin costs one py4j round-trip per
    host per round and the giant In bloats every downstream plan
    (measured ~2 s/round of driver time at 1 620 hosts)."""
    from infinitycrawler_spark.operators.admission import admit
    from infinitycrawler_spark.settings import CrawlSettings

    hosts = [f"h{i}.shop" for i in range(200)]
    cands = spark.createDataFrame(
        [(f"http://{h}/p", h, "link", 1, 0, 1, False, None) for h in hosts],
        schema="url string, host string, kind string, parent_seq long, "
               "child_pos int, depth int, skip_budget boolean, "
               "moved_chain array<string>")
    seen = spark.createDataFrame([], schema=schemas.SEEN)
    states = spark.createDataFrame([], schema=schemas.STATES)
    scope = spark.createDataFrame([(h,) for h in hosts[:150]], "host string")
    out = admit(cands, seen, states, {}, CrawlSettings(host_aliases=hosts),
                "h0.shop", budget_base=0, seq_base=0, round_no=0,
                exact_order=False, lazy_counts=True, scope_hosts=scope)
    plan = out.frontier_add._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no giant In(...) literal list from the alias set
    assert "h199.shop" not in plan
    # and the scoped rows are exactly the scope-table hosts
    assert out.frontier_add.count() == 150


def test_broadcast_suspect_seen_check_never_shuffles_seen(spark, tmp_path):
    """seen_broadcast_suspects=True: the bloom-positive suspects are
    broadcast against a scan of seen (LeftSemi) and the confirmed hits
    broadcast into the anti-join — no sort/shuffle of the seen table,
    the per-round seen cost at 10^10 URLs is a columnar scan. Results
    must equal the default shuffled-anti-join path exactly."""
    import re

    from infinitycrawler_spark.operators.admission import admit
    from infinitycrawler_spark.settings import CrawlSettings
    from infinitycrawler_spark.state.bloom_store import BloomShardStore

    urls = [f"http://h.shop/p{i}" for i in range(60)]
    cands = spark.createDataFrame(
        [(u, "h.shop", "link", 1, i, 1, False, None)
         for i, u in enumerate(urls)],
        schema="url string, host string, kind string, parent_seq long, "
               "child_pos int, depth int, skip_budget boolean, "
               "moved_chain array<string>")
    seen = spark.createDataFrame([(u,) for u in urls[:30]], "url string") \
        .selectExpr("url", "xxhash64(url) as url_key")
    states = spark.createDataFrame([], schema=schemas.STATES)
    store = BloomShardStore(str(tmp_path), n_buckets=4,
                            capacity_per_bucket=10_000)
    store.rebuild(seen)

    def run(broadcast):
        s = CrawlSettings(host_aliases=["h.shop"],
                          seen_broadcast_suspects=broadcast)
        return admit(cands, seen, states, {}, s, "h.shop", budget_base=0,
                     seq_base=0, round_no=0, exact_order=False,
                     lazy_counts=True, bloom_store=store)

    out = run(True)
    plan = out.frontier_add._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"(SortMergeJoin|ShuffledHashJoin)[^\n]*LeftAnti",
                         plan), plan[:3000]
    assert re.search(r"BroadcastHashJoin[^\n]*LeftSemi", plan), plan[:3000]
    got = {r.url for r in out.frontier_add.collect()}
    want = {r.url for r in run(False).frontier_add.collect()}
    assert got == want == set(urls[30:])
