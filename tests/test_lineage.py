"""Per-partition lineage (north rule): host shard → fetched URLs →
emitted rows, per round, persisted with the snapshots."""

from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import basic_site


def test_lineage_accounts_for_all_fetches(spark):
    out = crawl_fixture(
        spark, basic_site(),
        CrawlSettings(request_processor_options=RequestProcessorOptions().no_delay()))
    assert out.lineage is not None
    rows = out.lineage.collect()
    assert rows, "lineage deltas missing"
    # lineage fetch totals == metrics fetch totals
    assert (sum(r.fetched for r in rows)
            == sum(m["fetched"] for m in out.metrics))
    # per-round totals line up too
    by_round = {}
    for r in rows:
        by_round[r.round] = by_round.get(r.round, 0) + r.fetched
    for m in out.metrics:
        assert by_round.get(m["round"], 0) == m["fetched"]
    # every fetched host appears
    assert {r.host for r in rows if r.fetched > 0} == {"localhost"}
    # links were emitted and enqueues recorded
    assert sum(r.links_emitted for r in rows) > 0
    assert sum(r.enqueued for r in rows) > 0
