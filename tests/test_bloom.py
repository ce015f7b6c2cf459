"""Bloom filter unit tests + the crucial invariant: the pre-filter never
changes crawl semantics (no false negatives; positives fall through to
the exact anti-join)."""

import numpy as np
from hypothesis import given, settings as hsettings, strategies as st

from infinitycrawler_spark import golden
from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.state.bloom import BloomFilter
from infinitycrawler_spark.synth.fixtures import basic_site


def test_no_false_negatives():
    bloom = BloomFilter(10_000)
    keys = np.arange(-5000, 5000, dtype=np.int64) * 7919
    bloom.add_many(keys)
    assert bloom.contains_many(keys).all()


def test_fp_rate_reasonable():
    rng = np.random.default_rng(42)
    bloom = BloomFilter(10_000, fp_rate=0.01)
    present = rng.integers(-2**62, 2**62, 10_000, dtype=np.int64)
    bloom.add_many(present)
    absent = rng.integers(-2**62, 2**62, 20_000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    fp = bloom.contains_many(absent).mean()
    assert fp < 0.05


def test_serialization_roundtrip_and_merge():
    a = BloomFilter(1000)
    b = BloomFilter(1000)
    ka = np.array([1, 2, 3], dtype=np.int64)
    kb = np.array([7, 8, 9], dtype=np.int64)
    a.add_many(ka)
    b.add_many(kb)
    restored = BloomFilter.from_bytes(a.to_bytes())
    assert restored.contains_many(ka).all()
    merged = a.merge(b)
    assert merged.contains_many(np.concatenate([ka, kb])).all()


@hsettings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=1, max_size=200))
def test_property_membership(keys):
    bloom = BloomFilter(500)
    arr = np.array(keys, dtype=np.int64)
    bloom.add_many(arr)
    assert bloom.contains_many(arr).all()


def test_crawl_with_and_without_bloom_identical(spark):
    # bloom_min_seen=0 forces the sharded-Bloom check/update path from
    # round 0 (default gate would leave it dormant at fixture scale)
    s = CrawlSettings(request_processor_options=RequestProcessorOptions().no_delay())
    with_bloom = crawl_fixture(spark, basic_site(), s, use_bloom=True,
                               bloom_min_seen=0)
    g = golden.crawl(basic_site(), s)
    got = {(r.url, r.status, r.n_attempts) for r in with_bloom.results.collect()}
    want = {(r.url, r.status, r.n_attempts) for r in g.results}
    assert got == want
    assert {r.url for r in with_bloom.seen.collect()} == g.seen
    assert with_bloom.enqueue_log == g.enqueue_order


def test_bloom_shard_store_roundtrip(spark, tmp_path):
    """Distributed fold + membership UDF: every folded key reads back
    maybe-seen=True (superset invariant); unseen keys mostly False."""
    import pyspark.sql.functions as F

    from infinitycrawler_spark.state.bloom_store import BloomShardStore

    store = BloomShardStore(str(tmp_path), n_buckets=8,
                            capacity_per_bucket=10_000)
    seen = spark.range(1000).select(
        F.concat(F.lit("http://h/p"), "id").alias("url"),
        F.xxhash64(F.concat(F.lit("http://h/p"), "id")).alias("url_key"))
    n = store.update(seen)
    assert n == 1000
    checked = seen.withColumn("maybe", store.maybe_seen_udf()(F.col("url_key")))
    assert checked.filter(~F.col("maybe")).count() == 0  # no false negatives
    fresh = spark.range(1000, 3000).select(
        F.xxhash64(F.concat(F.lit("http://h/x"), "id")).alias("url_key"))
    fp = fresh.withColumn("maybe", store.maybe_seen_udf()(F.col("url_key")))
    assert fp.filter(F.col("maybe")).count() < 200  # fp rate sane


def test_bloom_gate_crossing_is_equivalent(spark):
    """A crawl that crosses bloom_min_seen mid-run (rebuild-then-
    incremental) matches the golden interpreter exactly."""
    s = CrawlSettings(request_processor_options=RequestProcessorOptions().no_delay())
    crossing = crawl_fixture(spark, basic_site(), s, use_bloom=True,
                             bloom_min_seen=5)  # crossed after round 0
    g = golden.crawl(basic_site(), s)
    got = {(r.url, r.status, r.n_attempts) for r in crossing.results.collect()}
    assert got == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in crossing.seen.collect()} == g.seen


def test_crawl_with_broadcast_suspect_check_identical(spark):
    """seen_broadcast_suspects must not change crawl semantics — the
    broadcast scan path is a pure physical-strategy swap."""
    s = CrawlSettings(seen_broadcast_suspects=True,
                      request_processor_options=RequestProcessorOptions().no_delay())
    out = crawl_fixture(spark, basic_site(), s, use_bloom=True,
                        bloom_min_seen=0)
    g = golden.crawl(basic_site(), s)
    got = {(r.url, r.status, r.n_attempts) for r in out.results.collect()}
    assert got == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in out.seen.collect()} == g.seen
    assert out.enqueue_log == g.enqueue_order
