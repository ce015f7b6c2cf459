"""Round-4 hardening: exact-order scale guard, results-delta schema
evolution on resume (mergeSchema), and null-buffer Arrow binary columns
in the arrow parse engine (ADVICE r3 items 1/3 + VERDICT r3 item 6)."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.admission import admit
from infinitycrawler_spark.operators.parse import _binary_views
from infinitycrawler_spark.settings import CrawlSettings
from infinitycrawler_spark.state.store import SnapshotStore


def test_exact_order_guard_refuses_large_rounds(spark):
    """exact_order sequences each round through a single-partition
    global window; admission must refuse loudly (not serialize silently)
    when a round admits more candidates than the configured cap."""
    rows = [(f"http://h/p{i}", "h", "link", 0, i, 1, False, None)
            for i in range(5)]
    cands = spark.createDataFrame(rows, schema=schemas.CANDIDATES)
    seen = spark.createDataFrame([], schema=schemas.SEEN)
    states = spark.createDataFrame([], schema=schemas.STATES)
    settings = CrawlSettings(exact_order_max_candidates=2)
    with pytest.raises(ValueError, match="exact_order_max_candidates"):
        admit(cands, seen, states, {}, settings, "h",
              budget_base=0, seq_base=0, round_no=1, exact_order=True)
    # same shape passes with the guard disabled and below the limit
    for s in (CrawlSettings(exact_order_max_candidates=0),
              CrawlSettings(exact_order_max_candidates=5)):
        out = admit(cands, seen, states, {}, s, "h",
                    budget_base=0, seq_base=0, round_no=1, exact_order=True)
        assert out.n_enqueued == 5
        out.cached.unpersist()


def test_results_delta_merge_schema_on_resume(spark, tmp_path):
    """A resumed crawl over a pre-upgrade store unions old-schema and
    new-schema results deltas; the new nullable columns must survive
    (null for old rows) regardless of file enumeration order."""
    store = SnapshotStore(str(tmp_path / "store"))
    old = spark.createDataFrame([("http://h/a", "Crawled")],
                                "url string, status string")
    new = spark.createDataFrame(
        [("http://h/b", "Crawled", [["r1", "r2"]])],
        "url string, status string, page_robot_rules array<array<string>>"
    ).select("url", "status", F.col("page_robot_rules")[0]
             .alias("page_robot_rules"))
    store.commit(0, tables={}, deltas={"results": old})
    store.commit(1, tables={}, deltas={"results": new})
    merged = store.read_deltas(spark, 1, "results")
    assert "page_robot_rules" in merged.columns
    rows = {r.url: r.page_robot_rules for r in merged.collect()}
    assert rows["http://h/a"] is None
    assert list(rows["http://h/b"]) == ["r1", "r2"]


def test_binary_views_null_buffers():
    """An all-null Binary array materialized with null offsets/data
    buffers must yield per-row Nones, not a frombuffer TypeError.
    pyarrow's own constructors validate such buffers away, but foreign
    producers (IPC from other engines, older writers) can ship them —
    mimic the degenerate layout with a minimal stand-in exposing the
    exact surface _binary_views reads."""

    class _NullBufArray:
        type = pa.binary()
        offset = 0
        null_count = 2

        def __len__(self):
            return 2

        def buffers(self):
            return [None, None, None]

    assert _binary_views(_NullBufArray()) == [None, None]
    # regular arrays still slice zero-copy
    reg = pa.array([b"ab", None, b"c"], type=pa.binary())
    views = _binary_views(reg)
    assert bytes(views[0]) == b"ab" and views[1] is None
    assert bytes(views[2]) == b"c"
    # all-null through the normal constructor (offsets present) too
    nn = pa.array([None, None], type=pa.binary())
    assert _binary_views(nn) == [None, None]
    assert _binary_views(pa.chunked_array([nn])) == [None, None]
