"""RocksDB state store — the out-of-heap streaming state backend a
100 TB deployment runs (state no longer bounded by executor heap; the
docstrings of the stateful pipelines name it as their scale path).
Spark 4 ships the provider in-box; these tests pin that the engine's
stateful pipelines run UNCHANGED and produce IDENTICAL results under
``RocksDBStateStoreProvider``, so the scale claim is executed, not
aspirational.  The provider conf is a runtime (per-query-start)
setting, so the shared test session can swap it and restore."""

from __future__ import annotations

import pytest

from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
    STREAMING_QUERIES,
)

SF = "/root/testdata/sf0.01"
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.mark.parametrize(
    "name", ["streaming_user_totals_stateful", "streaming_sessions"]
)
def test_stateful_pipelines_identical_under_rocksdb(spark, name):
    """Custom applyInPandasWithState totals and native session_window —
    the two heaviest state shapes — must be value-identical between the
    default (HDFS-backed heap) provider and RocksDB."""
    fn = STREAMING_QUERIES[name]
    default_rows = sorted(tuple(r) for r in fn(spark, SF).collect())
    assert default_rows
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        assert spark.conf.get(_PROVIDER_CONF) == _ROCKSDB
        rocks_rows = sorted(tuple(r) for r in fn(spark, SF).collect())
    finally:
        spark.conf.unset(_PROVIDER_CONF)
    assert rocks_rows == default_rows
