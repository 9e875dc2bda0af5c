"""Hypothesis property tests (SURVEY.md §5.2): random (n, Δ, seed)
draws beyond the fixed grid in test_coloring.py.  The G6 validator is
the oracle; examples are capped because each draw runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.operators.coloring import (
    minimal_coloring,
    validate_coloring,
)
from distributed_graph_coloring_with_pyspark_spark.sources.generator import generate_graph

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from distributed_graph_coloring_with_pyspark_spark.session import get_spark

        _spark = get_spark(app_name="dgc-tests", cpus=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n=st.integers(min_value=2, max_value=40),
    max_deg=st.integers(min_value=0, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_coloring_always_valid_and_bounded(n, max_deg, seed):
    spark = _get_spark()
    node_ids, edges = generate_graph(spark, n, max_deg, seed=seed)
    result = minimal_coloring(node_ids, edges)
    valid, n_uncolored, conflicts = validate_coloring(result.vertices, edges)
    assert valid, f"n={n} Δ={max_deg} seed={seed}: uncolored={n_uncolored} conflicts={conflicts}"
    true_max_deg = (
        edges.groupBy("src").count().agg(F.max("count")).collect()[0][0] or 0
    )
    assert 1 <= result.minimal_colors <= true_max_deg + 1
