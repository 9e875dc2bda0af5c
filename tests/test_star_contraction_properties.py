"""Property gate for the Kiveris star-contraction components engine:
on hypothesis-random graphs the labels must equal a pure-Python
union-find oracle exactly (label = min id per component, every vertex
of the symmetrized edge set covered).  Complements the planted-shape
tests in test_graph_analytics.py with unstructured inputs — duplicate
edges, self-loops, disconnected shards, near-cliques."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
    star_contraction_components,
)
from distributed_graph_coloring_with_pyspark_spark.session import get_spark

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        _spark = get_spark(app_name="dgc-tests", cpus=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _union_find_labels(und_edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und_edges:
        if a == b:
            parent.setdefault(a, a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    und=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=60,
    )
)
def test_star_contraction_matches_union_find(und):
    spark = _get_spark()
    # the engine contract takes a SYMMETRIC edge frame (self-loops are
    # filtered internally); vertices touching only self-loops still get
    # singleton labels via the vertex reattachment
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long") if sym else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {(r.id, r.label) for r in star_contraction_components(edges).collect()}
    want = set(_union_find_labels(und).items())
    assert got == want, f"edges={und}"
