"""The applyInPandas escape hatch must reproduce the reference's
sequential per-bucket greedy EXACTLY — including the asc/desc order
fork between coloring.py:64 and coloring_optimized.py:170-172 that
makes the two reference variants emit different colorings."""

from __future__ import annotations

from distributed_graph_coloring_with_pyspark_spark.functions.greedy import (
    attach_neighbor_ids,
    resolve_buckets_greedy,
)


def _fixture(spark):
    # path graph 1-2-3 plus isolated 4; all candidates = color 0
    cand = spark.createDataFrame(
        [(1, 1, 0), (2, 2, 0), (3, 1, 0), (4, 0, 0)],
        "id long, degree long, candidate int",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    return attach_neighbor_ids(cand, edges), edges


def test_greedy_asc_matches_baseline_semantics(spark):
    """asc (degree, id): visit 4,1,3,2 → accept 4,1,3; reject 2 (adj to
    both accepted 1 and 3) — hand-computed resolve_collisions result."""
    cwn, _ = _fixture(spark)
    got = {(r.id, r.new_color) for r in resolve_buckets_greedy(cwn, True).collect()}
    assert got == {(4, 0), (1, 0), (3, 0)}


def test_greedy_desc_matches_optimized_semantics(spark):
    """desc degree: visit 2 first → accept 2; 1 and 3 rejected (adjacent
    to 2); isolated 4 accepted — a DIFFERENT (still independent) set."""
    cwn, _ = _fixture(spark)
    got = {(r.id, r.new_color) for r in resolve_buckets_greedy(cwn, False).collect()}
    assert got == {(2, 0), (4, 0)}


def test_greedy_buckets_are_independent_sets(spark):
    """Across multiple candidate colors: accepted nodes within one color
    never touch an edge."""
    cand = spark.createDataFrame(
        [(i, 2, i % 2) for i in range(10)], "id long, degree long, candidate int"
    )
    ring = [(i, (i + 1) % 10) for i in range(10)]
    edges = spark.createDataFrame(
        ring + [(b, a) for a, b in ring], "src long, dst long"
    )
    accepted = resolve_buckets_greedy(attach_neighbor_ids(cand, edges), True).collect()
    by_color: dict[int, set[int]] = {}
    for r in accepted:
        by_color.setdefault(r.new_color, set()).add(r.id)
    edge_set = {(a, b) for a, b in ring}
    for ids in by_color.values():
        assert not any((a, b) in edge_set for a in ids for b in ids)
