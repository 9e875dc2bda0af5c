"""Graph JSON scan/sink round-trip (reference S1/S2/S3) + generator
invariants (S4: graph.py:30-43 semantics)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.sources.generator import (
    generate_graph,
    generate_graph_distributed,
)
from distributed_graph_coloring_with_pyspark_spark.sources.graph_json import (
    read_graph_json,
    write_coloring_json,
    write_coloring_jsonl,
    write_graph_json,
)


def test_graph_json_roundtrip_byte_fidelity(spark, tmp_path):
    """write_graph_json must emit exactly the reference's format
    (graph.py:10-12 / node.py:8-13: json.dump, indent=4, key order
    id/neighbors/color, -1 for uncolored)."""
    node_ids, edges = generate_graph(spark, 12, 4, seed=5)
    out = tmp_path / "g.json"
    write_graph_json(node_ids, edges, str(out))

    adj: dict[int, list[int]] = {i: [] for i in range(12)}
    for r in edges.collect():
        adj[r.src].append(r.dst)
    expected = json.dumps(
        [
            {"id": i, "neighbors": sorted(adj[i]), "color": -1}
            for i in range(12)
        ],
        indent=4,
    )
    assert out.read_text() == expected

    # reading back yields the identical edge set
    node_ids2, edges2 = read_graph_json(spark, str(out))
    assert sorted((r.src, r.dst) for r in edges2.collect()) == sorted(
        (r.src, r.dst) for r in edges.collect()
    )
    assert node_ids2.count() == 12


def test_reference_file_roundtrip_byte_identical(spark, tmp_path):
    """read graph.json → write must reproduce the reference serializer's
    exact bytes, including the UNSORTED insertion-order neighbor lists
    (node.py:11 keeps list order; graph.json is json.dumps(..., indent=4)
    verbatim)."""
    node_ids, edges = read_graph_json(spark, "/root/reference/graph.json")
    out = tmp_path / "rt.json"
    write_graph_json(node_ids, edges, str(out))
    ref = open("/root/reference/graph.json").read()
    # the reference file has color -1 on every node (uncolored input)
    assert out.read_text() == ref


def test_reference_graph_scan(spark):
    node_ids, edges = read_graph_json(spark, "/root/reference/graph.json")
    assert node_ids.count() == 10
    # symmetric adjacency (graph.py:40-41 doubles every edge)
    fwd = {(r.src, r.dst) for r in edges.collect()}
    assert all((b, a) in fwd for a, b in fwd)


def test_write_coloring_json_format(spark, tmp_path):
    verts = spark.createDataFrame(
        [(0, 1), (1, None), (2, 0)], "id long, color int"
    )
    out = tmp_path / "c.json"
    write_coloring_json(verts, str(out))
    data = json.loads(out.read_text())
    # sorted by id; NULL serialized as the reference's -1 sentinel
    assert data == [
        {"id": 0, "color": 1},
        {"id": 1, "color": -1},
        {"id": 2, "color": 0},
    ]
    assert out.read_text().startswith("[\n    {")  # indent=4


def test_write_coloring_jsonl_distributed_sink(spark, tmp_path):
    verts = spark.createDataFrame(
        [(0, 1), (1, None), (2, 0)], "id long, color int"
    )
    out = str(tmp_path / "colors_jsonl")
    write_coloring_jsonl(verts, out)
    back = spark.read.schema("id long, color int").json(out)
    rows = {(r.id, r.color) for r in back.collect()}
    assert rows == {(0, 1), (1, -1), (2, 0)}  # NULL → -1 sentinel


def _check_invariants(edges_rows, n, max_deg):
    pairs = [(r.src, r.dst) for r in edges_rows]
    assert all(s != d for s, d in pairs), "self-loop"
    assert len(pairs) == len(set(pairs)), "duplicate edge"
    assert all((d, s) in set(pairs) for s, d in pairs), "asymmetric"
    deg: dict[int, int] = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    assert all(v <= max_deg for v in deg.values()), "degree cap broken"
    assert all(0 <= s < n for s, _ in pairs)


def test_generator_invariants(spark):
    for seed in (1, 2):
        _, edges = generate_graph(spark, 30, 5, seed=seed)
        _check_invariants(edges.collect(), 30, 5)


import pytest


@pytest.mark.parametrize(
    "n,max_deg,seed",
    [(200, 6, 9), (50, 3, 1), (120, 12, 2), (80, 1, 3), (64, 63, 4)],
)
def test_distributed_generator_invariants(spark, n, max_deg, seed):
    node_ids, edges = generate_graph_distributed(spark, n, max_deg, seed=seed)
    rows = edges.collect()
    _check_invariants(rows, n, max_deg)
    assert node_ids.count() == n


def test_distributed_generator_determinism(spark):
    _, edges = generate_graph_distributed(spark, 200, 6, seed=9)
    _, edges2 = generate_graph_distributed(spark, 200, 6, seed=9)
    assert sorted((r.src, r.dst) for r in edges.collect()) == sorted(
        (r.src, r.dst) for r in edges2.collect()
    )


def test_generator_seed_determinism(spark):
    _, e1 = generate_graph(spark, 25, 4, seed=11)
    _, e2 = generate_graph(spark, 25, 4, seed=11)
    assert sorted((r.src, r.dst) for r in e1.collect()) == sorted(
        (r.src, r.dst) for r in e2.collect()
    )
