"""Graph JSON scan/sink (reference S1/S2/S3: graph.py:10-28, node.py:8-13,
coloring.py:238-241).

The reference's on-disk format is a single pretty-printed JSON array of
``{"id": int, "neighbors": [int, ...], "color": int}`` with ``-1`` as the
uncolored sentinel. Internally we use NULL for uncolored (SURVEY.md §1.2)
and keep ``-1`` only at this boundary for format fidelity.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

GRAPH_JSON_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("neighbors", ArrayType(LongType()), True),
        StructField("color", IntegerType(), True),
    ]
)


def read_graph_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S1: scan the reference's JSON graph → (node_ids(id), edges(src, dst)).

    ``multiLine=True`` because the file is one pretty-printed array
    (graph.py:11 ``indent=4``), not JSON-lines. Adjacency arrives already
    symmetric (graph.py:40-41 adds both directions); we normalize it to an
    edges frame via ``explode`` instead of rebuilding the reference's
    object-pointer links (graph.py:23-25).
    """
    raw = spark.read.schema(GRAPH_JSON_SCHEMA).option("multiLine", True).json(path)
    # fail at the READ boundary on malformed input (review r5): under
    # PERMISSIVE parsing a node object without "id" (or a syntax error,
    # which nulls the whole multiLine array) yields id=NULL rows — and a
    # NULL-id vertex can never win an equi-join, so the coloring loop
    # would spin its full round budget before failing confusingly
    bad = raw.filter(F.col("id").isNull()).count()
    if bad:
        raise ValueError(
            f"read_graph_json: {path} has {bad} records with NULL id —"
            " malformed JSON or node objects missing the 'id' field"
        )
    node_ids = raw.select("id")
    # ``pos`` carries each neighbor's position in the source list so the
    # sink can reproduce the reference's insertion-order serialization
    # byte-for-byte (node.py:11 keeps list order); algebraic consumers
    # just ignore the extra column
    edges = raw.select(
        F.col("id").alias("src"),
        F.posexplode_outer("neighbors").alias("pos", "dst"),
    ).filter(F.col("dst").isNotNull())
    return node_ids, edges


def write_coloring_json(vertices: DataFrame, path: str) -> None:
    """S3: write ``[{"id": ..., "color": ...}]`` with indent=4, sorted by id
    (reference coloring.py:238-241 collects then json.dump's). NULL colors
    serialize as -1 for format fidelity (node.py:5 sentinel).

    Driver-side by design: the result is one small row per vertex and the
    reference's format is a single JSON array, which is inherently a
    single-writer artifact. At 100 TB scale use
    ``vertices.write.parquet``/``.json`` instead (distributed sink).
    """
    rows = (
        vertices.select("id", F.coalesce("color", F.lit(-1)).alias("color"))
        .orderBy("id")
        .collect()
    )
    with open(path, "w") as f:
        json.dump([{"id": r["id"], "color": int(r["color"])} for r in rows], f, indent=4)


def write_coloring_jsonl(vertices: DataFrame, path: str) -> None:
    """S3 at scale: the distributed coloring sink — one JSON object per
    line, written by the executors (``df.write.json``), no driver
    collect.  The reference's single-array pretty-printed format
    (``write_coloring_json``) is inherently a single-writer artifact;
    this is the same record schema in the distributed layout a 100 TB
    result actually ships in.  NULL colors serialize as the -1 sentinel
    for record-level compatibility with the reference (node.py:5)."""
    (
        vertices.select("id", F.coalesce("color", F.lit(-1)).cast("int").alias("color"))
        .write.mode("overwrite")
        .json(path)
    )


def write_graph_json(node_ids: DataFrame, edges: DataFrame, path: str,
                     colors: DataFrame | None = None) -> None:
    """S2: write the full graph back as the reference's node format
    (graph.py:10-12): neighbors collapse to id lists (node.py:11).

    Neighbor order: if ``edges`` carries a ``pos`` column (a graph that
    came through ``read_graph_json``), the source insertion order is
    reproduced — a read→write round-trip is byte-identical to the
    reference serializer, which keeps list order (node.py:11).
    Otherwise (generated graphs) neighbors are sorted ascending — a
    deterministic canonical order; the reference's in-memory insertion
    order during random generation is not an on-disk contract."""
    if "pos" in edges.columns:
        adj = (
            edges.groupBy(F.col("src").alias("id"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "dst"))),
                    lambda x: x["dst"],
                ).alias("neighbors")
            )
        )
    else:
        adj = (
            edges.groupBy(F.col("src").alias("id"))
            .agg(F.sort_array(F.collect_list("dst")).alias("neighbors"))
        )
    g = node_ids.join(adj, "id", "left").select(
        "id", F.coalesce("neighbors", F.array().cast("array<long>")).alias("neighbors")
    )
    if colors is not None:
        g = g.join(colors.select("id", "color"), "id", "left")
    else:
        g = g.withColumn("color", F.lit(None).cast("int"))
    rows = g.select("id", "neighbors", F.coalesce("color", F.lit(-1)).alias("color")).orderBy(
        "id"
    ).collect()
    with open(path, "w") as f:
        json.dump(
            [
                {"id": r["id"], "neighbors": list(r["neighbors"]), "color": int(r["color"])}
                for r in rows
            ],
            f,
            indent=4,
        )
