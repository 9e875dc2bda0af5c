"""Random graph source (reference S4: graph.py:30-43).

Reference semantics: for each node draw a target degree uniform in
[0, max_degree]; add mutual edges to uniformly chosen partners, rejecting
self-loops, duplicate edges, and partners already at max_degree. The
rejection loop can spin when the partner pool saturates, so retries are
capped (FIXTURES.md §1.3).

Two implementations:

- ``generate_graph`` — driver-side, faithful to the reference's sequential
  semantics, for small n (tests, parity with graph.py).
- ``generate_graph_distributed`` — the scale path: ``spark.range(n)`` +
  seeded per-row edge proposals + symmetrize + degree-cap, entirely as
  DataFrame ops. Same *distribution family*, not the same sequential draws
  (the reference's draws are inherently order-dependent).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_graph(
    spark: SparkSession, node_count: int, max_degree: int, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Driver-side generator matching graph.py:30-43 semantics →
    (node_ids(id), edges(src, dst) symmetric)."""
    rng = random.Random(seed)
    neighbors: dict[int, set[int]] = {i: set() for i in range(node_count)}
    for i in range(node_count):
        target = rng.randint(0, max_degree)
        retries = 0
        while len(neighbors[i]) < target and retries < 10 * node_count:
            j = rng.randrange(node_count)
            retries += 1
            if j == i or j in neighbors[i] or len(neighbors[j]) >= max_degree:
                continue
            neighbors[i].add(j)
            neighbors[j].add(i)
    node_ids = spark.range(node_count).select(F.col("id"))
    edge_rows = [(i, j) for i, ns in neighbors.items() for j in ns]
    if edge_rows:
        edges = spark.createDataFrame(edge_rows, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    return node_ids, edges


def generate_graph_distributed(
    spark: SparkSession, node_count: int, max_degree: int, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Scale-path generator: no driver-side state, O(n·Δ) work distributed.

    Each node proposes ``degree_i ~ U[0, max_degree]`` partners via seeded
    ``rand``; proposals are symmetrized and every endpoint keeps at most
    ``max_degree`` edges (lowest-hash kept — deterministic), preserving the
    reference's invariants: no self-loops, no duplicates, symmetric,
    degree ≤ max_degree.
    """
    if max_degree <= 0 or node_count <= 1:
        return (
            spark.range(node_count).select("id"),
            spark.createDataFrame([], "src long, dst long"),
        )
    n = spark.range(node_count)
    # per-node target degree, then explode that many seeded proposals
    proposals = (
        n.withColumn(
            "target_degree",
            (F.floor(F.rand(seed) * (max_degree + 1))).cast("int"),
        )
        .withColumn("slot", F.explode(F.sequence(F.lit(1), F.col("target_degree"))))
        .withColumn(
            "partner",
            F.floor(F.rand(seed + 1) * node_count).cast("long"),
        )
        .filter(F.col("partner") != F.col("id"))
        .select(
            F.least("id", "partner").alias("a"),
            F.greatest("id", "partner").alias("b"),
        )
        .distinct()
    )
    # degree cap: rank each node's incident edges by a deterministic hash,
    # keep an edge only if BOTH endpoints rank it within max_degree.
    from pyspark.sql.window import Window

    e = proposals.withColumn("ehash", F.xxhash64("a", "b", F.lit(seed)))
    ranked = (
        e.select(F.col("a").alias("v"), "a", "b", "ehash")
        .unionAll(e.select(F.col("b").alias("v"), "a", "b", "ehash"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("v").orderBy("ehash", "a", "b"))
        )
    )
    kept = (
        ranked.groupBy("a", "b")
        .agg(F.max("rk").alias("worst_rank"))
        .filter(F.col("worst_rank") <= max_degree)
        .select("a", "b")
    )
    edges = kept.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        kept.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return n.select("id"), edges
