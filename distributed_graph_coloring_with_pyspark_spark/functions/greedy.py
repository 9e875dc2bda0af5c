"""Pandas-UDF escape hatch (SURVEY.md §2.4-A6/§2.6): the one capability
class of the reference that is irreducibly procedural — the per-bucket
*sequential* greedy scan inside its aggregateByKey combiners
(reference: resolve_collisions coloring.py:56-70, asc-degree order;
resolve_conflicts_within/across_partitions coloring_optimized.py:168-200,
desc-degree order — the two variants disagree on order, SURVEY.md §2.5).

The production coloring loop replaces this with the order-free
Jones-Plassmann local-max rule (operators/coloring.py) — better
parallel semantics, no intra-group ordering.  This module exists for
*exact* order parity with the reference when someone needs to reproduce
its colorings bucket-for-bucket: ``groupBy(candidate).applyInPandas``
runs the same sequential accept loop per candidate-color bucket, Arrow-
batched (each bucket becomes one pandas DataFrame in one task).

Scale notes: per-group state is O(bucket size); buckets are color
classes, which for sparse graphs are O(|V|/χ).  A pathological single
bucket degrades to one fat task — exactly the reference's behavior
(its combiner also serializes the whole bucket through one reduce
chain); the order-free rule is the fix, not a bigger executor.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_neighbor_ids(cand: DataFrame, edges: DataFrame) -> DataFrame:
    """(id, degree, candidate) + symmetric edges → add neighbor_ids
    ARRAY<LONG> (the projection the reference shuffles,
    coloring_optimized.py:86-90 {node, neighbor_ids, ...})."""
    adj = edges.groupBy(F.col("src").alias("id")).agg(
        F.collect_list("dst").alias("neighbor_ids")
    )
    return cand.join(adj, "id", "left").select(
        "id",
        "degree",
        "candidate",
        F.coalesce("neighbor_ids", F.array().cast("array<long>")).alias("neighbor_ids"),
    )


def resolve_buckets_greedy(
    cand_with_neighbors: DataFrame, ascending_degree: bool = True
) -> DataFrame:
    """Per-candidate-color bucket, scan nodes in (degree, id) order —
    asc like the baseline (coloring.py:64) or desc like the optimized
    variant (coloring_optimized.py:170-172) — and accept a node iff no
    already-accepted node in the bucket is its neighbor.  Returns the
    accepted (id, new_color) rows: each color class is an independent
    set built in the exact reference order.
    """

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["degree", "id"], ascending=[ascending_degree, True], kind="mergesort"
        )
        accepted_ids: set[int] = set()
        out_ids: list[int] = []
        out_colors: list[int] = []
        for row in pdf.itertuples(index=False):
            nbrs: Iterable[int] = row.neighbor_ids
            if accepted_ids.isdisjoint(nbrs):
                accepted_ids.add(row.id)
                out_ids.append(row.id)
                out_colors.append(int(row.candidate))
        return pd.DataFrame({"id": pd.Series(out_ids, dtype="int64"),
                             "new_color": pd.Series(out_colors, dtype="int32")})

    return (
        cand_with_neighbors.filter(F.col("candidate").isNotNull())
        .groupBy("candidate")
        .applyInPandas(greedy, "id long, new_color int")
    )
