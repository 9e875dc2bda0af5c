"""Property gate for the merged Misra-Gries heavy-hitter sketch:
deterministic two-sided error bound vs exact counts (the sketch's
estimates depend on Arrow batch boundaries, so like the ANN paths it
is bound-gated, not hash-gated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _MG_CAPACITY,
    _tokens,
    heavy_hitter_tokens,
)
from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_misra_gries_bounds_and_completeness(spark):
    exact = {
        r["token"]: r["cnt"]
        for r in load_table(spark, SF, "documents")
        .select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_total = sum(exact.values())
    eps = n_total / (_MG_CAPACITY + 1)

    est = {
        r["token"]: r["est_count"]
        for r in heavy_hitter_tokens(spark, SF, top=None).collect()
    }
    assert est, "sketch returned nothing"
    # two-sided Misra-Gries bound for every reported token
    for tok, e in est.items():
        t = exact.get(tok, 0)
        assert e <= t, (tok, e, t)
        assert e >= t - eps, (tok, e, t, eps)
    # completeness: no token heavier than eps can vanish from the sketch
    for tok, t in exact.items():
        if t > eps:
            assert tok in est, (tok, t, eps)


def test_misra_gries_topk_presentation(spark):
    rows = heavy_hitter_tokens(spark, SF).collect()
    assert 0 < len(rows) <= 20
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)
