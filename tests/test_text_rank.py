"""Oracle gates for the pytest-gated ranking operators (driver registry
is capped at 50 entries) — same DuckDB-oracle contract as
tools/check_oracle.py at sf0.01, plus structural invariants the hash
compare can't express (rank density, score monotonicity)."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.text_rank import (
    BM25_TOP_K,
    PYTEST_ORACLES,
    PYTEST_QUERIES,
    TFIDF_TOP_K,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_QUERIES))
def test_text_rank_matches_oracle(spark, name):
    assert set(PYTEST_QUERIES) == set(PYTEST_ORACLES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows), name
    assert srows, f"{name}: empty result"
    assert canon_rows(sdf.columns, srows) == canon_rows(ddf.columns, drows), name


def test_tfidf_rank_shape(spark):
    rows = PYTEST_QUERIES["tfidf_top_terms"](spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), doc  # dense 1..k
        assert len(rs) <= TFIDF_TOP_K
        # scores non-increasing in rank order
        ordered = sorted(rs, key=lambda r: r.rank)
        assert all(
            a.tfidf >= b.tfidf for a, b in zip(ordered, ordered[1:])
        ), doc


def test_bm25_rank_shape(spark):
    rows = sorted(
        PYTEST_QUERIES["bm25_rank"](spark, SF).collect(), key=lambda r: r.rank
    )
    assert 0 < len(rows) <= BM25_TOP_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.score >= b.score for a, b in zip(rows, rows[1:]))
    assert all(r.n_hit_terms >= 1 for r in rows)


def test_ranking_plans_take_ordered(spark):
    """Plan pin (VERDICT r8 #1): every ranking in this module must cut
    top-k via TakeOrderedAndProject (per-partition heap + k-row merge),
    never a partitionBy-less row_number window over the full scored set.
    The only SinglePartition exchange allowed is the rank-assignment
    window over the already-limited (≤ k / ≤ 2k row) result."""
    bm25 = PYTEST_QUERIES["bm25_rank"](spark, SF)
    plan = bm25._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 1, plan
    assert plan.count("SinglePartition") <= 1, plan

    hybrid = PYTEST_QUERIES["hybrid_search_rrf"](spark, SF)
    plan = hybrid._jdf.queryExecution().executedPlan().toString()
    # one TakeOrdered per ranking: lexical leg, vector leg, fused final
    assert plan.count("TakeOrderedAndProject") == 3, plan
    assert plan.count("SinglePartition") <= 1, plan


def test_retrieval_eval_metric_invariants(spark):
    """Beyond hash equality: the metric algebra must hold row-wise —
    bounds, hits ≤ min(k, n_rel), precision = hits/k, MRR/nDCG zero iff
    hits zero — and the fixture must exercise every branch (a partial
    probe with 0 < ndcg < 1, a saturated probe, and an n_rel = 0 probe;
    the degenerate labelings this op replaced measured all-zero)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.text_rank import (
        _EVAL_K,
        retrieval_eval_bm25,
    )

    rows = retrieval_eval_bm25(spark, SF).collect()
    for r in rows:
        assert 0.0 <= r.precision_k <= 1.0 and 0.0 <= r.recall_k <= 1.0
        assert 0.0 <= r.mrr <= 1.0 and 0.0 <= r.ndcg <= 1.0
        assert r.hits <= min(_EVAL_K, r.n_rel)
        assert r.precision_k == round(r.hits / _EVAL_K, 6)
        assert (r.mrr == 0.0) == (r.hits == 0)
        assert (r.ndcg == 0.0) == (r.hits == 0)
    assert any(0.0 < r.ndcg < 1.0 for r in rows), "partial branch"
    assert any(r.ndcg == 1.0 and r.hits == _EVAL_K for r in rows), "saturated"
    assert any(r.n_rel == 0 for r in rows), "empty-relevant branch"
