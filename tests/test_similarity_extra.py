"""Oracle gate for pytest-gated similarity operators (driver registry
is capped at 50 entries) — same contract as tools/check_oracle.py at
the same scale factor (sf0.01), using its own canon function."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_similarity_extra_matches_oracle(spark, name):
    # PYTEST_ORACLES ⊆ PYTEST_QUERIES: python-oracle entries (pca)
    # have their own dedicated tests below
    assert set(PYTEST_ORACLES) <= set(PYTEST_QUERIES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows), name
    assert srows, name
    assert canon_rows(scols, srows) == canon_rows(ddf.columns, drows), name


def test_quantization_quality_bounds(spark):
    """int8 SQ on unit-ish random vectors must reconstruct well: cosine
    ≥ 0.999 and max error ≤ scale/254 (+5e-7: the reported error is
    rounded to 6 decimals, which can exceed the exact bound by up to
    half that quantum) for every vector."""
    rows = PYTEST_QUERIES["quantize_embeddings_int8"](spark, SF).collect()
    assert all(r.cos_recon >= 0.999 for r in rows)
    assert all(r.max_abs_err <= r.scale / 254 + 5e-7 for r in rows)


def test_pca_matches_numpy(spark):
    """The distributed covariance + driver eigensolve must agree with
    numpy computing both steps directly from the collected vectors."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        embedding_pca_top,
    )
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    X = np.array(
        [r.embedding for r in load_table(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    cov = np.cov(X, rowvar=False)
    want = np.linalg.eigvalsh(cov)[::-1]
    total = want.sum()
    got = embedding_pca_top(spark, SF).collect()
    assert [r.component for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        w = want[r.component - 1]
        assert abs(r.eigenvalue - round(w, 6)) <= 2e-6, (r, w)
        assert abs(r.explained_ratio - round(w / total, 6)) <= 2e-6
    # ratios are a probability-like profile over a PSD spectrum
    assert all(r.explained_ratio >= 0 for r in got)


def test_covariance_plan_has_no_join(spark):
    """Round-5 reshape contract (VERDICT r4 #2): covariance partials are
    a mapInPandas scan + ONE partial-reduce aggregation — no join
    anywhere in the plan (the round-4 form self-joined ~DIM²/2 exploded
    rows per vector), and exactly the DIM·(DIM+1)/2 upper-triangle rows
    come out."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _DIM,
        _covariance_partials,
    )
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    df = _covariance_partials(emb, np.zeros(_DIM), _DIM)
    assert "Join" not in plan_string(df)
    assert df.count() == _DIM * (_DIM + 1) // 2
