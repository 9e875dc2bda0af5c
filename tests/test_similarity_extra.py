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


@pytest.mark.parametrize("name", sorted(PYTEST_QUERIES))
def test_similarity_extra_matches_oracle(spark, name):
    assert set(PYTEST_QUERIES) == set(PYTEST_ORACLES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
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
