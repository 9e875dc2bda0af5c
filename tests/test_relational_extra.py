"""Oracle gate for pytest-gated relational operators (driver registry
is capped at 50 entries) — same contract as tools/check_oracle.py at
sf0.01."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.relational import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_QUERIES))
def test_relational_extra_matches_oracle(spark, name):
    assert set(PYTEST_QUERIES) == set(PYTEST_ORACLES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    drows = ddf.fetchall()
    dcols = ddf.columns
    con.close()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert srows, name
    assert canon_rows(sdf.columns, srows) == canon_rows(dcols, drows), name
