"""Oracle gate for pytest-gated dedup operators (driver registry is
capped at 50 entries) — same contract as tools/check_oracle.py at the
same scale factor (sf0.01), using its own canon function.

dedup_ngram_jaccard's prefix filter is LOSSLESS by the set-similarity-
join prefix theorem; the all-pairs DuckDB oracle pins that empirically
— a dropped candidate would show up as a missing row here."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_QUERIES))
def test_dedup_extra_matches_oracle(spark, name):
    assert set(PYTEST_QUERIES) == set(PYTEST_ORACLES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows), name
    assert srows, f"{name}: empty result — threshold excludes every pair"
    assert canon_rows(scols, srows) == canon_rows(ddf.columns, drows), name


def test_ngram_jaccard_cross_validates_minhash(spark):
    """Two independent Spark algorithms, one predicate: the lossless
    prefix-filter join and the probabilistic MinHash-LSH path must
    return identical pairs at the shared threshold (any diff would be a
    banding miss or a prefix bug)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
        dedup_near_minhash,
        dedup_ngram_jaccard,
    )

    exact = dedup_ngram_jaccard(spark, SF)
    mh = dedup_near_minhash(spark, SF)
    assert canon_rows(exact.columns, [tuple(r) for r in exact.collect()]) == canon_rows(
        mh.columns, [tuple(r) for r in mh.collect()]
    )
