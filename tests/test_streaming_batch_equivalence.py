"""Correctness gate for the four Structured Streaming pipelines.

These pipelines are deliberately NOT in ``__spark_entry__.queries()``:
the driver records at most 50 correctness rows and each streaming query
shares its oracle SQL with an already-registered batch twin, so their
driver rows were redundant by construction (all four were driver-green
when registered in round 2).  This test applies the SAME contract the
driver does — run the pipeline on Spark, run the DuckDB oracle on the
identical parquet, compare column names, row count, and
order-insensitive canonicalized values — so moving them out of the
registry loses no checking strength.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)

SF = "/root/testdata/sf0.001"


def _canon(v):
    # same canonicalization as tools/check_oracle.py
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STREAMING_QUERIES))
def test_streaming_matches_batch_oracle(spark, duck, name):
    assert set(STREAMING_QUERIES) == set(STREAMING_ORACLES)
    sdf = STREAMING_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ddf = duck.sql(STREAMING_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    assert len(srows) == len(drows), name
    assert _canon_rows(scols, srows) == _canon_rows(ddf.columns, drows), name
