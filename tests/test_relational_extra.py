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
    # same view set the driver registers (r12: the demoted as-of join
    # reads events alongside the TPC-H tables)
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    drows = ddf.fetchall()
    dcols = ddf.columns
    con.close()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), name
    # anti_customers_without_orders is 0 rows at sf0.01 BY DESIGN (every
    # customer has orders) — exactly why VERDICT r7 #6 demoted it from
    # the driver registry (a 0-row hash matches trivially); both engines
    # must still agree on the emptiness.
    assert srows or name == "anti_customers_without_orders", name
    assert canon_rows(sdf.columns, srows) == canon_rows(dcols, drows), name


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_entity_name_match_blocking_is_lossless(spark, tmp_path):
    """Planted catalog whose qualifying pairs straddle every length-
    bucket boundary (lengths 2..9 with bucket width 3): the blocked
    equi-join must return EXACTLY the all-pairs python answer — each
    pair once, none dropped at a bucket edge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_graph_coloring_with_pyspark_spark.operators.relational import (
        entity_name_match,
    )

    # lengths 2,3 (bucket 0/1 edge), 5,6 (1/2 edge), 8,9 (2/3 edge),
    # plus same-bucket and unmatched fillers; duplicates exercise the
    # distinct-catalog collapse.
    names = [
        "ab", "abc", "axc",            # 2-3: ab~abc(1), abc~axc(1), ab~axc(2)
        "hello", "helloo", "hullo",    # 5-6 straddle
        "deadbolt", "deadbolts",       # 8-9 straddle
        "zzzzzzzzzzzz",                # isolated
        "ab",                          # duplicate row
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(len(names)), pa.int64()),
                "p_name": pa.array(names),
                "p_brand": pa.array(["b"] * len(names)),
                "p_type": pa.array(["t"] * len(names)),
                "p_size": pa.array([1] * len(names), pa.int32()),
                "p_retailprice": pa.array([1.0] * len(names)),
            }
        ),
        sf / "part.parquet",
    )
    got = {
        (r.name_a, r.name_b, r.dist, r.parts_a, r.parts_b)
        for r in entity_name_match(spark, str(sf)).collect()
    }
    catalog = sorted(set(names))
    want = {
        (a, b, _levenshtein(a, b), names.count(a), names.count(b))
        for a in catalog
        for b in catalog
        if a < b and 1 <= _levenshtein(a, b) <= 2
    }
    assert got == want
    assert any(len(a) // 3 != len(b) // 3 for a, b, *_ in want)  # edges exercised
