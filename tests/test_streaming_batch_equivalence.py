"""Correctness gate for the four Structured Streaming pipelines.

These pipelines are deliberately NOT in ``__spark_entry__.queries()``:
the driver records at most 50 correctness rows and each streaming query
shares its oracle SQL with an already-registered batch twin, so their
driver rows were redundant by construction (all four were driver-green
when registered in round 2).  This test applies the SAME contract the
driver did, at the SAME scale factor (sf0.01) — run the pipeline on
Spark, run the DuckDB oracle on the identical parquet, compare column
names, row count, and order-insensitive canonicalized values — using
the very ``canon`` function tools/check_oracle.py uses, so the two
canonicalizations cannot drift apart.

Plus the gap-boundary pin: Spark's native ``session_window`` MERGES
sessions that touch, so an event exactly gap-seconds after the previous
one stays in-session — the same strict-``>`` boundary as the batch
lag+cumsum formulation (round 3 wrongly assumed ``>=`` for the native
path).  No synthetic-corpus gap lands on exactly 1800 s, so the oracle
sweep alone cannot catch a wrong boundary — ``test_session_gap_boundary``
plants exact-boundary gaps to pin both engines' behavior directly.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    STREAMING_ORACLES,
    STREAMING_QUERIES,
    events_sessionization,
    streaming_sessions,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    # static dimension side of the stream-static enrichment join
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    yield con
    con.close()


_ALL_QUERIES = {**STREAMING_QUERIES, **EXTRA_QUERIES}
_ALL_ORACLES = {**STREAMING_ORACLES, **EXTRA_ORACLES}


@pytest.mark.parametrize("name", sorted(_ALL_QUERIES))
def test_streaming_matches_batch_oracle(spark, duck, name):
    assert set(_ALL_QUERIES) == set(_ALL_ORACLES)
    sdf = _ALL_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ddf = duck.sql(_ALL_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    assert len(srows) == len(drows), name
    assert canon_rows(scols, srows) == canon_rows(ddf.columns, drows), name


def test_session_gap_boundary(spark, tmp_path):
    """Exact-1800 s gaps: user 1 sits ON the boundary, users 2/3 bracket
    it.  BOTH sessionizations must keep the on-boundary pair in ONE
    session (strict >, GAP_CMP): session_window because Spark merges
    touching windows (measured — [t, t+gap) then an event at t+gap
    extends the session), lag+cumsum by its explicit `>`.  This is the
    test the constants note in streaming/events.py points at — the only
    place the boundary is exercised with data on both engines."""
    base_ns = 1_700_000_000 * 1_000_000_000  # epoch seconds -> nanos
    gaps = {1: 1800, 2: 1799, 3: 1801}
    rows = []
    eid = 0
    for user, gap in gaps.items():
        for t_off in (0, gap):
            rows.append((eid, base_ns + t_off * 1_000_000_000, user))
            eid += 1
    # single FILE named events.parquet: the streaming source's
    # pathGlobFilter matches file names, not directories
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    # max session_seq per user: 0 = one session, 1 = split into two
    native_max = {}
    batch_max = {}
    for r in streaming_sessions(spark, str(tmp_path)).collect():
        native_max[r.user_id] = max(native_max.get(r.user_id, 0), r.session_seq)
    for r in events_sessionization(spark, str(tmp_path)).collect():
        batch_max[r.user_id] = max(batch_max.get(r.user_id, 0), r.session_seq)

    # below the boundary: one session everywhere
    assert native_max[2] == 0 and batch_max[2] == 0
    # above the boundary: two sessions everywhere
    assert native_max[3] == 1 and batch_max[3] == 1
    # ON the boundary: one session on BOTH engines (strict >) —
    # session_window merges touching windows; lag+cumsum uses `>`
    assert native_max[1] == 0, "session_window must merge at gap == 30 min"
    assert batch_max[1] == 0, "batch sessionization must not split at gap == 30 min"


def test_hll_sketch_rollup_error_bound_and_mergeability(spark):
    """events_hll_user_sketches is bound-gated (HLL estimates are
    engine-specific): every per-type estimate must sit within the
    lgK=12 HLL's comfortable 3-sigma envelope (~3%) of the exact count
    carried in the same row, and the __all__ row — produced by UNIONING
    the per-type sketches, never rescanning the fact — must estimate
    the true global distinct count to the same bound, which is the
    mergeability contract the sketch-as-a-column pattern rests on."""
    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        events_hll_user_sketches,
    )

    rows = events_hll_user_sketches(spark, SF).collect()
    assert len(rows) >= 2  # at least one type + the __all__ union row
    assert rows[0].event_type == "__all__"  # orderBy puts it first
    for r in rows:
        assert r.exact_users > 0
        rel = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel <= 0.03, (r.event_type, r.approx_users, r.exact_users)
