"""Property tests for event analytics against PURE-PYTHON oracles.

The DuckDB gate proves Spark and DuckDB agree, but both speak SQL — a
shared-semantics blind spot (e.g., both could mis-handle a window edge
the same way).  These tests pin the operators against an imperative
reimplementation on randomized inputs, with seeds fixed for
reproducibility."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
    SESSION_GAP_MIN,
    events_sessionization,
)

# testdata layout: ts is INT64 epoch-nanos (see sources/tables.py)
_EV_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


def _gen_events(seed, n_users=20, max_events=60):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(n_users):
        t = base + datetime.timedelta(seconds=rng.randrange(0, 3600))
        for _ in range(rng.randrange(1, max_events)):
            # gaps cluster around the 30-min boundary to stress it,
            # including EXACT boundary gaps (1800 s → same session:
            # the rule is strictly-greater)
            gap = rng.choice([0, 1, 60, 900, 1799, 1800, 1801, 7200])
            t = t + datetime.timedelta(seconds=gap)
            rows.append((eid, t, u, "click", 1.0, "{}"))
            eid += 1
    rng.shuffle(rows)  # input order must not matter
    return rows


def _python_sessionize(rows):
    """Independent imperative oracle: sort per user by (ts, event_id),
    break when gap > 30 min, number sessions from 0."""
    by_user: dict[int, list] = {}
    for eid, ts, u, *_ in rows:
        by_user.setdefault(u, []).append((ts, eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        start = prev = evs[0][0]
        n = 0
        for ts, _ in evs:
            if (ts - prev).total_seconds() > SESSION_GAP_MIN * 60:
                out[(u, seq)] = (n, round((prev - start).total_seconds(), 3))
                seq += 1
                start = ts
                n = 0
            n += 1
            prev = ts
        out[(u, seq)] = (n, round((prev - start).total_seconds(), 3))
    return out


def _to_nanos(rows):
    epoch = datetime.datetime(1970, 1, 1)
    return [
        (eid, int((ts - epoch).total_seconds()) * 1_000_000_000, u, et, v, p)
        for eid, ts, u, et, v, p in rows
    ]


def test_sessionization_matches_python_oracle(spark, tmp_path):
    for seed in (1, 2, 3):
        rows = _gen_events(seed)
        path = str(tmp_path / f"ev{seed}")
        spark.createDataFrame(_to_nanos(rows), _EV_SCHEMA).write.mode(
            "overwrite"
        ).parquet(path + "/events.parquet")
        got = {
            (r.user_id, r.session_seq): (r.n_events, r.duration_secs)
            for r in events_sessionization(spark, path).collect()
        }
        assert got == _python_sessionize(rows), f"seed={seed}"


def test_cooccurrence_binning_exactness_on_planted_boundaries(spark, tmp_path):
    """The bin-join's exactly-once + boundary claims, pinned on planted
    data the synthetic corpus never guarantees: pairs exactly 60 s
    apart (inclusive), 60.000001 s apart (excluded), same-timestamp
    pairs (id tie-break), bucket-edge pairs straddling a bin boundary,
    and a triple inside one window — all verified against a brute-force
    python oracle over the same rows."""
    import itertools
    from datetime import datetime, timedelta

    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        events_cooccurrence_60s,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (event_id, offset_seconds, type)
        (1, 0.0, "a"), (2, 60.0, "b"),          # exactly 60 s -> pair
        (3, 200.0, "a"), (4, 260.000001, "b"),  # just over -> no pair
        (5, 500.0, "a"), (6, 500.0, "b"),       # same ts -> id tie-break
        (7, 659.9, "a"), (8, 660.1, "b"),       # straddles the 60s bin edge
        (9, 900.0, "a"), (10, 930.0, "b"), (11, 955.0, "c"),  # triple
    ]
    spark.createDataFrame(
        [
            (eid, base + timedelta(seconds=off), 1, ty, 1.0, "{}")
            for eid, off, ty in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r.type_a, r.type_b): r.n_pairs
        for r in events_cooccurrence_60s(spark, str(tmp_path)).collect()
    }
    want: dict = {}
    for (ia, oa, ta), (ib, ob, tb) in itertools.permutations(rows, 2):
        if 0 <= ob - oa <= 60 and (ob > oa or (ob == oa and ib > ia)):
            want[(ta, tb)] = want.get((ta, tb), 0) + 1
    assert got == want, (got, want)
    # the planted intent, spelled out
    assert got[("a", "b")] == 4  # exact-60s, same-ts, bin-edge, triple's a-b
    assert got[("b", "c")] == 1 and got[("a", "c")] == 1


def test_rolling_24h_boundary_inclusive(spark, tmp_path):
    """RANGE frame boundary: an event exactly 86 400 s earlier is IN
    the trailing-24h frame (inclusive), one microsecond beyond is OUT —
    planted, since no synthetic gap lands on the exact boundary."""
    from datetime import datetime, timedelta

    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        events_rolling_24h,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 0.0, 1),            # seed for user 1
        (2, 86400.0, 1),        # exactly 24h later -> frame includes #1
        (3, 0.0, 2),            # seed for user 2
        (4, 86400.000001, 2),   # just beyond -> frame excludes #3
    ]
    spark.createDataFrame(
        [
            (eid, base + timedelta(seconds=off), uid, "click", 2.0, "{}")
            for eid, off, uid in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {r.event_id: r.n_24h for r in events_rolling_24h(spark, str(tmp_path)).collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}


def test_props_variant_tolerates_malformed_json(spark, tmp_path):
    """A malformed props payload must contribute NULL (absent k), not
    fail the query — try_parse_json semantics, matching the oracle's
    JSON cast behavior on the engines' shared contract."""
    from datetime import datetime

    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        events_props_variant,
    )

    rows = [
        (1, '{"k": 5}'),
        (2, "{not json at all"),
        (3, '{"other": 1}'),
        (4, '{"k": 7}'),
    ]
    spark.createDataFrame(
        [(eid, datetime(2024, 1, 1), 1, "click", 1.0, props) for eid, props in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = events_props_variant(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.n_with_k, r.sum_k, r.min_k, r.max_k) == (4, 2, 12, 5, 7)
