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
