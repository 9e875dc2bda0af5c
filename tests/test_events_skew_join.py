"""Skew-join demo pins (VERDICT r6 #6): events_user_join_salted must
(a) equal the naive join on a PLANTED hot-user fixture — replica-join
multiplicity is exactly 1, so every aggregate recombines; (b) actually
split the hot key across salts (the point of the rewrite); (c) keep the
shuffle-join plan shape salting is for (sort-merge on (user_id, salt),
no fact broadcast).  The sf0.01 DuckDB value oracle runs separately in
test_streaming_batch_equivalence via EXTRA_ORACLES."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
    _N_SALTS,
    events_user_join_salted,
)

_HOT_ROWS = 4000


def _write_fixture(spark, tmp_path) -> str:
    """user 0 is hot (_HOT_ROWS events), users 1-10 have 10 each."""
    rows = []
    eid = 0
    for uid, n in [(0, _HOT_ROWS)] + [(u, 10) for u in range(1, 11)]:
        for _ in range(n):
            rows.append(
                (eid, datetime(2024, 1, 1, 0, eid % 60, eid % 60), uid,
                 "click", float(eid % 100), "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        [(u, f"C{u}", u % 3, 0.0, f"SEG{u % 4}") for u in range(11)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_salted_join_equals_naive_on_planted_hot_key(spark, tmp_path):
    sf = _write_fixture(spark, tmp_path)
    got = [tuple(r) for r in events_user_join_salted(spark, sf).collect()]
    ev = spark.read.parquet(f"{sf}/events.parquet")
    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    naive = [
        tuple(r)
        for r in ev.join(cu, "user_id")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("segment")
        .collect()
    ]
    assert got == naive and got  # non-degenerate, hot user contributes


def test_salt_splits_the_hot_key(spark, tmp_path):
    """The hot user's _HOT_ROWS fact rows must spread across salts: the
    largest (user_id, salt) group has to be far below the unsalted hot
    group — ≥ 4× split even under xxhash64's binomial imbalance (the
    expected max for 4000 draws over 16 salts is ~280, comfortably
    under 1000)."""
    sf = _write_fixture(spark, tmp_path)
    fact = (
        spark.read.parquet(f"{sf}/events.parquet")
        .withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)).cast("int"))
    )
    per_key = fact.groupBy("user_id", "salt").count()
    hot_max = (
        per_key.filter(F.col("user_id") == 0).agg(F.max("count")).collect()[0][0]
    )
    n_salts_hit = per_key.filter(F.col("user_id") == 0).count()
    assert n_salts_hit == _N_SALTS
    assert hot_max <= _HOT_ROWS // 4


def test_salted_join_plan_is_shuffle_join_on_salted_key(spark):
    """Plan pin: the merge hint must hold (SortMergeJoin — the 100 TB
    non-broadcastable-dimension regime salting exists for), the join
    key must include the salt, and the FACT side must not be
    broadcast."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    plan = plan_string(events_user_join_salted(spark, "/root/testdata/sf0.01"))
    assert "SortMergeJoin" in plan
    join_lines = [
        ln for ln in plan.splitlines() if "SortMergeJoin" in ln and "salt" in ln
    ] or [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("Left keys") or ln.strip().startswith("Right keys")
    ]
    assert any("salt" in ln for ln in join_lines), plan
    assert "BroadcastHashJoin" not in plan.split("SortMergeJoin")[0], (
        "fact side must reach the join via shuffle, not broadcast"
    )
