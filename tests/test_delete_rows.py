"""delete_rows_partitioned: content identity vs a DuckDB anti-join
oracle, untouched partitions pinned byte-for-byte (path+size+mtime),
and the fully-deleted-partition drop path."""

from __future__ import annotations

import glob
import os

import duckdb
from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.sources.maintenance import (
    compact_parquet,
    delete_rows_partitioned,
)

SF = "/root/testdata/sf0.01"


def _files(path: str) -> dict[str, tuple[int, float]]:
    return {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    }


def _materialize(spark, tmp_path) -> str:
    table = os.path.join(str(tmp_path), "events_by_type")
    compact_parquet(
        spark,
        os.path.join(SF, "events.parquet"),
        table,
        target_mb=8,
        partition_by=["event_type"],
    )
    return table


def test_delete_rewrites_only_affected_partitions(spark, tmp_path):
    table = _materialize(spark, tmp_path)
    all_types = [
        r[0]
        for r in spark.read.parquet(table).select("event_type").distinct().collect()
    ]
    # purge one user from a SUBSET of types (the sf0.01 fixture's users
    # span every type, so the partial coverage is made explicit) — the
    # operator must rewrite exactly those partitions and no others
    victim = spark.read.parquet(table).agg(F.min("user_id")).first()[0]
    types = sorted(all_types)[:2]
    untouched = sorted(set(all_types) - set(types))
    assert untouched, "predicate must leave some partition untouched"
    before = {
        t: {
            f: v
            for f, v in _files(table).items()
            if f"event_type={t}" in f
        }
        for t in untouched
    }
    types_in = ", ".join(f"'{t}'" for t in types)
    expected = duckdb.sql(
        f"""SELECT event_id FROM read_parquet('{table}/*/*.parquet',
            hive_partitioning=true)
            WHERE NOT (user_id = {victim} AND event_type IN ({types_in}))"""
    ).fetchall()

    pred = (F.col("user_id") == victim) & F.col("event_type").isin(*types)
    stats = delete_rows_partitioned(spark, table, pred, "event_type").collect()[0]
    assert stats["n_partitions_total"] == len(all_types)
    assert stats["n_partitions_rewritten"] == len(types)
    assert stats["n_partitions_dropped"] == 0
    assert stats["rows_deleted"] > 0

    after = spark.read.parquet(table)
    assert after.filter(pred).count() == 0
    got = [(r[0],) for r in after.select("event_id").collect()]
    assert sorted(got) == sorted(expected)
    # untouched partitions keep their exact files
    for t in untouched:
        now = {
            f: v for f, v in _files(table).items() if f"event_type={t}" in f
        }
        assert now == before[t], t


def test_delete_drops_fully_matched_partition(spark, tmp_path):
    table = _materialize(spark, tmp_path)
    all_types = sorted(
        r[0]
        for r in spark.read.parquet(table).select("event_type").distinct().collect()
    )
    victim_type = all_types[0]
    stats = delete_rows_partitioned(
        spark, table, F.col("event_type") == victim_type, "event_type"
    ).collect()[0]
    assert stats["n_partitions_dropped"] == 1
    assert stats["n_partitions_rewritten"] == 0
    assert not os.path.isdir(os.path.join(table, f"event_type={victim_type}"))
    remaining = spark.read.parquet(table)
    assert remaining.filter(F.col("event_type") == victim_type).count() == 0
    assert sorted(
        r[0] for r in remaining.select("event_type").distinct().collect()
    ) == all_types[1:]


def test_delete_no_matches_is_a_noop(spark, tmp_path):
    table = _materialize(spark, tmp_path)
    before = _files(table)
    stats = delete_rows_partitioned(
        spark, table, F.col("user_id") == -999, "event_type"
    ).collect()[0]
    assert stats["rows_deleted"] == 0
    assert stats["n_partitions_rewritten"] == 0
    assert stats["n_partitions_dropped"] == 0
    assert _files(table) == before
