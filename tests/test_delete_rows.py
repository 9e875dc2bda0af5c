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


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """ADVICE r8: predicate-NULL rows (three-valued logic) must be KEPT,
    not silently dropped from the rewrite."""
    table = os.path.join(str(tmp_path), "null_pred")
    spark.createDataFrame(
        [(1, 10, "a"), (2, None, "a"), (3, 97, "a"), (4, None, "b"), (5, 5, "b")],
        "id int, val int, part string",
    ).write.partitionBy("part").parquet(table)
    stats = delete_rows_partitioned(
        spark, table, F.col("val") % 97 == 0, "part"
    ).collect()[0]
    # only id=3 (val=97) matches TRUE; NULL-val rows in the affected
    # partition survive the rewrite
    assert stats["rows_deleted"] == 1
    after = spark.read.parquet(table)
    assert sorted(r["id"] for r in after.collect()) == [1, 2, 4, 5]


def test_delete_null_partition_value(spark, tmp_path):
    """A NULL partition (__HIVE_DEFAULT_PARTITION__) must match
    null-safely — rewritten when it has survivors, dropped when fully
    matched, never silently lost."""
    table = os.path.join(str(tmp_path), "null_part")
    spark.createDataFrame(
        [(1, "x", "a"), (2, "y", None), (3, "z", None)],
        "id int, v string, part string",
    ).write.partitionBy("part").parquet(table)
    assert os.path.isdir(os.path.join(table, "part=__HIVE_DEFAULT_PARTITION__"))
    # partial delete inside the NULL partition → rewrite, survivor kept
    stats = delete_rows_partitioned(
        spark, table, F.col("id") == 2, "part"
    ).collect()[0]
    assert stats["rows_deleted"] == 1
    assert stats["n_partitions_rewritten"] == 1
    assert stats["n_partitions_dropped"] == 0
    after = spark.read.parquet(table)
    assert sorted(r["id"] for r in after.collect()) == [1, 3]
    assert after.filter(F.col("part").isNull()).count() == 1
    # now fully delete the NULL partition → directory dropped
    stats = delete_rows_partitioned(
        spark, table, F.col("id") == 3, "part"
    ).collect()[0]
    assert stats["n_partitions_dropped"] == 1
    assert not os.path.isdir(
        os.path.join(table, "part=__HIVE_DEFAULT_PARTITION__")
    )
    assert [r["id"] for r in spark.read.parquet(table).collect()] == [1]


def test_delete_pins_partition_value_type(spark, tmp_path):
    """ADVICE r8: a part='01' directory must rewrite as part=01 — type
    inference would rewrite under part=1 and leave the original
    directory (deleted rows included) in place."""
    table = os.path.join(str(tmp_path), "zero_pad")
    spark.createDataFrame(
        [(1, "01"), (2, "01"), (3, "2")], "id int, part string"
    ).write.partitionBy("part").parquet(table)
    assert os.path.isdir(os.path.join(table, "part=01"))
    stats = delete_rows_partitioned(
        spark, table, F.col("id") == 1, "part"
    ).collect()[0]
    assert stats["rows_deleted"] == 1
    assert stats["n_partitions_rewritten"] == 1
    assert os.path.isdir(os.path.join(table, "part=01"))
    assert not os.path.isdir(os.path.join(table, "part=1"))
    got = duckdb.sql(
        f"""SELECT id, part FROM read_parquet('{table}/*/*.parquet',
            hive_partitioning=true, hive_types={{'part': VARCHAR}})
            ORDER BY id"""
    ).fetchall()
    assert got == [(2, "01"), (3, "2")]


def test_delete_escaped_partition_value(spark, tmp_path):
    """Partition values Hive %XX-escapes in paths (':' etc.) must drop
    via the actual listed directory, not an f-string guess."""
    table = os.path.join(str(tmp_path), "escaped")
    spark.createDataFrame(
        [(1, "a:b"), (2, "plain")], "id int, part string"
    ).write.partitionBy("part").parquet(table)
    escaped = [
        d for d in os.listdir(table) if d.startswith("part=") and "%" in d
    ]
    assert escaped, os.listdir(table)  # ':' is escaped to %3A
    stats = delete_rows_partitioned(
        spark, table, F.col("part") == "a:b", "part"
    ).collect()[0]
    assert stats["n_partitions_dropped"] == 1
    assert not any("%" in d for d in os.listdir(table)), os.listdir(table)
    assert [r["id"] for r in spark.read.parquet(table).collect()] == [2]
