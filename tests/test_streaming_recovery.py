"""Structured Streaming checkpoint recovery: a restarted query must
resume from its checkpointed file-source offsets — processing files that
arrived while it was down exactly once, never reprocessing old ones.
This is the exactly-once progress contract every production streaming
job leans on; none of the queries() entries exercise a restart, so this
pins it."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_batch(spark, path, ids, mode):
    rows = [(i, f"u{i % 3}", float(i)) for i in ids]
    spark.createDataFrame(rows, "event_id long, user_id string, value double").coalesce(
        1
    ).write.mode(mode).parquet(path)


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, range(0, 50), "overwrite")

    def start(sink):
        stream = spark.readStream.schema(
            "event_id long, user_id string, value double"
        ).parquet(src)
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start("recovery_sink_a")
    try:
        q.processAllAvailable()
        first = {r.user_id: (r.n, r.total) for r in spark.table("recovery_sink_a").collect()}
    finally:
        q.stop()
    assert sum(n for n, _ in first.values()) == 50

    # new data lands while the query is DOWN
    _write_batch(spark, src, range(50, 80), "append")

    q = start("recovery_sink_b")
    try:
        q.processAllAvailable()
        second = {r.user_id: (r.n, r.total) for r in spark.table("recovery_sink_b").collect()}
    finally:
        q.stop()

    # exactly-once across the restart: totals equal the batch answer over
    # ALL data, with no double-counting of the pre-restart files
    assert sum(n for n, _ in second.values()) == 80
    expected = {
        r.user_id: (r.n, r.total)
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert second == expected


def test_foreachbatch_parquet_sink_restart_idempotent(spark, tmp_path):
    """Restart-resume for the PRODUCTION sink path (VERDICT r4 #7):
    the same foreachBatch → partitioned-parquet overwrite epoch writer
    streaming_hourly_to_parquet uses, killed after its first batch and
    restarted on the SAME checkpoint dir with new files waiting.  The
    complete-mode overwrite must be idempotent across the restart: the
    read-back parquet equals the batch answer over ALL data — no
    double-counted pre-restart rows, no stale epoch files surviving
    the overwrite."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    _write_batch(spark, src, range(0, 50), "overwrite")

    def start():
        stream = spark.readStream.schema(
            "event_id long, user_id string, value double"
        ).parquet(src)
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )

        def _write_epoch(batch_df, epoch_id):
            batch_df.write.mode("overwrite").partitionBy("user_id").parquet(out)

        return (
            agg.writeStream.outputMode("complete")
            .foreachBatch(_write_epoch)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def read_sink():
        return {
            (r.user_id, r.n, r.total)
            for r in spark.read.parquet(out)
            .select("user_id", "n", "total")
            .collect()
        }

    def batch_answer():
        return {
            (r.user_id, r.n, r.total)
            for r in spark.read.parquet(src)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # "kill" after batch 1
    assert read_sink() == batch_answer()

    # new files land while the query is DOWN; restart on the SAME ckpt
    _write_batch(spark, src, range(50, 80), "append")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert read_sink() == batch_answer()


def test_scd2_incremental_restart_equals_batch(spark, tmp_path):
    """Incremental SCD2 (VERDICT r5 #4): the foreachBatch MERGE-upsert
    killed after its first run, restarted on the SAME checkpoint with
    new changelog files waiting — including a late out-of-order event
    that rewrites one key's history — must (a) process only the new
    files, (b) close the open intervals of changed keys, (c) leave the
    parquet files of every bucket containing no changed key untouched
    (the MERGE contract), and (d) end byte-equal to the batch
    events_scd2_intervals answer over all data."""
    import glob
    import os
    from datetime import datetime

    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        events_scd2_intervals,
        streaming_scd2_incremental,
    )

    sfdir = str(tmp_path / "sf")
    evdir = os.path.join(sfdir, "events.parquet")
    out = str(tmp_path / "scd2_table")
    ckpt = str(tmp_path / "ckpt")

    def write_events(rows, mode):
        spark.createDataFrame(
            [
                (eid, datetime(2024, 1, 1, h, mi), uid, "click", 1.0, "{}")
                for eid, h, mi, uid in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode(mode).parquet(evdir)

    # chunk 1: three users, two versions for user 1
    write_events(
        [(1, 1, 0, 1), (2, 2, 0, 1), (3, 1, 30, 2), (4, 3, 0, 3)], "overwrite"
    )
    first = streaming_scd2_incremental(spark, sfdir, out, ckpt).collect()
    assert sum(1 for r in first if r.is_current) == 3  # one open interval/user

    files_before = {
        d: sorted(glob.glob(os.path.join(d, "*.parquet")))
        for d in glob.glob(os.path.join(out, "ub=*"))
    }

    # query is DOWN; new changelog files land: user 1 gets a NEWER event
    # (closes its open interval) and user 2 a LATE out-of-order one
    # (history rewrite); user 4 is brand new
    write_events([(5, 4, 0, 1), (6, 1, 0, 2), (7, 2, 0, 4)], "append")
    second = streaming_scd2_incremental(spark, sfdir, out, ckpt).collect()

    batch = events_scd2_intervals(spark, sfdir).collect()
    assert [tuple(r) for r in second] == [tuple(r) for r in batch]
    # the late event became user 2's version 1 (history rewritten)
    v = {(r.user_id, r.version): r for r in second}
    assert v[(2, 1)].event_id == 6 and not v[(2, 1)].is_current
    assert v[(2, 2)].event_id == 3 and v[(2, 2)].is_current

    # MERGE contract: buckets with no changed key keep their exact files
    from pyspark.sql import functions as F

    hit = {
        r.ub
        for r in spark.createDataFrame([(1,), (2,), (4,)], "user_id long")
        .select(
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(8))
            .cast("int")
            .alias("ub")
        )
        .collect()
    }
    untouched = [
        d for d in files_before if int(d.rsplit("ub=", 1)[1]) not in hit
    ]
    assert untouched, "fixture must leave at least one bucket untouched"
    for d in untouched:
        assert sorted(glob.glob(os.path.join(d, "*.parquet"))) == files_before[d]
