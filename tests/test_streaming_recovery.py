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
