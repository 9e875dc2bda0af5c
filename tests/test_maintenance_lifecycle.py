"""Index/sink lifecycle: the incremental operators SHED small files by
design (the MinHash index is rewritten per corpus build, the SCD2 sink
appends per-epoch dynamic-partition overwrites) — compaction must close
that loop without changing a single answer (VERDICT r6 #5).

Two compositions, each asserting result-identity across the rewrite:

  build_minhash_index → compact_parquet(partition_by=band)
      → dedup_incremental equality + band layout preserved
  streaming_scd2_incremental (2 chunks, real restart) → compact_parquet
      (partition_by=ub) → interval-table equality + file count shrinks
"""

from __future__ import annotations

import glob
import os
from datetime import datetime

from distributed_graph_coloring_with_pyspark_spark.sources.maintenance import (
    compact_parquet,
)

SF = "/root/testdata/sf0.01"


def test_minhash_index_compaction_preserves_answers(spark, tmp_path):
    """Compacting the band-partitioned MinHash index must keep the
    incremental dedup answer bit-identical AND keep the band= layout
    (so the batch check's per-band reads still prune)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
        build_minhash_index,
        dedup_incremental,
    )

    idx = str(tmp_path / "mh_index")
    idx2 = str(tmp_path / "mh_index_compacted")
    build_minhash_index(spark, SF, idx)
    before = [tuple(r) for r in dedup_incremental(spark, SF, idx).collect()]

    report = compact_parquet(spark, idx, idx2, partition_by=["band"]).collect()[0]
    assert report.n_files_in >= report.n_files_out
    # layout preserved: still hive-partitioned on band, same band set
    bands_in = {os.path.basename(d) for d in glob.glob(os.path.join(idx, "band=*"))}
    bands_out = {os.path.basename(d) for d in glob.glob(os.path.join(idx2, "band=*"))}
    assert bands_out == bands_in and bands_out

    after = [tuple(r) for r in dedup_incremental(spark, SF, idx2).collect()]
    assert before and after == before


def test_scd2_sink_compaction_preserves_intervals(spark, tmp_path):
    """Run the incremental SCD2 sink across two changelog chunks (a
    real stop/restart on the checkpoint, so the table carries multiple
    epochs' files), compact the ub-partitioned table, and assert the
    interval view is row-identical while the file count shrank."""
    from distributed_graph_coloring_with_pyspark_spark.streaming.events import (
        streaming_scd2_incremental,
    )

    sfdir = str(tmp_path / "sf")
    evdir = os.path.join(sfdir, "events.parquet")
    out = str(tmp_path / "scd2_table")
    out2 = str(tmp_path / "scd2_table_compacted")
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

    write_events(
        [(1, 1, 0, 1), (2, 2, 0, 1), (3, 1, 30, 2), (4, 3, 0, 3)], "overwrite"
    )
    streaming_scd2_incremental(spark, sfdir, out, ckpt).collect()
    write_events([(5, 4, 0, 1), (6, 1, 0, 2), (7, 2, 0, 4)], "append")
    before = [
        tuple(r) for r in streaming_scd2_incremental(spark, sfdir, out, ckpt).collect()
    ]

    n_files_before = len(
        glob.glob(os.path.join(out, "ub=*", "*.parquet"))
    )
    report = compact_parquet(spark, out, out2, partition_by=["ub"]).collect()[0]
    n_files_after = len(glob.glob(os.path.join(out2, "ub=*", "*.parquet")))
    assert report.n_files_in == n_files_before
    assert n_files_after <= n_files_before
    # one file per live bucket: the partition-hash shuffle writes whole
    # buckets per task, never task-slivers of every bucket
    assert n_files_after == len(glob.glob(os.path.join(out2, "ub=*")))

    # the compacted table IS the table: same interval view, row for row
    from pyspark.sql import functions as F

    def view(path):
        return (
            spark.read.parquet(path)
            .select(
                "user_id",
                "event_id",
                "version",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
                F.date_format("valid_to_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
                F.col("valid_to_ts").isNull().alias("is_current"),
            )
            .orderBy("user_id", "version")
        )

    assert [tuple(r) for r in view(out2).collect()] == [
        tuple(r) for r in view(out).collect()
    ]
    assert before  # non-degenerate: the sink actually produced history
