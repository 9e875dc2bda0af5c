"""Z-order layout rewrite (sources/maintenance.py): content identity
plus the actual data-skipping win — after clustering events on
(user_id, ts), a user_id-range predicate box must overlap strictly
fewer files' parquet footer stats than the time-linear layout, which
spreads every user across every file."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from distributed_graph_coloring_with_pyspark_spark.sources.maintenance import (
    zorder_layout,
)

SF = "/root/testdata/sf0.001"
N_FILES = 16


def _files_overlapping_user_range(path: str, lo: float, hi: float) -> tuple[int, int]:
    """(n_overlapping, n_files) from parquet footer min/max of user_id."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "user_id"
        )
        mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        if mx >= lo and mn <= hi:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_user_box_and_preserves_content(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")

    # the "natural" streaming layout: time-range files
    ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.parquet(linear)
    report = zorder_layout(spark, f"{SF}/events.parquet", zord, ["user_id", "ts"], N_FILES).collect()[0]
    assert report.n_rows == ev.count()
    assert report.n_files_out == N_FILES

    # content identity, full value compare
    src = sorted(map(tuple, ev.collect()))
    assert sorted(map(tuple, spark.read.parquet(zord).collect())) == src

    # quarter-width user_id box inside one top-level quadrant (a box
    # crossing the 0.5 boundary is the Morton curve's worst case — the
    # top bit flips): linear layout can't skip (every time-file spans
    # ~the full user domain); z-order confines it to the files owning
    # that stripe of the curve
    ids = [r.user_id for r in ev.select("user_id").collect()]
    lo_all, hi_all = min(ids), max(ids)
    span = hi_all - lo_all
    lo, hi = lo_all + 0.26 * span, lo_all + 0.49 * span
    z_hit, z_n = _files_overlapping_user_range(zord, lo, hi)
    l_hit, l_n = _files_overlapping_user_range(linear, lo, hi)
    assert z_n == N_FILES and l_n == N_FILES
    assert l_hit == N_FILES  # time layout prunes nothing on user_id
    assert z_hit < l_hit  # strict data-skipping win
    assert z_hit <= N_FILES // 2  # one user quadrant + range straddle

    # and the query through Spark agrees on both layouts (skipping is
    # an optimization, never a semantics change)
    got_z = (
        spark.read.parquet(zord).filter(f"user_id >= {lo} and user_id <= {hi}").count()
    )
    got_l = (
        spark.read.parquet(linear).filter(f"user_id >= {lo} and user_id <= {hi}").count()
    )
    assert got_z == got_l == sum(1 for u in ids if lo <= u <= hi)
