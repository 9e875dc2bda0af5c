"""Persisted-IVF-index path: build_ivf_index writes the corpus as
cell-partitioned parquet, ann_ivf_topk_indexed queries it with static
partition pruning.  The scale claim under test: the probed-cell IN
filter must reach the parquet source as a PartitionFilter (unprobed
cells never leave disk), and the indexed query must return exactly the
in-memory ``ann_ivf_topk`` answer (same centroids, same rerank)."""

from __future__ import annotations

import re

from distributed_graph_coloring_with_pyspark_spark.operators import similarity as S
from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

SF = "/root/testdata/sf0.001"


def test_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    idx = str(tmp_path / "ivf_index")
    n_cells = S.build_ivf_index(spark, SF, idx)
    assert n_cells == S._IVF_K

    # the index is physically partitioned by cell
    cell_dirs = sorted(p.name for p in (tmp_path / "ivf_index").glob("cell=*"))
    assert cell_dirs, "expected cell=N partition directories"
    assert len(cell_dirs) <= n_cells

    indexed = S.ann_ivf_topk_indexed(spark, SF, idx)

    # partition pruning is STATIC: the probed-cell IN list appears as a
    # PartitionFilter on the index scan (not a post-scan filter)
    plan = plan_string(indexed)
    m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*IN", plan)
    assert m, f"no partition-pruning IN filter on cell in plan:\n{plan[:2000]}"

    # identical answers: same centroids (session cache), same rerank
    got = [tuple(r) for r in indexed.collect()]
    want = [tuple(r) for r in S.ann_ivf_topk(spark, SF).collect()]
    assert got == want
    assert got  # non-empty

    S.clear_ivf_cache(spark)
