"""10× scaling probe for the similarity family (VERDICT r5 #7): the
embeddings fixture has 2 000 vectors at sf0.1, so the 10× corpus is a
synthetic 20 000-vector replication — 8 parquet part files, each
replica's vectors CIRCULARLY SHIFTED by its replica index (norm- and
distribution-preserving, but decorrelated: a shifted near-random vector
has ~0 cosine against the original, so replication cannot manufacture
near-dup pairs or flatten the ANN recall task).

Times knn_exact_topk / cosine_neardup_pairs / ann_hyperplane_topk /
ann_ivf_topk / ann_pq_topk at 1× and 10× (second run, warm — bench.py's
convention).  Quantizer caches are released between sizes so each size
pays its own training.  Results are transcribed into SCALE.md; re-run
with `python tools/scale_probe_ann.py`.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_graph_coloring_with_pyspark_spark.session import (
    get_spark,
    release_session_caches,
)
from distributed_graph_coloring_with_pyspark_spark.operators import similarity as S

SF = "/root/testdata/sf0.1"
REPLICAS = 10
N_FILES = 8


def build_10x(tmp: str) -> str:
    src = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    vecs = np.array(
        [np.asarray(v, dtype=np.float32) for v in src["embedding"].to_pylist()]
    )
    labels = np.asarray(src["label"].to_pylist(), dtype=np.int32)
    n = len(vecs)
    out_dir = os.path.join(tmp, "embeddings.parquet")
    os.makedirs(out_dir, exist_ok=True)
    rows_per_file = (n * REPLICAS + N_FILES - 1) // N_FILES
    ids, embs, labs = [], [], []
    fidx = 0
    for r in range(REPLICAS):
        shifted = np.roll(vecs, r, axis=1)  # decorrelate replicas
        for i in range(n):
            ids.append(r * n + i)
            embs.append(shifted[i])
            labs.append(int(labels[i]))
            if len(ids) == rows_per_file:
                t = pa.table(
                    {
                        "vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(
                            [e.tolist() for e in embs], pa.list_(pa.float32())
                        ),
                        "label": pa.array(labs, pa.int32()),
                    }
                )
                pq.write_table(t, os.path.join(out_dir, f"part-{fidx:03d}.parquet"))
                ids, embs, labs, fidx = [], [], [], fidx + 1
    if ids:
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [e.tolist() for e in embs], pa.list_(pa.float32())
                ),
                "label": pa.array(labs, pa.int32()),
            }
        )
        pq.write_table(t, os.path.join(out_dir, f"part-{fidx:03d}.parquet"))
    return tmp


def main() -> int:
    spark = get_spark(app_name="dgc-ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="dgc_ann_10x_")
    big = build_10x(tmp)

    fns = {
        "knn_exact_topk": S.knn_exact_topk,
        "cosine_neardup_pairs": S.cosine_neardup_pairs,
        "ann_hyperplane_topk": S.ann_hyperplane_topk,
        "ann_ivf_topk": S.ann_ivf_topk,
        "ann_pq_topk": S.ann_pq_topk,
        "ann_ivfpq_topk": S.ann_ivfpq_topk,
        # r13 (VERDICT r12 #7): the two r12 flagship additions join the
        # committed 10× probes — the rotated composite (one extra
        # DIM×DIM matmul in the Arrow batches; should track ivfpq) and
        # the two-scan sketched k-center (vs the exact variant's K
        # corpus scans; its factor should track the scan pair, not K×)
        "ann_opq_topk": S.ann_opq_topk,
        "kcenter_select_sketched": S.kcenter_select_sketched,
        "kcenter_select": S.kcenter_select,
    }
    for label, sf_dir in (("1x (2k vectors)", SF), ("10x (20k vectors)", big)):
        release_session_caches(spark)
        print(f"--- {label} ---", flush=True)
        for name, fn in fns.items():
            last = None
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                last = time.monotonic() - t0
            print(f"{name}: {last:.1f} s (warm)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
