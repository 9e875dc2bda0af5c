"""Measure the exact-GEMM vs banded-LSH crossover for embedding
near-dup pair generation (SCALE.md r8: the sf1 run showed the banded
tier LOSING to the exact tier at the registered threshold 0.45 —
115 s vs 4.6 s — because hyperplane banding's candidate mass is
Θ(n² · r / 2^bits) and τ=0.45 in 64-d needs r≈412 12-bit bands for
0.9 recall).

This probe times the two pair frames at a sweep of thresholds on the
SAME corpus, printing band counts and candidate geometry alongside
wall time, so the crossover claim in SCALE.md is measured, not argued:

    python tools/lsh_crossover_probe.py --sf-dir /tmp/sfgen/sf1 \
        --thresholds 0.45,0.6,0.8
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfgen/sf1")
    ap.add_argument("--thresholds", default="0.45,0.6,0.8")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from distributed_graph_coloring_with_pyspark_spark.operators import similarity as S
    from distributed_graph_coloring_with_pyspark_spark.session import get_spark
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    spark = get_spark(app_name="lsh-crossover", cpus=args.cpus)
    spark.sparkContext.setLogLevel("WARN")
    emb = load_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors, dim {S._DIM}")

    for tau in [float(t) for t in args.thresholds.split(",")]:
        p1 = 1.0 - math.acos(tau) / math.pi
        q1 = p1**S._PAIR_LSH_BAND_BITS
        bands = S._pair_lsh_bands(tau)
        for name, frame in (
            ("exact", lambda: S._neardup_pair_frame(emb, pair_source="exact")),
            ("lsh", lambda: S._neardup_pair_frame(emb, pair_source="lsh")),
        ):
            t0 = time.monotonic()
            # same τ sweep on both tiers: re-filter the frame at tau
            # (the frame's own threshold filter is at the registered
            # 0.45, so tau ≥ 0.45 keeps the comparison apples-to-apples
            # for the verify stage; the LSH candidate generator is
            # rebuilt at tau)
            if name == "lsh":
                cand = S._lsh_candidate_pairs(emb, tau)
            else:
                cand = S._blocked_candidate_pairs(emb, tau)
            a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
            b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
            pairs = (
                cand.join(a, "id_a")
                .join(b, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    F.round(S.cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
                )
                .filter(F.col("cos_sim") >= tau)
            )
            n_pairs = pairs.count()
            dt = time.monotonic() - t0
            extra = (
                f" bands={bands} p1={p1:.4f} q1_band={q1:.2e}"
                if name == "lsh"
                else ""
            )
            print(
                f"tau={tau}: {name:5s} {dt:7.2f}s  pairs={n_pairs}{extra}",
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
