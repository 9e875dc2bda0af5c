"""Measure pair/candidate-set cardinalities at two scale factors so the
SCALE.md verdicts "candidate-linear" / "output-linear" are numbers, not
claims.

    python tools/pair_scaling_probe.py /root/testdata/sf0.1 /tmp/sfgen/sf1

Prints, for each sf dir:
- jaccard_pairs:   rows of the exact-Jaccard pair artifact (>= threshold)
- gemm_pairs:      rows of the exact cosine pair artifact (>= tau)
- docs / embeddings: the input cardinalities the above scale against
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
    clear_neardup_pair_cache,
    neardup_pair_frame_cached,
)
from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    clear_pair_cache,
    jaccard_pair_frame,
)
from distributed_graph_coloring_with_pyspark_spark.session import (
    get_spark,
    release_session_caches,
)


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfgen/sf1"]
    spark = get_spark(app_name="pair-scaling-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        release_session_caches(spark)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
        clear_pair_cache(spark)
        jp = jaccard_pair_frame(spark, sf_dir).count()
        clear_neardup_pair_cache(spark, "exact")
        gp = neardup_pair_frame_cached(spark, sf_dir, "exact").count()
        print(
            f"{sf_dir}: docs={docs} embeddings={embs} "
            f"jaccard_pairs={jp} gemm_pairs={gp}",
            flush=True,
        )
    release_session_caches(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
