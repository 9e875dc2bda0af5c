"""sf1 scaling probe for the r14 optimization winners (VERDICT r14 #8).

The sf0.1 registry sits below the parallelism floor (every r14 32c/8c
ratio <= 1.41), so the r14 structural claims (kcenter bounded pool,
ivfpq 2-pass trainers, DSIR single materialization) need scaling
evidence at a data size where parallel work dominates scheduling.
This probe times exactly those three surfaces at a given core count,
with the bench's own methodology (fresh session + untimed warmup
pipeline, release_session_caches, 3 reps, noop sink, median/min):

    SPARK_GRAFT_CPUS=32 python tools/probe_scaling_sf1_r15.py /tmp/sfgen/sf1
    SPARK_GRAFT_CPUS=8  python tools/probe_scaling_sf1_r15.py /tmp/sfgen/sf1

Run the two back-to-back in the same window; per the repo's noise
discipline only the within-window 32c-vs-8c ratio is evidence.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    import __spark_entry__ as entry_mod
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        build_ivfpq_index,
        kcenter_select,
        rebuild_ivfpq_index,
    )
    from distributed_graph_coloring_with_pyspark_spark.session import (
        get_spark,
        release_session_caches,
    )
    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window as W

    work = tempfile.mkdtemp(prefix="probe_sf1_")
    opq_path = os.path.join(work, "opq_index")

    def fresh_session(tag: str):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        s = get_spark(app_name=f"probe-sf1-{tag}", cpus=cpus)
        s.sparkContext.setLogLevel("ERROR")
        nat = s.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        reg = s.read.parquet(os.path.join(sf_dir, "region.parquet"))
        (
            nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n"), F.collect_list("n_name").alias("ns"))
            .withColumn("rk", F.row_number().over(W.orderBy("r_name")))
            .select(F.explode("ns"), "n", "rk")
        ).write.format("noop").mode("overwrite").save()
        release_session_caches(s)
        return s

    dsir = entry_mod.queries()["dsir_select"]

    def run_dsir(spark):
        dsir(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_kcenter(spark):
        kcenter_select(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_rebuild(spark):
        target = os.path.join(work, "rebuilt")
        shutil.rmtree(target, ignore_errors=True)
        rebuild_ivfpq_index(spark, sf_dir, opq_path, target)

    surfaces = [
        ("dsir_select", run_dsir, None),
        ("kcenter_select", run_kcenter, None),
        (
            "ivfpq_index_rebuild",
            run_rebuild,
            # untimed setup: the rebuild reads the standing OPQ index
            lambda spark: build_ivfpq_index(spark, sf_dir, opq_path, opq=True),
        ),
    ]

    results = {}
    for name, fn, setup in surfaces:
        spark = fresh_session(name)
        if setup is not None:
            setup(spark)
        runs = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark)
            runs.append(round(time.monotonic() - t0, 3))
        results[name] = {
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "min": round(min(runs), 3),
        }
        print(f"[{cpus}c] {name}: med {results[name]['median']}s "
              f"min {results[name]['min']}s runs {runs}", file=sys.stderr)
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    shutil.rmtree(work, ignore_errors=True)
    import json

    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
