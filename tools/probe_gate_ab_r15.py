"""Same-session A/B probe for streaming_neardup_gate (r15, VERDICT r14
item 1): the gate's driver line moved 14.8 s (r13) -> 19.3-19.5 s (r14)
in every driver window while the builder's per-epoch probes said epochs
IMPROVED.  This probe runs the full corpus-entry harness (temp dirs,
4 arrival chunks, checkpointed stream) under three interchangeable
epoch bodies IN ONE SESSION, interleaved, with per-phase timers, so the
delta splits into epoch-work vs harness (arrival writes, WAL commits,
final read) vs ambient window:

  r13  - the round-13 _gate_epoch (two batch checkpoints, eager
         vs_corpus, always-run MIS loop, 3 lazy-chain writes)
  r14  - the round-14 _gate_epoch (fused batch checkpoint, lazy
         vs_corpus, isEmpty fast path, decisions checkpoint, 3 writes)
  cur  - whatever streaming/ingest.py currently ships (imported live;
         == r14 before the r15 change, == the fused-single-write body
         after)

Usage: python tools/probe_gate_ab_r15.py [reps=3]
Prints one line per run: variant, total, arrival-write sum, per-epoch
drain times, final-read time, and the decision-log row count + verdict
histogram (identity check across variants).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_coloring_with_pyspark_spark.operators.coloring import (  # noqa: E402
    scoped_shuffle_partitions,
)
from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (  # noqa: E402
    _JACCARD_THRESHOLD,
    _minhash_band_frame,
    _shingles,
    _tokens,
)
from distributed_graph_coloring_with_pyspark_spark.session import get_spark  # noqa: E402
from distributed_graph_coloring_with_pyspark_spark.sources.tables import (  # noqa: E402
    load_table,
)
from distributed_graph_coloring_with_pyspark_spark.streaming import ingest  # noqa: E402
from distributed_graph_coloring_with_pyspark_spark.streaming.ingest import (  # noqa: E402
    DOC_STREAM_SCHEMA,
    _N_CHUNKS,
    _greedy_survivors,
    write_arrival_file,
)


# probe-local copies of the r13/r14 state-layout helpers, so the legacy
# variant bodies keep working even after ingest.py changes its layout
def _state_paths(state_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(state_dir, "kept"),
        os.path.join(state_dir, "index"),
        os.path.join(state_dir, "decisions"),
    )


def _has_epochs(path: str) -> bool:
    return os.path.isdir(path) and any(
        e.startswith("epoch=") for e in os.listdir(path)
    )


def _decisions_frame_legacy(spark: SparkSession, dec_dir: str) -> DataFrame:
    if not _has_epochs(dec_dir):
        return spark.createDataFrame(
            [], "doc_id long, verdict string, matched_doc long"
        )
    return spark.read.parquet(dec_dir).select("doc_id", "verdict", "matched_doc")


# --------------------------------------------------------------------------
# variant: r13 epoch body (verbatim from commit 455ec17)
# --------------------------------------------------------------------------
def _gate_epoch_r13(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, epoch_id: int
) -> None:
    cur = int(epoch_id)
    kept_dir, idx_dir, dec_dir = _state_paths(state_dir)
    b = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
    if b.isEmpty():
        return
    sh_b = b.select(
        "doc_id", _shingles(_tokens()).alias("shingles")
    ).localCheckpoint(eager=True)
    bands_b = _minhash_band_frame(sh_b)

    if _has_epochs(idx_dir):
        idx = (
            spark.read.parquet(idx_dir)
            .filter(F.col("epoch") < cur)
            .select(F.col("doc_id").alias("corpus_doc"), "band", "bucket")
        )
        cand = (
            bands_b.withColumnRenamed("doc_id", "batch_doc")
            .join(idx, ["band", "bucket"])
            .select("batch_doc", "corpus_doc")
            .distinct()
        )
        corpus_sh = (
            spark.read.parquet(kept_dir)
            .filter(F.col("epoch") < cur)
            .join(
                cand.select(F.col("corpus_doc").alias("doc_id")).distinct(),
                "doc_id",
                "semi",
            )
            .select(
                F.col("doc_id").alias("corpus_doc"),
                _shingles(_tokens()).alias("sb"),
            )
        )
        vs_corpus = (
            cand.join(
                sh_b.select(
                    F.col("doc_id").alias("batch_doc"),
                    F.col("shingles").alias("sa"),
                ),
                "batch_doc",
            )
            .join(corpus_sh, "corpus_doc")
            .filter(
                F.size(F.array_intersect("sa", "sb"))
                >= F.lit(_JACCARD_THRESHOLD) * F.size(F.array_union("sa", "sb"))
            )
            .groupBy(F.col("batch_doc").alias("doc_id"))
            .agg(F.min("corpus_doc").alias("matched_doc"))
            .localCheckpoint(eager=True)
        )
    else:
        vs_corpus = spark.createDataFrame([], "doc_id long, matched_doc long")

    cand_batch = b.select("doc_id").join(vs_corpus.select("doc_id"), "doc_id", "anti")
    bands_c = bands_b.join(cand_batch, "doc_id", "semi")
    raw_pairs = (
        bands_c.select(F.col("doc_id").alias("a"), "band", "bucket")
        .join(
            bands_c.select(F.col("doc_id").alias("b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    pairs = (
        raw_pairs.join(
            sh_b.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa")),
            "a",
        )
        .join(
            sh_b.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb")),
            "b",
        )
        .filter(
            F.size(F.array_intersect("sa", "sb"))
            >= F.lit(_JACCARD_THRESHOLD) * F.size(F.array_union("sa", "sb"))
        )
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    kept_b, dropped_b = _greedy_survivors(cand_batch, pairs)

    decisions = (
        vs_corpus.select(
            "doc_id", F.lit("dup_vs_corpus").alias("verdict"), "matched_doc"
        )
        .unionByName(
            dropped_b.select(
                F.col("id").alias("doc_id"),
                F.lit("dup_in_batch").alias("verdict"),
                "matched_doc",
            )
        )
        .unionByName(
            kept_b.select(
                F.col("id").alias("doc_id"),
                F.lit("novel").alias("verdict"),
                F.lit(None).cast("long").alias("matched_doc"),
            )
        )
        .withColumn("epoch", F.lit(cur))
    )
    kept_docs = b.join(
        kept_b.withColumnRenamed("id", "doc_id"), "doc_id", "semi"
    ).withColumn("epoch", F.lit(cur))
    kept_bands = bands_b.join(
        kept_b.withColumnRenamed("id", "doc_id"), "doc_id", "semi"
    ).withColumn("epoch", F.lit(cur))

    for df, path in (
        (decisions, dec_dir),
        (kept_docs, kept_dir),
        (kept_bands, idx_dir),
    ):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(path)
        )


# --------------------------------------------------------------------------
# variant: r14 epoch body (verbatim from commit b717195 / round-14 HEAD)
# --------------------------------------------------------------------------
def _gate_epoch_r14(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, epoch_id: int
) -> None:
    cur = int(epoch_id)
    kept_dir, idx_dir, dec_dir = _state_paths(state_dir)
    b = batch_df.select(
        "doc_id", "text", _shingles(_tokens()).alias("shingles")
    ).localCheckpoint(eager=True)
    n_batch = b.count()
    if n_batch == 0:
        return
    with scoped_shuffle_partitions(spark, n_batch):
        _gate_epoch_body_r14(spark, cur, kept_dir, idx_dir, dec_dir, b)


def _gate_epoch_body_r14(
    spark: SparkSession,
    cur: int,
    kept_dir: str,
    idx_dir: str,
    dec_dir: str,
    b: DataFrame,
) -> None:
    sh_b = b.select("doc_id", "shingles")
    bands_b = _minhash_band_frame(sh_b)

    if _has_epochs(idx_dir):
        idx = (
            spark.read.parquet(idx_dir)
            .filter(F.col("epoch") < cur)
            .select(F.col("doc_id").alias("corpus_doc"), "band", "bucket")
        )
        cand = (
            bands_b.withColumnRenamed("doc_id", "batch_doc")
            .join(idx, ["band", "bucket"])
            .select("batch_doc", "corpus_doc")
            .distinct()
        )
        corpus_sh = (
            spark.read.parquet(kept_dir)
            .filter(F.col("epoch") < cur)
            .join(
                cand.select(F.col("corpus_doc").alias("doc_id")).distinct(),
                "doc_id",
                "semi",
            )
            .select(
                F.col("doc_id").alias("corpus_doc"),
                _shingles(_tokens()).alias("sb"),
            )
        )
        vs_corpus = (
            cand.join(
                sh_b.select(
                    F.col("doc_id").alias("batch_doc"),
                    F.col("shingles").alias("sa"),
                ),
                "batch_doc",
            )
            .join(corpus_sh, "corpus_doc")
            .filter(
                F.size(F.array_intersect("sa", "sb"))
                >= F.lit(_JACCARD_THRESHOLD) * F.size(F.array_union("sa", "sb"))
            )
            .groupBy(F.col("batch_doc").alias("doc_id"))
            .agg(F.min("corpus_doc").alias("matched_doc"))
            .localCheckpoint(eager=False)
        )
    else:
        vs_corpus = spark.createDataFrame([], "doc_id long, matched_doc long")

    cand_batch = b.select("doc_id").join(vs_corpus.select("doc_id"), "doc_id", "anti")
    bands_c = bands_b.join(cand_batch, "doc_id", "semi")
    raw_pairs = (
        bands_c.select(F.col("doc_id").alias("a"), "band", "bucket")
        .join(
            bands_c.select(F.col("doc_id").alias("b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    pairs = (
        raw_pairs.join(
            sh_b.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa")),
            "a",
        )
        .join(
            sh_b.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb")),
            "b",
        )
        .filter(
            F.size(F.array_intersect("sa", "sb"))
            >= F.lit(_JACCARD_THRESHOLD) * F.size(F.array_union("sa", "sb"))
        )
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    if pairs.isEmpty():
        kept_b = cand_batch.select(F.col("doc_id").alias("id"))
        dropped_b = spark.createDataFrame([], "id long, matched_doc long")
    else:
        kept_b, dropped_b = _greedy_survivors(cand_batch, pairs)

    decisions = (
        vs_corpus.select(
            "doc_id", F.lit("dup_vs_corpus").alias("verdict"), "matched_doc"
        )
        .unionByName(
            dropped_b.select(
                F.col("id").alias("doc_id"),
                F.lit("dup_in_batch").alias("verdict"),
                "matched_doc",
            )
        )
        .unionByName(
            kept_b.select(
                F.col("id").alias("doc_id"),
                F.lit("novel").alias("verdict"),
                F.lit(None).cast("long").alias("matched_doc"),
            )
        )
        .withColumn("epoch", F.lit(cur))
        .localCheckpoint(eager=True)
    )
    kept_ids = decisions.filter(F.col("verdict") == "novel").select("doc_id")
    kept_docs = (
        b.select("doc_id", "text")
        .join(kept_ids, "doc_id", "semi")
        .withColumn("epoch", F.lit(cur))
    )
    kept_bands = bands_b.join(kept_ids, "doc_id", "semi").withColumn(
        "epoch", F.lit(cur)
    )

    for df, path in (
        (decisions, dec_dir),
        (kept_docs, kept_dir),
        (kept_bands, idx_dir),
    ):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(path)
        )


# --------------------------------------------------------------------------
# harness: the corpus-entry loop with per-phase timers
# --------------------------------------------------------------------------
def run_gate(spark: SparkSession, sf_dir: str, epoch_fn, live_layout=False):
    """One full gate run; returns (total, arrival_sum, drains, read_s,
    n_rows, histogram).  ``live_layout`` reads the decision log through
    the package's current helpers (for the ``cur`` variant); otherwise
    the probe-local legacy 3-dir layout readers are used."""
    root = tempfile.mkdtemp(prefix="gate_ab_")
    src = os.path.join(root, "src")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    t_all = time.monotonic()
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        step = max(1, -(-n // _N_CHUNKS))
        bounds = [
            r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").collect()
        ][::step] + [None]
        stream = (
            spark.readStream.schema(DOC_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        w = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: epoch_fn(spark, state, df, eid))
            .option("checkpointLocation", ckpt)
        )
        arrivals = 0.0
        drains = []
        q = w.start()
        try:
            for i in range(_N_CHUNKS):
                if i >= len(bounds) - 1 or bounds[i] is None:
                    break
                lo = bounds[i]
                hi = bounds[i + 1] if i + 1 < len(bounds) else None
                chunk = docs.filter(F.col("doc_id") >= lo)
                if hi is not None:
                    chunk = chunk.filter(F.col("doc_id") < hi)
                t0 = time.monotonic()
                write_arrival_file(chunk, src, f"chunk{i}")
                arrivals += time.monotonic() - t0
                t0 = time.monotonic()
                q.processAllAvailable()
                drains.append(time.monotonic() - t0)
        finally:
            q.stop()
        t0 = time.monotonic()
        if live_layout:
            dec_dir = ingest._state_paths(state)[2]
            dec = ingest._decisions_frame(spark, dec_dir)
        else:
            dec = _decisions_frame_legacy(spark, _state_paths(state)[2])
        out = dec.orderBy("doc_id").localCheckpoint(eager=True)
        rows = out.groupBy("verdict").count().collect()
        read_s = time.monotonic() - t0
        hist = {r["verdict"]: r["count"] for r in rows}
        total = time.monotonic() - t_all
        return total, arrivals, drains, read_s, sum(hist.values()), hist
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe-gate-ab-r15", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    variants = [
        ("r13", _gate_epoch_r13, False),
        ("r14", _gate_epoch_r14, False),
        ("cur", ingest._gate_epoch, True),
    ]
    # one untimed warmup of the whole harness (codegen for the
    # shingle/band/verify chain is session-global)
    spark.sparkContext.setJobDescription("gate-ab warmup")
    run_gate(spark, sf_dir, _gate_epoch_r13)
    results: dict[str, list[float]] = {}
    hists = {}
    for rep in range(reps):
        for name, fn, live in variants:
            spark.sparkContext.setJobDescription(f"gate-ab {name} rep{rep}")
            total, arr, drains, read_s, n, hist = run_gate(
                spark, sf_dir, fn, live
            )
            results.setdefault(name, []).append(total)
            hists.setdefault(name, hist)
            print(
                f"{name} rep{rep}: total {total:6.2f}s  arrivals {arr:5.2f}s  "
                f"drains [{', '.join(f'{d:5.2f}' for d in drains)}]  "
                f"read {read_s:5.2f}s  rows {n}",
                flush=True,
            )
    print("---")
    for name, ts in results.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(
            f"{name}: min {min(ts):6.2f}  med {med:6.2f}  "
            f"runs [{', '.join(f'{t:.2f}' for t in ts)}]  hist {hists[name]}"
        )
    ident = len({tuple(sorted(h.items())) for h in hists.values()}) == 1
    print(f"verdict-histogram identical across variants: {ident}")
    spark.stop()


if __name__ == "__main__":
    main()
