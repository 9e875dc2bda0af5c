"""Corpus interchange formats — the sink/source pair LLM data work
actually exchanges: gzip JSONL shards (the lingua franca of public
text-pipeline tooling: HF datasets, Dolma, CCNet all ship it) next to
the engine's native parquet.  The reference repo's only interchange
format is its pretty-printed graph JSON (reference graph.py:10-28);
this module belongs to the driver's training-data-pipeline mandate.

Scale shape: the shard assignment is a deterministic hash of doc_id
(no rand(), reproducible run-to-run and engine-to-engine), the
repartition puts exactly one shard in one task so each shard directory
holds ONE gzip member (atomic, resumable re-export per shard), and the
manifest is a by-product aggregate of the same frame — one corpus
shuffle total.  Reading back is ``spark.read.json`` with the explicit
schema (no inference pass)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

_N_JSONL_SHARDS = 8  # floor; actual count scales with the corpus
_DOCS_PER_SHARD = 250_000  # target shard size — a fixed shard count
# would funnel a 100 TB corpus through 8 writer tasks
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _shard_count(n_docs: int) -> int:
    return max(_N_JSONL_SHARDS, -(-n_docs // _DOCS_PER_SHARD))


def export_corpus_jsonl(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """Export the documents table as ``_N_JSONL_SHARDS`` gzip JSONL
    shards and return the export manifest → one row per shard:
    (shard, n_docs, n_chars) — the receipt a downstream consumer
    reconciles against.  Round-trip identity (read-back equals the
    source table row-for-row, text bytes included) is pinned by
    tests/test_corpus_io.py."""
    import tempfile

    out = out_dir or tempfile.mkdtemp(prefix="corpus_jsonl_")
    docs = load_table(spark, sf_dir, "documents")
    n_shards = _shard_count(docs.count())
    sharded = docs.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .json(out)
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .orderBy("shard")
    )


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL export back with the explicit documents schema —
    the partition column ``shard`` is recovered from the directory
    layout and dropped so the result is source-shaped."""
    return (
        spark.read.schema(DOCS_SCHEMA + ", shard int")
        .json(path)
        .drop("shard")
    )


def export_corpus_jsonl_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-contained bench entry: export to a temp dir, return the
    manifest, clean up the files."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="corpus_jsonl_bench_")
    try:
        m = export_corpus_jsonl(spark, sf_dir, out)
        return spark.createDataFrame(m.collect(), m.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# the manifest is also DuckDB-oracle-able: the shard hash is xxhash64,
# which DuckDB lacks — so the pytest gate checks round-trip identity +
# manifest-vs-readback consistency instead (tests/test_corpus_io.py)
QUERIES = {"export_corpus_jsonl": export_corpus_jsonl_bench}
