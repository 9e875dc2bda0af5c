"""JSONL corpus export: round-trip identity (every row, text bytes
included), one gzip member per shard, and manifest consistency with
the written files."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.sources.corpus_io import (
    _N_JSONL_SHARDS,
    export_corpus_jsonl,
    read_corpus_jsonl,
)
from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_jsonl_round_trip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "jsonl")
    manifest = {r.shard: (r.n_docs, r.n_chars) for r in export_corpus_jsonl(spark, SF, out).collect()}

    src = sorted(tuple(r) for r in load_table(spark, SF, "documents").collect())
    back = sorted(tuple(r) for r in read_corpus_jsonl(spark, out).collect())
    assert back == src  # lossless round trip, text bytes included

    # layout: every shard dir holds exactly ONE gzip member
    shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(shard_dirs) == len(manifest) <= _N_JSONL_SHARDS
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".json.gz")]
        assert len(files) == 1, d

    # manifest reconciles with what was actually written
    got = {
        r.shard: (r.n_docs, r.n_chars)
        for r in spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars int, shard int"
        )
        .json(out)
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .collect()
    }
    assert got == manifest
