"""DSIR importance resampling: semantic pin on a PLANTED corpus — the
sf0.01 DuckDB oracle (test_text_dedup_extra.py) proves the engine
computes the spec; this proves the spec does what DSIR is FOR: given a
target domain with a distinctive vocabulary, the selected top-k docs
are the raw-corpus docs that share it."""

from __future__ import annotations

import os

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _DSIR_FRACTION_DEN,
    _DSIR_FRACTION_NUM,
    dsir_select,
)


def _write_docs(spark, path: str, rows) -> str:
    df = spark.createDataFrame(
        [(i, text, lang, "src0", len(text)) for i, (text, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def test_dsir_selects_target_like_docs(spark, tmp_path):
    """40 docs: 8 'en' target docs speak vocabulary A; of the 32 raw
    docs, 8 also speak A (planted target-like) and 24 speak vocabulary
    B.  Top-20% selection (k=8) must consist of A-speakers, and every
    A-speaking non-target doc must outrank every B-speaker."""
    vocab_a = "alpha beta gamma delta epsilon zeta"
    vocab_b = "omega psi chi phi upsilon tau"
    rows = []
    for i in range(8):  # target domain (lang=en), vocabulary A
        rows.append((f"{vocab_a} {vocab_a} marker{i}", "en"))
    for i in range(8):  # planted target-like raw docs
        rows.append((f"{vocab_a} {vocab_a} other{i}", "de"))
    for i in range(24):  # background raw docs, vocabulary B
        rows.append((f"{vocab_b} {vocab_b} noise{i}", "fr"))
    sf_dir = _write_docs(spark, str(tmp_path), rows)

    got = dsir_select(spark, sf_dir).collect()
    k = -(-len(rows) * _DSIR_FRACTION_NUM // _DSIR_FRACTION_DEN)
    assert len(got) == k == 8
    assert [r["sel_rank"] for r in got] == list(range(1, k + 1))
    # every selected doc speaks vocabulary A (doc_ids 0..15)
    assert all(r["doc_id"] < 16 for r in got), got
    # and the scores separate the domains
    sel_min = min(r["log_weight"] for r in got)
    assert sel_min > 0, "target-like docs must have positive log-ratio"


def test_dsir_rank_is_deterministic(spark, tmp_path):
    """Identical corpora → identical selection and ranks (the md5
    bucketing and rounded-score tie-break leave no rand() anywhere)."""
    rows = [(f"tok{i % 7} tok{(i * 3) % 11} filler{i % 5}", ["en", "de"][i % 2]) for i in range(30)]
    sf_dir = _write_docs(spark, str(tmp_path), rows)
    a = [tuple(r) for r in dsir_select(spark, sf_dir).collect()]
    b = [tuple(r) for r in dsir_select(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 6  # ceil(30/5)
