"""Dedup semantics on synthetic corpora with PLANTED duplicates (the
sf0.01 near-dup pairs are also covered by the DuckDB oracle gate; these
tests pin behavior on controlled inputs)."""

from __future__ import annotations

import pytest

from distributed_graph_coloring_with_pyspark_spark.operators import text_dedup as TD

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(path)
    return str(tmp_path)


_BASE = " ".join(f"tok{i}" for i in range(100))  # 100 distinct tokens
_NEAR = _BASE.replace("tok50", "changed")  # one token differs → jaccard ≈ 0.94
_FAR = " ".join(f"other{i}" for i in range(100))


def test_dedup_exact_counts(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [_BASE, "  " + _BASE.upper() + " ", _FAR])
    row = TD.dedup_exact(spark, sf).collect()[0]
    # doc1 normalizes (lower+trim) to doc0 → 3 docs, 2 unique, 1 removed
    assert (row.n_docs, row.n_unique, row.n_dups_removed) == (3, 2, 1)


def test_minhash_finds_planted_near_dup(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [_BASE, _NEAR, _FAR])
    pairs = {(r.doc_a, r.doc_b) for r in TD.dedup_near_minhash(spark, sf).collect()}
    assert (0, 1) in pairs  # the planted near-dup
    assert not any(2 in p for p in pairs)  # unrelated doc never paired


def test_minhash_jaccard_value_is_exact(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [_BASE, _NEAR])
    [r] = TD.dedup_near_minhash(spark, sf).collect()
    # 100 tokens → 98 shingles each; one changed token kills 3 shingles
    # per side: |∩| = 95, |∪| = 101
    assert r.jaccard == pytest.approx(95 / 101, abs=1e-6)


def test_simhash_identical_token_sets_collide(spark, tmp_path):
    # same token multiset, different order → same distinct-token set
    shuffled = " ".join(reversed(_BASE.split()))
    sf = _write_docs(spark, tmp_path, [_BASE, shuffled, _FAR])
    rows = TD.dedup_simhash(spark, sf).collect()
    exact = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert exact.get((0, 1)) == 0  # identical sets → identical signature
    assert not any(2 in p for p in exact)


def test_winnowing_handles_sub_window_docs(spark, tmp_path):
    """Docs shorter than the 8-char window must yield an empty sketch,
    not an ANSI sequence(stop < start) error (round-2 ADVICE finding);
    chunking must survive them too."""
    sf = _write_docs(spark, tmp_path, ["", "ab", "1234567", "12345678", _BASE])
    rows = {r.doc_id: r for r in TD.winnowing_fingerprints(spark, sf).collect()}
    assert rows[0].n_windows == 0 and rows[0].winnow_fp == ""
    assert rows[1].n_windows == 0 and rows[2].n_windows == 0
    assert rows[3].n_windows == 1  # exactly one window at length 8
    assert rows[4].n_windows > 0
    # chunking on the same pathological corpus
    chunks = TD.chunk_documents(spark, sf).collect()
    assert {c.doc_id for c in chunks} >= {1, 2, 3, 4}


def test_chunking_is_codepoint_based_on_unicode(spark, tmp_path):
    """substring/length must count CODE POINTS, not bytes or UTF-16
    units, or multi-byte text (CJK, emoji beyond the BMP) chunks at the
    wrong offsets.  Oracle: a pure-Python reimplementation of the same
    chunk rule (Python strings are code-point sequences)."""
    texts = [
        "日本語のテキスト" * 60,          # 3-byte CJK, 480 cp
        "naïve café ĝi " * 40,            # 2-byte accents
        ("🚀x" * 150),                    # surrogate-pair emoji, 300 cp
        "plain ascii " * 30,
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_len
        for r in TD.chunk_documents(spark, sf).collect()
    }
    size, stride = 200, 150
    expected = {}
    for doc_id, t in enumerate(texts):
        # full-coverage rule (round 5): stride grid plus the clamped
        # tail start, deduped — mirrors chunk_documents exactly
        tail = max(len(t) - size, 0)
        starts = sorted(set(range(0, max(len(t) - (size - 1), 1), stride)) | {tail})
        for idx, s in enumerate(starts):
            expected[(doc_id, idx)] = len(t[s : s + size])
    assert got == expected


def test_fingerprint_order_insensitive(spark, tmp_path):
    shuffled = " ".join(reversed(_BASE.split()))
    sf = _write_docs(spark, tmp_path, [_BASE, shuffled, _FAR])
    rows = {r.doc_id: (r.fingerprint, r.n_same) for r in
            TD.doc_fingerprints(spark, sf).collect()}
    assert rows[0][0] == rows[1][0]  # shuffled copy → same fingerprint
    assert rows[0][1] == 2 and rows[2][1] == 1
