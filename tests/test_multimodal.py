"""Multimodal binary plumbing: the mapInPandas decode must agree with a
hand computation on real payload bytes, and the pure-Catalyst frame
sampler must agree with a Python reimplementation."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from distributed_graph_coloring_with_pyspark_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, source FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 20"
    ).fetchall()


def test_decode_features_match_hand_computation(spark):
    rows = {r.doc_id: r for r in MM.multimodal_decode_features(spark, SF).collect()}
    for doc_id, text, source in _docs():
        body = text.encode("utf-8")
        n = len(body)
        got = rows[doc_id]
        assert got.width == 16 + (n * 7) % 240
        assert got.height == 16 + (n * 13) % 240
        expect_frames = 1 + n % 50 if got.media_type in ("AUD!", "VID!") else 1
        assert got.n_frames == expect_frames
        assert got.brightness == pytest.approx(
            round(sum(body[:16]) / 16, 4), abs=1e-9
        )
        # media type derives from source index mod 3
        idx = int(source.replace("src", "")) % 3
        assert got.media_type == ["IMG!", "AUD!", "VID!"][idx]


def test_frame_sample_matches_python(spark):
    rows = {r.doc_id: r for r in MM.multimodal_frame_sample(spark, SF).collect()}
    for doc_id, text, _ in _docs():
        body = text.encode("utf-8")
        n_frames = len(body) // 64
        sampled = b"".join(
            body[f * 256 : f * 256 + 64] for f in range(0, (n_frames - 1) // 4 + 1)
        ) if n_frames > 0 else b""
        got = rows[doc_id]
        assert got.n_frames == n_frames
        assert got.n_sampled == math.ceil(n_frames / 4)
        assert got.sample_md5 == hashlib.md5(sampled).hexdigest()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_media_real(b"IMG!abc", "IMG!")


def test_blob_stats_magic_all_ok(spark):
    for r in MM.multimodal_blob_stats(spark, SF).collect():
        assert r.n_magic_ok == r.n_blobs
        assert r.media_type in ("IMG!", "AUD!", "VID!")
