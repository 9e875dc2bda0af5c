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


def test_real_decoder_ppm_handbuilt_bytes():
    """Hand-built P6 fixture (comment in header, 2x2 image) so the
    parser is pinned against raw bytes, independent of encode_ppm."""
    rgb = bytes(range(12))
    payload = b"P6\n# a comment\n2 2\n255\n" + rgb
    assert MM.decode_media_real(payload) == ("ppm", 2, 2, rgb)


def test_real_decoder_bmp_handbuilt_bytes():
    """Hand-built 2x2 24-bit BMP: bottom-up BGR rows with 2-byte pad.
    Top-down RGB out must reverse rows AND channels — a symmetric
    encode/decode bug could not hide from this fixture."""
    import struct as _struct

    # image rows (top-down RGB): row0 = (1,2,3),(4,5,6); row1 = (7,8,9),(10,11,12)
    row_bottom = bytes((9, 8, 7, 12, 11, 10)) + b"\x00\x00"  # stored first
    row_top = bytes((3, 2, 1, 6, 5, 4)) + b"\x00\x00"
    hdr = _struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    fmt, w, h, rgb = MM.decode_media_real(hdr + info + row_bottom + row_top)
    assert (fmt, w, h) == ("bmp", 2, 2)
    assert rgb == bytes(range(1, 13))


def test_real_decoder_roundtrip_container_invariant():
    """encode_ppm and encode_bmp of the same pixels decode to the SAME
    normalized top-down RGB stream (including non-multiple-of-4 widths
    that force BMP row padding)."""
    for w, h in [(1, 1), (2, 3), (5, 4), (7, 2)]:
        rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
        assert MM.decode_media_real(MM.encode_ppm(w, h, rgb)) == ("ppm", w, h, rgb)
        assert MM.decode_media_real(MM.encode_bmp(w, h, rgb)) == ("bmp", w, h, rgb)


def test_real_decoder_rejects_unknown_and_truncated():
    with pytest.raises(ValueError):
        MM.decode_media_real(b"IMG!abc")  # fake-magic blobs stay fake-decoded
    with pytest.raises(ValueError):
        MM.decode_media_real(b"P6\n2 2\n255\n\x00\x00\x00")  # truncated pixels
    with pytest.raises(ValueError):
        # 32-bpp BMP is out of scope for the dependency-free parser
        import struct as _struct

        hdr = _struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
        info = _struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
        MM.decode_media_real(hdr + info + b"\x00" * 4)


def test_blob_stats_magic_all_ok(spark):
    for r in MM.multimodal_blob_stats(spark, SF).collect():
        assert r.n_magic_ok == r.n_blobs
        assert r.media_type in ("IMG!", "AUD!", "VID!")


def test_real_decoder_rejects_nonstandard_ppm_maxval():
    """maxval < 255 needs sample rescaling (netpbm); raw passthrough
    would silently darken — the decoder must refuse, not guess."""
    with pytest.raises(ValueError):
        MM.decode_media_real(b"P6\n1 1\n127\n\x00\x00\x00")
