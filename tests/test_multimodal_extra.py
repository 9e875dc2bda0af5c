"""Oracle gate for pytest-gated multimodal operators (driver registry
is capped at 50 entries) — same contract as tools/check_oracle.py at
the same scale factor (sf0.01), using its own canon function."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.multimodal import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_multimodal_extra_matches_oracle(spark, name):
    # PYTEST_ORACLES ⊆ PYTEST_QUERIES: python-oracle entries (phash)
    # have their own dedicated tests below
    assert set(PYTEST_ORACLES) <= set(PYTEST_QUERIES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows), name
    assert canon_rows(scols, srows) == canon_rows(ddf.columns, drows), name


def _python_allpairs_phash(rows):
    """Independent all-pairs oracle over collected (doc_id, media_type,
    blob) rows using the same signature function — the exactness of the
    banded plan rests on the pigeonhole argument, which this verifies."""
    from distributed_graph_coloring_with_pyspark_spark.operators.multimodal import (
        _PHASH_HAMMING_MAX,
        _fake_phash,
    )

    sigs = [(r.doc_id, r.media_type, _fake_phash(bytes(r.blob))) for r in rows]
    want = set()
    for i in range(len(sigs)):
        d1, m1, (h1, l1) = sigs[i]
        for j in range(i + 1, len(sigs)):
            d2, m2, (h2, l2) = sigs[j]
            if m1 != m2:
                continue
            ham = bin(h1 ^ h2).count("1") + bin(l1 ^ l2).count("1")
            if ham <= _PHASH_HAMMING_MAX:
                want.add((m1, min(d1, d2), max(d1, d2), ham))
    return want


def test_phash_neardup_matches_python_allpairs(spark):
    """The banded phash plan must EQUAL the all-pairs answer on the real
    sf0.01 corpus (pigeonhole-complete at hamming <= 3)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.multimodal import (
        multimodal_neardup_phash,
        with_blob,
    )
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    rows = with_blob(load_table(spark, SF, "documents")).select(
        "doc_id", "media_type", "blob"
    ).collect()
    want = _python_allpairs_phash(rows)
    got = {
        (r.media_type, r.doc_a, r.doc_b, r.hamming)
        for r in multimodal_neardup_phash(spark, SF).collect()
    }
    assert got == want


def test_phash_neardup_planted_fixture(spark, tmp_path):
    """Planted near-identical payloads: a byte-identical clone (hamming
    0) and a one-char edit (a localized edit perturbs one grid bucket
    -> <= 2 bits) must surface as pairs; an unrelated doc must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_graph_coloring_with_pyspark_spark.operators.multimodal import (
        multimodal_neardup_phash,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    edited = base[:-10] + "Zog " + base[-6:]
    other = "completely different content with other bytes entirely " * 5
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                "text": pa.array([base, base, edited, other], pa.string()),
                "source": pa.array(["src0"] * 4, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in multimodal_neardup_phash(spark, str(tmp_path)).collect()
    }
    assert (1, 2, 0) in got, got  # exact clone
    assert any(a == 1 and b == 3 for a, b, _ in got), got  # near-dup edit
    assert not any(9 in (a, b) for a, b, _ in got), got  # unrelated doc


def test_decode_real_matches_python_oracle(spark):
    """Pure-python oracle for multimodal_decode_real: every output
    column recomputed from the TEXT alone (the _real_pixels derivation
    plus plain arithmetic) — neither encode_* nor decode_media_real is
    touched, so the Spark result matching proves the container
    round-trip is lossless for both formats."""
    import hashlib

    import duckdb as _duckdb
    import numpy as _np

    from distributed_graph_coloring_with_pyspark_spark.operators.multimodal import (
        multimodal_decode_real,
    )

    got = {r.doc_id: r for r in multimodal_decode_real(spark, SF).collect()}
    con = _duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    con.close()
    assert len(got) == len(docs) and len(docs) > 0
    for doc_id, text in docs:
        base = text.encode("utf-8") or b"\x00"
        n = len(base)
        w, h = 4 + n % 13, 3 + n % 7
        need = w * h * 3
        rgb = (base * (need // len(base) + 1))[:need]
        px = _np.frombuffer(rgb, _np.uint8).reshape(-1, 3)
        r = got[doc_id]
        assert r.container == ("ppm" if doc_id % 2 == 0 else "bmp")
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        means = px.mean(axis=0)
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(
            round(float(m), 4) for m in means
        )
        assert r.pixels_md5 == hashlib.md5(rgb).hexdigest()
