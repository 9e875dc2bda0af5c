"""Oracle gate for pytest-gated similarity operators (driver registry
is capped at 50 entries) — same contract as tools/check_oracle.py at
the same scale factor (sf0.01), using its own canon function."""

from __future__ import annotations

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_similarity_extra_matches_oracle(spark, name):
    # PYTEST_ORACLES ⊆ PYTEST_QUERIES: python-oracle entries (pca)
    # have their own dedicated tests below
    assert set(PYTEST_ORACLES) <= set(PYTEST_QUERIES)
    sdf = PYTEST_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    ddf = con.sql(PYTEST_ORACLES[name])
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows), name
    assert srows, name
    assert canon_rows(scols, srows) == canon_rows(ddf.columns, drows), name


def test_quantization_quality_bounds(spark):
    """int8 SQ on unit-ish random vectors must reconstruct well: cosine
    ≥ 0.999 and max error ≤ scale/254 (+5e-7: the reported error is
    rounded to 6 decimals, which can exceed the exact bound by up to
    half that quantum) for every vector."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    # registry row since the r11 rotation; the quality bound stays here
    rows = quantize_embeddings_int8(spark, SF).collect()
    assert all(r.cos_recon >= 0.999 for r in rows)
    assert all(r.max_abs_err <= r.scale / 254 + 5e-7 for r in rows)


def test_pca_matches_numpy(spark):
    """The distributed covariance + driver eigensolve must agree with
    numpy computing both steps directly from the collected vectors."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        embedding_pca_top,
    )
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    X = np.array(
        [r.embedding for r in load_table(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    cov = np.cov(X, rowvar=False)
    want = np.linalg.eigvalsh(cov)[::-1]
    total = want.sum()
    got = embedding_pca_top(spark, SF).collect()
    assert [r.component for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        w = want[r.component - 1]
        assert abs(r.eigenvalue - round(w, 6)) <= 2e-6, (r, w)
        assert abs(r.explained_ratio - round(w / total, 6)) <= 2e-6
    # ratios are a probability-like profile over a PSD spectrum
    assert all(r.explained_ratio >= 0 for r in got)


def test_covariance_plan_has_no_join(spark):
    """Round-5 reshape contract (VERDICT r4 #2): covariance partials are
    a mapInPandas scan + ONE partial-reduce aggregation — no join
    anywhere in the plan (the round-4 form self-joined ~DIM²/2 exploded
    rows per vector), and exactly the DIM·(DIM+1)/2 upper-triangle rows
    come out."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _DIM,
        _covariance_partials,
    )
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    df = _covariance_partials(emb, np.zeros(_DIM), _DIM)
    assert "Join" not in plan_string(df)
    assert df.count() == _DIM * (_DIM + 1) // 2


def test_lsh_pair_source_recall_and_precision(spark):
    """The banded LSH pair generator (VERDICT r7 #3) vs the exact
    blocked-GEMM pair frame, same contract as the ANN top-k gates:
    precision is EXACTLY 1.0 (every candidate is exact-verified, so the
    LSH pairs must be a subset of the exact pairs — any extra row is a
    verify bug), recall ≥ 0.85 at sf0.01 (measured 0.929: 13/14 pairs;
    deterministic — seeded planes, fixed data).  Candidate volume must
    be well under all-pairs (measured ~13% — the N^1.62 operating point
    at this deliberately-hard 3.6σ threshold)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _NEARDUP_THRESHOLD,
        _lsh_candidate_pairs,
        _neardup_pair_frame,
    )
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = {(r.id_a, r.id_b) for r in _neardup_pair_frame(emb).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in _neardup_pair_frame(emb, pair_source="lsh").collect()
    }
    assert lsh <= exact  # precision 1.0 by construction
    assert len(lsh & exact) / len(exact) >= 0.85
    n = emb.count()
    cand = _lsh_candidate_pairs(emb, _NEARDUP_THRESHOLD).count()
    assert cand < 0.25 * n * (n - 1) / 2


def test_lsh_band_count_tracks_threshold(spark):
    """The generator is threshold-aware: the repo's hard t=0.45 needs
    hundreds of bands (LSH physics at 3.6σ), a SemDeDup-realistic
    t=0.9 needs ~14 — the same wiring spans both regimes."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _PAIR_LSH_MAX_BANDS,
        _pair_lsh_bands,
    )

    assert _pair_lsh_bands(0.9) <= 20
    assert 100 <= _pair_lsh_bands(0.45) <= _PAIR_LSH_MAX_BANDS
    # ADVICE r8 edge cases: t >= 1.0 must not raise (ln 0) — every band
    # collides, one suffices; sub-cap thresholds warn nothing; a
    # cap-truncated threshold surfaces the degraded recall
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _pair_lsh_bands(1.0) == 1
        assert _pair_lsh_bands(0.45) >= 100
        assert not caught
        assert _pair_lsh_bands(-1.0) == _PAIR_LSH_MAX_BANDS
        assert len(caught) == 1 and issubclass(
            caught[0].category, RuntimeWarning
        )
        assert "recall" in str(caught[0].message)


def test_neardup_clusters_lsh_composition(spark):
    """embedding_neardup_clusters(pair_source="lsh") runs the identical
    downstream component engine on the banded pair frame.  Missing
    edges can only SPLIT components, never merge them or invent
    members — on this fixture (all exact clusters are 2-vec pairs,
    deterministic seeded planes) that means the LSH clustering is
    exactly the exact clustering minus the clusters of missed pairs:
    a strict subset at ≥ 0.85 of the exact count (measured: 13 of
    14)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        embedding_neardup_clusters,
    )

    exact = {
        (r.cluster_id, r.n_vecs)
        for r in embedding_neardup_clusters(spark, SF).collect()
    }
    lsh = {
        (r.cluster_id, r.n_vecs)
        for r in embedding_neardup_clusters(spark, SF, pair_source="lsh").collect()
    }
    assert lsh <= exact
    assert len(lsh) >= 0.85 * len(exact)


def test_modality_agreement_lsh_composition(spark):
    """dedup_modality_agreement(embed_pair_source="lsh"): the text side
    is unchanged, the embedding side loses at most the measured LSH
    misses — n_text_pairs equal, n_embed_pairs within recall of the
    exact run, and no pair can be embed-flagged that the exact run
    didn't flag."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        dedup_modality_agreement,
    )

    ex = dedup_modality_agreement(spark, SF).collect()[0]
    ls = dedup_modality_agreement(spark, SF, embed_pair_source="lsh").collect()[0]
    assert ls.n_text_pairs == ex.n_text_pairs
    assert ls.n_embed_pairs <= ex.n_embed_pairs
    assert ls.n_embed_pairs >= 0.85 * ex.n_embed_pairs
    assert ls.n_both <= ex.n_both


def test_contamination_flags_planted_eval_clone(spark, tmp_path):
    """embedding_contamination must flag a train vector that is a
    byte-copy of an eval vector (cos 1.0, matched to that eval id) and
    must NOT flag orthogonal background vectors.  Fixture: one-hot-ish
    disjoint basis vectors (pairwise cosine 0) + one planted copy, so
    the expected report is exactly one row."""
    import random

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        embedding_contamination,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [0.0] * 64
        v[i % 64] = 1.0
        v[(i + 7) % 64] = 0.1 * (1 + (i % 3))  # break exact symmetry
        rows.append((i, v, 0))
    # vec_id 30 (eval: 30 % 10 == 0) cloned into train id 33
    rows[33] = (33, list(rows[30][1]), 0)
    # noise dims so norms differ slightly from 1
    rows = [
        (i, [x + 0.0 for x in v], lbl) for i, v, lbl in rows
    ]
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").write.mode(
        "overwrite"
    ).parquet(path)

    got = embedding_contamination(spark, str(tmp_path)).collect()
    assert [(r.train_vec_id, r.eval_vec_id) for r in got] == [(33, 30)]
    assert got[0].cos_sim == 1.0


def test_contamination_eval_cap_binds(spark, tmp_path):
    """r12 (VERDICT r11 #1): the eval suite is HARD-bounded.  Fixture:
    6 mod-10 holdout rows with ``eval_cap=3`` → suite = {0, 10, 20}.
    A train clone of suite member 20 is flagged; a train clone of
    holdout row 30 (PAST the cap → outside the suite) is NOT — the
    bound changes semantics deliberately, never silently.  The whole
    capped result is also cross-checked against the DuckDB oracle at
    the same cap."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _contamination_emb_oracle,
        embedding_contamination,
    )

    rows = []
    for i in range(60):
        v = [0.0] * 64
        v[i % 64] = 1.0
        v[(i + 7) % 64] = 0.1 * (1 + (i % 3))
        rows.append((i, v, 0))
    rows[23] = (23, list(rows[20][1]), 0)  # clone of IN-suite eval 20
    rows[33] = (33, list(rows[30][1]), 0)  # clone of PAST-cap holdout 30
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(path)

    got = embedding_contamination(spark, str(tmp_path), eval_cap=3).collect()
    flagged = [(r.train_vec_id, r.eval_vec_id) for r in got]
    assert (23, 20) in flagged
    assert all(e in (0, 10, 20) for _, e in flagged)
    assert 33 not in [t for t, _ in flagged]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'")
    drows = con.sql(_contamination_emb_oracle(3)).fetchall()
    con.close()
    scols = ["train_vec_id", "eval_vec_id", "cos_sim"]
    srows = [tuple(r) for r in got]
    assert len(srows) == len(drows)
    assert canon_rows(scols, srows) == canon_rows(scols, drows)


def test_ann_recall_report_consistent_with_gates(spark):
    """The productized recall report must reproduce the recall the
    pytest gates compute from the same frames, and every tier must sit
    above its design floor on the graded fixture."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _TOP_K,
        ann_recall_report,
        knn_exact_topk,
        ann_hyperplane_topk,
    )

    rows = {r.method: r for r in ann_recall_report(spark, SF).collect()}
    assert set(rows) == {"hyperplane_lsh", "ivf", "ivfpq", "opq", "pq_adc"}
    exact = {
        (r.probe_id, r.neighbor_id) for r in knn_exact_topk(spark, SF).collect()
    }
    lsh = {
        (r.probe_id, r.neighbor_id)
        for r in ann_hyperplane_topk(spark, SF).collect()
    }
    want = round(len(lsh & exact) / len(exact), 4)
    assert rows["hyperplane_lsh"].recall == want
    for r in rows.values():
        assert r.k == _TOP_K and r.n_probes == len(exact) // _TOP_K
        assert 0.0 <= r.recall <= 1.0
    assert rows["hyperplane_lsh"].recall >= 0.9
    assert rows["ivf"].recall >= 0.85
    assert rows["pq_adc"].recall >= 0.85
    assert rows["ivfpq"].recall >= 0.85
    assert rows["opq"].recall >= 0.85


def test_ann_recall_report_reuses_session_artifacts(spark):
    """r10 (VERDICT r9 #3): the recall report consumes the memoized
    per-(session, corpus, method) top-k frames instead of re-running
    exact KNN + all four ANN tiers per call.  Pins: (a) a repeat call
    returns identical values while the memo holds exactly the five
    tier frames, (b) release drops all five, (c) a post-release call
    rebuilds and still agrees — the artifact is a cache, not a fork."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _ANN_TOPK_CACHE,
        ann_recall_report,
        ann_topk_frame_cached,
        clear_ann_topk_cache,
    )

    clear_ann_topk_cache(spark)
    first = ann_recall_report(spark, SF).collect()
    memo = _ANN_TOPK_CACHE.get(spark)
    assert memo is not None and {m for (_, m) in memo} == {
        "exact",
        "hyperplane_lsh",
        "ivf",
        "ivfpq",
        "opq",
        "pq_adc",
    }
    cached_ivf = ann_topk_frame_cached(spark, SF, "ivf")
    assert ann_topk_frame_cached(spark, SF, "ivf") is cached_ivf
    second = ann_recall_report(spark, SF).collect()
    assert [r.asDict() for r in second] == [r.asDict() for r in first]
    assert clear_ann_topk_cache(spark) == 6
    assert _ANN_TOPK_CACHE.get(spark) is None
    rebuilt = ann_recall_report(spark, SF).collect()
    assert [r.asDict() for r in rebuilt] == [r.asDict() for r in first]
    clear_ann_topk_cache(spark)


def test_contamination_plan_shape(spark):
    """The decontamination scan must stay the designed plan: ONE
    Arrow-batched python pass over the corpus (the GEMM prefilter) and
    NO corpus × eval join before it — the id-emitting first cut that
    re-scored every candidate against the whole eval frame measured
    213× at 10× data, and this pin keeps that regression structural."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        embedding_contamination,
    )
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    import re

    plan = plan_string(embedding_contamination(spark, SF))
    # exactly one MapInPandas NODE (formatted plans print each node in
    # the tree and again in the details section)
    assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1
    # the only joins are candidate-pair-sized: pairs->train equi-join
    # and the broadcast eval-frame lookup (no corpus-wide cross join)
    assert "CartesianProduct" not in plan


def test_kcenter_select_matches_numpy_greedy(spark):
    """r11: exact replication of the greedy max-min sweep — same seed
    (smallest vec_id), same 9-dp rounding before the argmax, same
    smallest-id tie-break, same selected-id exclusion — plus the greedy
    invariants: ranks are 0..k-1, ids distinct, and the max-min radius
    is non-increasing."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _KCENTER_K,
        kcenter_select,
    )

    rows = sorted(
        (
            (r.vec_id, [float(x) for x in r.embedding])
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding")
            .collect()
        ),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.array([t[1] for t in rows])
    Xn = X / np.sqrt((X * X).sum(1))[:, None]

    sel = [0]  # positional index of the smallest vec_id
    expect = [(0, int(ids[0]), None)]
    while len(sel) < min(_KCENTER_K, len(ids)):
        best_cos = (Xn @ Xn[sel].T).max(axis=1)
        d = np.round(1.0 - best_cos, 9)
        d[sel] = -np.inf  # exclusion
        # argmax with smallest-id tie-break: ids are sorted ascending,
        # so the first occurrence of the max IS the smallest id
        j = int(np.argmax(d))
        sel.append(j)
        expect.append((len(sel) - 1, int(ids[j]), float(d[j])))

    got = [
        (r.sel_rank, r.vec_id, r.dist_at_selection)
        for r in kcenter_select(spark, SF).orderBy("sel_rank").collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, gd), (_, _, ed) in zip(got[1:], expect[1:]):
        assert gd == pytest.approx(ed, abs=1e-9)
    assert len({b for _, b, _ in got}) == len(got)  # distinct centers
    dists = [d for _, _, d in got[1:]]
    assert all(x >= y - 1e-12 for x, y in zip(dists, dists[1:]))  # non-increasing


def test_kcenter_sketched_identity_when_sketch_covers_corpus(spark):
    """r12 (VERDICT r11 missing #2): with sketch_size >= the corpus the
    two-stage variant IS the exact greedy — same centers in the same
    order, same radii (the audit pass evaluates the identical Catalyst
    expression the exact path's struct-max does)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        kcenter_select,
        kcenter_select_sketched,
    )

    ex = kcenter_select(spark, SF).orderBy("sel_rank").collect()
    sk = kcenter_select_sketched(spark, SF).orderBy("sel_rank").collect()
    assert [(r.sel_rank, r.vec_id) for r in sk] == [
        (r.sel_rank, r.vec_id) for r in ex
    ]
    for a, b in zip(ex[1:], sk[1:]):
        assert b.dist_at_selection == pytest.approx(
            a.dist_at_selection, abs=1e-9
        )
    assert sk[0].dist_at_selection is None


def test_kcenter_sketched_radius_gate_under_forced_sketch(spark):
    """A sketch of 64 of the 500 corpus rows must still place centers
    whose EXACT corpus max-min radius is within 25% of the exhaustive
    greedy's (measured 1.008 on this fixture — the gate leaves real
    margin without letting a broken sketch through), and the manifest
    keeps the greedy invariants: ranks 0..k-1, distinct corpus ids,
    non-increasing radius."""
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _KCENTER_K,
        kcenter_select,
        kcenter_select_sketched,
    )

    ex = kcenter_select(spark, SF).orderBy("sel_rank").collect()
    sk = kcenter_select_sketched(spark, SF, sketch_size=64).orderBy(
        "sel_rank"
    ).collect()
    assert [r.sel_rank for r in sk] == list(range(min(_KCENTER_K, 500)))
    assert len({r.vec_id for r in sk}) == len(sk)
    corpus_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id")
        .collect()
    }
    assert {r.vec_id for r in sk} <= corpus_ids
    ds = [r.dist_at_selection for r in sk[1:]]
    assert all(x >= y - 1e-12 for x, y in zip(ds, ds[1:]))
    assert sk[-1].dist_at_selection <= 1.25 * ex[-1].dist_at_selection


def test_opq_rotation_gates(spark):
    """r12 (VERDICT r11 missing #3): the learned OPQ rotation must (a)
    be orthogonal, (b) BALANCE per-subspace residual variance at least
    as well as the identity layout, (c) REDUCE PQ quantization
    distortion on the corpus residuals vs the plain residual codebooks
    (the OPQ promise — measured 0.946 on this fixture), and (d) keep
    the composite's recall at the family floor."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators import (
        similarity as S,
    )

    emb = S.load_table(spark, SF, "embeddings")
    cents = S._get_ivf_centroids(spark, SF, emb)
    rot, obooks = S._get_opq_state(spark, SF, emb)
    assert np.abs(rot @ rot.T - np.eye(S._DIM)).max() < 1e-9

    res = np.array(
        [
            r.residual
            for r in S._residual_corpus(emb, cents).select("residual").collect()
        ]
    )

    def subspace_spread(X):
        per = X.var(axis=0).reshape(S._PQ_M, S._PQ_SUB).sum(1)
        return float(per.max() / per.min())

    assert subspace_spread(res @ rot) <= subspace_spread(res) + 1e-9

    pbooks = S._get_ivfpq_codebooks(spark, SF, emb, cents)

    def mse(X, books):
        B = S._np_books(books)
        codes = S._batch_codes(X, B)
        rec = np.concatenate(
            [B[m][codes[:, m]] for m in range(S._PQ_M)], axis=1
        )
        return float(((X - rec) ** 2).sum(1).mean())

    assert mse(res @ rot, obooks) <= mse(res, pbooks)

    exact = {
        (r.probe_id, r.neighbor_id) for r in S.knn_exact_topk(spark, SF).collect()
    }
    opq = {
        (r.probe_id, r.neighbor_id) for r in S.ann_opq_topk(spark, SF).collect()
    }
    assert len(opq & exact) / len(exact) >= 0.85


def test_kcenter_both_variants_on_tiny_corpus(spark, tmp_path):
    """ADVICE r12: degenerate corpora (n <= K) must not crash either
    variant — the sketched audit's conditional max can go NULL on such
    inputs, which must surface as a NULL radius, not a TypeError.  With
    the sketch covering everything the two variants must also agree."""
    import pandas as pd

    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _DIM,
        kcenter_select,
        kcenter_select_sketched,
    )

    tiny = str(tmp_path)
    rows = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [
                [1.0] + [0.0] * (_DIM - 1),
                [0.0, 1.0] + [0.0] * (_DIM - 2),
                [1.0] + [0.0] * (_DIM - 1),  # duplicate of vec 0
            ],
            "label": [0, 0, 0],
        }
    )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tiny}/embeddings.parquet")

    ex = kcenter_select(spark, tiny).orderBy("sel_rank").collect()
    sk = kcenter_select_sketched(spark, tiny).orderBy("sel_rank").collect()
    assert [(r.sel_rank, r.vec_id) for r in ex] == [(0, 0), (1, 1), (2, 2)]
    assert [(r.sel_rank, r.vec_id) for r in sk] == [(0, 0), (1, 1), (2, 2)]
    # rank-2 center is the duplicate: its max-min radius is exactly 0
    assert ex[2].dist_at_selection == sk[2].dist_at_selection == 0.0

    # single-row corpus: both variants emit the bare seed manifest
    one = str(tmp_path / "one")
    spark.createDataFrame(
        rows.iloc[:1], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{one}/embeddings.parquet")
    for fn in (kcenter_select, kcenter_select_sketched):
        got = fn(spark, one).collect()
        assert [(r.sel_rank, r.vec_id, r.dist_at_selection) for r in got] == [
            (0, 0, None)
        ]


def test_kcenter_pool_fallback_paths_stay_exact(spark, monkeypatch):
    """r14 opt: the exact greedy now runs over a bounded candidate pool
    with refresh-on-bound-crossing and a full-scan fallback.  Shrink the
    pool to 4 (<< K) so nearly every round must refresh AND routinely
    fail its refreshed bound (the bound sits at the 5th-best distance),
    exercising refresh + fallback heavily — the output must STILL equal
    the plain numpy greedy the normal-pool test pins."""
    import numpy as np

    from distributed_graph_coloring_with_pyspark_spark.operators import (
        similarity as S,
    )

    monkeypatch.setattr(S, "_KCENTER_POOL_CAP", 4)
    got = [
        (r.sel_rank, r.vec_id, r.dist_at_selection)
        for r in S.kcenter_select(spark, SF).orderBy("sel_rank").collect()
    ]

    rows = sorted(
        (
            (int(r.vec_id), [float(v) for v in r.embedding])
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        ),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows], dtype=np.int64)
    X = np.array([t[1] for t in rows], dtype=np.float64)
    Xn = X / np.sqrt((X * X).sum(1))[:, None]
    sel = [0]
    expect = [(0, int(ids[0]), None)]
    while len(sel) < min(S._KCENTER_K, len(ids)):
        d = np.round(1.0 - (Xn @ Xn[sel].T).max(axis=1), 9)
        d[sel] = -np.inf
        j = int(np.argmax(d))
        sel.append(j)
        expect.append((len(sel) - 1, int(ids[j]), float(d[j])))

    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, gd), (_, _, ed) in zip(got[1:], expect[1:]):
        assert gd == pytest.approx(ed, abs=1e-9)


def test_kcenter_pool_bound_rounding_boundary(spark, tmp_path, monkeypatch):
    """r15 (VERDICT r14 #6 / ADVICE r14): adversarial 9-dp grid
    boundary AT the pool bound.  The corpus is engineered so that

    - five candidates are EXACT distance ties (identical (c, s)
      components on orthogonal axes), so every pool round's in-pool
      argmax sits exactly at the bound (d == B, never > B + 1e-9) and
      the greedy must take the refresh -> full-scan-fallback path with
      the smallest-id tie-break deciding each pick, and
    - a sixth candidate's true distance STRADDLES a 1e-9 rounding
      midpoint with the tied group: d6 - d* ~ 1e-10 (< the 1e-9
      headroom, within 1e-10 of the midpoint on each side), so the
      9-dp rounding puts it one full grid step ABOVE the group and it
      must win outright despite the raw gap being ~1e-10.

    The pool path (cap=2, bound active every round), the full-scan
    fallback, and the numpy greedy oracle must all agree — this is the
    boundary case the +1e-9 bound headroom exists for.  The numpy
    greedy is the AUTHORITATIVE semantics (every kcenter test pins it);
    components are chosen sparse (<= 3 nonzero, one 8-float block) so
    numpy's pairwise summation and Spark's left-to-right aggregation
    produce bit-identical doubles and the test cannot flake on
    summation order."""
    import numpy as np
    import pandas as pd

    from distributed_graph_coloring_with_pyspark_spark.operators import (
        similarity as S,
    )

    C32 = np.float32(0.3)
    S32 = np.float32(0.95)

    def d_to_seed(c, s, t=np.float32(0.0)):
        v = np.array([float(c), float(s), float(t)], dtype=np.float64)
        return 1.0 - v[0] / np.sqrt((v * v).sum())

    # scan float32 neighbors of 0.3 for a tied-group distance d* that
    # sits 2e-11..1e-10 BELOW a 1e-9 rounding midpoint (grid units:
    # frac in [0.40, 0.48])
    c = C32
    d_star = None
    for _ in range(20000):
        d = d_to_seed(c, S32)
        fr = (d * 1e9) % 1.0
        if 0.40 <= fr <= 0.48:
            d_star = d
            break
        c = np.nextafter(c, np.float32(1.0))
    assert d_star is not None, "no float32 c found near the midpoint"

    # scan a third tiny component t for the straddler: same 1e-9 cell,
    # 2e-11..1e-10 ABOVE the midpoint (frac in [0.52, 0.60])
    t_pick = None
    m_star = np.floor(d_star * 1e9)
    for k in range(1, 4001):
        t = np.float32(1.0e-5 + k * 1.0e-8)
        d6 = d_to_seed(c, S32, t)
        fr = (d6 * 1e9) % 1.0
        if np.floor(d6 * 1e9) == m_star and 0.52 <= fr <= 0.60:
            t_pick = t
            break
    assert t_pick is not None, "no float32 t found across the midpoint"
    d6 = d_to_seed(c, S32, t_pick)
    assert 0 < d6 - d_star < 1e-9  # raw gap inside the headroom
    # rounded: exactly one 1e-9 grid step apart (approx — 9-dp decimals
    # are not exactly representable as doubles)
    assert abs(np.round(d6, 9) - np.round(d_star, 9) - 1e-9) < 1e-15

    dim = S._DIM
    cf, sf, tf = float(c), float(S32), float(t_pick)

    def vec(entries):
        v = [0.0] * dim
        for i, val in entries:
            v[i] = val
        return v

    rows = pd.DataFrame(
        {
            "vec_id": list(range(8)),
            "embedding": [
                vec([(0, 1.0)]),  # seed
                vec([(0, cf), (1, sf)]),  # exact-tie group, d = d*
                vec([(0, cf), (2, sf)]),
                vec([(0, cf), (3, sf)]),
                vec([(0, cf), (4, sf)]),
                vec([(0, cf), (5, sf)]),
                vec([(0, cf), (6, sf), (7, tf)]),  # straddler, d = d6
                vec([(0, 0.9), (1, 0.436)]),  # far tail, picked last
            ],
            "label": [0] * 8,
        }
    )
    tiny = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tiny}/embeddings.parquet")

    monkeypatch.setattr(S, "_KCENTER_POOL_CAP", 2)
    got = [
        (r.sel_rank, r.vec_id, r.dist_at_selection)
        for r in S.kcenter_select(spark, tiny).orderBy("sel_rank").collect()
    ]

    # authoritative numpy greedy over the same float32-snapped matrix
    X = np.array(
        [np.asarray(e, dtype=np.float32) for e in rows["embedding"]],
        dtype=np.float64,
    )
    Xn = X / np.sqrt((X * X).sum(1))[:, None]
    sel = [0]
    expect = [(0, 0, None)]
    while len(sel) < min(S._KCENTER_K, len(X)):
        d = np.round(1.0 - (Xn @ Xn[sel].T).max(axis=1), 9)
        d[sel] = -np.inf
        j = int(np.argmax(d))
        sel.append(j)
        expect.append((len(sel) - 1, j, float(d[j])))

    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, gd), (_, _, ed) in zip(got[1:], expect[1:]):
        assert gd == pytest.approx(ed, abs=1e-9)
    # the straddler must have won over the tied group on the rounded
    # grid: rank 1 is vec 6, then the group in id order, then the tail
    assert [b for _, b, _ in got] == [0, 6, 1, 2, 3, 4, 5, 7]


def test_lit_double_array_exact_roundtrip(spark):
    """r14 opt: litutil builds model-sized double literals as one
    F.expr string.  Pin value exactness through a query — including
    negative zero, denormals, large/small magnitudes and non-finite
    values — against the same values carried by per-element F.lit."""
    import math

    from pyspark.sql import functions as F

    from distributed_graph_coloring_with_pyspark_spark.litutil import (
        lit_double_array,
        lit_double_matrix,
    )

    vals = [
        0.0,
        -0.0,
        1.0,
        -1.5,
        1 / 3,
        math.pi,
        1e-300,
        -1e300,
        5e-324,
        float("inf"),
        float("-inf"),
        float("nan"),
        0.1 + 0.2,
    ]
    row = (
        spark.range(1)
        .select(
            lit_double_array(vals).alias("a"),
            F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
            lit_double_matrix([vals, list(reversed(vals))]).alias("m"),
        )
        .head()
    )
    import struct as st

    def bits(x):
        return st.pack("<d", x)

    assert [bits(x) for x in row.a] == [bits(x) for x in row.b]
    assert [bits(x) for x in row.m[0]] == [bits(v) for v in vals]
    assert [bits(x) for x in row.m[1]] == [bits(v) for v in reversed(vals)]
