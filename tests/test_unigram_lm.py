"""Gates for the unigram-LM tokenizer trainer: an INDEPENDENT
pure-Python implementation of the documented spec (seed scoring, EM
forward-backward, Viterbi with the rounded-logp tie-break) run on the
collected word-type table.  EM probabilities must agree to 1e-8
relative (only cross-word float-sum order differs between engines);
the Viterbi check feeds BOTH implementations the same trained model,
so segmentation equality is exact by construction of the spec."""

from __future__ import annotations

import math

import pytest

from distributed_graph_coloring_with_pyspark_spark.operators.unigram_lm import (
    _EM_ROUNDS,
    _LOGP_ROUND,
    _MAX_PIECE_LEN,
    _SEED_MULTI,
    _em_word_pass,
    train_unigram,
    unigram_pieces,
    unigram_tokenize_stats,
)
from distributed_graph_coloring_with_pyspark_spark.operators.tokenizer import (
    _word_freqs,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def word_freqs(spark):
    return {r.word: r.cnt for r in _word_freqs(spark, SF).collect()}


def _ref_train(wf: dict[str, int], rounds: int) -> dict[str, float]:
    # seed: substring scores, overlapping occurrences counted
    score: dict[str, int] = {}
    for w, c in wf.items():
        for i in range(len(w)):
            for L in range(1, min(_MAX_PIECE_LEN, len(w) - i) + 1):
                p = w[i : i + L]
                score[p] = score.get(p, 0) + c
    singles = {p: s for p, s in score.items() if len(p) == 1}
    multis = sorted(
        ((p, s) for p, s in score.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:_SEED_MULTI]
    kept = dict(singles)
    kept.update(dict(multis))
    total = sum(kept.values())
    probs = {p: s / total for p, s in kept.items()}
    for _ in range(rounds):
        exp: dict[str, float] = {}
        for w, c in sorted(wf.items()):
            n = len(w)
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for i in range(1, n + 1):
                alpha[i] = sum(
                    alpha[j] * probs[w[j:i]]
                    for j in range(max(0, i - _MAX_PIECE_LEN), i)
                    if w[j:i] in probs
                )
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for i in range(n - 1, -1, -1):
                beta[i] = sum(
                    probs[w[i:j]] * beta[j]
                    for j in range(i + 1, min(n, i + _MAX_PIECE_LEN) + 1)
                    if w[i:j] in probs
                )
            z = alpha[n]
            for i in range(n):
                for j in range(i + 1, min(n, i + _MAX_PIECE_LEN) + 1):
                    piece = w[i:j]
                    if piece in probs:
                        e = alpha[i] * probs[piece] * beta[j] / z * c
                        if e:
                            exp[piece] = exp.get(piece, 0.0) + e
        tot = sum(exp.values())
        probs = {p: e / tot for p, e in exp.items() if e > 0}
        for p in singles:
            probs.setdefault(p, 1e-12)
    return probs


def _ref_viterbi(word: str, probs: dict[str, float]) -> tuple[str, ...]:
    logp = {
        p: round(math.log(v), _LOGP_ROUND) for p, v in probs.items() if v > 0
    }
    best = {0: (0.0, 0, ())}
    for i in range(1, len(word) + 1):
        cands = []
        for j in range(max(0, i - _MAX_PIECE_LEN), i):
            if j in best and word[j:i] in logp:
                sc, k, seq = best[j]
                cands.append(
                    (
                        round(sc + logp[word[j:i]], _LOGP_ROUND),
                        k + 1,
                        seq + (word[j:i],),
                    )
                )
        if cands:
            best[i] = min(cands, key=lambda c: (-c[0], c[1], c[2]))
    return best[len(word)][2]


def test_em_matches_reference(spark, word_freqs):
    got = train_unigram(spark, SF)
    want = _ref_train(word_freqs, _EM_ROUNDS)
    assert set(got) == set(want)
    for p, v in want.items():
        assert abs(got[p] - v) <= 1e-8 * max(v, 1e-12), p
    # a real subword model: multi-char pieces must carry mass
    assert sum(v for p, v in got.items() if len(p) > 1) > 0.3
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_viterbi_matches_reference_and_reconstructs(spark, word_freqs):
    probs = train_unigram(spark, SF)
    import pandas as pd

    pdf = pd.DataFrame(
        {"word": sorted(word_freqs), "cnt": [1] * len(word_freqs)}
    )
    segs = {}
    for out in _em_word_pass(iter([pdf]), probs, False):
        segs.update(zip(out["word"], (tuple(s) for s in out["segs"])))
    assert set(segs) == set(word_freqs)
    for w, s in segs.items():
        assert "".join(s) == w  # lossless segmentation
        assert s == _ref_viterbi(w, probs), w


def test_surfaces_shape(spark):
    pieces = unigram_pieces(spark, SF).collect()
    assert len(pieces) > 26
    assert all(0.0 <= r.prob <= 1.0 for r in pieces)
    stats = unigram_tokenize_stats(spark, SF).collect()
    assert {r.lang for r in stats} == {"de", "en", "es", "fr", "zh"}
    for r in stats:
        # subword tokenization: between 1 token/word and 1 token/char
        assert r.n_words <= r.total_tokens
        assert r.chars_per_token > 1.0
