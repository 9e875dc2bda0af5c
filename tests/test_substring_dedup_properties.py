"""Property test: the windowed ExactSubstr pair (detection spans +
removal) equals a brute-force pure-Python oracle on adversarial random
corpora — tiny vocabularies force heavy window sharing, overlapping
repeats, back-to-back duplicated runs, and docs straddling the W-token
boundary.  The sf0.01 DuckDB oracle gate covers the real fixture; this
covers the input space around it (and the island-merge arithmetic the
fixture can't stress)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _SUBSTR_W,
    apply_substring_dedup,
    dedup_substring_spans,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from distributed_graph_coloring_with_pyspark_spark.session import get_spark

        _spark = get_spark(app_name="dgc-tests", cpus=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _windows(tokens):
    return [
        (i + 1, " ".join(tokens[i : i + _SUBSTR_W]))
        for i in range(len(tokens) - _SUBSTR_W + 1)
    ]


def _brute(docs):
    """docs: {doc_id: [tokens]} → (spans, cleaned) per the operators'
    contracts: spans = maximal islands of tokens covered by any window
    occurring ≥2 times corpus-wide; cleaned = tokens minus coverage of
    non-(corpus-first) occurrences."""
    from collections import defaultdict

    occ = defaultdict(list)  # window text -> [(doc_id, pos)]
    for d in sorted(docs):
        for pos, w in _windows(docs[d]):
            occ[w].append((d, pos))
    dup_cov = defaultdict(set)  # doc -> covered idx (any dup occurrence)
    later_cov = defaultdict(set)  # doc -> covered idx (non-first occurrences)
    for w, hits in occ.items():
        if len(hits) < 2:
            continue
        for k, (d, pos) in enumerate(sorted(hits)):
            idxs = range(pos, pos + _SUBSTR_W)
            dup_cov[d].update(idxs)
            if k > 0:
                later_cov[d].update(idxs)
    spans = []
    for d in sorted(docs):
        run = []
        for idx in sorted(dup_cov.get(d, ())):
            if run and idx == run[-1] + 1:
                run.append(idx)
            else:
                if run:
                    spans.append((d, run[0], run[-1], len(run)))
                run = [idx]
        if run:
            spans.append((d, run[0], run[-1], len(run)))
    cleaned = {}
    for d in sorted(docs):
        kept = [
            t
            for i, t in enumerate(docs[d], start=1)
            if i not in later_cov.get(d, set())
        ]
        if kept:  # fully-stripped docs drop out (documented contract)
            cleaned[d] = (
                len(docs[d]),
                len(docs[d]) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
    return spans, cleaned


# vocab of 3 symbols and docs of up to 3*W tokens force repeated
# windows within and across docs, overlapping self-repeats (aaaa...),
# and near-boundary doc lengths (W-1, W, W+1).
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]),
            min_size=_SUBSTR_W - 1,
            max_size=3 * _SUBSTR_W,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_substring_family_equals_brute_force(docs, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = _get_spark()
    corpus = {i + 1: toks for i, toks in enumerate(docs)}
    tmp = tmp_path_factory.mktemp("substr")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(corpus), pa.int64()),
                "text": pa.array(
                    [" ".join(corpus[k]) for k in sorted(corpus)], pa.string()
                ),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    want_spans, want_clean = _brute(corpus)
    got_spans = [
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in dedup_substring_spans(spark, str(tmp)).collect()
    ]
    assert got_spans == want_spans
    got_clean = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_md5)
        for r in apply_substring_dedup(spark, str(tmp)).collect()
    }
    assert got_clean == want_clean
