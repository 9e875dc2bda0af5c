"""Property test: the prefix-filter set-similarity join
(`_prefix_jaccard_pairs`) is LOSSLESS — equal to a brute-force
all-pairs Python oracle — on adversarial random inputs: tiny shingle
sets, heavily shared vocabularies, duplicate documents, and pairs
sitting exactly ON the Jaccard threshold (the ceil-vs-floor prefix
bound edge).  The sf0.01 DuckDB oracle gate covers the real fixture;
this covers the input space around it."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _JACCARD_THRESHOLD,
    _prefix_jaccard_pairs,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from distributed_graph_coloring_with_pyspark_spark.session import get_spark

        _spark = get_spark(app_name="dgc-tests", cpus=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _brute_force(doc_sets):
    out = set()
    ids = sorted(doc_sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = doc_sets[a], doc_sets[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= _JACCARD_THRESHOLD:
                out.add((a, b, round(j, 6)))
    return out


# small vocab (<= 8 symbols) forces shared grams and exact-threshold
# ties like |∩|/|∪| = 2/4; duplicates are allowed by min_size=1 lists.
# Both candidate schemes are exercised on every example: l1 (the
# single-gram prefix filter) and the forced l2 pair-key escalation —
# whose small-doc union path (n ≤ 2 docs qualifying on one shared
# gram) only these tiny inputs reach.
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.frozensets(
            st.integers(min_value=0, max_value=7).map(lambda i: f"g{i}"),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_join_equals_brute_force(docs):
    spark = _get_spark()
    doc_sets = {i: set(s) for i, s in enumerate(docs)}
    rows = [(i, sorted(s)) for i, s in doc_sets.items()]
    grams = spark.createDataFrame(rows, "doc_id long, shingles array<string>").persist()
    want = _brute_force(doc_sets)
    for scheme in ("l1", "l2"):
        got = {
            (r.doc_a, r.doc_b, round(r.j, 6))
            for r in _prefix_jaccard_pairs(grams, scheme=scheme).collect()
        }
        assert got == want, scheme
    grams.unpersist()
