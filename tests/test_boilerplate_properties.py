"""Property test: remove_boilerplate equals a brute-force pure-Python
oracle on adversarial random corpora — a 3-word vocabulary over short
docs forces heavy segment sharing, sub-segment docs, exact ties at the
doc-frequency threshold, and all-boilerplate documents.  The sf0.01
DuckDB oracle gate covers the real fixture; this covers the input
space around it."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _BOILER_MIN_DOCS,
    _BOILER_SEG_TOKENS,
    remove_boilerplate,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from distributed_graph_coloring_with_pyspark_spark.session import get_spark

        _spark = get_spark(app_name="dgc-tests", cpus=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _reference(texts):
    """(doc_id, n_segs, n_boiler, clean_n_chars, clean_md5) rows."""
    per, freq = {}, {}
    for did, text in texts:
        ts = text.strip().split(" ")
        n_segs = math.ceil(len(ts) / _BOILER_SEG_TOKENS)
        ss = [
            " ".join(ts[i * _BOILER_SEG_TOKENS : (i + 1) * _BOILER_SEG_TOKENS])
            for i in range(n_segs)
        ]
        per[did] = ss
        for s in set(ss):
            freq.setdefault(s, set()).add(did)
    boiler = {s for s, d in freq.items() if len(d) >= _BOILER_MIN_DOCS}
    out = {}
    for did, ss in per.items():
        clean = " ".join(s for s in ss if s not in boiler)
        out[did] = (
            len(ss),
            sum(s in boiler for s in ss),
            len(clean),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "c"]), min_size=0, max_size=20),
        min_size=1,
        max_size=12,
    )
)
def test_remove_boilerplate_matches_python_reference(tmp_path_factory, corpora):
    spark = _get_spark()
    texts = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    sf = str(tmp_path_factory.mktemp("boiler"))
    spark.createDataFrame(
        [(d, t, "src", "en", len(t)) for d, t in texts],
        "doc_id long, text string, source string, lang string, n_chars int",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r.doc_id: (r.n_segs, r.n_boiler, r.clean_n_chars, r.clean_md5)
        for r in remove_boilerplate(spark, sf).collect()
    }
    assert got == _reference(texts)
