"""Gate for the histogram-BFD whole-document packer: exact assignment
equality against an INDEPENDENT per-item best-fit-decreasing reference
(the bulk/interval solve in text_dedup._bfd_histogram_solve never runs
here — this one places one document at a time with the documented
tie-break), plus the packing invariants the manifest must satisfy."""

from __future__ import annotations

from collections import deque

from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _PACK_SEQ_LEN,
    _bestfit_assignments,
    _tokens,
    pack_sequences,
    pack_sequences_bestfit,
)
from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _bfd_reference(items: list[tuple[int, int]], seq_len: int) -> dict[int, int]:
    """Per-item BFD: docs in (length desc, doc_id asc) order; each doc
    goes into the open bin with the SMALLEST remaining capacity that
    fits, ties broken toward the bin that entered that capacity class
    earliest (FIFO); no fit → a fresh bin.  One dict entry per bin —
    fine at test scale, the thing the distributed solve avoids."""
    classes: dict[int, deque] = {}
    assign: dict[int, int] = {}
    next_bin = 0
    for doc_id, length in sorted(items, key=lambda t: (-t[1], t[0])):
        fits = [r for r, q in classes.items() if r >= length and q]
        if fits:
            r = min(fits)
            b = classes[r].popleft()
        else:
            r = seq_len
            b = next_bin
            next_bin += 1
        assign[doc_id] = b
        if r - length > 0:
            classes.setdefault(r - length, deque()).append(b)
    return assign


def _items(spark):
    docs = load_table(spark, SF, "documents")
    rows = docs.select(
        "doc_id",
        F.least(F.size(_tokens()), F.lit(_PACK_SEQ_LEN)).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0).collect()
    return [(r.doc_id, r.n_tok) for r in rows]


def test_bestfit_assignment_matches_per_item_reference(spark):
    items = _items(spark)
    want = _bfd_reference(items, _PACK_SEQ_LEN)
    toks = spark.createDataFrame(items, "doc_id long, n_tok long")
    got = {
        r.doc_id: r.bin_id for r in _bestfit_assignments(spark, toks).collect()
    }
    assert got == want


def test_bestfit_manifest_invariants(spark):
    """Every doc packed exactly once, no bin overflows, token mass is
    conserved, bin count is within the BFD guarantee of the lower
    bound, and bin ids are dense."""
    items = _items(spark)
    total = sum(l for _, l in items)
    rows = pack_sequences_bestfit(spark, SF).collect()
    assert sorted(r.bin_id for r in rows) == list(range(len(rows)))  # dense
    assert sum(r.n_docs for r in rows) == len(items)
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 < r.n_tokens <= _PACK_SEQ_LEN
        assert r.padding == _PACK_SEQ_LEN - r.n_tokens
    lower = -(-total // _PACK_SEQ_LEN)
    # BFD is an 11/9·OPT + 1 algorithm; OPT >= ceil(total/L)
    assert len(rows) <= (11 * lower) // 9 + 1


def test_bestfit_vs_concat_split_tradeoff(spark):
    """The two packers trade document splits for padding: concat-split
    has (near-)zero padding but cuts documents at sequence boundaries;
    best-fit never cuts a document but pads.  Pin both sides of the
    trade so a regression in either packer shows up."""
    split_rows = pack_sequences(spark, SF).collect()
    bf_rows = pack_sequences_bestfit(spark, SF).collect()
    # concat-split: every doc crossing a boundary is a split — with
    # 54-token average docs and L=512 almost every sequence splits one
    n_split_docs = sum(r.n_docs - r.n_full_docs for r in split_rows)
    assert n_split_docs > 0
    # best-fit: zero splits by construction; padding overhead must stay
    # small on this length mix (measured ~1-2%: short docs backfill)
    pad = sum(r.padding for r in bf_rows)
    cap = _PACK_SEQ_LEN * len(bf_rows)
    assert pad / cap < 0.10
