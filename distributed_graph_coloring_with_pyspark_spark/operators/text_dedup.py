"""Deduplication + text analysis over the ``documents`` table — the
LLM-training-pipeline surface (extends the reference, which has no text
ops; see SURVEY.md §1.3).

Everything is built-in Catalyst expressions (split / transform /
xxhash64 / array_* higher-order functions) — zero Python UDFs, so the
whole pipeline stays inside whole-stage codegen and scales by
partitioning alone.

Scale design (100 TB corpus):

- ``dedup_exact``: one hash-shuffle on a 64-hex-char key; map-side
  partial aggregation makes the shuffle proportional to *distinct*
  hashes, not rows.
- ``dedup_near_minhash``: banded MinHash-LSH.  Cost is
  O(rows × bands) shuffle, never all-pairs; candidate pairs are
  generated per band-bucket via a self-equi-join on the bucket key, and
  only candidates pay the exact-Jaccard verify.  A pathological bucket
  (every doc identical) degrades to quadratic within that bucket —
  mitigated by the ``_BUCKET_CAP`` guard, which drops buckets larger
  than the cap (a bucket that hot means thousands of copies of one doc;
  exact-dedup already catches those).
- ``dedup_simhash``: 64-bit signature per doc, then a 4×16-bit
  band-bucket join (hamming ≤ 3 ⇒ at least one of 4 bands equal —
  pigeonhole) — again never all-pairs.

DuckDB-oracle notes: shingling / jaccard use only distinct-set
semantics (array_intersect / array_union ↔ list_intersect /
list_distinct ∘ list_concat), which agree exactly between engines.
MinHash signatures use xxhash64 (NOT reproducible in DuckDB), so that
query verifies candidates with *exact* Jaccard and the oracle
recomputes the same exact predicate all-pairs — correct whenever the
LSH layer reaches the pairs the oracle finds.  With r=2, b=16 the miss
probability P_miss = (1 - s^r)^b is ≈ 1e-2 at the s = 0.5 threshold
(0.75^16) and falls fast above it (4e-4 at s = 0.6, ~1e-13 at s = 0.8);
the graded fixture's duplicate pairs sit well above threshold, and a
near-threshold miss would surface as an explicit oracle diff, not
silent wrongness.  SimHash signatures use an md5-derived hash precisely
so DuckDB *can* recompute them — that query is value-checked end to
end (see _simhash_signatures).
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import persist_tracked
from ..sources.tables import load_table

# MinHash parameters: b bands × r rows = k hashes.
# s-curve: P(candidate | jaccard=s) = 1 - (1 - s^r)^b
#   r=2, b=16, s=0.5 → 1 - 0.75^16 ≈ 0.990 ; s=0.6 → 0.9996 ; s=0.8 → 1-1e-13
_MINHASH_ROWS = 2
_MINHASH_BANDS = 16
_NUM_HASHES = _MINHASH_ROWS * _MINHASH_BANDS
_JACCARD_THRESHOLD = 0.5

# Canonical DuckDB twin of ``_shingles()``: the distinct token-3-gram
# list built from a `ts` token-list column.  Every oracle that
# re-derives shingles interpolates THIS fragment so the SQL can never
# drift from the Spark tokenizer (review r5: a fifth hand-copy had
# appeared cross-module in similarity.py).
SHINGLE_SQL_EXPR = """list_distinct(CASE WHEN len(ts) >= 3
                   THEN [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                         for i in range(1, len(ts) - 1)]
                   ELSE [] END)"""
_BUCKET_CAP = 1000  # max docs per LSH bucket before the bucket is dropped
# max docs indexing one gram in the prefix-filter inverted index before
# that gram's bucket is dropped (same drop semantics as _BUCKET_CAP: a
# prefix gram that hot means thousands of near-identical docs — exact
# dedup catches full copies, and the MinHash path still covers the rest)
_PREFIX_BUCKET_CAP = 1000
# l1 → l2 prefix-scheme escalation (see _prefix_jaccard_pairs): switch
# to pair-key blocking when the l1 candidate count Σ C(bucket, 2)
# exceeds max(FLOOR, FACTOR × prefix entries) — i.e. when the l1 join
# stops being candidate-linear in the index it reads.  sf0.1 sits at
# 441 k candidates / 135 k entries (l1, under both bounds); the r7 sf1
# run sat at 52.7 M / 1.35 M (27 M budget → l2).
_PREFIX_L2_BUDGET_FACTOR = 20
_PREFIX_L2_BUDGET_FLOOR = 1_000_000
_SIMHASH_HAMMING_MAX = 3

_STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it"]

# marker tokens for the n-gram-free language-ID heuristic; the guess is
# argmax over per-language distinct-marker hits (ties → first in list
# order en,es,de,fr,zh — both engines implement the same tie-break).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "fast", "slow"],
    "es": ["data", "query", "small", "row"],
    "de": ["window", "merge", "batch", "stream"],
    "fr": ["value", "table", "part", "key"],
    "zh": ["join", "big", "line", "agg"],
}


def _tokens(col: str = "text") -> Column:
    """Whitespace tokens of the trimmed text (single-space separated in
    the synthetic corpus; split on ' ' matches DuckDB string_split)."""
    return F.split(F.trim(F.col(col)), " ")


def _shingles(tok: Column) -> Column:
    """Distinct 3-token shingles, '' -joined with single spaces.
    Matches the oracle's  ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2].
    Docs with < 3 tokens yield an empty shingle set (the guard also
    keeps the slice lengths positive).

    Shape matters ~30× here (r8 sf1 profile): the previous
    ``transform(sequence(...), i -> concat(element_at(tok, i+1), ...))``
    referenced ``tok`` three times PER SHINGLE, and when ``tok`` is the
    inline ``split(text)`` expression (CollapseProject re-inlines it
    even if a caller projects the tokens first), codegen re-evaluates
    the full split for every element_at — O(tokens²) splits per doc,
    measured 14-20 s for one 10 k-doc batch signature at sf1.  This
    arrays_zip-of-slices form references ``tok`` four times TOTAL
    (size + 3 slices), so worst-case inlining costs 4 splits per doc:
    same values, same order, same distinct — 0.5-0.8 s measured."""
    zipped = F.arrays_zip(
        F.slice(tok, 1, F.size(tok) - 2),
        F.slice(tok, 2, F.size(tok) - 2),
        F.slice(tok, 3, F.size(tok) - 2),
    )
    make = F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]))
    return F.array_distinct(F.when(F.size(tok) >= 3, make).otherwise(F.array()))


def _doc_shingles(
    spark: SparkSession, sf_dir: str, parallel: bool = False
) -> DataFrame:
    # The testdata is one small parquet file → one input split.
    # ``parallel=True`` spreads the shingle projection when the scan has
    # fewer splits than cores (same guard as winnowing; a no-op on a
    # many-file real corpus).  Callers whose FIRST materialization is a
    # persist of the full shingle frame (the prefix-join paths) want it
    # — measured cold at sf0.1: 9.6 s → 6.2 s.  MinHash does NOT: its
    # signature's map-side combine already overlaps the scan, and the
    # extra full-text shuffle measurably costs more than it buys there
    # (r2 measurement, re-confirmed r4: warm 1.6 s → 3.3 s).
    docs = load_table(spark, sf_dir, "documents")
    if parallel:
        par = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
    return docs.select("doc_id", _shingles(_tokens()).alias("shingles"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


# The (doc_id, shingles) projection is the shared input of THREE dedup
# families (MinHash, exact n-gram Jaccard, near-dup components) and the
# single most expensive pre-shuffle step of each (~5 s of HOF work per
# scan at sf0.1).  Memoize ONE persisted copy per (session, sf_dir) —
# the same shared-scan materialization the customer-graph edge cache
# does (graph_bridge.py).  Lifetime honesty (review r5): the weak
# keying only guards against id-recycling aliasing — it canNOT free
# entries when a session is dropped, because the cached frame itself
# strongly references its session; EXPLICIT release
# (clear_shingle_cache / release_session_caches) is the real
# mechanism.  At 100 TB this is the "materialize the shingle table
# once per corpus build" step every multi-pass dedup pipeline
# schedules.
_SHINGLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def shingle_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, shingles) for this session+corpus (built with
    the parallel projection; consumers reading the cache no longer care
    about the scan-split question the parallel flag answers)."""
    per_session = _SHINGLE_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        df = _doc_shingles(spark, sf_dir, parallel=True).persist()
        per_session[sf_dir] = df
    return df


def clear_shingle_cache(spark: SparkSession) -> int:
    """Unpersist and drop this session's shingle frames; returns the
    number of entries released."""
    dropped = _SHINGLE_CACHE.pop(spark, {})
    for df in dropped.values():
        df.unpersist(False)
    return len(dropped)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection on sha256 of normalized text (lower +
    trim).  One row out: corpus size, distinct-normalized-text count,
    number of duplicate docs a dedup pass would drop.  At scale the
    groupBy shuffles 32-byte keys with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h")
    )
    groups = hashed.groupBy("h").agg(F.count("*").alias("n"))
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_unique"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dups_removed"),
    )


_DEDUP_EXACT_ORACLE = """
    SELECT count(*)::BIGINT AS n_docs,
           count(DISTINCT sha256(lower(trim(text))))::BIGINT AS n_unique,
           (count(*) - count(DISTINCT sha256(lower(trim(text)))))::BIGINT
               AS n_dups_removed
    FROM documents
"""


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH banding, exact-Jaccard verification
# ---------------------------------------------------------------------------


def _minhash_band_frame(sh: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band keys for a (doc_id, shingles)
    frame — the shared signature core of ``dedup_near_minhash`` and the
    persisted index pair (``build_minhash_index``).

    signature[i] = min over shingles of xxhash64(shingle, seed=i),
    shaped as explode → 32 min-aggregates: the partial (map-side)
    aggregation reduces each partition to 32 longs per doc before the
    shuffle — this scales to any corpus size, unlike a nested
    transform-over-transform expression that re-walks the shingle array
    once per hash function inside a single projection.  Bucket key =
    xxhash64 over the band's r minhashes."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    sig = exploded.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}") for i in range(_NUM_HASHES)]
    )
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[F.col(f"h{b * _MINHASH_ROWS + r}") for r in range(_MINHASH_ROWS)],
                    )
                    for b in range(_MINHASH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )


def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs at 3-gram-shingle Jaccard ≥ 0.5.

    Plan: shingle → 32 seeded-xxhash64 minhashes → 16 bands × 2 rows →
    band-bucket self-join (candidates) → exact Jaccard on the candidate
    pairs only → threshold filter.  The only shuffles are the band
    groupBy/join (rows × 16) and the two doc_id-keyed verify joins.
    False positives from band-key collisions are removed by the exact
    verify, so the 64-bit bucket key needs no collision handling.
    """
    # NOT the shared shingle cache: the signature's map-side combine
    # overlaps the parquet scan, which measurably beats re-reading the
    # persisted (array-heavy) cached frame here — the one consumer for
    # whom recompute-from-scan wins (see _doc_shingles' parallel note).
    sh = persist_tracked(spark, _doc_shingles(spark, sf_dir))

    bands = _minhash_band_frame(sh)

    # drop pathological buckets (see module docstring) before the pair join
    sized = bands.join(
        bands.groupBy("band", "bucket").count().filter(F.col("count") <= _BUCKET_CAP),
        ["band", "bucket"],
    )

    a, b = sized.alias("a"), sized.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
    return verified


_NEAR_DUP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
    ), sh AS (
        SELECT doc_id,
               {SHINGLE_SQL_EXPR} AS sg
        FROM toks
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.sg, b.sg))::DOUBLE
                 / len(list_distinct(list_concat(a.sg, b.sg))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sg, b.sg))::DOUBLE
          / len(list_distinct(list_concat(a.sg, b.sg))) >= {_JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# incremental near-dup: persisted MinHash band index — build once over the
# standing corpus, check every incoming batch against it (the lakehouse
# dedup SERVING path, mirroring similarity's build_ivf_index pair)
# ---------------------------------------------------------------------------

_INCR_BATCH_CUT = int(0.2 * 2**32)  # md5 split: ~20% of docs play "incoming"


def _incr_is_batch() -> Column:
    """Engine-reproducible batch membership: md5-derived 32-bit hash of
    ('incr', doc_id) under the 20% cut — the same no-rand determinism
    rationale as stratified_sample_split, so the DuckDB oracle can
    replay the split hash-for-hash."""
    return _hash32_col(F.concat_ws(":", F.lit("incr"), "doc_id")) < _INCR_BATCH_CUT


def build_minhash_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Write the standing corpus's (doc_id, bucket) MinHash band keys as
    band-partitioned parquet — the expensive half (shingle + 32-hash
    signature) of near-dedup, paid ONCE per corpus build instead of per
    incoming batch.  Hot buckets above ``_BUCKET_CAP`` are dropped at
    build time (same drop semantics as the in-memory path: a bucket
    that hot means thousands of near-identical docs — exact dedup owns
    full copies).  At 100 TB this is a per-corpus artifact next to the
    data: index build is one scan + one partitioned write; each batch
    check reads only the band files (no text, no signatures)."""
    sh = _doc_shingles(spark, sf_dir, parallel=True).filter(~_incr_is_batch())
    bands = _minhash_band_frame(sh)
    capped = bands.join(
        bands.groupBy("band", "bucket").count().filter(F.col("count") <= _BUCKET_CAP),
        ["band", "bucket"],
    ).select("doc_id", "band", "bucket")
    capped.write.mode("overwrite").partitionBy("band").parquet(index_path)


def dedup_incremental(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """Incremental near-dedup — the query half of the index pair: check
    the INCOMING batch (the ~20% md5 split) against the persisted
    corpus index → (batch_doc, corpus_doc, jaccard) for every true
    near-dup pair at the shared ≥ 0.5 threshold.

    The batch pays its own signature (batch-sized, not corpus-sized),
    equi-joins the index on (band, bucket) — 8-byte keys, no text —
    and only the matched candidates are exact-verified: the corpus
    side's shingles are recomputed AFTER a candidate-keyed semi-join
    against the documents table, so corpus text is read only for docs
    an LSH bucket actually flagged.

    Recall bound (ADVICE r6): the index drops hot buckets above
    ``_BUCKET_CAP`` at build time, so a true pair whose every shared
    band lands in a dropped bucket is missed — the same documented
    drop semantics as the in-memory banded path.  The all-pairs DuckDB
    oracle equality in tests/test_text_dedup_extra therefore depends on
    the test corpus having no such pair; the companion build-time
    assertion there (`test_minhash_index_has_no_dropped_buckets`) makes
    that corpus-shape dependence explicit, so a future fixture change
    fails with a named reason instead of a confusing hash mismatch.
    Oracle: the all-pairs batch × corpus exact-Jaccard join in DuckDB,
    which also pins that banding loses nothing on this corpus split —
    the same completeness cross-check dedup_near_minhash carries."""
    # parallel=True: the batch signature is this query's first
    # materialization and the single-file test parquet gives the scan
    # fewer splits than cores (r8 sf1 profile: 25.7 s → 16.7 s on the
    # 2-split scan before the _shingles reshape; both fixes together
    # put the batch signature at ~1 s)
    batch_sh = persist_tracked(
        spark, _doc_shingles(spark, sf_dir, parallel=True).filter(_incr_is_batch())
    )
    idx = spark.read.parquet(index_path).select(
        F.col("doc_id").alias("corpus_doc"), "band", "bucket"
    )
    cand = (
        _minhash_band_frame(batch_sh)
        .withColumnRenamed("doc_id", "batch_doc")
        .join(idx, ["band", "bucket"])
        .select("batch_doc", "corpus_doc")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    corpus_sh = docs.join(
        cand.select(F.col("corpus_doc").alias("doc_id")).distinct(), "doc_id", "semi"
    ).select("doc_id", _shingles(_tokens()).alias("shingles"))
    return (
        cand.join(
            batch_sh.select(F.col("doc_id").alias("batch_doc"), F.col("shingles").alias("sa")),
            "batch_doc",
        )
        .join(
            corpus_sh.select(F.col("doc_id").alias("corpus_doc"), F.col("shingles").alias("sb")),
            "corpus_doc",
        )
        .select(
            "batch_doc",
            "corpus_doc",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("batch_doc", "corpus_doc", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("batch_doc", "corpus_doc")
    )


# index dirs for the self-contained registry entry below, memoized per
# (session, corpus) with the same WeakKeyDictionary discipline as
# _PAIR_CACHE (ADVICE r7: an id(spark) key can be recycled after the
# session is garbage-collected, silently adopting a dead session's
# index).  Every created temp dir is also registered for process-exit
# removal, and clear_incremental_e2e_index/release_session_caches
# reclaim them eagerly.
_INCR_E2E_INDEX: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)
_INCR_E2E_DIRS: list[str] = []
_INCR_E2E_ATEXIT_ARMED = False


def clear_incremental_e2e_index(spark: SparkSession) -> int:
    """Drop this session's e2e index memo and remove its temp dirs;
    returns entries released."""
    import os
    import shutil

    dropped = _INCR_E2E_INDEX.pop(spark, {})
    for path in dropped.values():
        root = os.path.dirname(path)
        shutil.rmtree(root, ignore_errors=True)
        if root in _INCR_E2E_DIRS:
            _INCR_E2E_DIRS.remove(root)
    return len(dropped)


def _remove_e2e_dirs() -> None:
    import shutil

    for d in _INCR_E2E_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _INCR_E2E_DIRS.clear()


def dedup_incremental_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-contained (spark, sf_dir) form of the incremental dedup
    pair for the driver registry (round-7 rotation): build the corpus
    MinHash index into a session-temp directory on first use, then run
    ``dedup_incremental`` against it.  The build is memoized per
    (session, corpus) — steady state is the serving path (index reads
    only), exactly the amortization bench.py prices separately as
    ``minhash_index_build`` / ``dedup_incremental`` in the dedup
    family."""
    import atexit
    import os
    import tempfile

    global _INCR_E2E_ATEXIT_ARMED
    per_session = _INCR_E2E_INDEX.setdefault(spark, {})
    path = per_session.get(sf_dir)
    if path is None or not os.path.isdir(path):
        root = tempfile.mkdtemp(prefix="mh_index_e2e_")
        path = os.path.join(root, "index")
        build_minhash_index(spark, sf_dir, path)
        per_session[sf_dir] = path
        _INCR_E2E_DIRS.append(root)
        if not _INCR_E2E_ATEXIT_ARMED:
            atexit.register(_remove_e2e_dirs)
            _INCR_E2E_ATEXIT_ARMED = True
    return dedup_incremental(spark, sf_dir, path)


def _incremental_oracle() -> str:
    h = _hash32_sql("'incr:' || doc_id::VARCHAR")
    return f"""
    WITH toks AS (
        SELECT doc_id, {h} < {_INCR_BATCH_CUT} AS is_batch,
               string_split(trim(text), ' ') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id, is_batch, {SHINGLE_SQL_EXPR} AS sg FROM toks
    )
    SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc,
           round(len(list_intersect(a.sg, b.sg))::DOUBLE
                 / len(list_distinct(list_concat(a.sg, b.sg))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.is_batch AND NOT b.is_batch
    WHERE len(a.sg) > 0 AND len(b.sg) > 0
      AND len(list_intersect(a.sg, b.sg))::DOUBLE
          / len(list_distinct(list_concat(a.sg, b.sg))) >= {_JACCARD_THRESHOLD}
    ORDER BY batch_doc, corpus_doc
"""


# (_INCREMENTAL_ORACLE is materialized near the registries at the
# bottom of the module — _hash32_sql is defined later in the file.)


# ---------------------------------------------------------------------------
# near-dup: SimHash (md5-derived token hash — exactly reproducible in DuckDB)
# ---------------------------------------------------------------------------


def _simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig_hi, sig_lo): explode distinct tokens → 64-bit token
    hash from the first 16 hex chars of md5, carried as two 32-bit
    halves → 64 per-bit ±1 vote sums as hash aggregates (map-side
    combine, like the MinHash signature path) → assemble the sign bits.

    Two 32-bit halves instead of one 64-bit value so every intermediate
    fits a non-negative BIGINT in *both* engines: DuckDB has no unsigned
    64-bit hex parse that round-trips through BIGINT, and bit 63 of a
    single 64-bit signature would need sign-wrap semantics to agree.
    The halves make the whole computation (hex parse, bit votes, sign
    assembly, XOR popcount) overflow-free and engine-exact, which is
    what lets the DuckDB oracle verify this query value-for-value
    instead of the round-2 rows-only check.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("t")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h_hi"),
        F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long").alias("h_lo"),
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"{name}{i}")
            for name, h in (("vh", F.col("h_hi")), ("vl", F.col("h_lo")))
            for i in range(32)
        ]
    )

    def _sig(prefix: str) -> Column:
        s = F.lit(0).cast("long")
        for i in range(32):
            s = s + F.when(F.col(f"{prefix}{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return s

    return votes.select("doc_id", _sig("vh").alias("sig_hi"), _sig("vl").alias("sig_lo"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_a, sig_b) ≤ 3 over 64-bit
    token-set signatures (two 32-bit halves).  Candidate generation is a
    4×16-bit band join — pigeonhole-complete for hamming ≤ 3 (3 flipped
    bits can touch at most 3 of the 4 bands, so one band always matches)
    — then the exact hamming filter.  Because banding loses nothing at
    this radius, the banded output equals the all-pairs answer the
    DuckDB oracle computes (the _BUCKET_CAP guard only drops buckets
    > 1000 docs, which the graded corpus never reaches)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = persist_tracked(spark, _simhash_signatures(docs))

    bands = sigs.select(
        "doc_id",
        "sig_hi",
        "sig_lo",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(half), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for half in ("sig_lo", "sig_hi")
                    for b in range(2)
                ]
            )
        ).alias("band", "chunk"),
    )
    # same pathological-bucket guard as the MinHash path (module docstring)
    bands = bands.join(
        bands.groupBy("band", "chunk").count().filter(F.col("count") <= _BUCKET_CAP)
        .drop("count"),
        ["band", "chunk"],
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig_hi").alias("ha"),
            F.col("a.sig_lo").alias("la"),
            F.col("b.sig_hi").alias("hb"),
            F.col("b.sig_lo").alias("lb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            (
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_oracle() -> str:
    """All-pairs DuckDB recomputation of dedup_simhash (see
    _simhash_signatures for why the hash is md5-halved).  Exact, because
    the 4-band LSH is pigeonhole-complete at hamming ≤ 3."""
    digit = "(strpos('0123456789abcdef', md5(t)[{j}:{j}]) - 1)"
    h_hi = " + ".join(f"{digit.format(j=j)} * {1 << (4 * (8 - j))}" for j in range(1, 9))
    h_lo = " + ".join(f"{digit.format(j=j)} * {1 << (4 * (16 - j))}" for j in range(9, 17))
    votes = ",\n               ".join(
        f"sum(CASE WHEN (h_{half} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{half[0]}{i}"
        for half in ("hi", "lo")
        for i in range(32)
    )
    sig = {
        half: " + ".join(f"CASE WHEN v{half[0]}{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32))
        for half in ("hi", "lo")
    }
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS t
        FROM documents
    ), hashed AS (
        SELECT doc_id,
               ({h_hi})::BIGINT AS h_hi,
               ({h_lo})::BIGINT AS h_lo
        FROM toks
    ), votes AS (
        SELECT doc_id,
               {votes}
        FROM hashed GROUP BY doc_id
    ), sigs AS (
        SELECT doc_id,
               ({sig['hi']})::BIGINT AS sig_hi,
               ({sig['lo']})::BIGINT AS sig_lo
        FROM votes
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           (bit_count(xor(a.sig_hi, b.sig_hi))
            + bit_count(xor(a.sig_lo, b.sig_lo)))::INT AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig_hi, b.sig_hi))
          + bit_count(xor(a.sig_lo, b.sig_lo)) <= {_SIMHASH_HAMMING_MAX}
    ORDER BY doc_a, doc_b
"""


_SIMHASH_ORACLE = _simhash_oracle()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source): doc count, char stats, token
    stats.  Single hash-aggregate; exact percentile is fine per-group at
    any scale because groups are small — for a true 100 TB profile swap
    percentile → percentile_approx."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return (
        docs.select("lang", "source", "n_chars", F.size(toks).alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )


_TEXT_STATS_ORACLE = """
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
           sum(len(string_split(trim(text), ' ')))::BIGINT AS total_tokens,
           round(avg(len(string_split(trim(text), ' '))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
"""


def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency table (top 25): the classic corpus
    word-count.  explode → two-phase hash agg; at 100 TB the map-side
    combine collapses each partition to its distinct tokens before the
    shuffle, so the shuffle is tiny for Zipfian text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(25)
    )


_TOKEN_FREQ_ORACLE = """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
"""


def lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic vs the labeled lang column.
    guess = argmax over languages of |distinct markers present|, ties
    broken by list order.  Output: per labeled lang, docs and agreement
    count.  All set ops (array_intersect ↔ list_intersect) — identical
    distinct semantics in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens())
    scored = docs.select(
        "lang",
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(m) for m in marks]))
            ).alias(f"s_{lg}")
            for lg, marks in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"s_{lg}") == best, F.lit(lg)) for lg in langs]
    )
    return (
        scored.select("lang", guess.alias("guessed"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("lang") == F.col("guessed"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree"),
        )
        .orderBy("lang")
    )


def _lang_score_sql(lg: str) -> str:
    marks = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lg])
    return (
        f"len(list_intersect(list_distinct(string_split(trim(text), ' ')), "
        f"[{marks}]))"
    )


_LANG_ID_ORACLE = f"""
    WITH scored AS (
        SELECT lang,
               {", ".join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in _LANG_MARKERS)}
        FROM documents
    ), guessed AS (
        SELECT lang,
               CASE
                   {" ".join(
                       f"WHEN s_{lg} = greatest({', '.join('s_' + l2 for l2 in _LANG_MARKERS)}) THEN '{lg}'"
                       for lg in _LANG_MARKERS
                   )}
               END AS guessed
        FROM scored
    )
    SELECT lang, count(*) AS n_docs,
           sum(CASE WHEN lang = guessed THEN 1 ELSE 0 END)::BIGINT AS n_agree
    FROM guessed
    GROUP BY lang
    ORDER BY lang
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality profile: stopword ratio, mean token length,
    short-doc rate — the usual cheap quality heuristics an LLM-data
    pipeline filters on.  One aggregate pass, all HOF expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double") / n_tok
    per_doc = docs.select(
        "source",
        (n_stop.cast("double") / n_tok).alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        F.when(F.col("n_chars") < 200, 1).otherwise(0).alias("is_short"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.round(F.avg("mean_tok_len"), 6).alias("avg_tok_len"),
            F.sum("is_short").cast("long").alias("n_short"),
        )
        .orderBy("source")
    )


_TEXT_QUALITY_ORACLE = f"""
    WITH per_doc AS (
        SELECT source,
               len(list_filter(string_split(trim(text), ' '),
                   t -> list_contains({_STOPWORDS!r}, t)))::DOUBLE
                   / len(string_split(trim(text), ' ')) AS stop_ratio,
               list_sum(list_transform(string_split(trim(text), ' '),
                                       t -> length(t)))::DOUBLE
                   / len(string_split(trim(text), ' ')) AS mean_tok_len,
               CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS is_short
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           round(avg(stop_ratio), 6) AS avg_stop_ratio,
           round(avg(mean_tok_len), 6) AS avg_tok_len,
           sum(is_short)::BIGINT AS n_short
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per doc: md5 of the sorted distinct token
    set (order-insensitive bag fingerprint — catches shuffled copies
    that exact-dedup misses).  Plus the fingerprint-collision count."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens()))))
    with_fp = docs.select("doc_id", fp.alias("fingerprint"))
    counts = with_fp.groupBy("fingerprint").agg(F.count("*").alias("n_same"))
    return (
        with_fp.join(counts, "fingerprint")
        .select("doc_id", "fingerprint", "n_same")
        .orderBy("doc_id")
    )


_FINGERPRINT_ORACLE = """
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(trim(text), ' '))), ' ')) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           count(*) OVER (PARTITION BY fingerprint) AS n_same
    FROM fp
    ORDER BY doc_id
"""


_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single punctuation — the pre-tokenization split GPT-style BPE vocabs
    use), compared against plain whitespace tokens, per lang.  Both
    Spark (Java regex) and DuckDB (RE2) produce identical matches for
    this ASCII-class pattern — verified expression-for-expression."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    return (
        docs.select(
            "lang",
            F.size(bpe).alias("n_bpe"),
            F.size(F.array_distinct(bpe)).alias("n_bpe_distinct"),
            F.size(_tokens()).alias("n_ws"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
            F.round(F.avg("n_bpe_distinct"), 4).alias("avg_distinct_bpe"),
            F.sum("n_ws").cast("long").alias("total_ws_tokens"),
        )
        .orderBy("lang")
    )


_TOKEN_BPE_ORACLE = rf"""
    SELECT lang, count(*) AS n_docs,
           sum(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')))::BIGINT
               AS total_bpe_tokens,
           round(avg(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}'))), 4)
               AS avg_bpe_tokens,
           round(avg(len(list_distinct(
               regexp_extract_all(lower(text), '{_BPE_PATTERN}')))), 4)
               AS avg_distinct_bpe,
           sum(len(string_split(trim(text), ' ')))::BIGINT AS total_ws_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""

_WINNOW_W = 8  # char-window width
_WINNOW_K = 4  # sketch size: k smallest window hashes
_WINNOW_STRIDE = 2  # hash every 2nd window start — same sketch family, ½ cost


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window fingerprint sketch (winnowing family): hash the
    8-char windows of the text (stride 2), keep the 4 smallest hashes —
    a content-defined sketch robust to insertions/shifts (unlike
    fixed-offset chunking; same selection rule as MOSS winnowing).  One
    projection, no shuffle until the final sort; the md5-per-window cost
    is what a Rabin-Karp rolling hash would amortize on a real engine —
    the *selection semantics* (min-k of window hashes) are identical and
    reproducible in SQL, which is what the oracle checks.

    The repartition spreads the md5-per-window projection across cores:
    unlike the other document queries (whose heavy work runs after a
    shuffle and therefore parallelizes anyway), ALL of this query's cost
    is in the pre-shuffle projection, which otherwise runs on as few
    cores as there are input splits — one, for the single-file test
    fixture (measured: 4.8 s → 0.7 s at sf0.1).  On a many-file 100 TB
    corpus the scan already yields ≥ core-count splits and AQE-planned
    parallelism, so the repartition is applied only when the scan has
    fewer splits than cores."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    # short-text guard: sequence(1, stop, +step) throws when stop < 1
    # (ANSI), i.e. any doc shorter than the window; emit an empty sketch
    # instead, matching the oracle's empty range()
    windows = F.when(
        F.length("text") >= _WINNOW_W,
        F.transform(
            F.sequence(
                F.lit(1), F.length("text") - (_WINNOW_W - 1), F.lit(_WINNOW_STRIDE)
            ),
            lambda i: F.md5(F.substring(F.col("text"), i, F.lit(_WINNOW_W))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.size(windows).alias("n_windows"),
        F.concat_ws("", F.slice(F.array_sort(windows), 1, _WINNOW_K)).alias("winnow_fp"),
    ).orderBy("doc_id")


_WINNOW_ORACLE = f"""
    SELECT doc_id,
           (CASE WHEN length(text) >= {_WINNOW_W}
                 THEN (length(text) - {_WINNOW_W}) // {_WINNOW_STRIDE} + 1
                 ELSE 0 END)::INT AS n_windows,
           array_to_string(
               list_sort([md5(substr(text, i, {_WINNOW_W}))
                          for i in range(1, length(text) - {_WINNOW_W - 2},
                                         {_WINNOW_STRIDE})])[1:{_WINNOW_K}],
               '') AS winnow_fp
    FROM documents
    ORDER BY doc_id
"""


_CHUNK_SIZE = 200  # chars per chunk
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking — the canonical LLM-pipeline
    fan-out (doc → training/RAG chunks).  posexplode over a sequence of
    window starts + substring: pure Catalyst, so a 100 TB corpus chunks
    inside whole-stage codegen with zero Python.  Emits (doc_id,
    chunk_idx, chunk_len, chunk_md5); the md5 stands in for the chunk
    text in the oracle hash (keeps the compared values small)."""
    docs = load_table(spark, sf_dir, "documents")
    # FULL-coverage starts (review r5: the bare stride grid dropped up
    # to _CHUNK_STRIDE-1 trailing chars of any doc whose length wasn't
    # stride-aligned): the stride grid plus a tail start clamped to
    # len-(size-1), deduped+sorted — the final chunk is always the last
    # _CHUNK_SIZE chars (with a deeper overlap when unaligned), so no
    # byte of the corpus is absent from every chunk.
    tail_start = F.greatest(F.length("text") - (_CHUNK_SIZE - 1), F.lit(1))
    starts = F.array_sort(
        F.array_distinct(
            F.concat(
                F.sequence(F.lit(1), tail_start, F.lit(_CHUNK_STRIDE)),
                F.array(tail_start),
            )
        )
    )
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.substring(F.col("text"), i, F.lit(_CHUNK_SIZE)))
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").alias("chunk_len"),
        F.md5("chunk").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


_CHUNK_ORACLE = f"""
    WITH starts AS (
        SELECT doc_id, text,
               unnest(list_sort(list_distinct(list_append(
                   range(1, greatest(length(text) - {_CHUNK_SIZE - 1}, 1) + 1,
                         {_CHUNK_STRIDE}),
                   greatest(length(text) - {_CHUNK_SIZE - 1}, 1))))) AS s
        FROM documents
    )
    SELECT doc_id,
           (row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1)::INT
               AS chunk_idx,
           length(substr(text, s::INT, {_CHUNK_SIZE})) AS chunk_len,
           md5(substr(text, s::INT, {_CHUNK_SIZE})) AS chunk_md5
    FROM starts
    ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# exact substring-span dedup (windowed ExactSubstr)
# ---------------------------------------------------------------------------


_SUBSTR_W = 8  # tokens per duplicated-substring window


def _window_hashes(tok: Column) -> Column:
    """md5 of every stride-1 ``_SUBSTR_W``-token window, in position
    order (array index i ↔ 1-based token position i+1).  arrays_zip-of-
    slices, NOT sequence + slice-per-window: CollapseProject re-inlines
    ``tok`` as the raw split() into each per-window slice and codegen
    then re-splits the text once per window — the O(tokens²) shape
    fixed in ``_shingles`` (r8 sf1 profile).  This form references
    ``tok`` ``_SUBSTR_W``+2 times total."""
    ln = F.size(tok) - (_SUBSTR_W - 1)
    zipped = F.arrays_zip(*[F.slice(tok, k + 1, ln) for k in range(_SUBSTR_W)])
    make = F.transform(
        zipped,
        lambda s: F.md5(F.concat_ws(" ", *[s[str(k)] for k in range(_SUBSTR_W)])),
    )
    return F.when(F.size(tok) >= _SUBSTR_W, make).otherwise(
        F.array().cast("array<string>")
    )


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SUBSTRING spans — the dedup granularity the pairwise
    families can't express: every run of ≥ ``_SUBSTR_W`` tokens that
    occurs verbatim more than once anywhere in the corpus (across
    documents or repeated within one), merged into maximal per-document
    token spans — the removal unit of suffix-array ExactSubstr dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better").  The reference has no text surface (its data model
    is graph JSON — reference coloring.py:1-243); this extends the
    mandated training-data tier alongside doc-level exact/MinHash/
    SimHash/Jaccard dedup.

    Spark-first shape: a suffix array is a sequential construction, so
    the distributed equivalent is stride-1 windowed content hashing —
    and unlike EVERY pairwise dedup family it is LINEAR in window
    occurrences, never quadratic in documents:

      1. ``posexplode`` the ``_SUBSTR_W``-token windows → md5 of the
         window text — pure codegen in the arrays_zip-of-slices shape
         (no per-window re-split, the r8 shingle lesson);
      2. ``groupBy(window-hash)`` count, keep n ≥ 2 — map-side combine
         collapses each partition's repeats before the 16-byte-key
         shuffle;
      3. LEFT SEMI join the window stream against the duplicated
         hashes (on real corpora the dup-hash side is the small one
         and AQE broadcast-converts the join);
      4. explode each hit's ≤ W covered token indices, ``distinct``,
         then the classic gaps-and-islands window (idx − row_number
         per doc) → maximal merged spans.

    A boilerplate 8-gram occurring k times costs k·W covered-index
    rows — linear — where the pairwise families would pay ~k²
    candidate pairs; no hot-bucket cap is needed, which is exactly why
    ExactSubstr is the web-scale dedup of record.  Window hashing is
    md5 (128-bit): collision probability over a 100 TB corpus
    (~2⁴⁵ windows) is ≈ 2⁻³⁸ — the same collision-honesty budget as
    the gram-hash note in ``_prefix_jaccard_pairs``.

    Output: one row per maximal span, token indices 1-based inclusive:
    (doc_id, span_start, span_end, span_tokens).
    """
    docs = load_table(spark, sf_dir, "documents")
    # pre-shuffle projection parallelism guard (same reasoning as
    # winnowing_fingerprints: ALL of stage-1's cost is the window md5
    # projection, which otherwise runs on as few cores as input splits)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    toks = docs.select("doc_id", _tokens().alias("t"))
    wins = (
        toks.select(
            "doc_id", F.posexplode(_window_hashes(F.col("t"))).alias("pos0", "h")
        )
        # posexplode pos is 0-based; oracle token positions are 1-based
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    dup = (
        wins.groupBy("h")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    hits = wins.join(dup, "h", "leftsemi")
    covered = hits.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (_SUBSTR_W - 1))
        ).alias("idx"),
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("idx")
    islands = covered.withColumn("grp", F.col("idx") - F.row_number().over(w))
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("idx").cast("long").alias("span_start"),
            F.max("idx").cast("long").alias("span_end"),
            (F.max("idx") - F.min("idx") + 1).cast("long").alias("span_tokens"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .orderBy("doc_id", "span_start")
    )


_SUBSTR_SPANS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), wins0 AS (
        SELECT doc_id, unnest(range(1, len(t) - {_SUBSTR_W - 2})) AS pos, t
        FROM toks
    ), wins AS (
        SELECT doc_id, pos,
               md5(array_to_string(t[pos:pos + {_SUBSTR_W - 1}], ' ')) AS h
        FROM wins0
    ), dup AS (
        SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
    ), hits AS (
        SELECT DISTINCT doc_id, idx FROM (
            SELECT doc_id, unnest(range(pos, pos + {_SUBSTR_W})) AS idx
            FROM wins WHERE h IN (SELECT h FROM dup)
        )
    ), isl AS (
        SELECT doc_id, idx,
               idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
        FROM hits
    )
    SELECT doc_id,
           min(idx)::BIGINT AS span_start,
           max(idx)::BIGINT AS span_end,
           (max(idx) - min(idx) + 1)::BIGINT AS span_tokens
    FROM isl
    GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
"""


def apply_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of ExactSubstr dedup: keep the corpus-FIRST
    occurrence of every duplicated ``_SUBSTR_W``-token window (first =
    min (doc_id, pos), the deterministic canonical), strip the tokens
    covered only by later occurrences, and emit per-document cleaned
    text as (doc_id, n_tokens, n_removed, clean_md5) — together with
    ``dedup_substring_spans`` (the detection half) this is the full
    Lee-et-al. pipeline: a training corpus keeps exactly one copy of
    every long verbatim repeat, wherever it appeared.

    Same linear window stream as the detection pass, plus one
    canonicalisation window function (row_number per window-hash over
    (doc_id, pos) — the shuffle key is the 16-byte hash, and partition
    skew IS the duplication mass: a window repeated k times makes a
    k-row group, linear again).  Removal-set application is a LEFT
    ANTI join of the (doc_id, token-idx) stream against the removed
    indices, then an order-restoring ``array_sort(collect_list(
    struct(idx, tok)))`` per doc — collect_list order is partition-
    nondeterministic, the sort is what makes the md5 reproducible.

    A fully-duplicated document (every token stripped — its canonical
    copy lives elsewhere) has no kept rows and therefore drops out of
    the output entirely, the doc-level analogue of what exact dedup
    does; the oracle's kept-stream GROUP BY drops it identically."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    toks = docs.select("doc_id", _tokens().alias("t"))
    wins = toks.select(
        "doc_id", F.posexplode(_window_hashes(F.col("t"))).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    occ = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "pos"))
    later = wins.withColumn("occ", occ).filter(F.col("occ") >= 2)
    removed = later.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (_SUBSTR_W - 1))
        ).alias("idx"),
    ).distinct()
    stream = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.posexplode("t").alias("idx0", "tok"),
    ).select("doc_id", "n_tokens", (F.col("idx0") + 1).alias("idx"), "tok")
    kept = stream.join(removed, ["doc_id", "idx"], "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.first("n_tokens").cast("long").alias("n_tokens"),
            (F.first("n_tokens") - F.count("*")).cast("long").alias("n_removed"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


_APPLY_SUBSTR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), wins0 AS (
        SELECT doc_id, unnest(range(1, len(t) - {_SUBSTR_W - 2})) AS pos, t
        FROM toks
    ), wins AS (
        SELECT doc_id, pos,
               md5(array_to_string(t[pos:pos + {_SUBSTR_W - 1}], ' ')) AS h
        FROM wins0
    ), later AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                       AS occ
            FROM wins
        ) WHERE occ >= 2
    ), removed AS (
        SELECT DISTINCT doc_id, idx FROM (
            SELECT doc_id, unnest(range(pos, pos + {_SUBSTR_W})) AS idx
            FROM later
        )
    ), stream AS (
        SELECT doc_id, len(t) AS n_tokens,
               unnest(range(1, len(t) + 1)) AS idx, t
        FROM toks
    ), kept AS (
        SELECT s.doc_id, s.n_tokens, s.idx, s.t[s.idx] AS tok
        FROM stream s
        WHERE NOT EXISTS (
            SELECT 1 FROM removed r
            WHERE r.doc_id = s.doc_id AND r.idx = s.idx
        )
    )
    SELECT doc_id,
           any_value(n_tokens)::BIGINT AS n_tokens,
           (any_value(n_tokens) - count(*))::BIGINT AS n_removed,
           md5(array_to_string(list(tok ORDER BY idx), ' ')) AS clean_md5
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# near-dup: EXACT n-gram Jaccard via prefix-filtered set-similarity join
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-duplicate pairs at token-3-gram Jaccard ≥ 0.5 — the
    third dedup family (n-gram Jaccard), deliberately computing the SAME
    predicate as ``dedup_near_minhash`` by a lossless algorithm: MinHash
    banding has miss probability (1 − s²)¹⁶ > 0, the prefix filter's is
    ~2⁻⁶⁴ (the gram-hash collision bound — see the collision-honesty
    note in ``_prefix_jaccard_pairs``), so the two queries
    cross-validate each other (and the all-pairs DuckDB oracle
    arbitrates both).  Like the other dedup families it carries a
    hot-bucket drop guard (``_PREFIX_BUCKET_CAP``).

    Candidate generation is the prefix filter of the set-similarity-join
    literature (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07 /
    PPJoin): order every doc's n-grams by a global rare-first key
    (document frequency, gram), index only each doc's first
    ``n - floor(t·n) + 1`` grams, and equi-join on those.  A pair with
    Jaccard ≥ t shares ≥ ⌈t·n⌉ grams, hence at least one PREFIX gram —
    lossless (``floor`` rather than ``ceil`` costs a 1-gram-longer
    prefix and keeps the bound safe against FP rounding).  A length
    filter (t·max(|a|,|b|) ≤ min(|a|,|b|), also implied by J ≥ t)
    prunes candidates before the dedup shuffle; only survivors pay the
    exact verify.

    Feature choice matters at scale: token 3-grams, NOT character
    grams — measured on this corpus at sf0.1, char-5-grams have ~1.5 k
    distinct values across 5 000 docs (avg df ≈ 675), which degenerates
    the prefix index to all-pairs, while token 3-grams give 27 k
    distinct values, max df 25, max prefix bucket 10.

    100 TB design: the inverted index holds each doc's RAREST grams, so
    bucket sizes track the low tail of the df distribution (a common
    gram enters a prefix only for a doc consisting almost entirely of
    common grams); every shuffle is equi-key (gram-df groupBy, per-doc
    window sort, doc_id-keyed verify joins).  When gram document
    frequency grows with the corpus (fixed vocabulary — the regime the
    r7 sf1 run measured at 99×@10× data), the build escalates to the
    AdaptJoin 2-prefix pair-key scheme, still lossless (theorem +
    measured 283 s → 18 s at sf1 in ``_prefix_jaccard_pairs``).  Versus
    MinHash at the same threshold: no signature cost and zero misses,
    in exchange for a corpus-dependent candidate volume — the standard
    trade, which is why both paths ship."""
    return (
        jaccard_pair_frame(spark, sf_dir)
        .select("doc_a", "doc_b", F.round("j", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# The full-corpus exact-Jaccard pair list is the expensive stage of the
# dedup family and THREE queries consume the identical frame
# (dedup_ngram_jaccard, dedup_components, similarity's
# dedup_modality_agreement) — memoize ONE persisted copy per
# (session, sf_dir), exactly the shingle-cache discipline above.  At
# 100 TB this is "materialize the pair table once per corpus build":
# every downstream consumer (drop list, clustering, calibration) reads
# the same artifact rather than re-running the set-similarity join.
# Lifetime honesty: explicit release (clear_pair_cache /
# release_session_caches) is the mechanism, same as every session memo.
# Consumers: dedup_ngram_jaccard, dedup_components, dedup_keep_policy,
# and (since round 7) curate_corpus, which restricts the corpus-wide
# pair list to its exact-dedup survivors via two semi-joins.
_PAIR_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def jaccard_pair_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_a, doc_b, j) exact-Jaccard pairs for this
    session+corpus (built on the session shingle cache)."""
    per_session = _PAIR_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        grams = shingle_frame(spark, sf_dir).filter(F.size("shingles") > 0)
        df = _prefix_jaccard_pairs(grams).persist()
        per_session[sf_dir] = df
    return df


def clear_pair_cache(spark: SparkSession) -> int:
    """Unpersist and drop this session's pair frames; returns entries
    released."""
    dropped = _PAIR_CACHE.pop(spark, {})
    for df in dropped.values():
        df.unpersist(False)
    return len(dropped)


def _l2_candidate_pairs(ranked: DataFrame, pi1) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs under the l2 (pair-key) prefix
    scheme — see the theorem in ``_prefix_jaccard_pairs``.  ``ranked``
    is the (doc_id, n, gram, rk) frame ranked by the global (df, gram)
    order; ``pi1`` the l1 prefix-length column expression.

    One wide shuffle total: per-doc prefix arrays are built with a
    single groupBy (the window already co-partitioned by doc_id, so
    AQE elides that exchange), pair keys expand in codegen
    (transform × slice — no self-join), and the bucket groupBy carries
    the hot-bucket cap AND emits candidates straight from the bucket
    array, replacing l1's count + semi-join + self-join triple."""
    prefix2 = ranked.filter(F.col("rk") <= pi1 + 1).select("doc_id", "n", "gram", "rk")
    pg = prefix2.groupBy("doc_id").agg(
        F.first("n").alias("n"),
        F.array_sort(F.collect_list(F.struct("rk", "gram"))).alias("pg"),
    )
    keyed = pg.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                "flatten(transform(pg, (x, i) -> transform("
                "slice(pg, i + 2, size(pg)), y -> struct(x.gram AS g1, y.gram AS g2))))"
            )
        ).alias("p"),
    ).select("doc_id", "n", F.xxhash64("p.g1", "p.g2").alias("k"))
    # docs that can qualify on a SINGLE shared gram (J ≥ t with |∩| = 1
    # forces max(na, nb) ≤ 1/t ... truncated to the n ≤ 2 cases for
    # t = 0.5, see the docstring) fall back to single-gram keys among
    # themselves; xxhash64 of one column can collide with a pair key
    # only at the usual 2⁻⁶⁴ honesty bound (extra candidates at worst).
    small = prefix2.filter(F.col("n") <= 2).select(
        "doc_id", "n", F.xxhash64("gram").alias("k")
    )
    buckets = (
        keyed.union(small)
        .groupBy("k")
        .agg(F.collect_list(F.struct("doc_id", "n")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _PREFIX_BUCKET_CAP))
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> transform("
                    "slice(ds, i + 2, size(ds)), y -> struct("
                    "x.doc_id AS da, x.n AS na, y.doc_id AS db, y.n AS nb))))"
                )
            ).alias("c")
        )
        .filter(
            (F.col("c.da") != F.col("c.db"))
            & (
                F.greatest("c.na", "c.nb") * _JACCARD_THRESHOLD
                <= F.least("c.na", "c.nb")
            )
        )
        .select(
            F.least("c.da", "c.db").alias("doc_a"),
            F.greatest("c.da", "c.db").alias("doc_b"),
        )
        .distinct()
    )


def _prefix_jaccard_pairs(grams: DataFrame, scheme: str | None = None) -> DataFrame:
    """Exact (doc_a, doc_b, j) pairs with Jaccard ``j`` ≥
    ``_JACCARD_THRESHOLD`` over a (doc_id, shingles) frame, via a
    lossless prefix-filter candidate join documented in
    ``dedup_ngram_jaccard``.  ``grams`` is scanned for the index AND
    the verify — callers hand in either the session shingle cache
    (already persisted) or their own persisted frame (curate_corpus's
    survivor set).

    Two candidate schemes, both lossless, selected per corpus
    (``scheme=None`` → data-driven; tests force ``"l1"``/``"l2"``):

    - ``l1`` — the classic 1-gram prefix filter (Chaudhuri ICDE'06 /
      Bayardo WWW'07): index each doc's ``n − ⌊t·n⌋ + 1`` globally
      rarest grams, join on single grams.  Candidate volume is
      Σ_g C(bucket_g, 2) — linear while gram document frequency stays
      flat (the Heaps'-law web-corpus regime), quadratic once df grows
      with the corpus (fixed vocabulary: the r7 sf1 run measured this
      path at 99×@10× data — VERDICT r7 #2).
    - ``l2`` — the 2-prefix scheme of AdaptJoin (Wang et al., SIGMOD
      2012): lengthen the prefix by one (``+ 2``) and join on unordered
      PAIRS of prefix grams.  Theorem: J ≥ t ⇒ |∩| ≥ ⌈t·max(na,nb)⌉,
      and each doc holds at most ``⌊t·n⌋ − 2`` of its shared grams
      outside the lengthened prefix, so ≥ 2 shared grams sit inside
      BOTH prefixes; every gram outside a prefix is globally larger
      than every gram inside it, hence the two globally-smallest
      shared grams {s1, s2} lie in both prefixes and both docs emit
      the key (s1, s2) — with the same orientation, because prefix
      rank order restricts the one global (df, gram) order.  Bucket
      keys are gram PAIRS, so bucket membership tracks CO-occurrence
      of two rare grams (≈ df²/N), which stays flat even when single
      dfs grow linearly — measured at sf1: candidates 52.7 M (l1) →
      2.6 M (l2), max bucket 88 → 11, index 24 M rows (linear).
      Exception: a pair can qualify with |∩| = 1 only when
      max(na, nb) ≤ 2 (J = 1/|∪| ≥ ½ forces |∪| ≤ 2), so docs with
      n ≤ 2 also emit single-gram keys joined among themselves — the
      hypothesis suite (tests/test_prefix_join_properties.py) runs the
      forced-l2 path over exactly these tiny-doc inputs.

    The choice is made from one cheap aggregate over the l1 prefix
    index (Σ C(bucket, 2) = the exact l1 equi-join output): escalate
    when it exceeds ``max(_PREFIX_L2_BUDGET_FLOOR,
    _PREFIX_L2_BUDGET_FACTOR × prefix entries)`` — i.e. when l1 stops
    being candidate-linear.  At sf0.1 (441 k candidates, 135 k
    entries) l1 wins on constants and is kept; the sf0.01 oracle
    fixture never escalates, so oracle equality is scheme-independent
    by construction (and the forced-l2 run is pinned equal to l1 on
    the same fixture by tests/test_text_dedup_extra.py).

    l2's OWN envelope and the l3/PassJoin criterion (VERDICT r8 #5,
    measured by ``tools/pair_scaling_probe.py --l2`` at sf1→sf2 — a
    2× step where 2-gram dfs also double, the fixed-vocabulary worst
    case): l2 candidates 1.96 M → 8.12 M (4.1× at 2× data) vs l1's
    52.7 M → 214 M (4.07×) — the pair keys buy a stable ~27×
    constant-factor reduction but co-occurrence df² ALSO grows
    quadratically once single dfs grow linearly, so on a vocabulary
    that does NOT grow with the corpus l2 delays, not removes, the
    quadratic regime.  The escalation criterion when that regime is
    reached is the same decision-aggregate pattern one level up:
    compute Σ C(bucket₂, 2) over the l2 pair-key index and, when it
    exceeds the same factor×entries budget, lengthen to l3 (3-prefix,
    triple keys ≈ df³/N² co-occurrence) or switch family to PassJoin
    length-partitioning (Li et al., VLDB 2011), whose partition count
    is token-length-bounded rather than df-driven.  Real web corpora
    sit in the Heaps'-law regime (vocabulary ∝ corpusᵝ, β≈0.5, dfs
    sublinear), where the sf1 measurement — candidates linear, max
    bucket 11 — is the operative one; the l3 path is therefore
    documented-not-built, exactly like the 50k-merge BPE handover."""
    # grams travel as xxhash64 ints, not strings: the df count, per-doc
    # window sort and candidate equi-join all shuffle 8-byte keys
    # instead of ~20-byte token strings.  Collision honesty (the prefix
    # theorem needs a total order on the TRUE grams, and hashing gives
    # a total order on hash keys instead): two distinct grams sharing a
    # hash merge into one index key, which usually ADDS candidates (the
    # equi-join is relaxed, and every candidate is exact-verified on
    # the true shingle arrays below) but can also shorten a doc's
    # effective prefix, so a qualifying pair could in principle be
    # missed.  The guarantee is therefore probabilistic at ~2⁻⁶⁴ per
    # gram pair (union-bounded over the corpus vocabulary — orders of
    # magnitude below the FP noise floor of the verify itself), not
    # axiomatically lossless; the all-pairs DuckDB oracle arbitrates.
    ex = grams.select(
        "doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("g")
    ).select("doc_id", "n", F.xxhash64("g").alias("gram"))
    gram_df = ex.groupBy("gram").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    pi1 = F.col("n") - F.floor(F.lit(_JACCARD_THRESHOLD) * F.col("n")) + 1
    ranked = ex.join(gram_df, "gram").withColumn("rk", F.row_number().over(w))
    if scheme is None:
        # the decision aggregate (Σ C(bucket, 2) over the l1 index IS
        # the l1 equi-join's output cardinality — the cost being
        # bounded) forces an action, so the ranked frame it scans is
        # persisted first (tracked — release_session_caches reclaims
        # it between bench families) and the chosen path then reads
        # the same blocks instead of re-running the df-join + window.
        ranked = persist_tracked(
            grams.sparkSession, ranked.filter(F.col("rk") <= pi1 + 1)
        )
        stats = (
            ranked.filter(F.col("rk") <= pi1)
            .groupBy("gram")
            .count()
            .agg(
                F.sum("count").alias("entries"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand"),
            )
            .first()
        )
        budget = max(
            _PREFIX_L2_BUDGET_FLOOR,
            _PREFIX_L2_BUDGET_FACTOR * int(stats["entries"] or 0),
        )
        scheme = "l2" if (stats["cand"] or 0) > budget else "l1"
    prefix1 = ranked.filter(F.col("rk") <= pi1).select("doc_id", "n", "gram")
    if scheme == "l1":
        # hot-bucket guard (same semantics as the MinHash _BUCKET_CAP): a
        # degenerate corpus — e.g. one ubiquitous gram tying first in every
        # doc's rare-first order — would regenerate quadratic candidate
        # sets; drop any gram indexed by more than _PREFIX_BUCKET_CAP docs
        # before the self-join.  groupBy+semi-join deliberately, NOT a
        # gram-partitioned window count: the aggregated side is tiny
        # (distinct prefix grams) so AQE broadcasts the join, while the
        # window form sorts the full prefix frame inside each gram
        # partition (measured 2.3× slower end-to-end at sf0.1).  Exercised
        # by tests/test_cap_semantics.py.  The lossless claim (and the
        # oracle equality of every jaccard_pair_frame consumer, curate
        # included) therefore REQUIRES no bucket above the cap — asserted
        # on the fixture corpus by tests/test_text_dedup_extra.py::
        # test_prefix_index_has_no_dropped_buckets.
        prefix = prefix1.join(
            prefix1.groupBy("gram")
            .count()
            .filter(F.col("count") <= _PREFIX_BUCKET_CAP)
            .drop("count"),
            "gram",
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.gram") == F.col("b.gram"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (
                    F.greatest("a.n", "b.n") * _JACCARD_THRESHOLD
                    <= F.least("a.n", "b.n")
                ),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    else:
        cand = _l2_candidate_pairs(ranked, pi1)
    return (
        cand.join(
            grams.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ga")),
            "doc_a",
        )
        .join(
            grams.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("gb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.size(F.array_union("ga", "gb"))
            ).alias("j"),
        )
        .filter(F.col("j") >= _JACCARD_THRESHOLD)
    )


# Same all-pairs predicate as the MinHash oracle: the two Spark paths
# (probabilistic banding vs lossless prefix filter) must both equal it.
_NGRAM_JACCARD_ORACLE = _NEAR_DUP_ORACLE


# ---------------------------------------------------------------------------
# deterministic stratified sampling + train/val/test split
# ---------------------------------------------------------------------------

# per-language keep rates: downsample the over-represented language to
# balance the corpus (the canonical pre-training rebalancing move)
_STRAT_RATES = {"en": 0.3}
_STRAT_DEFAULT_RATE = 1.0
# 80/10/10 split on a second, independently-salted hash
_SPLIT_TRAIN_CUT = int(0.8 * 2**32)
_SPLIT_VAL_CUT = int(0.9 * 2**32)


def _hash32_sql(expr: str) -> str:
    """DuckDB: first 8 md5 hex digits of ``expr`` as a BIGINT in
    [0, 2^32) — positional digit parse, same idiom as the SimHash
    oracle (strpos is 1-based; digit value × place value)."""
    digit = f"(strpos('0123456789abcdef', md5({expr})[{{j}}:{{j}}]) - 1)"
    return (
        "("
        + " + ".join(digit.format(j=j) + f" * {1 << (4 * (8 - j))}" for j in range(1, 9))
        + ")::BIGINT"
    )


def _hash32_col(col: Column) -> Column:
    """Spark twin of ``_hash32_sql``: same md5-derived 32-bit value."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def stratified_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling + train/val/test split — the
    two bookkeeping ops every training-data build runs last: downsample
    over-represented strata (here: language, ``_STRAT_RATES``), then
    assign surviving docs to 80/10/10 splits.

    Determinism is the whole point: membership is a pure function of
    (salt, lang, doc_id) via an md5-derived 32-bit hash compared against
    INTEGER thresholds — no ``rand()``, no float arithmetic, so the
    assignment is reproducible run-to-run, engine-to-engine (the DuckDB
    oracle recomputes it hash-for-hash), and stable under corpus
    re-partitioning — properties ``df.sample``/``sampleBy`` do NOT give
    (their Bernoulli draw depends on partition layout and seed plumbing).
    Independent salts ('strat', 'split') keep the two decisions
    uncorrelated.  At 100 TB this is a stateless projection + one
    aggregation — embarrassingly parallel, no shuffle before the final
    tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    rate_cut = F.lit(None).cast("long")
    for lg, rate in sorted(_STRAT_RATES.items()):
        rate_cut = F.when(F.col("lang") == lg, F.lit(int(rate * 2**32))).otherwise(
            rate_cut
        )
    rate_cut = F.coalesce(rate_cut, F.lit(int(_STRAT_DEFAULT_RATE * 2**32)))
    # NULL-lang discipline (review r5): concat_ws SKIPS nulls while the
    # oracle's `||` propagates them, so hash the explicit coalesce('')
    # in BOTH engines — identical bytes for labeled rows, and unlabeled
    # rows are sampled instead of silently dropped by the oracle.
    lang_key = F.coalesce(F.col("lang"), F.lit(""))
    h_strat = _hash32_col(F.concat_ws(":", F.lit("strat"), lang_key, "doc_id"))
    h_split = _hash32_col(F.concat_ws(":", F.lit("split"), lang_key, "doc_id"))
    kept = docs.filter(h_strat < rate_cut).select(
        "lang",
        F.when(h_split < _SPLIT_TRAIN_CUT, "train")
        .when(h_split < _SPLIT_VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        kept.groupBy("lang", "split")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "split")
    )


def _stratified_oracle() -> str:
    strat_h = _hash32_sql("'strat:' || coalesce(lang, '') || ':' || doc_id::VARCHAR")
    split_h = _hash32_sql("'split:' || coalesce(lang, '') || ':' || doc_id::VARCHAR")
    rate_cases = " ".join(
        f"WHEN lang = '{lg}' THEN {int(rate * 2**32)}"
        for lg, rate in sorted(_STRAT_RATES.items())
    )
    return f"""
    WITH kept AS (
        SELECT lang,
               CASE WHEN {split_h} < {_SPLIT_TRAIN_CUT} THEN 'train'
                    WHEN {split_h} < {_SPLIT_VAL_CUT} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        WHERE {strat_h} < (CASE {rate_cases}
                           ELSE {int(_STRAT_DEFAULT_RATE * 2**32)} END)
    )
    SELECT lang, split, count(*) AS n_docs
    FROM kept GROUP BY lang, split ORDER BY lang, split
"""


_STRATIFIED_ORACLE = _stratified_oracle()


# target mixture weights by source tier (a training-data mixture is an
# EXTERNAL spec — "web 3 : curated 2 : longtail 1" — not derivable from
# the data; unknown sources default to weight 1)
_MIXTURE_WEIGHTS = {f"src{i}": (3 if i < 5 else 2 if i < 10 else 1) for i in range(20)}
_MIXTURE_DEFAULT_WEIGHT = 1


def _budget_cut_expr(div: str, k: str = "k") -> str:
    """``k*w*2^32 div n_docs`` in two base-2^16 long-division steps so
    every int64 intermediate stays below 2^63 for n_docs < 2^47 (ADVICE
    r11: the single-multiply form overflows past ~2^31 docs — Spark
    (non-ANSI) wraps silently while DuckDB raises, breaking engine
    exactness exactly at the corpus sizes these ops claim to serve).
    Exact by the schoolbook identity: with a = k*w, B = 2^16 and
    a*B = q1*N + r1, a*B^2 div N = q1*B + (r1*B div N); K's
    construction gives a <= N, so q1 <= B and the recombined cut stays
    <= 2^32.  ``div`` is the engine's integer-divide token ('div'
    Spark, '//' DuckDB) — both operands are non-negative, so the two
    engines' floor semantics coincide."""
    t = f"({k} * w * 65536)"
    return f"({t} {div} n_docs) * 65536 + (({t} % n_docs) * 65536) {div} n_docs"


def mixture_balance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source-mixture balancing — the training-mixture op next
    to ``stratified_sample_split``'s per-language fixed rates: given
    target mixture WEIGHTS per source (``_MIXTURE_WEIGHTS``), pick the
    largest per-weight-unit document budget K the scarcest source
    supports without upsampling — ``K = min_s(count_s div w_s)`` — and
    downsample every source toward ``w_s · K`` docs, so surviving
    shares approximate the target mixture at maximal total size.

    Determinism and engine parity follow the stratified op's rules:
    membership is a pure function of (salt, source, doc_id) via the
    md5-derived 32-bit hash against an INTEGER cut, and the cut itself
    stays in pure integer arithmetic end-to-end — ``K · w_s · 2^32 div
    count_s`` (≤ 2^32 by construction of K) — so both engines divide
    identical longs; float rates would diverge in the last ulp.  Plan:
    one groupBy count (the per-source catalog, dimension-sized), a
    broadcast 1-row min for K, a broadcast cuts join back onto the
    scan, and one conditional-count agg — no data-sized shuffle beyond
    the per-source aggs."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.lit(None).cast("long")
    for src, wt in sorted(_MIXTURE_WEIGHTS.items()):
        w = F.when(F.col("src") == src, F.lit(wt)).otherwise(w)
    w = F.coalesce(w, F.lit(_MIXTURE_DEFAULT_WEIGHT)).cast("long")
    counts = (
        docs.groupBy(F.coalesce(F.col("source"), F.lit("")).alias("src"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("w", w)
    )
    budget = counts.agg(F.min(F.expr("n_docs div w")).alias("k"))
    cuts = counts.crossJoin(F.broadcast(budget)).select(
        "src", "n_docs", F.expr(_budget_cut_expr("div")).alias("cut")
    )
    h = _hash32_col(
        F.concat_ws(":", F.lit("mix"), F.coalesce(F.col("source"), F.lit("")), "doc_id")
    )
    tagged = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("src"), h.alias("h")
    )
    return (
        tagged.join(F.broadcast(cuts), "src")
        .groupBy(F.col("src").alias("source"), "n_docs")
        .agg(F.count(F.when(F.col("h") < F.col("cut"), 1)).cast("long").alias("n_kept"))
        .orderBy("source")
    )


def _mixture_oracle() -> str:
    h = _hash32_sql("'mix:' || coalesce(source, '') || ':' || doc_id::VARCHAR")
    cut = _budget_cut_expr("//", k="(SELECT MIN(n_docs // w) FROM weighted)")
    w_cases = " ".join(
        f"WHEN src = '{s}' THEN {wt}" for s, wt in sorted(_MIXTURE_WEIGHTS.items())
    )
    return f"""
    WITH counts AS (
        SELECT coalesce(source, '') AS src, COUNT(*)::BIGINT AS n_docs
        FROM documents GROUP BY 1
    ),
    weighted AS (
        SELECT src, n_docs,
               (CASE {w_cases} ELSE {_MIXTURE_DEFAULT_WEIGHT} END)::BIGINT AS w
        FROM counts
    ),
    cuts AS (
        SELECT src, n_docs,
               {cut} AS cut
        FROM weighted
    )
    SELECT c.src AS source, c.n_docs,
           COUNT(CASE WHEN {h} < c.cut THEN 1 END)::BIGINT AS n_kept
    FROM documents d JOIN cuts c ON coalesce(d.source, '') = c.src
    GROUP BY c.src, c.n_docs
    ORDER BY source
"""


_MIXTURE_ORACLE = _mixture_oracle()


def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (α) source sampling — the multilingual-balancing
    policy (mBERT / XLM-R: sample source s with p_s ∝ n_s^α, α < 1
    flattening the head) next to ``mixture_balance_sources``'s
    EXTERNAL weights: here the weights are DERIVED from the corpus
    itself at α = 1/2, w_s = ⌊√n_s⌋, then the same
    maximal-budget-without-upsampling machinery applies (K = min_s(n_s
    div w_s), kept_s target = w_s·K, membership by salted md5 hash vs
    an integer cut).

    Exactness note: n^α for irrational α would put a float Σ/÷ on the
    cut path, where cross-engine last-ulp drift flips boundary docs —
    so the weight is the INTEGER isqrt, computed as cast(sqrt(n)) ±1
    correction (both engines adjust the same double to the same
    integer), and every downstream quantity stays in the long domain
    exactly like the weighted op.  Same plan shape: dimension-sized
    groupBy count, broadcast 1-row min, broadcast cuts join, one
    conditional-count agg — no data-sized shuffle beyond the aggs."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy(
        F.coalesce(F.col("source"), F.lit("")).alias("src")
    ).agg(F.count("*").cast("long").alias("n_docs"))
    r = F.expr("cast(sqrt(cast(n_docs as double)) as long)")
    isqrt = (
        F.when((r + 1) * (r + 1) <= F.col("n_docs"), r + 1)
        .when(r * r > F.col("n_docs"), r - 1)
        .otherwise(r)
    )
    weighted = counts.withColumn("w", isqrt)
    budget = weighted.agg(F.min(F.expr("n_docs div w")).alias("k"))
    cuts = weighted.crossJoin(F.broadcast(budget)).select(
        "src", "n_docs", "w", F.expr(_budget_cut_expr("div")).alias("cut")
    )
    h = _hash32_col(
        F.concat_ws(
            ":", F.lit("temp"), F.coalesce(F.col("source"), F.lit("")), "doc_id"
        )
    )
    tagged = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("src"), h.alias("h")
    )
    return (
        tagged.join(F.broadcast(cuts), "src")
        .groupBy(F.col("src").alias("source"), "n_docs", "w")
        .agg(
            F.count(F.when(F.col("h") < F.col("cut"), 1)).cast("long").alias("n_kept")
        )
        .orderBy("source")
    )


def _mixture_temperature_oracle() -> str:
    h = _hash32_sql("'temp:' || coalesce(source, '') || ':' || doc_id::VARCHAR")
    cut = _budget_cut_expr("//", k="(SELECT MIN(n_docs // w) FROM weighted)")
    return f"""
    WITH counts AS (
        SELECT coalesce(source, '') AS src, COUNT(*)::BIGINT AS n_docs
        FROM documents GROUP BY 1
    ),
    weighted AS (
        SELECT src, n_docs,
               (CASE
                    WHEN (r + 1) * (r + 1) <= n_docs THEN r + 1
                    WHEN r * r > n_docs THEN r - 1
                    ELSE r
                END) AS w
        FROM (SELECT src, n_docs,
                     CAST(sqrt(n_docs::DOUBLE) AS BIGINT) AS r
              FROM counts)
    ),
    cuts AS (
        SELECT src, n_docs, w,
               {cut} AS cut
        FROM weighted
    )
    SELECT c.src AS source, c.n_docs, c.w,
           COUNT(CASE WHEN {h} < c.cut THEN 1 END)::BIGINT AS n_kept
    FROM documents d JOIN cuts c ON coalesce(d.source, '') = c.src
    GROUP BY c.src, c.n_docs, c.w
    ORDER BY source
"""


_MIXTURE_TEMPERATURE_ORACLE = _mixture_temperature_oracle()


# epoch-shuffle manifest: fixed small epoch/shard counts so the whole
# surface is value-pinnable; a production call takes these as arguments
_EPOCH_SHUFFLE_EPOCHS = 2
_EPOCH_SHUFFLE_SHARDS = 8


def epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle — the manifest a data
    loader consumes so every run (and every resume) visits documents in
    the same pseudo-random order per epoch: each epoch e defines a
    permutation by the salted hash md5('ep:e:' || doc_id), docs are
    globally ranked in (hash, doc_id) order, and the rank stripes
    round-robin into ``_EPOCH_SHUFFLE_SHARDS`` shards (sizes equal ±1
    by construction).  Engine-portable randomness: the permutation is a
    pure function of (salt, doc_id) — no rand(), no zipWithIndex
    partition dependence.

    The global rank is the two-pass distributed scan ``pack_sequences``
    documents (literal-derived range buckets from one seeded hash
    sample, per-bucket row_number + broadcast bucket offsets) — never a
    single-partition global window.  Cross-bucket order is strict
    because equal hashes can never straddle a cut (bucket = count of
    cuts ≤ hash).  Per epoch: two scans of a 12-byte projection, one
    equi-shuffle, three bounded driver actions — epochs are a small
    constant, so 100 TB cost is epochs × one lean scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    par = spark.sparkContext.defaultParallelism
    out = None
    for epoch in range(_EPOCH_SHUFFLE_EPOCHS):
        h = _hash32_col(
            F.concat_ws(":", F.lit("ep"), F.lit(str(epoch)), "doc_id")
        )
        # plain persist, released right after the offsets collect below
        # (ADVICE r11: a tracked per-epoch persist accumulated across
        # repeated calls in one session) — the final consumer action
        # recomputes this 12-byte projection once, which is exactly the
        # second scan the docstring already prices; recomputation is
        # safe because hv is a pure function of (salt, doc_id)
        keyed_p = docs.select("doc_id", h.alias("hv")).persist()
        try:  # finally-release (ADVICE r12): a failed collect must not
            # leak the cached frame — this persist is deliberately NOT
            # session-tracked (see the r11 note above), so nothing else
            # would ever reclaim it
            n = keyed_p.count()
            frac = min(1.0, (par * 20) / max(n, 1))
            sample = sorted(
                r["hv"]
                for r in keyed_p.select("hv")
                .sample(False, frac, 7 + epoch)
                .collect()
            )
            step = max(1, len(sample) // par)
            cuts = sample[step::step][: par - 1]
            if cuts:
                cut_arr = F.array(*[F.lit(c) for c in cuts])
                bucket = F.size(F.filter(cut_arr, lambda c: c <= F.col("hv")))
            else:
                bucket = F.lit(0)
            keyed = keyed_p.withColumn("pid", bucket.cast("int"))
            totals = sorted(
                (r["pid"], r["c"])
                for r in keyed.groupBy("pid").agg(F.count("*").alias("c")).collect()
            )
        finally:
            keyed_p.unpersist(False)  # all eager consumers done; see above
        offsets, acc = [], 0
        for pid, c in totals:
            offsets.append((pid, acc))
            acc += c
        off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, base long")
        w = Window.partitionBy("pid").orderBy("hv", "doc_id")
        ranked = (
            keyed.withColumn("rk", F.row_number().over(w))
            .join(F.broadcast(off_df), "pid")
            .select(
                F.lit(epoch).alias("epoch"),
                "doc_id",
                (F.col("base") + F.col("rk") - 1).cast("long").alias("pos"),
            )
        )
        out = ranked if out is None else out.unionByName(ranked)
    return out.select(
        "epoch",
        "doc_id",
        "pos",
        (F.col("pos") % _EPOCH_SHUFFLE_SHARDS).alias("shard"),
        F.expr(f"pos div {_EPOCH_SHUFFLE_SHARDS}").alias("pos_in_shard"),
    ).orderBy("epoch", "pos")


def _epoch_shuffle_oracle() -> str:
    h = _hash32_sql("'ep:' || epoch::VARCHAR || ':' || doc_id::VARCHAR")
    eps = ", ".join(str(e) for e in range(_EPOCH_SHUFFLE_EPOCHS))
    return f"""
    WITH eps AS (SELECT unnest([{eps}]) AS epoch),
    keyed AS (
        SELECT epoch, doc_id, {h} AS hv
        FROM documents CROSS JOIN eps
    ),
    ranked AS (
        SELECT epoch, doc_id,
               row_number() OVER (PARTITION BY epoch ORDER BY hv, doc_id) - 1
                   AS pos
        FROM keyed
    )
    SELECT epoch, doc_id, pos,
           pos % {_EPOCH_SHUFFLE_SHARDS} AS shard,
           pos // {_EPOCH_SHUFFLE_SHARDS} AS pos_in_shard
    FROM ranked
    ORDER BY epoch, pos
"""


_EPOCH_SHUFFLE_ORACLE = _epoch_shuffle_oracle()


# ---------------------------------------------------------------------------
# training-shard export: deterministic global shuffle + sharded write
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def export_training_shards(
    spark: SparkSession, sf_dir: str, out_path: str | None = None
) -> DataFrame:
    """Deterministic shard assignment + seeded global shuffle — the
    EXPORT stage a training-data build runs last (after curation,
    dedup, mixture balancing, packing): fix the corpus into N shards a
    data loader can stream round-robin, with document order inside each
    shard randomized but REPRODUCIBLE.

    Two independent md5-derived 32-bit hashes (same determinism rules
    as ``stratified_sample_split`` — pure functions of (salt, doc_id),
    no ``rand()``): ``shard = h('shard:'||id) mod N`` places the doc,
    ``h('order:'||id)`` orders it within the shard.  Decorrelated salts
    mean in-shard order carries no shard-assignment bias, and a seeded
    ORDER column beats an actual global sort-by-random: the write needs
    only ``repartition(N, shard)`` (each writer task owns WHOLE shards
    — one output file per shard, the compact_parquet partition_by
    lesson) + an in-partition sort, never a global ordering shuffle.

    The returned report is the shard manifest: per shard, the doc
    count, whitespace-token count (loader-side budgeting), and an
    integer checksum (sum of order hashes — a membership fingerprint
    both engines compute exactly).  With ``out_path`` set, the shards
    are also written as ``shard=``-partitioned parquet; round-trip
    identity and one-file-per-shard ownership are pinned by
    tests/test_text_dedup_extra.py."""
    docs = load_table(spark, sf_dir, "documents")
    h_shard = _hash32_col(F.concat_ws(":", F.lit("shard"), "doc_id"))
    h_order = _hash32_col(F.concat_ws(":", F.lit("order"), "doc_id"))
    tagged = docs.select(
        (h_shard % _N_SHARDS).cast("long").alias("shard"),
        h_order.alias("h_order"),
        F.col("doc_id"),
        F.size(_tokens()).cast("long").alias("n_toks"),
        F.col("text"),
    )
    if out_path is not None:
        (
            tagged.repartition(_N_SHARDS, "shard")
            .sortWithinPartitions("shard", "h_order")
            .select("shard", "h_order", "doc_id", "text")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(out_path)
        )
    return (
        tagged.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("h_order").cast("long").alias("id_checksum"),
        )
        .orderBy("shard")
    )


def _shards_oracle() -> str:
    hs = _hash32_sql("'shard:' || doc_id::VARCHAR")
    ho = _hash32_sql("'order:' || doc_id::VARCHAR")
    return f"""
    WITH tagged AS (
        SELECT {hs} % {_N_SHARDS} AS shard, {ho} AS h_order,
               len(string_split(trim(text), ' '))::BIGINT AS n_toks
        FROM documents
    )
    SELECT shard::BIGINT AS shard, COUNT(*)::BIGINT AS n_docs,
           SUM(n_toks)::BIGINT AS n_tokens, SUM(h_order)::BIGINT AS id_checksum
    FROM tagged GROUP BY shard ORDER BY shard
"""


_SHARDS_ORACLE = _shards_oracle()


# ---------------------------------------------------------------------------
# near-dup clustering: connected components of the pair graph
# ---------------------------------------------------------------------------


def dedup_components(
    spark: SparkSession, sf_dir: str, max_rounds: int = 50
) -> DataFrame:
    """Connected components of the near-duplicate pair graph — the
    clustering step production dedup pipelines run after pair
    generation (keep one canonical doc per component; the per-pair
    smaller-id rule in ``curate_corpus`` is the non-transitive
    shortcut, this is the full answer).  Output: (doc_id, component_id,
    component_size) for every doc touching ≥ 1 near-dup pair, where
    component_id = min doc_id in the component.

    Runs on the SHARED component engine
    (graph_analytics.min_label_components): iterative min-label
    propagation with one action per round and lazy localCheckpoint —
    see that docstring for the loop discipline and the
    star-contraction escalation path at scale.

    Unusually for an iterative graph algorithm, this is fully
    value-checked: the DuckDB oracle computes the same components via a
    recursive-CTE transitive closure, so the driver-style gate covers
    the loop end to end (the coloring flagship only gets a rows-only
    check because colorings are not unique — components ARE)."""
    from .graph_analytics import min_label_components

    # the session pair cache makes the DIRECTED pairs a persisted leaf,
    # so the union's two branches (which are separate subtrees of one
    # plan) both read cached blocks instead of re-running the expensive
    # prefix-filter join (measured +6 s at sf0.1, review r5)
    pairs = jaccard_pair_frame(spark, sf_dir).select("doc_a", "doc_b")
    # persist_tracked, not a bare persist (review r5): if the component
    # loop raises (star-engine validation, on_exhaustion="raise"), the
    # unpersist below never runs — the registry lets
    # release_session_caches reclaim the blocks anyway
    edges = persist_tracked(
        spark,
        pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst"),
    )
    labels = min_label_components(edges, max_rounds)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("component_size"))
    out = (
        labels.join(sizes, "label")
        .select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("component_id"),
            "component_size",
        )
        .orderBy("doc_id")
    )
    edges.unpersist(False)
    return out


_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
    ), sh AS (
        SELECT doc_id,
               {SHINGLE_SQL_EXPR} AS sg
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sg, b.sg))::DOUBLE
              / len(list_distinct(list_concat(a.sg, b.sg))) >= {_JACCARD_THRESHOLD}
    ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ), reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id,
           least(u, min(v)) AS component_id,
           (count(DISTINCT v) + 1)::BIGINT AS component_size
    FROM (SELECT u, v FROM reach WHERE u <> v)  -- cycles put (u,u) in reach
    GROUP BY u
    ORDER BY doc_id
"""


def dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per near-dup cluster — the step
    between clustering and dropping: within each connected component of
    the pair graph keep the LONGEST doc, ties broken by smallest
    doc_id (the standard production policy: length is the cheap
    monotone proxy for information content, and the tie-break keeps
    the rule a pure function of the cluster).  Output one row per
    clustered doc: (doc_id, component_id, n_chars, keep).

    Plan: the shared component engine's labels (cached pair frame +
    min-label/star loop) joined to a 2-column doc projection, then one
    component-keyed row_number window — the window's partitions are
    cluster-sized, so no skew beyond the clusters themselves.  The
    DuckDB oracle replays the recursive-CTE closure plus the same
    window, value-checking policy AND clustering in one gate."""
    comp = dedup_components(spark, sf_dir).select("doc_id", "component_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("component_id").orderBy(F.desc("n_chars"), "doc_id")
    return (
        comp.join(docs, "doc_id")
        .select(
            "doc_id",
            "component_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.row_number().over(w) == 1).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _keep_policy_oracle() -> str:
    closure = _COMPONENTS_ORACLE.split("SELECT u AS doc_id")[0]
    return f"""{closure.rstrip().rstrip(')')}),
    comp AS (
        SELECT u AS doc_id, least(u, min(v)) AS component_id
        FROM (SELECT u, v FROM reach WHERE u <> v)
        GROUP BY u
    )
    SELECT c.doc_id, c.component_id, d.n_chars::BIGINT AS n_chars,
           row_number() OVER (PARTITION BY c.component_id
                              ORDER BY d.n_chars DESC, c.doc_id) = 1 AS keep
    FROM comp c JOIN documents d USING (doc_id)
    ORDER BY c.doc_id
"""


_KEEP_POLICY_ORACLE = _keep_policy_oracle()


# ---------------------------------------------------------------------------
# end-to-end corpus curation pipeline (composition demo)
# ---------------------------------------------------------------------------

_CURATE_MIN_CHARS = 200  # quality gate: drop short docs
_CURATE_MIN_TOKENS = 10  # quality gate: drop token-sparse docs


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-training-data pipeline, composed end to end
    from this module's operators in ONE lazy plan (no driver collect):

        quality gate → exact dedup (keep-first) → near-dedup drop
        (exact n-gram Jaccard pairs, drop the larger doc_id of each
        pair) → chunk + token accounting

    Output is the one-row curation funnel — the numbers a data team
    reports for every corpus build: docs in, docs surviving each stage,
    and the chunk/token yield of the kept set.

    100 TB design: each stage is the already-scale-audited operator it
    reuses (hash-window dedup on the 32-byte digest, the SHARED
    session exact-Jaccard pair artifact — see below), and the funnel
    aggregates are single-pass map-side combines crossJoined as 1-row
    frames (broadcast, no shuffle).  The greedy smaller-id-wins
    near-dup rule is deterministic and SQL-expressible; it is the
    per-pair rule (not transitive-closure clustering — at 100 TB that
    would be the iterative connected-components loop, the documented
    scale path being this same pair list fed to graph_color-style
    iteration).

    Pair-stage reuse (round 7, closing the VERDICT r6 #1 bench drift):
    Jaccard of a pair depends only on the two documents, so the
    survivor-set pair list EQUALS the corpus-wide pair list with both
    endpoints restricted to survivors — the funnel therefore consumes
    ``jaccard_pair_frame`` (the memoized artifact every dedup consumer
    shares, honestly priced as bench.py's ``jaccard_pair_build`` line)
    through two semi-joins instead of re-running a survivor-only
    prefix join per call, which both duplicated the join cost and made
    the benched median hostage to family warm-up order (isolated
    profile: floor 6.5 s unchanged from r5; first post-artifact-build
    run 11.9 s — tools/profile_curate.py).  Exactness caveat, same
    class as the banded paths: the corpus-wide build computes its
    hot-bucket cap over corpus document frequencies, the survivor-only
    join over survivor frequencies, so on a corpus where the cap FIRES
    the two pair lists may differ; on this fixture the prefix join
    drops nothing (pinned by the minhash↔prefix pair-identity test),
    so the DuckDB survivor-all-pairs oracle equality holds by
    construction."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    quality = (
        docs.filter(
            (F.col("n_chars") >= _CURATE_MIN_CHARS) & (n_tok >= _CURATE_MIN_TOKENS)
        )
        .select("doc_id", "text")
    )
    w = Window.partitionBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).orderBy(
        "doc_id"
    )
    exact = persist_tracked(
        spark,
        quality.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk"),
    )
    # shared pair artifact, restricted to survivors (see docstring):
    # two 8-byte-key semi-joins on the already-persisted pair frame
    # replace a per-call survivor-only set-similarity join
    pairs = jaccard_pair_frame(spark, sf_dir)
    dropped = (
        pairs.join(
            exact.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        )
        .join(exact.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = exact.join(dropped, "doc_id", "left_anti")
    ln = F.length("text")
    # closed form of chunk_documents' full-coverage start list: the
    # stride-grid count plus one tail chunk when the length is not
    # stride-aligned (review r5 — keep in lockstep with _CHUNK_ORACLE)
    n_chunks = F.when(
        ln >= _CHUNK_SIZE,
        F.floor((ln - _CHUNK_SIZE) / _CHUNK_STRIDE)
        + 1
        + F.when(((ln - _CHUNK_SIZE) % _CHUNK_STRIDE) != 0, 1).otherwise(0),
    ).otherwise(F.lit(1))
    kept_agg = kept.agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(n_chunks).cast("long").alias("n_chunks"),
        F.sum(F.size(_tokens())).cast("long").alias("n_tokens"),
    )
    funnel = (
        docs.agg(F.count("*").cast("long").alias("n_input"))
        .crossJoin(quality.agg(F.count("*").cast("long").alias("n_quality")))
        .crossJoin(exact.agg(F.count("*").cast("long").alias("n_exact_unique")))
        .crossJoin(kept_agg)
    )
    return funnel.select(
        "n_input", "n_quality", "n_exact_unique", "n_kept", "n_chunks", "n_tokens"
    )


_CURATE_ORACLE = f"""
    WITH quality AS (
        SELECT doc_id, text FROM documents
        WHERE n_chars >= {_CURATE_MIN_CHARS}
          AND len(string_split(trim(text), ' ')) >= {_CURATE_MIN_TOKENS}
    ), exact AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY sha256(lower(trim(text)))
                                      ORDER BY doc_id) AS rk
            FROM quality)
        WHERE rk = 1
    ), sh AS (
        SELECT doc_id,
               {SHINGLE_SQL_EXPR} AS sg
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM exact)
    ), pairs AS (
        SELECT b.doc_id AS dropped FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sg, b.sg))::DOUBLE
              / len(list_distinct(list_concat(a.sg, b.sg))) >= {_JACCARD_THRESHOLD}
    ), kept AS (
        SELECT doc_id, text FROM exact
        WHERE doc_id NOT IN (SELECT dropped FROM pairs)
    )
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_input,
           (SELECT count(*) FROM quality)::BIGINT AS n_quality,
           (SELECT count(*) FROM exact)::BIGINT AS n_exact_unique,
           (SELECT count(*) FROM kept)::BIGINT AS n_kept,
           (SELECT sum(CASE WHEN length(text) >= {_CHUNK_SIZE}
                            THEN (length(text) - {_CHUNK_SIZE}) // {_CHUNK_STRIDE} + 1
                                 + CASE WHEN (length(text) - {_CHUNK_SIZE})
                                             % {_CHUNK_STRIDE} <> 0
                                        THEN 1 ELSE 0 END
                            ELSE 1 END) FROM kept)::BIGINT AS n_chunks,
           (SELECT sum(len(string_split(trim(text), ' ')))
            FROM kept)::BIGINT AS n_tokens
"""


# ---------------------------------------------------------------------------
# repetition / boilerplate quality signals (Gopher-style)
# ---------------------------------------------------------------------------


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals in the style of the Gopher data
    quality filters (Rae et al. 2021, table A1): fraction of tokens
    covered by the single most frequent 2-gram / 3-gram, plus the
    distinct-token ratio.  The corpus has no newlines, so the line-level
    duplicate filters are replaced by their token-n-gram analogues
    (documented divergence; same intent — catch boilerplate/spam).

    100 TB design: two aggregations keyed by (doc_id, gram) with
    map-side combine (gram counts collapse before the shuffle), then a
    per-doc max and one doc_id-keyed join back to the single-pass token
    stats.  No all-pairs structure, no Python, state per task bounded by
    the doc's own gram set.  Fraction uses least(1, .) because
    overlapping occurrences of a self-similar gram ("a a a a") can
    cover more than n_tok tokens.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )

    def _grams(n: int) -> Column:
        # arrays_zip-of-slices, NOT sequence + element_at: CollapseProject
        # re-inlines `toks` as the raw split() into each element_at, and
        # codegen then re-splits the text per gram element — the same
        # O(tokens²) shape fixed in _shingles (r8 sf1 profile)
        ln = F.col("n_tok") - (n - 1)
        zipped = F.arrays_zip(*[F.slice(F.col("toks"), k + 1, ln) for k in range(n)])
        make = F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
        )
        return F.when(F.col("n_tok") >= n, make).otherwise(F.array().cast("array<string>"))

    def _top_gram(n: int, out: str) -> DataFrame:
        return (
            base.select("doc_id", F.explode(_grams(n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(out))
        )

    stats = base.select("doc_id", "n_tok", "n_distinct")
    out = (
        stats.join(_top_gram(2, "max_bi"), "doc_id", "left")
        .join(_top_gram(3, "max_tri"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tok"), 6).alias(
                "distinct_ratio"
            ),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(2.0) * F.coalesce(F.col("max_bi"), F.lit(0)) / F.col("n_tok"),
                ),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(3.0) * F.coalesce(F.col("max_tri"), F.lit(0)) / F.col("n_tok"),
                ),
                6,
            ).alias("top_trigram_frac"),
        )
        .orderBy("doc_id")
    )
    return out


_REPETITION_ORACLE = """
    WITH base AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t
        FROM documents
    ), stats AS (
        SELECT doc_id, len(t) AS n_tok, len(list_distinct(t)) AS n_distinct
        FROM base
    ), bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM base WHERE len(t) >= 2
    ), bimax AS (
        SELECT doc_id, max(c) AS max_bi FROM (
            SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
        ) GROUP BY doc_id
    ), tri AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM base WHERE len(t) >= 3
    ), trimax AS (
        SELECT doc_id, max(c) AS max_tri FROM (
            SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g
        ) GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_tok,
           round(s.n_distinct::DOUBLE / s.n_tok, 6) AS distinct_ratio,
           round(least(1.0, 2.0 * coalesce(b.max_bi, 0) / s.n_tok), 6)
               AS top_bigram_frac,
           round(least(1.0, 3.0 * coalesce(tr.max_tri, 0) / s.n_tok), 6)
               AS top_trigram_frac
    FROM stats s
    LEFT JOIN bimax b USING (doc_id)
    LEFT JOIN trimax tr USING (doc_id)
    ORDER BY s.doc_id
"""


def stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level cleaning — the preprocessing pass between ingestion
    and tokenizer training: drop stopwords, keep order, emit the
    before/after accounting plus an md5 of the cleaned text so the
    transform itself is value-pinned (not just the counts).  Pure
    Catalyst HOF filter — stateless per-row projection, no shuffle
    until the final presentation orderBy (dropped in a real pipeline,
    which writes the cleaned column back to parquet)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    kept = F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(kept).alias("n_kept"),
        F.md5(F.concat_ws(" ", kept)).alias("cleaned_md5"),
    ).orderBy("doc_id")


_STOPWORD_FILTER_ORACLE = f"""
    SELECT doc_id,
           len(string_split(trim(text), ' ')) AS n_tokens,
           len(list_filter(string_split(trim(text), ' '),
               t -> NOT list_contains({_STOPWORDS!r}, t))) AS n_kept,
           md5(array_to_string(list_filter(string_split(trim(text), ' '),
               t -> NOT list_contains({_STOPWORDS!r}, t)), ' ')) AS cleaned_md5
    FROM documents
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# line-level boilerplate removal (RefinedWeb / CCNet-style segment dedup)
# ---------------------------------------------------------------------------

# segment = non-overlapping window of this many whitespace tokens (the
# corpus has no newline structure, so fixed token windows stand in for
# "lines"; a newline-delimited corpus would swap the segmenter only)
_BOILER_SEG_TOKENS = 8
# a segment is boilerplate when it occurs in at least this many DISTINCT
# documents (headers/footers/nav chrome repeat corpus-wide; genuine
# content does not)
_BOILER_MIN_DOCS = 3


def remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency segment removal — the RefinedWeb/CCNet "line
    dedup" pass: drop any segment ("line") that repeats across >=
    ``_BOILER_MIN_DOCS`` distinct documents (boilerplate headers,
    footers, navigation chrome), keeping each document's remaining
    segments in order.  Emits per-doc accounting plus an md5 of the
    cleaned text so the transform is value-pinned, not just counted.

    100 TB plan: three keyed shuffles and nothing else —
    (1) groupBy(seg_hash) with a map-side-combinable count(DISTINCT
    doc_id) (the 32-byte hash is the shuffle record, never the text),
    (2) a join of segments against the per-hash doc_freq (one row per
    hash on the build side; a hot boilerplate hash replicates that one
    row, and AQE skew-join splits the probe side), (3) the per-doc
    regroup, where collect_list is bounded by a single document's
    segment count and array_sort on (seg_idx, seg) structs restores
    order without a window.  No global window, no UDF, no driver state.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_segs = F.ceil(F.size(toks) / F.lit(_BOILER_SEG_TOKENS)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * _BOILER_SEG_TOKENS + 1, _BOILER_SEG_TOKENS)
                ),
            )
        ).alias("seg_idx", "seg"),
    ).withColumn("seg_hash", F.md5("seg"))
    freq = segs.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    tagged = segs.join(freq, "seg_hash").withColumn(
        "is_boiler", F.col("doc_freq") >= _BOILER_MIN_DOCS
    )
    kept_struct = F.when(
        ~F.col("is_boiler"), F.struct("seg_idx", "seg")
    )  # collect_list skips NULLs, so boilerplate segments vanish here
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(F.col("is_boiler").cast("long")).alias("n_boiler"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["seg"]
                ),
            ).alias("_clean"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_boiler",
            F.length("_clean").alias("clean_n_chars"),
            F.md5("_clean").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


_BOILERPLATE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
    ), segs AS (
        SELECT doc_id, i AS seg_idx,
               array_to_string(
                   ts[(i*{_BOILER_SEG_TOKENS}+1):(i*{_BOILER_SEG_TOKENS}+{_BOILER_SEG_TOKENS})],
                   ' ') AS seg
        FROM toks, LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(len(ts) / {_BOILER_SEG_TOKENS}.0) AS BIGINT)))
        ) AS u(i)
    ), freq AS (
        SELECT seg, count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS} AS is_boiler
        FROM segs GROUP BY seg
    )
    SELECT doc_id,
           count(*) AS n_segs,
           sum(CASE WHEN is_boiler THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
           length(coalesce(string_agg(CASE WHEN NOT is_boiler THEN seg END,
               ' ' ORDER BY seg_idx), '')) AS clean_n_chars,
           md5(coalesce(string_agg(CASE WHEN NOT is_boiler THEN seg END,
               ' ' ORDER BY seg_idx), '')) AS clean_md5
    FROM segs JOIN freq USING (seg)
    GROUP BY doc_id
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# benchmark-contamination check (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

# deterministic eval holdout: ~10% of docs by a salted md5 hash (same
# engine-portable idiom as the stratified split; independent salt)
_CONTAM_EVAL_CUT = int(0.1 * 2**32)


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination scan — the decontamination pass every
    serious pre-training build runs before reporting benchmark numbers
    (GPT-3 appendix C / PaLM style: flag eval documents sharing n-grams
    with the training set).  A deterministic ~10% holdout is carved out
    by a salted md5 hash (pure function of doc_id — reproducible
    engine-to-engine, like ``stratified_sample_split``); for every eval
    doc with ≥ 1 shingle the output reports how many of its distinct
    token-3-grams also appear anywhere in the training partition:

        (doc_id, n_grams, n_shared, contam_frac)

    100 TB design: the training side collapses to DISTINCT 8-byte
    xxhash64 gram keys (the inverted-index trick the prefix-filter join
    uses — grams never shuffle as strings), the eval side explodes and
    LEFT SEMI joins on that key, and both sides reuse the session
    shingle cache.  Equi-join + two hash aggregations, no window, no
    driver state.  Collision honesty (same note as
    ``_prefix_jaccard_pairs``): two distinct grams colliding at 64 bits
    could count a non-shared gram as shared with probability ~2⁻⁶⁴ per
    pair — the DuckDB oracle joins on TRUE gram strings and arbitrates."""
    sh = shingle_frame(spark, sf_dir)
    is_eval = _hash32_col(F.concat_ws(":", F.lit("contam"), "doc_id")) < _CONTAM_EVAL_CUT
    labeled = sh.withColumn("is_eval", is_eval)
    train_grams = (
        labeled.filter(~F.col("is_eval"))
        .select(F.explode("shingles").alias("g"))
        .select(F.xxhash64("g").alias("gk"))
        .distinct()
    )
    eval_docs = labeled.filter(F.col("is_eval") & (F.size("shingles") > 0)).select(
        "doc_id", F.size("shingles").alias("n_grams"), "shingles"
    )
    shared = (
        eval_docs.select("doc_id", F.explode("shingles").alias("g"))
        .select("doc_id", F.xxhash64("g").alias("gk"))
        .join(train_grams, "gk", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        eval_docs.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0)) / F.col("n_grams"), 6
            ).alias("contam_frac"),
        )
        .orderBy("doc_id")
    )


def _contamination_oracle() -> str:
    h = _hash32_sql("'contam:' || doc_id::VARCHAR")
    return f"""
    WITH sh AS (
        SELECT doc_id,
               {SHINGLE_SQL_EXPR} AS sg,
               {h} < {_CONTAM_EVAL_CUT} AS is_eval
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents)
    ), train_g AS (
        SELECT DISTINCT unnest(sg) AS g FROM sh WHERE NOT is_eval
    ), ev AS (
        SELECT doc_id, unnest(sg) AS g FROM sh WHERE is_eval AND len(sg) > 0
    ), shared AS (
        SELECT doc_id, count(*) AS n_shared FROM ev
        WHERE g IN (SELECT g FROM train_g) GROUP BY doc_id
    )
    SELECT s.doc_id,
           len(s.sg)::BIGINT AS n_grams,
           coalesce(sh2.n_shared, 0)::BIGINT AS n_shared,
           round(coalesce(sh2.n_shared, 0)::DOUBLE / len(s.sg), 6) AS contam_frac
    FROM sh s LEFT JOIN shared sh2 USING (doc_id)
    WHERE s.is_eval AND len(s.sg) > 0
    ORDER BY s.doc_id
"""


_CONTAMINATION_ORACLE = _contamination_oracle()


# ---------------------------------------------------------------------------
# training-sequence packing (concat-and-split token accounting)
# ---------------------------------------------------------------------------

_PACK_SEQ_LEN = 512  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing — the GPT-style pre-training
    layout: concatenate every document's tokens in doc_id order and cut
    the stream every ``_PACK_SEQ_LEN`` tokens.  Output is the packing
    manifest a data loader needs, one row per packed sequence:

        (seq_id, n_docs, n_full_docs, n_tokens)

    where n_docs counts documents intersecting the sequence,
    n_full_docs those fully contained (no boundary fragment), and
    n_tokens is _PACK_SEQ_LEN except for the final tail.

    The core is a GLOBAL prefix sum over token counts in doc_id order —
    the textbook two-pass distributed scan, NOT a single-partition
    window (``Window.orderBy`` with no partitionBy funnels the corpus
    through one task — the anti-pattern this module bans):

      0. derive EXPLICIT range-bucket cut points once (one seeded
         doc_id sample, sorted on the driver, ≤ par−1 literals).  The
         bucket id is then a PURE FUNCTION of doc_id — a literal-array
         rank expression — so both passes, and any recompute after
         cache/block loss, assign identical buckets by construction.
         (Before r6 this used repartitionByRange + spark_partition_id
         with persist as the pinning mechanism; RangePartitioner's
         sampling being recompute-stable is an implementation detail,
         not a contract — VERDICT r5 item 5.)
      1. one tiny action collects per-bucket token totals (#buckets
         rows, bounded driver state);
      2. per-bucket running sums via a bucket-partitioned window plus
         the broadcast bucket-offset table give every doc its global
         [start, end) token span.

    Each doc then explodes to the sequences its span crosses
    (``F.sequence`` — ≤ ⌈n_tok/L⌉ + 1 rows) and a single hash
    aggregation builds the manifest.  At 100 TB: two scans of an
    8-byte-per-doc projection, one equi-shuffle (range partition), one
    broadcast join, one agg — and the manifest is ~corpus_tokens/L rows,
    itself distributed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.size(_tokens()).cast("long").alias("n_tok"))
    return _pack_manifest(spark, toks)


def _doc_spans(spark: SparkSession, toks: DataFrame) -> DataFrame:
    """Every doc's global token span [start, end) in doc_id order —
    the two-pass prefix-sum core of ``_pack_manifest``, factored out
    (r14) so the shard EXPORT (operators/curation.py:
    export_packed_shards) can place each kept token at its global
    position with the exact same cut points the manifest used."""
    par = spark.sparkContext.defaultParallelism
    # the persist is now a pure scan-saver (3 tiny actions + the final
    # plan read it); correctness no longer depends on it — bucket ids
    # below are literal-derived, recompute-safe
    base = persist_tracked(spark, toks)
    n = base.count()
    frac = min(1.0, (par * 20) / max(n, 1))
    sample = sorted(
        r["doc_id"] for r in base.select("doc_id").sample(False, frac, 42).collect()
    )
    step = max(1, len(sample) // par)
    cuts = sample[step::step][: par - 1]
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c <= F.col("doc_id")))
    else:
        bucket = F.lit(0)
    base = base.withColumn("pid", bucket.cast("int"))
    totals = sorted(
        (r["pid"], r["tot"])
        for r in base.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += tot
    # empty corpus: createDataFrame([]) would need an explicit guard —
    # keep a dummy row so the (empty) join below still plans
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, base long")
    w = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.withColumn("cum", F.sum("n_tok").over(w))
        .join(F.broadcast(off_df), "pid")
        .select(
            "doc_id",
            "n_tok",
            (F.col("base") + F.col("cum") - F.col("n_tok")).alias("start"),
            (F.col("base") + F.col("cum")).alias("end"),
        )
    )


def _pack_manifest(spark: SparkSession, toks: DataFrame) -> DataFrame:
    """The packing core of ``pack_sequences`` over any (doc_id, n_tok)
    frame — shared with the end-to-end curation funnel
    (operators/curation.py), which packs its CLEANED survivor stream
    with the same two-pass prefix-sum scan."""
    L = _PACK_SEQ_LEN
    spans = _doc_spans(spark, toks)
    ex = spans.select(
        "start",
        "end",
        F.explode(
            F.sequence(F.floor(F.col("start") / L), F.floor((F.col("end") - 1) / L))
        ).alias("seq_id"),
    )
    return (
        ex.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("start") >= F.col("seq_id") * L)
                    & (F.col("end") <= (F.col("seq_id") + 1) * L),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_full_docs"),
            F.sum(
                F.least(F.col("end"), (F.col("seq_id") + 1) * L)
                - F.greatest(F.col("start"), F.col("seq_id") * L)
            )
            .cast("long")
            .alias("n_tokens"),
        )
        .orderBy("seq_id")
    )


_PACK_ORACLE = f"""
    WITH cum AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cend
        FROM (SELECT doc_id,
                     len(string_split(trim(text), ' '))::BIGINT AS n_tok
              FROM documents)
    ), spans AS (
        -- DuckDB widens the window sum to HUGEINT; generate_series needs BIGINT
        SELECT (cend - n_tok)::BIGINT AS cstart, cend::BIGINT AS cend FROM cum
    ), ex AS (
        SELECT cstart, cend,
               unnest(generate_series(cstart // {_PACK_SEQ_LEN},
                                      (cend - 1) // {_PACK_SEQ_LEN})) AS seq_id
        FROM spans
    )
    SELECT seq_id::BIGINT AS seq_id,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN cstart >= seq_id * {_PACK_SEQ_LEN}
                     AND cend <= (seq_id + 1) * {_PACK_SEQ_LEN}
                    THEN 1 ELSE 0 END)::BIGINT AS n_full_docs,
           sum(least(cend, (seq_id + 1) * {_PACK_SEQ_LEN})
               - greatest(cstart, seq_id * {_PACK_SEQ_LEN}))::BIGINT AS n_tokens
    FROM ex GROUP BY seq_id ORDER BY seq_id
"""


# ---------------------------------------------------------------------------
# best-fit sequence packing (whole-document bins, r9)
# ---------------------------------------------------------------------------


def _bfd_histogram_solve(
    hist: dict[int, int], seq_len: int
) -> tuple[list[tuple[int, int, int, int, int]], int]:
    """Best-fit-decreasing bin packing solved on the LENGTH HISTOGRAM —
    the bounded-driver-state reformulation (same idea as Graphcore's
    histogram packing, arXiv 2107.02027: at most ``seq_len`` distinct
    lengths exist, so the solve never touches per-document state).
    Items of one length are interchangeable, so classic per-item BFD
    (each item into the fullest open bin that fits, ties to the bin
    whose capacity class was entered earliest; no fit → new bin)
    collapses into bulk moves between capacity classes:

    - bins of equal remaining capacity form a class, stored as FIFO
      interval fragments (bin_lo, count) — bins moved together stay
      id-contiguous, so a fragment IS the per-item tie-break order;
    - an item chain fills one bin with m = ⌊capacity/len⌋ items before
      per-item BFD would ever leave it (each placement makes the bin
      strictly tighter, so it stays the best fit while it still fits);
    - a bulk step therefore consumes bins of the min fitting class in
      fragment order, m items per bin.

    Returns (placements, n_bins); each placement
    ``(length, slot_lo, n_items, bin_lo, per_bin)`` maps the rank-
    ordered items of that length: item with per-length rank
    ``slot_lo + i`` → bin ``bin_lo + i // per_bin``.  Placement count
    is O(distinct-lengths × classes) — corpus-size-free, like the BPE
    merge table or the IVF centroid grid."""
    from collections import deque

    classes: dict[int, deque] = {}
    placements: list[tuple[int, int, int, int, int]] = []
    next_bin = 0
    for length in sorted(hist, reverse=True):
        remaining = hist[length]
        slot = 0
        while remaining > 0:
            fits = [r for r, q in classes.items() if r >= length and q]
            if fits:
                r = min(fits)
                frag_lo, frag_n = classes[r][0]
                m = r // length
                n_use = min(frag_n, -(-remaining // m))
                k_items = min(remaining, n_use * m)
                placements.append((length, slot, k_items, frag_lo, m))
                if n_use == frag_n:
                    classes[r].popleft()
                else:
                    classes[r][0] = (frag_lo + n_use, frag_n - n_use)
                full = n_use if k_items == n_use * m else n_use - 1
                if full and r - m * length > 0:
                    classes.setdefault(r - m * length, deque()).append(
                        (frag_lo, full)
                    )
                if full < n_use:
                    q_items = k_items - full * m
                    if r - q_items * length > 0:
                        classes.setdefault(r - q_items * length, deque()).append(
                            (frag_lo + full, 1)
                        )
            else:
                m = seq_len // length
                n_new = -(-remaining // m)
                placements.append((length, slot, remaining, next_bin, m))
                full = n_new if remaining == n_new * m else n_new - 1
                if full and seq_len - m * length > 0:
                    classes.setdefault(seq_len - m * length, deque()).append(
                        (next_bin, full)
                    )
                if full < n_new:
                    q_items = remaining - full * m
                    if seq_len - q_items * length > 0:
                        classes.setdefault(
                            seq_len - q_items * length, deque()
                        ).append((next_bin + full, 1))
                next_bin += n_new
                k_items = remaining
            slot += k_items
            remaining -= k_items
    return placements, next_bin


def _bestfit_assignments(spark: SparkSession, toks: DataFrame) -> DataFrame:
    """(doc_id, n_tok) → (doc_id, n_tok, bin_id) under histogram-BFD.

    Per-length document ranks use the SAME two-pass distributed scan as
    ``_pack_manifest`` (seeded doc_id cut points → per-(bucket, length)
    counts collected as bounded driver state → broadcast offsets +
    bucket-scoped windows) — never a 512-way global window.  The solve
    itself runs on the collected histogram (≤ seq_len rows); the
    placement table is broadcast back and the bin id is pure arithmetic
    on (rank, placement)."""
    par = spark.sparkContext.defaultParallelism
    base = persist_tracked(spark, toks)
    n = base.count()
    frac = min(1.0, (par * 20) / max(n, 1))
    sample = sorted(
        r["doc_id"] for r in base.select("doc_id").sample(False, frac, 42).collect()
    )
    step = max(1, len(sample) // par)
    cuts = sample[step::step][: par - 1]
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c <= F.col("doc_id")))
    else:
        bucket = F.lit(0)
    base = base.withColumn("pid", bucket.cast("int"))
    counts = sorted(
        (int(r["pid"]), int(r["n_tok"]), int(r["cnt"]))
        for r in base.groupBy("pid", "n_tok")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )  # ≤ par × distinct-lengths rows — bounded driver state
    hist: dict[int, int] = {}
    offsets = []
    for pid, length, cnt in counts:
        offsets.append((pid, length, hist.get(length, 0)))
        hist[length] = hist.get(length, 0) + cnt
    placements, _ = _bfd_histogram_solve(hist, _PACK_SEQ_LEN)
    off_df = spark.createDataFrame(
        offsets or [(0, 0, 0)], "pid int, n_tok long, off long"
    )
    pl_df = spark.createDataFrame(
        placements or [(0, 0, 0, 0, 1)],
        "n_tok long, slot_lo long, n_items long, bin_lo long, per_bin long",
    )
    w = Window.partitionBy("pid", "n_tok").orderBy("doc_id")
    ranked = (
        base.join(F.broadcast(off_df), ["pid", "n_tok"])
        .withColumn("rank", F.row_number().over(w) - 1 + F.col("off"))
    )
    return (
        ranked.join(F.broadcast(pl_df), "n_tok")
        .filter(
            (F.col("rank") >= F.col("slot_lo"))
            & (F.col("rank") < F.col("slot_lo") + F.col("n_items"))
        )
        .select(
            "doc_id",
            "n_tok",
            (
                F.col("bin_lo")
                + F.floor((F.col("rank") - F.col("slot_lo")) / F.col("per_bin"))
            ).cast("long").alias("bin_id"),
        )
    )


def pack_sequences_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHOLE-DOCUMENT sequence packing by best-fit decreasing — the
    padding-based alternative to ``pack_sequences``' concat-and-split:
    no document is ever cut across training sequences (no cross-doc
    attention contamination), the cost being padding instead of split
    docs.  Output is one row per packed bin:

        (bin_id, n_docs, n_tokens, padding)

    with every bin ≤ ``_PACK_SEQ_LEN`` tokens and padding its unused
    tail.  Documents longer than the sequence length are truncated to
    it (none exist in this corpus — lengths are ≤ 100 vs L = 512);
    empty documents are excluded.

    Scale shape: ONE corpus pass builds (doc_id, n_tok); the histogram
    solve is bounded driver state (≤ L distinct lengths — the same
    reformulation Graphcore's packing paper uses for GPU batch
    assembly); ranks ride the committed two-pass prefix-scan pattern;
    assignment is a broadcast join + integer arithmetic; the manifest
    is one hash aggregation over (bin_id).  Gated by an independent
    PER-ITEM best-fit-decreasing Python reference (exact assignment
    equality) plus packing invariants — see tests/test_pack_bestfit.py."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.least(F.size(_tokens()), F.lit(_PACK_SEQ_LEN)).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    assigned = _bestfit_assignments(spark, toks)
    return (
        assigned.groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            "bin_id",
            "n_docs",
            "n_tokens",
            (F.lit(_PACK_SEQ_LEN) - F.col("n_tokens")).cast("long").alias("padding"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# unigram surprisal (corpus-LM perplexity proxy)
# ---------------------------------------------------------------------------


def token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram surprisal −E[ln p(token)] under the
    corpus's own unigram distribution — the cheapest member of the
    perplexity-filtering family (CCNet/Gopher filter on a real LM; the
    unigram proxy needs no model artifact and already separates
    boilerplate-heavy from vocabulary-rich documents).  Low surprisal =
    repetitive/common tokens; high = rare-token-dense.

    Two hash aggregations and one token-keyed equi-join — the unigram
    "model" is the corpus token-frequency table itself (never
    collected; the total rides along as a broadcast one-row
    aggregate).  At 100 TB this is exactly ``token_frequencies`` plus
    one join keyed on the same shuffle key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    freq = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # total from the (tiny) frequency aggregate, NOT a third scan of the
    # exploded corpus (review r5 — the same duplicated-subtree recompute
    # the dedup pair-join fix removed)
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "avg_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


_SURPRISAL_ORACLE = """
    WITH t AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
        FROM documents
    ), f AS (
        SELECT token, count(*) AS cnt FROM t GROUP BY token
    ), n AS (
        SELECT count(*) AS total FROM t
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(-ln(cnt::DOUBLE / total)), 6) AS avg_surprisal
    FROM t JOIN f USING (token) CROSS JOIN n
    GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter tokens (mergeable frequency sketch)
# ---------------------------------------------------------------------------

_MG_CAPACITY = 64  # counters per batch summary; ε = N/(capacity+1)
_MG_TOP = 20  # rows returned


def heavy_hitter_tokens(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = _MG_CAPACITY,
    top: int | None = _MG_TOP,
) -> DataFrame:
    """Approximate top tokens via a MERGED Misra-Gries sketch — the
    third sketch family after the t-digest quantile contract and the
    HLL ``approx_count_distinct``: bounded-state frequency estimation
    for when the exact ``token_frequencies`` groupBy is too hot (at
    100 TB the token stream is ~corpus-sized and Zipf-skewed; the
    sketch never shuffles more than ``capacity`` rows per Arrow batch).

    Per batch, the exact value_counts is reduced to ≤ ``capacity``
    counters by subtracting the (capacity+1)-th largest count δ_b from
    every counter and dropping the non-positive — the classic
    Misra-Gries reduction, error ≤ n_b/(capacity+1) per batch.  Batch
    summaries merge by summed counters (Agarwal et al., "Mergeable
    Summaries"), so the global estimate carries the deterministic
    two-sided bound

        true − N/(capacity+1)  ≤  est  ≤  true

    which tests/test_heavy_hitters.py checks against the exact counts —
    including that every token with true count > N/(capacity+1) is
    PRESENT (no heavy hitter can vanish; the gate passes ``top=None``
    to see the whole summary — the default top-k presentation cut could
    otherwise hide one behind 20 heavier tokens).  Estimates depend on
    batch boundaries, so this is property-gated, not hash-gated (same
    status as the recall-gated ANN paths).  Output: top ``top`` rows by
    (est_count desc, token asc), or the full summary when ``top`` is
    None."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("token"))

    def mg_batches(batches):
        for pdf in batches:
            cnt = pdf["token"].value_counts()
            if len(cnt) > capacity:
                delta = int(cnt.iloc[capacity])
                cnt = (cnt - delta)[cnt > delta]
            out = cnt.rename_axis("token").reset_index(name="est_count")
            out["est_count"] = out["est_count"].astype("int64")
            yield out

    merged = (
        toks.mapInPandas(mg_batches, "token string, est_count long")
        .groupBy("token")
        .agg(F.sum("est_count").cast("long").alias("est_count"))
        .orderBy(F.desc("est_count"), "token")
    )
    return merged.limit(top) if top is not None else merged


# ---------------------------------------------------------------------------
# per-source corpus health rollup
# ---------------------------------------------------------------------------


def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health — the dashboard a data team reads when
    deciding which crawl/source to up- or down-weight in the next mix:
    per source, the doc count, how many of its docs are corpus-wide
    exact duplicates (normalized sha256 appearing > once ANYWHERE, not
    just within the source — cross-source duplication is exactly what
    this surfaces), average document length and total token yield.

    100 TB design: one groupBy on the 32-byte digest (map-side
    combined; dup groups compress it far below corpus size), one
    equi-join back on the digest, one tiny per-source aggregation —
    text itself never shuffles, only digests and counters."""
    docs = load_table(spark, sf_dir, "documents")
    hsh = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    counts = (
        docs.select(hsh.alias("hsh")).groupBy("hsh").agg(F.count("*").alias("cnt"))
    )
    return (
        docs.select(
            "source",
            "n_chars",
            F.size(_tokens()).cast("long").alias("n_tok"),
            hsh.alias("hsh"),
        )
        .join(counts, "hsh")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )


_SOURCE_ROLLUP_ORACLE = """
    WITH h AS (
        SELECT source, n_chars,
               len(string_split(trim(text), ' '))::BIGINT AS n_tok,
               sha256(lower(trim(text))) AS hsh
        FROM documents
    ), c AS (
        SELECT hsh, count(*) AS cnt FROM h GROUP BY hsh
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
           round(avg(n_chars), 4) AS avg_chars,
           sum(n_tok)::BIGINT AS n_tokens
    FROM h JOIN c USING (hsh)
    GROUP BY source ORDER BY source
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_near_minhash": dedup_near_minhash,
    "dedup_simhash": dedup_simhash,
    "text_stats": text_stats,
    "token_frequencies": token_frequencies,
    "lang_id_agreement": lang_id_agreement,
    "text_quality": text_quality,
    "doc_fingerprints": doc_fingerprints,
    "token_stats_bpe": token_stats_bpe,
    "winnowing_fingerprints": winnowing_fingerprints,
    "chunk_documents": chunk_documents,
}

ORACLES = {
    "dedup_exact": _DEDUP_EXACT_ORACLE,
    "dedup_near_minhash": _NEAR_DUP_ORACLE,
    "dedup_simhash": _SIMHASH_ORACLE,
    "text_stats": _TEXT_STATS_ORACLE,
    "token_frequencies": _TOKEN_FREQ_ORACLE,
    "lang_id_agreement": _LANG_ID_ORACLE,
    "text_quality": _TEXT_QUALITY_ORACLE,
    "doc_fingerprints": _FINGERPRINT_ORACLE,
    "token_stats_bpe": _TOKEN_BPE_ORACLE,
    "winnowing_fingerprints": _WINNOW_ORACLE,
    "chunk_documents": _CHUNK_ORACLE,
}

_INCREMENTAL_ORACLE = _incremental_oracle()


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 50


def _bigram_array(tok: Column) -> Column:
    """Adjacent-bigram strings of a token array — JVM-side `zip_with`
    of the array with its own tail (no posexplode self-join); shared by
    the PMI collocations and the bigram-LM surprisal."""
    n = F.greatest(F.size(tok) - 1, F.lit(0))
    return F.zip_with(
        F.slice(tok, 1, n), F.slice(tok, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )


def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_PMI_TOP_K`` bigram collocations by pointwise mutual
    information — the classic corpus-linguistics association measure a
    tokenizer-vocabulary build runs (merge candidates, multi-word
    expressions):

        pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ),
        p(a,b) = c_ab / N_bigrams,  p(x) = c_x / N_tokens

    Bigram extraction is a JVM-side `zip_with` of the token array with
    its own tail (no posexplode self-join); counts are two exploded
    hash aggregations with map-side combine, the corpus totals are
    broadcast one-row aggregates, and the unigram counts join back to
    the bigram table on each side's token (token-keyed equi-joins —
    Zipf-head skew lands on AQE, min-count pruning shrinks the bigram
    side first).  Ranked by ROUNDED pmi (6 dp) with the bigram as
    tie-break so a last-ulp ln() divergence between engines cannot
    reorder the output — the TF-IDF/BM25 discipline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("t"))
    bigrams = toks.select(F.explode(_bigram_array(F.col("t"))).alias("bigram"))
    uni = (
        toks.select(F.explode("t").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c_tok"))
    )
    n_tok = uni.agg(F.sum("c_tok").cast("double").alias("n_tokens"))
    bg_all = bigrams.groupBy("bigram").agg(F.count("*").alias("c_ab"))
    bg = bg_all.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    # total bigrams from the ALREADY-aggregated counts (Σ c_ab), not a
    # second corpus-wide explode — review r6 caught the double scan
    n_bg = bg_all.agg(F.sum("c_ab").cast("double").alias("n_bigrams"))
    first = F.split(F.col("bigram"), " ").getItem(0)
    second = F.split(F.col("bigram"), " ").getItem(1)
    scored = (
        bg.join(uni.select(F.col("token").alias("tok_a"), F.col("c_tok").alias("c_a")),
                first == F.col("tok_a"))
        .join(uni.select(F.col("token").alias("tok_b"), F.col("c_tok").alias("c_b")),
              second == F.col("tok_b"))
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bg))
        .select(
            "bigram",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_bigrams"))
                    / ((F.col("c_a") / F.col("n_tokens"))
                       * (F.col("c_b") / F.col("n_tokens")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "bigram").limit(_PMI_TOP_K)


_PMI_ORACLE = f"""
    WITH toks AS (
        SELECT string_split(trim(text), ' ') AS t FROM documents
    ), bigrams AS (
        SELECT t[i] || ' ' || t[i+1] AS bigram
        FROM toks, unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2
    ), uni AS (
        SELECT token, count(*) AS c_tok
        FROM (SELECT unnest(t) AS token FROM toks)
        WHERE token <> ''
        GROUP BY token
    ), totals AS (
        SELECT (SELECT sum(c_tok)::DOUBLE FROM uni) AS n_tokens,
               (SELECT count(*)::DOUBLE FROM bigrams) AS n_bigrams
    ), bg AS (
        SELECT bigram, count(*)::BIGINT AS c_ab FROM bigrams
        GROUP BY bigram HAVING count(*) >= {_PMI_MIN_COUNT}
    )
    SELECT bigram, c_ab,
           round(ln((c_ab / n_bigrams)
                    / ((a.c_tok / n_tokens) * (b.c_tok / n_tokens))), 6) AS pmi
    FROM bg
    JOIN uni a ON a.token = string_split(bigram, ' ')[1]
    JOIN uni b ON b.token = string_split(bigram, ' ')[2]
    CROSS JOIN totals
    ORDER BY pmi DESC, bigram
    LIMIT {_PMI_TOP_K}
"""


def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram negative log-likelihood under the
    corpus's OWN add-1-smoothed bigram LM — the next rung of the
    perplexity-filtering ladder above ``token_surprisal``'s unigram
    proxy (CCNet/Gopher filter on a trained LM; a self-trained bigram
    model already separates formulaic from varied word ORDER, which
    unigrams cannot see):

        nll(a b) = −ln( (c_ab + 1) / (c_a + V) )

    with c_a = occurrences of a as a bigram-first token and V the
    unigram vocabulary size (add-1 over the conditional's V outcomes).

    Plan: the shared `_bigram_array` extraction exploded once per need
    (per-doc stream + corpus counts), counts as map-side-combined hash
    aggs, the model "served" back onto the stream through two keyed
    equi-joins (bigram, then first token — the Zipf head lands on AQE),
    V as a broadcast 1-row aggregate.  At 100 TB this is exactly the
    n-gram-LM scoring pass data teams run: model = aggregate tables,
    never driver state."""
    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(
        "doc_id", F.explode(_bigram_array(_tokens())).alias("bigram")
    )
    bg_counts = stream.groupBy("bigram").agg(F.count("*").alias("c_ab"))
    first_counts = (
        bg_counts.groupBy(
            F.split(F.col("bigram"), " ").getItem(0).alias("tok_a")
        )
        .agg(F.sum("c_ab").alias("c_a"))
    )
    vocab = (
        docs.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .agg(F.countDistinct("token").alias("v"))
    )
    return (
        stream.join(bg_counts, "bigram")
        .join(
            first_counts,
            F.split(F.col("bigram"), " ").getItem(0) == F.col("tok_a"),
        )
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(-F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.col("v")))), 6
            ).alias("avg_bigram_nll"),
        )
        .orderBy("doc_id")
    )


_BIGRAM_SURPRISAL_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), stream AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
        FROM toks, unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2
    ), bg AS (
        SELECT bigram, count(*) AS c_ab FROM stream GROUP BY bigram
    ), firsts AS (
        SELECT string_split(bigram, ' ')[1] AS tok_a, sum(c_ab) AS c_a
        FROM bg GROUP BY 1
    ), vocab AS (
        SELECT count(DISTINCT token) AS v
        FROM (SELECT unnest(t) AS token FROM toks) WHERE token <> ''
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(-ln((c_ab + 1)::DOUBLE / (c_a + v))), 6) AS avg_bigram_nll
    FROM stream
    JOIN bg USING (bigram)
    JOIN firsts ON string_split(bigram, ' ')[1] = tok_a
    CROSS JOIN vocab
    GROUP BY doc_id
    ORDER BY doc_id
"""


_PII_RULES = [
    # order matters (applied sequentially, same order in the oracle):
    # emails first so their digits can't be half-eaten by the number rule
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
    ("longnum", r"\d{6,}", "<NUM>"),
]


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction — the scrub pass an LLM-data pipeline runs
    before anything ships: emails, phone-shaped digit runs and long
    numeric identifiers replaced with typed placeholders, counts kept
    for the removal report.  One projection of chained
    ``regexp_replace``/``regexp_count`` expressions — pure JVM
    whole-stage codegen, no Python, embarrassingly parallel at any
    scale.  Patterns stay in the regex subset Java and RE2 interpret
    identically (character classes, bounded/unbounded repetition — no
    backrefs/lookarounds), so the DuckDB oracle replays the exact
    transformation; the synthetic corpus is mostly clean text, which
    the md5 over the REDACTED output still pins (a false positive
    would flip the hash), and planted email/phone fixtures exercise
    every rule (tests/test_text_dedup_extra.py)."""
    docs = load_table(spark, sf_dir, "documents")
    red = F.col("text")
    counts = []
    for name, pat, rep in _PII_RULES:
        counts.append(F.regexp_count(red, F.lit(pat)).cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, rep)
    return (
        docs.select("doc_id", *counts, F.md5(red).alias("redacted_md5"))
        .orderBy("doc_id")
    )


def _pii_oracle() -> str:
    red = "text"
    cols = []
    for name, pat, rep in _PII_RULES:
        cols.append(
            f"len(regexp_extract_all({red}, '{pat}'))::BIGINT AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return f"""
    SELECT doc_id, {', '.join(cols)}, md5({red}) AS redacted_md5
    FROM documents
    ORDER BY doc_id
"""


_PII_ORACLE = _pii_oracle()


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (data selection toward a target domain)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024  # hashed n-gram feature buckets (paper uses 10^4)
_DSIR_ALPHA_NUM, _DSIR_ALPHA_DEN = 1, 2  # add-1/2 smoothing as a ratio
_DSIR_FRACTION_NUM, _DSIR_FRACTION_DEN = 1, 5  # select top 20% of docs


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resampled data selection toward a target domain —
    the DSIR recipe (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling", public arXiv 2302.03169):
    featurize every document as HASHED N-GRAM bucket counts, fit
    bag-of-buckets unigram models for the TARGET domain (here: the
    ``lang = 'en'`` slice, standing in for "looks like my curated
    set") and the RAW corpus, score each doc by its target-vs-raw
    log-likelihood ratio, and keep the top 20%.

    Determinism and engine parity: buckets come from the md5-derived
    32-bit hash (``_hash32_col``/``_hash32_sql``, the same pair the
    stratified split replays hash-for-hash) mod ``_DSIR_BUCKETS``;
    smoothing is the exact rational α=1/2 so both engines divide
    identical integers; the per-doc score is rounded to 6 dp BEFORE
    ranking, with doc_id as the tie-break, so a last-ulp ``ln`` or
    float-sum-order divergence (|Δ| ~1e-12 against a 1e-6 grid) cannot
    flip the selection; k = ceil(n/5) in integer arithmetic.

    Scale shape (100 TB): grams explode → (doc, bucket) count is ONE
    corpus-scale shuffle with map-side combine; the two domain models
    are B-row aggregates OF THAT FRAME (no second corpus pass); the
    λ-table join back is a broadcast (B = 1024 rows); scoring is one
    more doc-keyed agg; the final top-k is Spark's distributed
    TakeOrdered.  At a petabyte the exact top-k cut would move to an
    approx-quantile threshold — documented trade, same contract."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", _tokens().alias("t"))
    n = F.size("t")
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(
                F.transform(F.col("t"), lambda x: F.concat(F.lit("u:"), x)),
                F.zip_with(
                    F.slice(F.col("t"), 1, n - 1),
                    F.slice(F.col("t"), 2, n - 1),
                    lambda a, b: F.concat(F.lit("b:"), a, F.lit(" "), b),
                ),
            )
        ).alias("g"),
    )
    # r14 opt: the (doc, bucket) count frame used to feed FOUR separate
    # subtrees (raw model, target model, the 1-row totals, the scoring
    # join), and Spark's ReuseExchange did not canonicalize them — the
    # executed plan recomputed the corpus-scale explode+agg EIGHT times
    # (explain: 8 Generate nodes, 8 scans, 0 ReusedExchange).  The two
    # domain models are now ONE fused B-row aggregate (sum + conditional
    # sum — identical integers: the old en-filtered agg's missing
    # buckets surfaced as NULL t_b, exactly what the conditional sum
    # yields), the totals are a second-level 1-row agg OF THE B-ROW
    # MODEL (not another corpus pass), and doc_buckets itself is a
    # tracked persist so the model pass and the scoring join share one
    # materialization (the simhash-signature persist pattern;
    # released by release_session_caches).
    doc_buckets = persist_tracked(
        spark,
        grams.groupBy(
            "doc_id",
            "lang",
            (_hash32_col(F.col("g")) % _DSIR_BUCKETS).alias("bucket"),
        ).agg(F.count("*").cast("long").alias("c")),
    )

    models = doc_buckets.groupBy("bucket").agg(
        F.sum("c").alias("r_b"),
        F.sum(F.when(F.col("lang") == "en", F.col("c"))).alias("t_b"),
    )
    # 1-row totals over the B-row model, broadcast back onto it (the
    # repo's standing broadcast-1-row-aggregate crossJoin pattern);
    # r_tot/t_tot are sums of the per-bucket sums — identical integers
    totals_row = F.broadcast(
        models.agg(
            F.sum("r_b").alias("r_tot"),
            F.sum("t_b").alias("t_tot"),
        )
    )
    a_num, a_den = _DSIR_ALPHA_NUM, _DSIR_ALPHA_DEN
    b_cnt = _DSIR_BUCKETS

    def _logp(cnt, tot):
        # ln((cnt + α) / (tot + α·B)) with α = a_num/a_den kept rational:
        # ln(cnt·den + num) - ln(tot·den + num·B) — integer numerators,
        # so both engines take ln of identical values
        return F.log(cnt * a_den + a_num) - F.log(tot * a_den + a_num * b_cnt)

    lam = (
        models.crossJoin(totals_row)
        .select(
            "bucket",
            (
                _logp(F.coalesce(F.col("t_b"), F.lit(0)), F.col("t_tot"))
                - _logp(F.col("r_b"), F.col("r_tot"))
            ).alias("lam"),
        )
    )
    scored = (
        doc_buckets.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("lam")), 6).alias("log_weight"),
        )
    )
    # k as a plan literal so the cut compiles to TakeOrderedAndProject
    # (distributed per-partition top-k + driver merge, NO global sort or
    # single-partition window over the doc-count frame); the count is a
    # parquet-metadata action, the same bounded-model-state class as the
    # iterative engines' round stats
    n_docs = docs.count()
    k = -(-n_docs * _DSIR_FRACTION_NUM // _DSIR_FRACTION_DEN)
    top = scored.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(int(k))
    # rank assignment runs on the k-row (output-sized) result only
    return top.withColumn(
        "sel_rank",
        F.row_number().over(Window.orderBy(F.desc("log_weight"), F.asc("doc_id"))),
    ).select("doc_id", "lang", "n_grams", "log_weight", "sel_rank")


def _dsir_oracle() -> str:
    h = _hash32_sql("g")
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(trim(text), ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, lang, 'u:' || unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, lang, 'b:' || t[i] || ' ' || t[i+1] AS g
        FROM toks, unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2
    ), db AS (
        SELECT doc_id, lang, {h} % {_DSIR_BUCKETS} AS bucket,
               count(*)::BIGINT AS c
        FROM grams GROUP BY 1, 2, 3
    ), raw AS (
        SELECT bucket, sum(c) AS r_b FROM db GROUP BY bucket
    ), tgt AS (
        SELECT bucket, sum(c) AS t_b FROM db WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
        SELECT sum(c) AS r_tot,
               sum(CASE WHEN lang = 'en' THEN c END) AS t_tot
        FROM db
    ), lam AS (
        SELECT raw.bucket,
               (ln(coalesce(t_b, 0) * {_DSIR_ALPHA_DEN} + {_DSIR_ALPHA_NUM})
                - ln(t_tot * {_DSIR_ALPHA_DEN}
                     + {_DSIR_ALPHA_NUM * _DSIR_BUCKETS})
                - ln(r_b * {_DSIR_ALPHA_DEN} + {_DSIR_ALPHA_NUM})
                + ln(r_tot * {_DSIR_ALPHA_DEN}
                     + {_DSIR_ALPHA_NUM * _DSIR_BUCKETS})) AS lam
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ), scored AS (
        SELECT doc_id, lang, sum(c)::BIGINT AS n_grams,
               round(sum(c * lam), 6) AS log_weight
        FROM db JOIN lam USING (bucket)
        GROUP BY doc_id, lang
    ), k AS (
        SELECT ceil(count(*) * {_DSIR_FRACTION_NUM}
                    / {_DSIR_FRACTION_DEN}) AS k
        FROM documents
    )
    SELECT doc_id, lang, n_grams, log_weight,
           row_number() OVER (ORDER BY log_weight DESC, doc_id) AS sel_rank
    FROM scored CROSS JOIN k
    QUALIFY sel_rank <= k.k
    ORDER BY sel_rank
"""


_DSIR_ORACLE = _dsir_oracle()


# Oracle-checked via pytest (tests/test_text_dedup_extra.py) rather than
# the driver registry, which is shaped to the 50-row correctness cap.
PYTEST_QUERIES = {
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "curate_corpus": curate_corpus,
    "dedup_components": dedup_components,
    "stratified_sample_split": stratified_sample_split,
    "repetition_stats": repetition_stats,
    "stopword_filter": stopword_filter,
    "remove_boilerplate": remove_boilerplate,
    "mixture_temperature_sample": mixture_temperature_sample,
    "epoch_shuffle_manifest": epoch_shuffle_manifest,
    "contamination_check": contamination_check,
    "pack_sequences": pack_sequences,
    "source_quality_rollup": source_quality_rollup,
    "token_surprisal": token_surprisal,
    "bigram_collocations": bigram_collocations,
    "dedup_keep_policy": dedup_keep_policy,
    "bigram_surprisal": bigram_surprisal,
    "redact_pii": redact_pii,
    "mixture_balance_sources": mixture_balance_sources,
    "export_training_shards": export_training_shards,
    "dedup_substring_spans": dedup_substring_spans,
    "apply_substring_dedup": apply_substring_dedup,
    "dsir_select": dsir_select,
}
PYTEST_ORACLES = {
    "dedup_ngram_jaccard": _NGRAM_JACCARD_ORACLE,
    "curate_corpus": _CURATE_ORACLE,
    "dedup_components": _COMPONENTS_ORACLE,
    "stratified_sample_split": _STRATIFIED_ORACLE,
    "repetition_stats": _REPETITION_ORACLE,
    "stopword_filter": _STOPWORD_FILTER_ORACLE,
    "remove_boilerplate": _BOILERPLATE_ORACLE,
    "mixture_temperature_sample": _MIXTURE_TEMPERATURE_ORACLE,
    "epoch_shuffle_manifest": _EPOCH_SHUFFLE_ORACLE,
    "contamination_check": _CONTAMINATION_ORACLE,
    "pack_sequences": _PACK_ORACLE,
    "source_quality_rollup": _SOURCE_ROLLUP_ORACLE,
    "token_surprisal": _SURPRISAL_ORACLE,
    "bigram_collocations": _PMI_ORACLE,
    "dedup_keep_policy": _KEEP_POLICY_ORACLE,
    "bigram_surprisal": _BIGRAM_SURPRISAL_ORACLE,
    "redact_pii": _PII_ORACLE,
    "mixture_balance_sources": _MIXTURE_ORACLE,
    "export_training_shards": _SHARDS_ORACLE,
    "dedup_substring_spans": _SUBSTR_SPANS_ORACLE,
    "apply_substring_dedup": _APPLY_SUBSTR_ORACLE,
    "dsir_select": _DSIR_ORACLE,
}

# Bound-gated / python-oracle-gated rather than DuckDB-oracle-gated
# (heavy hitters: estimates depend on Arrow batch boundaries —
# tests/test_heavy_hitters.py pins the Misra-Gries error contract;
# best-fit packing: the BFD solve is not SQL-expressible —
# tests/test_pack_bestfit.py pins exact assignment equality against an
# independent per-item Python BFD plus the packing invariants); benched
# with the dedup family.
EXTRA_QUERIES = {
    "heavy_hitter_tokens": heavy_hitter_tokens,
    "pack_sequences_bestfit": pack_sequences_bestfit,
}

# Round-7 registry rotation (VERDICT r6 #7): promote the PII redaction
# pass and the incremental-index pair into the driver's 50-row registry
# (three low-information relational rows moved to the pytest gate in
# exchange — see operators/relational.py).  redact_pii keeps its planted
# fixture test; dedup_incremental keeps its recall-by-construction and
# all-pairs tests plus the standalone benched pair in the dedup family.
QUERIES["redact_pii"] = PYTEST_QUERIES.pop("redact_pii")
ORACLES["redact_pii"] = PYTEST_ORACLES.pop("redact_pii")
QUERIES["dedup_incremental_e2e"] = dedup_incremental_e2e
ORACLES["dedup_incremental_e2e"] = _INCREMENTAL_ORACLE

# Round-8 rotation (VERDICT r7 #6): the two strongest r7 training-data
# surfaces take driver rows — weighted mixture balancing and the
# deterministic shard export (both hash-for-hash DuckDB-oracled since
# r7; the freed rows come from relational.py's demotions).
for _rot in ("mixture_balance_sources", "export_training_shards"):
    QUERIES[_rot] = PYTEST_QUERIES.pop(_rot)
    ORACLES[_rot] = PYTEST_ORACLES.pop(_rot)

# Round-8 addition: the ExactSubstr detection pass takes a driver row —
# it is the sixth dedup family and the only span-granular one (the
# relational demotion freeing the row: supplier_distinct_parts).  The
# removal pass (apply_substring_dedup) stays pytest-gated with the same
# all-pairs-free linear plan.
QUERIES["dedup_substring_spans"] = PYTEST_QUERIES.pop("dedup_substring_spans")
ORACLES["dedup_substring_spans"] = PYTEST_ORACLES.pop("dedup_substring_spans")

# Round-8 (third rotation): dsir_select — DSIR importance resampling,
# the strongest new r8 training-data surface with a full DuckDB oracle
# — takes the driver row freed by semi_customers_with_big_orders
# (plain LEFT SEMI with a HAVING subquery; semi-join coverage stays via
# the curation funnel's survivor semi-joins and the incremental index's
# candidate semi-join, both oracle-checked).
QUERIES["dsir_select"] = PYTEST_QUERIES.pop("dsir_select")
ORACLES["dsir_select"] = PYTEST_ORACLES.pop("dsir_select")

# Round-9 rotation (VERDICT r8 #2): token_frequencies (plain
# explode→groupBy→top-k, long-green since r2) moves to the pytest
# gate, freeing its driver row for the promoted bpe_encode_stats
# (tokenizer.py, hash-checked against a train-in-SQL DuckDB oracle).
PYTEST_QUERIES["token_frequencies"] = QUERIES.pop("token_frequencies")
PYTEST_ORACLES["token_frequencies"] = ORACLES.pop("token_frequencies")

# Round-10 rotation (VERDICT r9 #2): doc_fingerprints (rolling-hash
# fingerprints, long-green since r3; fingerprint coverage stays via
# winnowing_fingerprints in the registry) frees the driver row
# profile_lineitem takes in relational.py — same oracle now runs at
# the tests/test_text_dedup_extra.py gate.
PYTEST_QUERIES["doc_fingerprints"] = QUERIES.pop("doc_fingerprints")
PYTEST_ORACLES["doc_fingerprints"] = ORACLES.pop("doc_fingerprints")


# Round-11 (second rotation): promote the round's two strongest new
# surfaces into the driver registry on the rows relational.py frees
# (cube_part_stats, cross_region_status_grid) — remove_boilerplate is
# the only corpus-frequency segment-dedup family member and
# epoch_shuffle_manifest the only training-order surface; both carry
# full DuckDB oracles plus planted/property pytest gates that stay.
QUERIES["remove_boilerplate"] = PYTEST_QUERIES.pop("remove_boilerplate")
ORACLES["remove_boilerplate"] = PYTEST_ORACLES.pop("remove_boilerplate")
QUERIES["epoch_shuffle_manifest"] = PYTEST_QUERIES.pop("epoch_shuffle_manifest")
ORACLES["epoch_shuffle_manifest"] = PYTEST_ORACLES.pop("epoch_shuffle_manifest")

# Round-12 rotation (VERDICT r11 #5): repetition_stats — the n-gram
# repetition profiler, DuckDB-oracled at the pytest gate since r6 and
# never driver-exposed — takes the driver row asof_purchase_after_click
# frees in relational.py; same oracle, now value-hashed by the driver.
QUERIES["repetition_stats"] = PYTEST_QUERIES.pop("repetition_stats")
ORACLES["repetition_stats"] = PYTEST_ORACLES.pop("repetition_stats")

# Round-13 rotation (VERDICT r12 #6): promote the two strongest
# never-driver-exposed DuckDB-oracled surfaces — pack_sequences (the
# two-pass prefix-sum packing manifest, oracle-checked at the pytest
# gate since r5) and curate_corpus (the chained survivor-dedup funnel,
# oracle-checked since r7) — onto the rows relational.py frees
# (nations_setops, approx_distinct_users).  Same oracles, now
# value-hashed by the driver; their pytest property gates stay.
for _rot in ("pack_sequences", "curate_corpus"):
    QUERIES[_rot] = PYTEST_QUERIES.pop(_rot)
    ORACLES[_rot] = PYTEST_ORACLES.pop(_rot)

# Round-14 rotation (VERDICT r13 #5): dedup_exact (single sha256
# groupBy, hash-green every driver round since r2; exact-dedup coverage
# stays driver-checked inside dedup_incremental_e2e and the curation
# funnel's canonical stage) moves to the tests/test_text_dedup_extra.py
# gate with the same oracle — its driver row goes to similarity's
# promoted embedding_contamination.
PYTEST_QUERIES["dedup_exact"] = QUERIES.pop("dedup_exact")
PYTEST_ORACLES["dedup_exact"] = ORACLES.pop("dedup_exact")
