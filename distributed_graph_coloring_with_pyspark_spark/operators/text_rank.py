"""Lexical relevance ranking over the ``documents`` table: TF-IDF term
extraction and Okapi BM25 retrieval — the search-side counterpart of the
dedup/quality operators in text_dedup.py, sharing its whitespace
tokenizer (`_tokens`, which matches DuckDB's ``string_split``) so every
text operator in the engine agrees on what a token is.

The reference repo has no text surface (it is a graph-coloring engine,
reference coloring.py:73-132); these belong to the driver-mandated
LLM-training-data-pipeline extension, alongside dedup and quality
scoring: TF-IDF surfaces the characteristic terms a curation run keys
on, BM25 is the standard first-stage retrieval for building
eval/finetune sets from a corpus.

Scale design
------------
* TF-IDF is two hash aggregations — (doc_id, term) term frequencies,
  then per-term document frequencies — and one term-keyed join back,
  all map-side-combinable; the final top-k-per-doc window is
  partitioned by doc_id (per-partition heap, no global sort).  At
  100 TB the join is shuffle-on-term with AQE handling vocabulary skew
  (stopword-like hot terms); nothing is collected to the driver.
* BM25 filters the exploded token stream to the query's terms FIRST
  (an IN-list predicate that pushes into the scan projection), so the
  expensive stats run on |query-term postings|, not the corpus.  The
  corpus-level scalars (N, avgdl) enter the plan as broadcast one-row
  aggregates, not driver collects.  The final global top-k is
  ``orderBy().limit(k)`` — Spark's TakeOrdered, a per-partition heap +
  driver merge of k rows, which is the 100 TB-safe form of "rank the
  whole corpus".

Cross-engine determinism: ranking windows order by the ROUNDED (6 dp)
score before the deterministic (term / doc_id) tie-break, so a last-ulp
difference between the JVM's and DuckDB's ``ln`` cannot reorder rows —
equal real-valued scores (e.g. tf=2,df=50 vs tf=1,df=5 at N=500: both
ln(100)) are forced onto the explicit tie-break in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .text_dedup import _tokens

TFIDF_TOP_K = 5
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
# default retrieval query for the registered surface: three terms that
# are frequent-but-not-universal in the synthetic corpus, so scores
# spread and the top-k is meaningfully selective
BM25_QUERY_TERMS = ("query", "scan", "hash")


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF →
    (doc_id, rank, term, tf, df, tfidf).

    tfidf = tf · ln(N / df) with raw counts (no length normalization —
    that's BM25's job below); ties broken by term ascending.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
    )


_TFIDF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf, df,
               round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, rank, term, tf, df, tfidf
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored
    )
    WHERE rank <= {TFIDF_TOP_K}
"""


def bm25_rank(
    spark: SparkSession,
    sf_dir: str,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """Okapi BM25 retrieval of the top-``k`` documents for
    ``query_terms`` → (rank, doc_id, n_hit_terms, score).

    score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  — the standard
    non-negative Robertson-Spärck-Jones form.  dl is the document's
    whitespace token count; df counts documents containing the term.
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term")).filter(
        F.col("term").isin(*query_terms)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "term",
        "n_docs",
        "avgdl",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")  # |query_terms| rows — broadcast
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.round(
                F.sum(
                    F.col("idf")
                    * (F.col("tf") * (BM25_K1 + 1.0))
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_hit_terms", "score"
    )


def _bm25_oracle(query_terms: tuple[str, ...] = BM25_QUERY_TERMS) -> str:
    in_list = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH dl AS (
        SELECT doc_id, len(string_split(trim(text), ' ')) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    toks AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ({in_list}) GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    idf AS (
        SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
               avgdl
        FROM df CROSS JOIN stats
    ),
    scored AS (
        SELECT tf.doc_id, count(*)::BIGINT AS n_hit_terms,
               round(sum(idf * (tf * ({BM25_K1} + 1.0))
                         / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                              + {BM25_B} * dl.dl / avgdl))), 6)
                   AS score
        FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        GROUP BY tf.doc_id
    )
    SELECT rank, doc_id, n_hit_terms, score
    FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored
    )
    WHERE rank <= {BM25_TOP_K}
"""


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ embedding-cosine fused with reciprocal-rank
# fusion (RRF, Cormack/Clarke/Buettcher 2009 — the standard public
# score-free fusion rule: score(d) = Σ_lists 1/(k + rank_list(d))).
# --------------------------------------------------------------------------

_RRF_K = 60  # the canonical RRF constant from the paper
_HYBRID_PROBE = 7  # probe document; vec_id == doc_id (the repo-wide
# doc/vec convention dedup_modality_agreement's join already encodes)
_HYBRID_LIST_K = 20  # depth of each per-modality candidate list
_HYBRID_TOP_K = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this retrieval for one probe document, fusing a
    LEXICAL list (Okapi BM25 over the probe's own distinct tokens as
    the query) with a VECTOR list (embedding cosine to the probe's
    vector) via reciprocal-rank fusion →
    (rank, doc_id, rank_lex, rank_vec, rrf_score).

    This is the first-stage retrieval shape real curation/eval-set
    builders run (lexical recall + semantic recall, rank-fused so
    neither scorer's scale dominates).  Every stage reuses an
    already-oracle-checked computation: the BM25 formula/constants from
    ``bm25_rank`` (query terms arrive as a broadcast semi-join instead
    of a literal IN-list — data-dependent queries can't be plan
    literals), the sequential-fold cosine from operators/similarity
    (same expression the KNN oracle matches), and the rounded-score-
    then-id ranking discipline shared by every window in this module.

    Scale shape: the probe row is a broadcast; the lexical side's
    postings are filtered to probe terms BEFORE stats (semi-join
    pushdown); the vector side is one corpus scan × 1 probe; both lists
    end in TakeOrdered-style windows over rounded scores; the fusion
    join touches 2·K rows.  RRF arithmetic (1/(k+rank)) is exact
    rational-on-integers in doubles — identical in both engines."""
    from .similarity import cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    probe_terms = (
        docs.filter(F.col("doc_id") == _HYBRID_PROBE)
        .select(F.explode(_tokens()).alias("term"))
        .distinct()
    )
    dl = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    toks = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .join(F.broadcast(probe_terms), "term", "left_semi")
        .filter(F.col("doc_id") != _HYBRID_PROBE)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "term",
        "avgdl",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored_lex = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * (F.col("tf") * (BM25_K1 + 1.0))
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("s_lex"),
        )
    )
    # Top-k FIRST via orderBy().limit(k) — Spark compiles this to
    # TakeOrderedAndProject (per-partition heap + driver merge of k
    # rows), then the rank window runs on the k-row result.  Ranking
    # the full scored set through a partitionBy-less window would
    # funnel every candidate through ONE task — the anti-pattern
    # text_dedup.py's prefix-sum ban documents and dsir_select's
    # TakeOrdered cut (text_dedup.py:3122) solves; row_number over the
    # same total order on the limited set yields identical ranks 1..k.
    top_lex = scored_lex.orderBy(
        F.col("s_lex").desc(), F.col("doc_id").asc()
    ).limit(_HYBRID_LIST_K)
    w_lex = Window.orderBy(F.col("s_lex").desc(), F.col("doc_id").asc())
    ranked_lex = top_lex.withColumn(
        "rank_lex", F.row_number().over(w_lex)
    ).select("doc_id", "rank_lex")

    probe_vec = emb.filter(F.col("vec_id") == _HYBRID_PROBE).select(
        F.col("embedding").alias("probe_emb")
    )
    scored_vec = (
        emb.filter(F.col("vec_id") != _HYBRID_PROBE)
        .crossJoin(F.broadcast(probe_vec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("probe_emb")), 6).alias(
                "s_vec"
            ),
        )
    )
    # Same limit-then-rank shape: this leg scores the ENTIRE embeddings
    # table — at scale the TakeOrdered cut is the difference between a
    # k-row merge and a single-task sort of the corpus.
    top_vec = scored_vec.orderBy(
        F.col("s_vec").desc(), F.col("doc_id").asc()
    ).limit(_HYBRID_LIST_K)
    w_vec = Window.orderBy(F.col("s_vec").desc(), F.col("doc_id").asc())
    ranked_vec = top_vec.withColumn(
        "rank_vec", F.row_number().over(w_vec)
    ).select("doc_id", "rank_vec")

    fused = ranked_lex.join(ranked_vec, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    # fused is ≤ 2·K rows by construction, but keep the same
    # limit-then-rank discipline so every ranking in this module
    # compiles to TakeOrderedAndProject.
    top_fused = fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(_HYBRID_TOP_K)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return top_fused.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "rank_lex", "rank_vec", "rrf_score"
    )


_HYBRID_ORACLE = f"""
    WITH probe_terms AS (
        SELECT DISTINCT unnest(string_split(trim(text), ' ')) AS term
        FROM documents WHERE doc_id = {_HYBRID_PROBE}
    ),
    dl AS (
        SELECT doc_id, len(string_split(trim(text), ' ')) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    toks AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        FROM documents WHERE doc_id <> {_HYBRID_PROBE}
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN (SELECT term FROM probe_terms) GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    idf AS (
        SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
               avgdl
        FROM df CROSS JOIN stats
    ),
    scored_lex AS (
        SELECT tf.doc_id,
               round(sum(idf * (tf * ({BM25_K1} + 1.0))
                         / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                              + {BM25_B} * dl.dl / avgdl))), 6)
                   AS s_lex
        FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        GROUP BY tf.doc_id
    ),
    ranked_lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY s_lex DESC, doc_id) AS rank_lex
        FROM scored_lex QUALIFY rank_lex <= {_HYBRID_LIST_K}
    ),
    scored_vec AS (
        SELECT a.vec_id AS doc_id, round({{cos}}, 6) AS s_vec
        FROM embeddings a JOIN embeddings b
          ON b.vec_id = {_HYBRID_PROBE} AND a.vec_id <> {_HYBRID_PROBE}
    ),
    ranked_vec AS (
        SELECT doc_id, row_number() OVER (ORDER BY s_vec DESC, doc_id) AS rank_vec
        FROM scored_vec QUALIFY rank_vec <= {_HYBRID_LIST_K}
    ),
    fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, rank_lex, rank_vec,
               round(coalesce(1.0 / ({_RRF_K} + rank_lex), 0.0)
                     + coalesce(1.0 / ({_RRF_K} + rank_vec), 0.0), 6)
                   AS rrf_score
        FROM ranked_lex l FULL JOIN ranked_vec v ON l.doc_id = v.doc_id
    )
    SELECT rank, doc_id, rank_lex, rank_vec, rrf_score
    FROM (
        SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    )
    WHERE rank <= {_HYBRID_TOP_K}
    ORDER BY rank
"""


def _hybrid_oracle() -> str:
    from .similarity import _COS_SQL

    return _HYBRID_ORACLE.replace("{cos}", _COS_SQL)


# --------------------------------------------------------------------------
# Retrieval evaluation (r9): precision@k / recall@k / MRR / nDCG@k for a
# batch of more-like-this BM25 queries — the metrics harness that turns
# the retrieval family from "runs" into "measurably good", the same way
# the ANN paths carry recall gates.  Relevance labels are deterministic
# corpus structure: a candidate is relevant to a probe iff it shares the
# probe's language — the labeling provenance metadata gives for free,
# and the one a lexical ranker can actually recover (the synthetic
# corpus draws each language from its own vocabulary, so same-lang docs
# share tokens; (lang, source) groups are 2-5 docs and lexically
# indistinguishable from the rest of the language — measured all-zero
# metrics, a degenerate gate).
# --------------------------------------------------------------------------

_EVAL_PROBES = (3, 7, 11, 19, 23)  # fixed probe docs (exist at every sf)
_EVAL_K = 10
_EVAL_REL_JACCARD = 0.65  # relevance cut: distinct-token-set Jaccard


def retrieval_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25 retrieval eval → one row per probe:
    (probe_id, n_rel, n_retrieved, hits, precision_k, recall_k, mrr,
    ndcg).  Query = the probe doc's distinct tokens (more-like-this);
    ranking = the bm25_rank formula; binary relevance = distinct-token
    Jaccard(doc, probe) ≥ ``_EVAL_REL_JACCARD``, probe excluded.  nDCG uses the binary-gain form
    DCG = Σ_hits 1/log2(rank+1), IDCG = Σ_{i≤min(k, n_rel)} 1/log2(i+1).

    Scale shape: the probe batch is a broadcast (an eval suite is
    bounded); postings are semi-join-filtered to probe terms BEFORE any
    stats; per-probe ranking is a window PARTITIONED by probe_id (a
    per-partition heap per probe — never a global sort); relevance
    labels come from one corpus scan against the broadcast probe
    attributes.  Everything downstream of the rank filter is
    |probes| × k rows."""
    docs = load_table(spark, sf_dir, "documents")
    probe_list = list(_EVAL_PROBES)
    probes = docs.filter(F.col("doc_id").isin(probe_list)).select(
        F.col("doc_id").alias("probe_id"), "lang", "source", _tokens().alias("ptoks")
    )
    probe_terms = probes.select(
        "probe_id", F.explode("ptoks").alias("term")
    ).distinct()
    term_set = probe_terms.select("term").distinct()

    dl = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term")).join(
        F.broadcast(term_set), "term", "left_semi"
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "avgdl",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(probe_terms), "term")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .groupBy("probe_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * (F.col("tf") * (BM25_K1 + 1.0))
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _EVAL_K
    )

    psets = probes.select(
        "probe_id", F.array_distinct("ptoks").alias("pset")
    )
    jac = F.size(F.array_intersect(F.col("dset"), F.col("pset"))) / F.size(
        F.array_union(F.col("dset"), F.col("pset"))
    )
    rel = (
        docs.select("doc_id", F.array_distinct(_tokens()).alias("dset"))
        .crossJoin(F.broadcast(psets))
        .filter(
            (F.col("doc_id") != F.col("probe_id"))
            & (jac >= _EVAL_REL_JACCARD)
        )
        .select("probe_id", "doc_id")
    )
    n_rel = rel.groupBy("probe_id").agg(F.count("*").cast("long").alias("n_rel"))

    per_probe = (
        ranked.join(
            rel.withColumn("is_rel", F.lit(1)), ["probe_id", "doc_id"], "left"
        )
        .groupBy("probe_id")
        .agg(
            F.count("*").cast("long").alias("n_retrieved"),
            F.coalesce(F.sum("is_rel"), F.lit(0)).cast("long").alias("hits"),
            F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel"),
            F.sum(
                F.when(F.col("is_rel") == 1, 1.0 / F.log2(F.col("rank") + 1.0))
            ).alias("dcg"),
        )
    )
    m = F.least(F.lit(_EVAL_K), F.col("n_rel"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return (
        probes.select("probe_id")
        .join(n_rel, "probe_id", "left")
        .join(per_probe, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce(F.col("n_retrieved"), F.lit(0)).cast("long").alias(
                "n_retrieved"
            ),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.lit(_EVAL_K), 6).alias(
                "precision_k"
            ),
            F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel"), 6))
            .alias("recall_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6))
            .alias("ndcg"),
        )
        .orderBy("probe_id")
    )


def _retrieval_eval_oracle() -> str:
    in_list = ", ".join(str(p) for p in _EVAL_PROBES)
    return f"""
    WITH probes AS (
        SELECT doc_id AS probe_id, lang, source,
               string_split(trim(text), ' ') AS ptoks
        FROM documents WHERE doc_id IN ({in_list})
    ),
    probe_terms AS (
        SELECT DISTINCT probe_id, unnest(ptoks) AS term FROM probes
    ),
    dl AS (
        SELECT doc_id, len(string_split(trim(text), ' ')) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    toks AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN (SELECT DISTINCT term FROM probe_terms)
        GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    idf AS (
        SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
               avgdl
        FROM df CROSS JOIN stats
    ),
    scored AS (
        SELECT pt.probe_id, tf.doc_id,
               round(sum(idf * (tf * ({BM25_K1} + 1.0))
                         / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                              + {BM25_B} * dl.dl / avgdl))), 6)
                   AS score
        FROM tf
        JOIN probe_terms pt USING (term)
        JOIN idf USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        WHERE tf.doc_id <> pt.probe_id
        GROUP BY pt.probe_id, tf.doc_id
    ),
    ranked AS (
        SELECT probe_id, doc_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored QUALIFY rank <= {_EVAL_K}
    ),
    psets AS (
        SELECT probe_id, list_distinct(ptoks) AS pset FROM probes
    ),
    dsets AS (
        SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS dset
        FROM documents
    ),
    rel AS (
        SELECT p.probe_id, d.doc_id
        FROM dsets d CROSS JOIN psets p
        WHERE d.doc_id <> p.probe_id
          AND len(list_intersect(d.dset, p.pset))::DOUBLE
              / len(list_distinct(list_concat(d.dset, p.pset)))
              >= {_EVAL_REL_JACCARD}
    ),
    n_rel AS (
        SELECT probe_id, count(*)::BIGINT AS n_rel FROM rel GROUP BY 1
    ),
    per_probe AS (
        SELECT r.probe_id,
               count(*)::BIGINT AS n_retrieved,
               count(rl.doc_id)::BIGINT AS hits,
               min(CASE WHEN rl.doc_id IS NOT NULL THEN r.rank END) AS first_rel,
               sum(CASE WHEN rl.doc_id IS NOT NULL
                        THEN 1.0 / log2(r.rank + 1.0) END) AS dcg
        FROM ranked r
        LEFT JOIN rel rl ON r.probe_id = rl.probe_id AND r.doc_id = rl.doc_id
        GROUP BY r.probe_id
    )
    SELECT p.probe_id,
           coalesce(n.n_rel, 0)::BIGINT AS n_rel,
           coalesce(pp.n_retrieved, 0)::BIGINT AS n_retrieved,
           coalesce(pp.hits, 0)::BIGINT AS hits,
           round(coalesce(pp.hits, 0) / {_EVAL_K}.0, 6) AS precision_k,
           CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 0.0
                ELSE round(coalesce(pp.hits, 0)::DOUBLE / n.n_rel, 6)
           END AS recall_k,
           round(coalesce(1.0 / pp.first_rel, 0.0), 6) AS mrr,
           CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 0.0
                ELSE round(
                    coalesce(pp.dcg, 0.0)
                    / list_sum(list_transform(
                          generate_series(1, greatest(least({_EVAL_K}, n.n_rel), 1)),
                          i -> 1.0 / log2(i + 1.0))), 6)
           END AS ndcg
    FROM probes p
    LEFT JOIN n_rel n USING (probe_id)
    LEFT JOIN per_probe pp USING (probe_id)
    ORDER BY p.probe_id
"""


# pytest-gated (driver registry is shaped to the 50-row cap):
# tests/test_text_rank.py runs all four against their DuckDB oracles.
PYTEST_QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "bm25_rank": bm25_rank,
    "hybrid_search_rrf": hybrid_search_rrf,
    "retrieval_eval_bm25": retrieval_eval_bm25,
}
PYTEST_ORACLES = {
    "tfidf_top_terms": _TFIDF_ORACLE,
    "bm25_rank": _bm25_oracle(),
    "hybrid_search_rrf": _hybrid_oracle(),
    "retrieval_eval_bm25": _retrieval_eval_oracle(),
}


# driver-registry surface (promoted r9 — VERDICT r8 #2, after the
# limit-then-rank fix): hybrid RRF retrieval with its full DuckDB
# oracle.  tfidf/bm25 stay pytest-gated under the same contract.
QUERIES = {"hybrid_search_rrf": hybrid_search_rrf}
ORACLES = {"hybrid_search_rrf": _hybrid_oracle()}
