"""Distributed domain/quality classifier — logistic regression over
hashed token features, trained with full-batch gradient descent where
every iteration is ONE Spark action.

Real curation pipelines (CCNet, the GPT-3 data work, fastText-based
quality filters) train a linear classifier that separates a trusted
domain from the raw crawl and keep the high-scoring documents.  This
module is that operator, Spark-first and MLlib-free:

- features: hashed token buckets (md5-derived, ``_CLS_BUCKETS``) with
  per-document term-frequency normalization plus a bias term — the
  fastText-style bag-of-hashed-tokens, built once and persisted;
- label: membership in the target slice (``lang = 'en'``, the same
  target the DSIR selector uses, so the two operators are directly
  comparable on the same corpus);
- training: T full-batch GD steps.  Each step collects ONE unioned
  frame — the B+1 gradient rows plus a NULL-bucket loss row — so the
  action count is T, independent of corpus size.  The collect is
  bounded model state (B+2 doubles), exactly the contract the IVF
  trainer's centroid collect follows; the weight update runs
  driver-side.  No per-row Python, no MLlib.

Scale shape (100 TB): the feature frame is ONE ROW PER DOCUMENT
(bucket/value arrays), built in one corpus pass and persisted; each
GD step scores MAP-SIDE — the weight vector is a B+1-double literal
array indexed by element_at, the per-doc margin an aggregate fold —
so the step's only exchange is the map-side-combined B+1-row gradient
agg.  One shuffle per step, B+2 rows wide, independent of corpus
size.  (The first array-based draft joined a broadcast weight TABLE
per step and shuffled doc-keyed scores: 2 shuffles/step, measured
24 s at sf0.1; the literal-array fold halves that structurally.)  The
classifier's capacity is deliberately linear-in-buckets — the public
recipe for corpus-scale quality filters — so model state never
leaves bounded territory.

Correctness: a numpy reference implementing the identical math is the
pytest oracle (same gate class as the PCA operator's numpy oracle) —
weights match to 1e-6 after all steps, predicted labels match exactly,
the loss column decreases monotonically, and a planted two-vocabulary
corpus reaches training accuracy 1.0 (tests/test_classifier.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .text_dedup import _hash32_col, _tokens

_CLS_BUCKETS = 256
_CLS_STEPS = 15
_CLS_LR = 2.0
_TARGET_LANG = "en"


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, bs array<int>, xs array<double>): tf-normalized
    hashed-unigram features, ONE ROW PER DOCUMENT so every GD step can
    score map-side (no per-step doc-keyed shuffle).

    x = count(bucket) / count(doc tokens) keeps every document's
    feature mass at 1 regardless of length, so the learning rate is
    length-invariant; the bias term is bucket -1 with x = 1, kept
    inside the arrays so the gradient agg covers it uniformly.
    Entries are bucket-sorted for deterministic fold order.

    Documents that tokenize to ZERO tokens still get a row (bias-only
    features, via a left join back onto the documents table) — explode
    would otherwise drop them, undercounting n_docs during training
    and vanishing an all-empty lang from classifier_eval's confusion
    table (ADVICE r8)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", (F.col("lang") == _TARGET_LANG).cast("int").alias("y")
    )
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    counts = toks.groupBy(
        "doc_id",
        (_hash32_col(F.col("tok")) % _CLS_BUCKETS).cast("int").alias("bucket"),
    ).agg(F.count("*").cast("double").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket", "c"))
        ).alias("ent"),
        F.sum("c").alias("tot"),
    )
    bias = F.struct(F.lit(-1).alias("bucket"), F.lit(1.0).alias("x"))
    no_ent = F.array().cast("array<struct<bucket:int,c:double>>")
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "y",
        F.concat(
            F.array(bias),
            F.transform(
                F.coalesce("ent", no_ent),
                lambda e: F.struct(
                    e.bucket.alias("bucket"), (e.c / F.col("tot")).alias("x")
                ),
            ),
        ).alias("fx"),
    ).select(
        "doc_id",
        "y",
        F.transform("fx", lambda e: e.bucket).alias("bs"),
        F.transform("fx", lambda e: e.x).alias("xs"),
    )


def _weight_array(weights: dict[int, float]):
    """Literal weight array [w_bias, w_0, …, w_{B-1}] — the model is
    B+1 doubles of driver state, embedded per-step as plan literals
    (the coloring loop's per-round-literal discipline; constant size)."""
    return F.array(
        *[F.lit(float(weights[b])) for b in range(-1, _CLS_BUCKETS)]
    )


def _scored_frame(feats: DataFrame, weights: dict[int, float]) -> DataFrame:
    """(doc_id, y, bs, xs, s): margin w·x per document — pure map-side
    (element_at into the literal weight array + an aggregate fold)."""
    w_arr = _weight_array(weights)
    s = F.aggregate(
        F.zip_with(
            "bs", "xs", lambda b, x: x * F.element_at(w_arr, b + F.lit(2))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return feats.select("doc_id", "y", "bs", "xs", s.alias("s"))


def _resid_cols(scored: DataFrame) -> DataFrame:
    """Adds r = sigmoid(s)−y and the overflow-safe log-loss
    l = ln(1+e^{−ỹs}) (ỹ = ±1)."""
    yy = F.col("y") * 2 - 1  # ±1
    return scored.select(
        "doc_id",
        "bs",
        "xs",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y")).alias("r"),
        (
            F.log1p(F.exp(-F.abs("s")))
            + F.when(yy * F.col("s") < 0, F.abs("s")).otherwise(F.lit(0.0))
        ).alias("l"),
    )


def train_quality_classifier(
    spark: SparkSession,
    sf_dir: str,
    steps: int = _CLS_STEPS,
    lr: float = _CLS_LR,
    feats: DataFrame | None = None,
) -> tuple[dict[int, float], list[float]]:
    """Full-batch logistic-regression GD; returns (weights, losses).

    weights: {bucket: w} with -1 the bias — bounded model state (B+1
    floats).  losses[t]: mean log-loss under the weights BEFORE step
    t's update, so a decreasing list certifies the descent.

    ``feats``: an already-persisted feature frame to reuse (the caller
    keeps ownership — classifier_eval passes one so train + eval share
    a single corpus pass); when None this function builds, persists
    and releases its own."""
    owns_feats = feats is None
    if owns_feats:
        feats = _feature_frame(spark, sf_dir).persist()
    try:
        n_docs = feats.count()  # one row per document
        if n_docs == 0:
            return {}, []
        weights = {b: 0.0 for b in range(-1, _CLS_BUCKETS)}
        losses: list[float] = []
        for _ in range(steps):
            resid = _resid_cols(_scored_frame(feats, weights))
            grad = (
                resid.select(
                    F.explode(
                        F.zip_with(
                            "bs",
                            "xs",
                            lambda b, x: F.struct(
                                b.alias("bucket"), (x * F.col("r")).alias("gx")
                            ),
                        )
                    ).alias("e")
                )
                .groupBy(F.col("e.bucket").alias("bucket"))
                .agg(F.sum("e.gx").alias("g"))
            )
            loss_row = resid.agg(
                F.lit(None).cast("int").alias("bucket"),
                F.sum("l").alias("g"),
            )
            # ONE action per step, ONE shuffle per step: the scoring +
            # residual is map-side (literal weight array), so the only
            # exchange is the B+1-row map-side-combined gradient agg;
            # the NULL-bucket loss row rides the same collect
            rows = grad.unionByName(loss_row).collect()
            step_loss = None
            for row in rows:
                if row["bucket"] is None:
                    step_loss = row["g"] / n_docs
                else:
                    weights[row["bucket"]] -= lr * row["g"] / n_docs
            losses.append(float(step_loss))
        return weights, losses
    finally:
        if owns_feats:
            feats.unpersist(False)


def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the corpus, score every document, and report the
    per-lang confusion summary: docs, predicted-target count, and the
    mean target probability — the quality-filter calibration table a
    pipeline owner actually reads.  Integer counts make the surface
    robust to last-ulp float divergence; the probability is rounded.

    ONE persisted feature frame serves both train and eval scoring —
    one corpus pass, not two (ADVICE r8); rows survive for empty
    documents (bias-only features), so every lang appears in the
    table."""
    from ..cache import persist_tracked

    # tracked persist: the returned (lazy) DataFrame still reads the
    # cached frame when the caller collects; release_session_caches
    # reclaims it between bench families
    feats = persist_tracked(spark, _feature_frame(spark, sf_dir))
    weights, _ = train_quality_classifier(spark, sf_dir, feats=feats)
    if not weights:  # empty corpus: nothing trained, nothing to score
        weights = {b: 0.0 for b in range(-1, _CLS_BUCKETS)}
    scored = _scored_frame(feats, weights)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    result = (
        scored.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("s") > 0).cast("long")).alias("pred_target"),
            F.round(
                F.avg(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s")))), 4
            ).alias("mean_p_target"),
        )
        .orderBy("lang")
    )
    return result


def _eval_oracle(steps: int = _CLS_STEPS, lr: float = _CLS_LR) -> str:
    """Full DuckDB oracle for ``classifier_eval``: re-trains the same
    ``steps``-round gradient descent in generated SQL (the shared
    ``_gd_chain`` — deferred import, curation.py imports this module)
    and rebuilds the per-lang confusion table from the final weights.
    Complements the numpy oracle: engine-independent, value-hashed."""
    from .curation import _gd_chain  # deferred: avoids the import cycle

    return f"""
    WITH {_gd_chain(steps, lr)}
    SELECT d.lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN s.s > 0 THEN 1 ELSE 0 END)::BIGINT AS pred_target,
           round(avg(1.0 / (1.0 + exp(-s.s))), 4) AS mean_p_target
    FROM sfin s JOIN documents d USING (doc_id)
    GROUP BY d.lang ORDER BY d.lang
"""


PYTEST_QUERIES = {"classifier_eval": classifier_eval}
