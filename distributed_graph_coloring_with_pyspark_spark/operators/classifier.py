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
  action count is T, independent of corpus size; the two branches
  share the scored-documents subtree and Spark's ReuseExchange planner
  rule evaluates it once.  The collect is bounded model state (B+2
  doubles), exactly the contract the IVF trainer's centroid collect
  follows; the weight update runs driver-side.  No per-row Python, no
  MLlib.

Scale shape (100 TB): the feature frame is built in one corpus pass
and persisted (doc-bucket rows ≈ distinct tokens per doc — the same
cardinality every dedup family already shuffles); each GD step joins
it to a BROADCAST B+1-row weight table (built from the driver model,
never a per-weight plan literal, so plan size is constant across
steps) and reduces to B+2 rows.  The classifier's capacity is
deliberately linear-in-buckets — the public recipe for corpus-scale
quality filters — so model state never leaves bounded territory.

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
    """(doc_id, y, bucket, x): tf-normalized hashed-unigram features.

    x = count(bucket) / count(doc tokens) keeps every document's
    feature mass at 1 regardless of length, so the learning rate is
    length-invariant; the bias term is bucket -1 with x = 1."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == _TARGET_LANG).cast("int").alias("y"),
        F.explode(_tokens()).alias("tok"),
    )
    counts = toks.groupBy(
        "doc_id", "y", (_hash32_col(F.col("tok")) % _CLS_BUCKETS).alias("bucket")
    ).agg(F.count("*").cast("double").alias("c"))
    totals = counts.groupBy("doc_id", "y").agg(F.sum("c").alias("tot"))
    feats = counts.join(totals.select("doc_id", "tot"), "doc_id").select(
        "doc_id", "y", "bucket", (F.col("c") / F.col("tot")).alias("x")
    )
    bias = totals.select(
        "doc_id", "y", F.lit(-1).alias("bucket"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def _weight_frame(spark: SparkSession, weights: dict[int, float]) -> DataFrame:
    return spark.createDataFrame(
        [(int(b), float(w)) for b, w in sorted(weights.items())],
        "bucket int, w double",
    )


def _resid_frame(feats: DataFrame, weights: dict[int, float]) -> DataFrame:
    """(doc_id, r, l): residual sigmoid(s)−y and overflow-safe log-loss
    ln(1+e^{−ỹs}) (ỹ = ±1) per document under ``weights``."""
    w_df = _weight_frame(feats.sparkSession, weights)
    scored = (
        feats.join(F.broadcast(w_df), "bucket")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
    )
    yy = F.col("y") * 2 - 1  # ±1
    return scored.select(
        "doc_id",
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
) -> tuple[dict[int, float], list[float]]:
    """Full-batch logistic-regression GD; returns (weights, losses).

    weights: {bucket: w} with -1 the bias — bounded model state (B+1
    floats).  losses[t]: mean log-loss under the weights BEFORE step
    t's update, so a decreasing list certifies the descent."""
    feats = _feature_frame(spark, sf_dir).persist()
    try:
        n_docs = feats.filter(F.col("bucket") == -1).count()
        if n_docs == 0:
            return {}, []
        weights = {b: 0.0 for b in range(-1, _CLS_BUCKETS)}
        losses: list[float] = []
        for _ in range(steps):
            resid = _resid_frame(feats, weights)
            grad = (
                feats.join(resid.select("doc_id", "r"), "doc_id")
                .groupBy("bucket")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            )
            loss_row = resid.agg(
                F.lit(None).cast("int").alias("bucket"),
                F.sum("l").alias("g"),
            )
            # ONE action per step: B+1 gradient rows + the NULL-bucket
            # loss row in a single collect (ReuseExchange evaluates the
            # shared scored subtree once)
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
        feats.unpersist(False)


def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the corpus, score every document, and report the
    per-lang confusion summary: docs, predicted-target count, and the
    mean target probability — the quality-filter calibration table a
    pipeline owner actually reads.  Integer counts make the surface
    robust to last-ulp float divergence; the probability is rounded."""
    weights, _ = train_quality_classifier(spark, sf_dir)
    feats = _feature_frame(spark, sf_dir)
    w_df = _weight_frame(spark, weights)
    scored = (
        feats.join(F.broadcast(w_df), "bucket")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
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


PYTEST_QUERIES = {"classifier_eval": classifier_eval}
