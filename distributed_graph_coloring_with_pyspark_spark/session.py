"""SparkSession factory tuned for this engine.

The reference hand-configures Kryo, 1-core executors and
``spark.default.parallelism=1`` (coloring.py:190-198); under the
DataFrame engine all of that is obsolete — Tungsten UnsafeRow replaces
Kryo-pickled Python objects and AQE sizes shuffles at runtime. We pin:

- AQE on (runtime broadcast conversion, skew-join splitting, partition
  coalescing) — the scale path for 100 TB joins.
- ``spark.sql.session.timeZone=UTC`` — Spark timestamps are session-TZ
  while DuckDB's (the correctness oracle) are UTC-naive.
- Arrow on — every Pandas-UDF boundary is Arrow-batched.
- shuffle partitions default to local core count; on a real cluster this
  is overridden (AQE coalesces down, so a high initial value is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dgc-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned local session.

    On a real cluster, master/memory come from spark-submit; everything
    set here is safe to keep.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
        # default; read as long nanos and convert in sources/tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_session_caches(spark: SparkSession) -> dict[str, int]:
    """Drop every per-session memo this engine keeps — the trained IVF
    quantizers, the customer-graph edge cache, the persisted shingle
    cache, and the ad-hoc tracked persists (cache.py) — in one call.
    Long-lived sessions (the bench harness, a notebook running many
    query families) use this between families so one family's warm
    state can't flatter or starve the next; each underlying helper is
    idempotent and safe on a cold session.  This explicit release IS
    the cache-lifetime mechanism: cached frames strongly reference
    their session, so no keying scheme can expire them automatically
    (see cache.py's honesty note).  Returns {cache_name:
    entries_released} for observability."""
    import gc

    from .cache import release_tracked
    from .operators.classifier import clear_classifier_cache
    from .operators.curation import clear_decon_cache
    from .operators.graph_bridge import clear_customer_graph_cache
    from .operators.similarity import (
        clear_ann_topk_cache,
        clear_ivf_cache,
        clear_neardup_pair_cache,
        clear_pq_cache,
    )
    from .operators.text_dedup import (
        clear_incremental_e2e_index,
        clear_pair_cache,
        clear_shingle_cache,
    )
    from .operators.tokenizer import clear_bpe_cache
    from .operators.unigram_lm import clear_unigram_cache

    released = {
        "customer_graph": clear_customer_graph_cache(spark),
        "ivf_centroids": clear_ivf_cache(spark),
        "pq_codebooks": clear_pq_cache(spark),
        "shingles": clear_shingle_cache(spark),
        "jaccard_pairs": clear_pair_cache(spark),
        "neardup_pairs": clear_neardup_pair_cache(spark),
        "ann_topk": clear_ann_topk_cache(spark),
        "e2e_index_dirs": clear_incremental_e2e_index(spark),
        "bpe_models": clear_bpe_cache(spark),
        "unigram_models": clear_unigram_cache(spark),
        "classifier": clear_classifier_cache(spark),
        "decon_drop_sets": clear_decon_cache(spark),
        "tracked_frames": release_tracked(spark),
    }
    # Long-session hygiene (r6): iterative queries leave localCheckpoint
    # RDD blocks that Spark's ContextCleaner can only reclaim after the
    # driver-side py4j references are garbage collected — CPython's
    # generational GC defers that in a long session, so block storage
    # ratchets up and later queries pay for earlier ones (measured in
    # bench.py: the flagship coloring at 7.9 s late-session vs its
    # 3.9 s isolated floor).  A release point is exactly when a caller
    # wants the session clean, so drain the ref graph here too.
    gc.collect()
    return released
