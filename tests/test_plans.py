"""Plan regression gate: the plans we designed for must survive code
drift.  Checks static plan properties only (explicit broadcast hints,
ReadSchema pruning, filter pushdown) — AQE runtime conversions are
deliberately out of scope (they depend on sizes observed at runtime)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_coloring_with_pyspark_spark.operators import (
    multimodal as MM,
    relational as R,
    similarity as S,
    text_dedup as TD,
)
from distributed_graph_coloring_with_pyspark_spark.plans.audit import (
    has_broadcast_hash_join,
    pushed_filters,
    scan_schemas,
)

SF = "/root/testdata/sf0.001"


def test_knn_probe_side_broadcasts(spark):
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = S.knn_exact_topk(spark, SF)
    # probe×corpus is a non-equi join (vec_id != probe_id) with an explicit
    # broadcast hint → BroadcastNestedLoopJoin, never a shuffle of the corpus
    assert "Broadcast" in plan_string(df)
    # the probe filter must reach the parquet scan as a pushdown
    assert any("vec_id" in f for f in pushed_filters(df))


def test_q5_dimension_broadcast(spark):
    # q5 hints broadcast for region/nation (relational.py): must be static
    assert has_broadcast_hash_join(R.q5_local_supplier_volume(spark, SF))


def test_text_stats_prunes_doc_id(spark):
    # text_stats touches text/lang/source/n_chars — doc_id must be pruned
    schemas = scan_schemas(TD.text_stats(spark, SF))
    assert schemas and all("doc_id" not in s for s in schemas)


def test_blob_stats_prunes_to_two_columns(spark):
    schemas = scan_schemas(MM.multimodal_blob_stats(spark, SF))
    assert schemas and all(
        "doc_id" not in s and "lang" not in s and "n_chars" not in s for s in schemas
    )


def test_bucketed_join_elides_shuffle(spark):
    """Bucketing = the co-located-join strategy for repeated large joins
    at 100 TB: both sides bucketed by the join key with equal bucket
    counts → SortMergeJoin with NO Exchange on either side."""
    from pyspark.sql import functions as F

    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy is decided by bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = plan_string(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, "bucketed join still shuffles"
        # sanity: same result as the unbucketed join
        n_plain = (
            load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cross_grid_broadcasts_dimensions(spark):
    # the fact-side dimension joins carry explicit broadcast hints; the
    # 15-row scaffold cross join must never shuffle the fact table
    assert has_broadcast_hash_join(R.cross_region_status_grid(spark, SF))


def test_full_outer_is_full_outer(spark):
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    p = plan_string(R.full_outer_top_revenue_vs_orders(spark, SF))
    assert "FullOuter" in p


def test_sql_revenue_prunes_and_partial_aggs(spark):
    """Round-5 drift follow-up (VERDICT r4 #3): the isolated re-profile
    showed sql_revenue_by_region's plan unchanged (drift was session
    warmup/load, see bench.py notes) — pin the two properties that
    matter at 100 TB so a REAL regression can't hide behind measurement
    noise again: the lineitem scan reads only its 3 needed columns, and
    the region-wise aggregation has a partial (map-side) phase."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = R.sql_revenue_by_region(spark, SF)
    li = [s for s in scan_schemas(df) if "l_extendedprice" in s]
    assert li and all(
        set(__import__("re").findall(r"(\w+):", s))
        <= {"l_orderkey", "l_extendedprice", "l_discount"}
        for s in li
    ), li
    assert "partial" in plan_string(df).lower()


def test_ivf_probe_side_broadcasts(spark):
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    # the cell equi-join must broadcast the tiny probe side, never
    # shuffle the corpus
    assert "Broadcast" in plan_string(S.ann_ivf_topk(spark, SF))


def test_q1_pushdown_and_partial_agg(spark):
    # AQE hides codegen ids pre-execution; assert the two static
    # properties that matter: the date filter reaches the parquet scan,
    # and aggregation is two-phase (map-side partial_* before the
    # exchange — the optimization the reference hand-built with
    # aggregateByKey, SURVEY §4)
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = R.q1_pricing_summary(spark, SF)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    assert "partial_sum" in plan_string(df)


def test_repetition_stats_prunes_metadata(spark):
    # repetition_stats touches doc_id/text only — lang/source/n_chars
    # must never reach the scan
    schemas = scan_schemas(TD.repetition_stats(spark, SF))
    assert schemas and all(
        "lang" not in s and "source" not in s and "n_chars" not in s
        for s in schemas
    )


def test_latest_snapshot_prunes_props(spark):
    # CDC compaction reads user_id/ts/event_id/event_type/value — the
    # wide props JSON column must be pruned from the scan
    from distributed_graph_coloring_with_pyspark_spark.streaming import events as E

    schemas = scan_schemas(E.events_latest_snapshot(spark, SF))
    assert schemas and all("props" not in s for s in schemas)


def test_q6_all_filters_pushed_and_pruned(spark):
    """Q6 is the pushdown showcase: all three predicates reach the
    parquet scan and the projection prunes to the 4 touched columns —
    at 100 TB the scan cost IS the query cost, so this shape is the
    whole point of the operator."""
    import re as _re

    df = R.q6_forecast_revenue(spark, SF)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    schemas = scan_schemas(df)
    assert schemas and all(
        set(_re.findall(r"(\w+):", s))
        <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
        for s in schemas
    ), schemas


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """100 TB lever check: with broadcast off (forcing the shuffle-join
    regime a fact-fact join hits at scale), Spark's runtime bloom
    filter must inject a might_contain probe on the fact scan side of
    a selective join — row-group-level pruning the engine gets for
    free as long as our join shapes stay eligible (equi-key, selective
    creation side).  Thresholds are lowered only inside this test; the
    tiny local tables would never cross the 10 GB default."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string
    from distributed_graph_coloring_with_pyspark_spark.sources.tables import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        li = load_table(spark, SF, "lineitem")
        od = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        assert "might_contain" in plan_string(df).lower(), plan_string(df)[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_pack_sequences_no_single_partition_window(spark):
    """pack_sequences' global prefix sum must stay the TWO-PASS
    distributed form — a naive Window.orderBy with no partitionBy
    funnels the corpus through one task (plans show a SinglePartition
    exchange), which is exactly the shape this pin forbids."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    ps = plan_string(TD.pack_sequences(spark, SF))
    assert "Window" in ps  # the pid-local cumsum is still a window
    assert "SinglePartition" not in ps, ps[:2000]


def test_q19_single_join_disjunctive_residual(spark):
    """Q19's entire point is the PLAN: the three OR-ed brand/size/qty
    bands must evaluate as a residual filter after ONE broadcast part
    join on the common partkey equi-condition — never three unioned
    scans of the fact."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = R.q19_disjunctive_revenue(spark, SF)
    ps = plan_string(df)
    assert has_broadcast_hash_join(df)
    assert "Union" not in ps, ps[:2000]
    # exactly two scans in the whole plan: lineitem + part, each once
    assert len(scan_schemas(df)) == 2, ps[:2000]


def test_q17_no_fact_window_single_agg_rejoin(spark):
    """Q17's correlated scalar subquery must decorrelate to a per-part
    average broadcast-joined back to the brand-filtered fact — not a
    Window over the fact (which would add a per-part sort of every
    lineitem row)."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = R.q17_small_quantity_revenue(spark, SF)
    ps = plan_string(df)
    assert "Window" not in ps, ps[:2000]
    assert has_broadcast_hash_join(df)


def test_q22_pushes_date_filter_below_anti_join(spark):
    """Q22's lapsed predicate: the o_orderdate filter must reach the
    orders parquet scan (PushedFilters), so the anti-join's build side
    is the filtered fact, not all orders."""
    df = R.q22_sales_opportunity(spark, SF)
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_substring_spans_plan_shape(spark):
    """ExactSubstr detection (r8): the scale story is 'linear, never
    pairwise' — pin the plan facts that make it true: the duplicated-
    hash filter applies via LEFT SEMI (never a pair-producing inner
    join or a cartesian), the dup-hash agg partial-aggregates map-side
    before its shuffle, and the scan prunes to doc_id+text."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = TD.dedup_substring_spans(spark, SF)
    plan = plan_string(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "partial_count" in plan  # map-side combine on the window-hash agg
    schemas = scan_schemas(df)
    assert schemas and all("lang" not in s and "source" not in s for s in schemas)


def test_apply_substring_dedup_plan_shape(spark):
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = TD.apply_substring_dedup(spark, SF)
    plan = plan_string(df)
    assert "LeftAnti" in plan  # removal set applied as anti join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_dsir_select_plan_shape(spark):
    """The DSIR selector's scale contract, structurally: the B-row
    λ-model and the 1-row totals rejoin the doc-bucket frame as
    BROADCASTS (no corpus-keyed shuffle for the model), and the
    top-20% cut compiles to TakeOrdered (per-partition heap + driver
    merge), never a global sort or single-partition window."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = TD.dsir_select(spark, SF)
    plan = plan_string(df, "simple")
    # r14 opt: the raw/target models are ONE fused aggregate, so the
    # old λ-side keyed join is GONE — the only keyed join left is the
    # broadcast λ-table onto the doc-bucket frame (was >= 2 BHJ when
    # the two models joined each other first)
    assert plan.count("BroadcastHashJoin") >= 1, plan  # λ → bucket join
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan  # no corpus-keyed model join
    # the shared doc-bucket materialization (one corpus explode for the
    # model pass AND the scoring join — was 8 Generate subtrees)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_hybrid_search_plan_shape(spark):
    """Hybrid retrieval's first-stage contracts: the probe's query
    terms reach the token stream as a broadcast LEFT SEMI (an IN-list
    can't hold data-dependent terms), the probe vector and BM25
    scalars enter as broadcasts, and nothing degenerates to a
    cartesian join."""
    from distributed_graph_coloring_with_pyspark_spark.operators.text_rank import (
        hybrid_search_rrf,
    )
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = hybrid_search_rrf(spark, SF)
    plan = plan_string(df, "simple")
    assert "LeftSemi" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan


def test_remove_boilerplate_prunes_and_avoids_windows(spark):
    """r11: the line-dedup pass must read only (doc_id, text) and build
    its per-doc reassembly from aggregation, never a window — a Window
    sneaking in would be the single-partition global-sort anti-pattern
    this module bans."""
    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = TD.remove_boilerplate(spark, SF)
    schemas = scan_schemas(df)
    assert schemas and all(
        "lang" not in s and "source" not in s and "n_chars" not in s
        for s in schemas
    )
    assert "Window" not in plan_string(df)


def test_epoch_shuffle_windows_are_bucket_partitioned(spark):
    """r11: the per-epoch global rank must ride bucket-partitioned
    windows (the literal-cut two-pass scan), never an unpartitioned
    Window.orderBy — the plan says 'Window' with a partition spec on
    pid, and the scan reads doc_id only."""
    import re

    from distributed_graph_coloring_with_pyspark_spark.plans.audit import plan_string

    df = TD.epoch_shuffle_manifest(spark, SF)
    plan = plan_string(df)
    schemas = scan_schemas(df)
    assert schemas and all(s == "struct<doc_id:bigint>" for s in schemas)
    # every Window node carries a partition spec over the bucket id —
    # formatted plans render Window as `Arguments: [exprs], [partition
    # spec], [order spec]` with the spec repeated as the leading args
    # of windowspecdefinition(...) (ADVICE r11: the old
    # `partitionBy=[...]` regex never matched and the loop was dead)
    specs = re.findall(r"windowspecdefinition\((\w+#\d+)", plan)
    assert specs, "no Window node found in the plan"
    assert all(s.startswith("pid#") for s in specs), specs
