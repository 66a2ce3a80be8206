"""Plan-shape regression tests: the scale properties (pushdown,
broadcast selection, no accidental windows/shuffles) must survive
refactors, not just the values."""

from __future__ import annotations

import pytest


def _physical(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture(scope="module")
def queries():
    from cube_builder_spark.queries import all_queries
    return all_queries()


def test_q3_broadcasts_dims_and_pushes_filters(spark, sf_dir, queries):
    plan = _physical(queries["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan          # dims broadcast
    assert "SortMergeJoin" not in plan          # nothing big-big here
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_filter_reaches_scan_and_prunes_columns(spark, sf_dir, queries):
    plan = _physical(queries["q6_forecast_revenue"](spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed
    # column pruning: the scan reads only what the query needs
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def _distinct_shuffles(plan: str) -> set[str]:
    import re
    return {m.group(1) for m in
            re.finditer(r"(?<!Broadcast)Exchange \((\d+)\)", plan)}


def test_blend_has_no_window_and_single_agg_exchange(spark, sf_dir, queries):
    plan = _physical(queries["c2_blend_lcf"](spark, sf_dir))
    assert "Window" not in plan                 # max-of-struct, not row_number
    assert "BroadcastHashJoin" in plan          # efficacy join broadcast
    # the only real shuffles: the tiny efficacy groupBy and the blend
    # groupBy (the plane is cached; its derivation + subset-key
    # repartition exchanges — rendered inside InMemoryRelation
    # subtrees, once or twice depending on what ran earlier in the
    # session — are replaced by the cache at exec)
    assert len(_distinct_shuffles(plan)) <= 5, \
        f"blend plan grew extra shuffles:\n{plan[:2000]}"


def test_mosaic_has_no_window(spark, sf_dir, queries):
    plan = _physical(queries["c1_mosaic_first_valid"](spark, sf_dir))
    assert "Window" not in plan
    # the packed-argmax must plan a HashAggregate (max over a packed
    # long); the struct form's SortAggregate re-sorts every partition
    # — measured 10x slower at sf0.1 (round 7)
    assert "SortAggregate" not in plan


def test_ann_bruteforce_broadcasts_query_vector(spark, sf_dir, queries):
    plan = _physical(queries["a_ann_bruteforce_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan      # top-k, not global sort


def test_e2e_pipeline_assigns_periods_by_broadcast(spark, sf_dir, queries):
    plan = _physical(queries["p_cube_build_e2e"](spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_grouping_sets_single_pass(spark, sf_dir, queries):
    """GROUPING SETS must expand BEFORE the exchange: one scan, one
    shuffle carrying (set, group) rows — never one scan per level."""
    import re
    plan = _physical(queries["r16_grouping_sets"](spark, sf_dir))
    # formatted explain names each scan in the tree AND its detail
    # section — count distinct node ids
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    assert "Expand" in plan
    # one real (non-broadcast) shuffle: the grouping aggregation
    assert len(_distinct_shuffles(plan)) == 1


def test_hash_split_sample_single_shuffle_and_pruned_scan(
        spark, sf_dir, queries):
    """Deterministic split/sample is map-side arithmetic: one scan
    reading only (doc_id, source), one rollup shuffle."""
    import re
    plan = _physical(queries["p_hash_split_sample"](spark, sf_dir))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read          # the fat column never loads
    assert len(_distinct_shuffles(plan)) == 1


def test_pagerank_edge_derivation_projects_early(spark, sf_dir, queries):
    """The fact-table scans behind the PageRank edge set must read only
    join keys — never prices/dates — and the iterations add no plan at
    all (driver-side fold over bounded metadata)."""
    df = queries["x_pagerank_trade"](spark, sf_dir)
    # the returned frame is a bounded local relation: no scan, no join
    plan = _physical(df)
    assert "Scan parquet" not in plan


def test_c42_upsample_single_eval_no_selfjoin(spark, sf_dir, queries):
    """C42's claim: the coarse plane scatters ONCE — never a join of
    the fine grid against shifted copies of the coarse subtree. The
    plan must contain NO join at all (explode + one groupBy), and no
    window."""
    plan = _physical(queries["c42_bilinear_upsample"](spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "ShuffledHashJoin", "BroadcastNestedLoopJoin", "Window"):
        assert node not in plan, node


def test_c43_terrain_no_join_back(spark, sf_dir, queries):
    """C43 uses flow_direction's no-join-back kernel: the center rides
    the scatter shuffle (max(CASE center)), so the plan has no join
    and no window — one scatter, one aggregate."""
    plan = _physical(queries["c43_terrain_indexes"](spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "ShuffledHashJoin", "BroadcastNestedLoopJoin", "Window"):
        assert node not in plan, node


def test_c40_distance_no_range_join(spark, sf_dir, queries):
    """C40's distance transform must be scatter + equi-join-back —
    a coordinate-RANGE join over the grid would plan a
    BroadcastNestedLoopJoin (quadratic per tile at scale)."""
    plan = _physical(queries["c40_cloud_distance"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dpp_prunes_fact_partitions_at_runtime(spark, sf_dir, queries):
    """x_dynamic_partition_pruning's contract: the hive-partitioned
    fact scan must carry a dynamicpruningexpression PartitionFilter —
    the runtime subquery that skips non-qualifying partitions' files
    entirely. (Values are oracle-checked; this pins the mechanism.)"""
    plan = _physical(queries["x_dynamic_partition_pruning"](spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_runtime_bloom_filter_injects_across_shuffle(spark, sf_dir):
    """Catalyst's row-level runtime filtering (InjectRuntimeFilter,
    SPARK-32268) — the sibling of x_dynamic_partition_pruning's
    partition-level pruning: a selective dim predicate becomes a
    bloom_filter_agg subquery and a might_contain condition on the
    fact scan, filtering rows BEFORE the shuffle. Probed insertion
    conditions (documented here because they're non-obvious): the
    application side must actually contain a shuffle — a broadcast
    join never gets the filter (it wouldn't pay) — and the
    application-side scan must exceed
    ``runtime.bloomFilter.applicationSideScanSizeThreshold``
    (default 10GB, lowered for fixture-scale data)."""
    from pyspark.sql import functions as F

    from cube_builder_spark.tables import load_tables

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = load_tables(spark, sf_dir, ["lineitem", "orders"])
        big = t["lineitem"].select("l_orderkey", "l_quantity")
        small = (t["orders"].filter(F.col("o_totalprice") > 400000)
                 .select("o_orderkey"))
        j = (big.join(small, big["l_orderkey"] == small["o_orderkey"])
             .groupBy().count())
        plan = _physical(j)
        assert "might_contain" in plan.lower(), plan[:3000]
        assert "bloom_filter_agg" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_global_shuffle_no_global_sort_or_range_exchange(
        spark, sf_dir, queries):
    """p_global_shuffle's rank must come from the checkpointed range
    shuffle (TeraSort shape): the final plan carries NO range
    exchange (it ran pre-checkpoint, once) and NO unpartitioned
    global Sort over data — the only windows run partitioned by the
    range-partition label or over the metadata offsets frame."""
    plan = _physical(queries["p_global_shuffle"](spark, sf_dir))
    assert "rangepartitioning" not in plan.lower()
    assert "Scan ExistingRDD" in plan   # both branches read the ckpt


def test_hybrid_rrf_partial_topk_not_global_window(spark, sf_dir, queries):
    """Both candidate lists must come from TakeOrderedAndProject
    (distributed partial top-k) — a global row_number window over the
    scored corpus would funnel it through one task."""
    plan = _physical(queries["a_hybrid_search_rrf"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the rank windows run AFTER the top-50 truncation; the full
    # candidate frames never meet a global sort
    assert plan.count("TakeOrderedAndProject") >= 2


def test_cusum_windows_partitioned_by_type(spark, sf_dir, queries):
    """Every window in the CUSUM plan partitions by event_type — the
    statistic runs over the pre-aggregated daily frame, and nothing
    sorts globally except the final tiny output."""
    import re

    df = queries["e_cusum_changepoint"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    matches = list(re.finditer(
        r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)", opt))
    # vacuous-pass guard: the plan carries the cum/t windows and the
    # argmax rank window — if the rendering changes and the regex
    # stops matching, fail loudly instead of green-lighting anything
    assert len(matches) >= 2, opt
    for m in matches:
        assert "event_type" in m.group(2), m.group(0)


def test_kaplan_meier_single_events_scan(spark, sf_dir, queries):
    """Round-12 (VERDICT r11 #5): the horizon must ride the
    calendar-bounded (duration, last_day) rollup, not a second scan
    of events — ONE parquet scan in the whole plan."""
    import re

    plan = _physical(queries["e_kaplan_meier"](spark, sf_dir))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, plan


def test_range_frame_window_partitioned_by_customer(spark, sf_dir,
                                                    queries):
    """The RANGE frame must run partitioned by o_custkey — a global
    value-ordered window would funnel all orders through one task."""
    import re

    df = queries["e_range_frame_spend"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    matches = list(re.finditer(
        r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)", opt))
    assert matches, opt
    for m in matches:
        assert "o_custkey" in m.group(2), m.group(0)


def test_peak_concurrency_windows_partitioned_by_day(spark, sf_dir,
                                                     queries):
    """The sweep-line running sum must run over the calendar-bounded
    (day, minute) frame, partitioned by day."""
    import re

    df = queries["e_peak_concurrency"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    matches = list(re.finditer(
        r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)", opt))
    assert matches, opt
    for m in matches:
        assert "day" in m.group(2), m.group(0)


def test_lorenz_gini_no_range_exchange_no_global_data_window(
        spark, sf_dir, queries):
    """e_lorenz_gini rides global_rank: the final plan carries no
    range exchange (materialized once, pre-checkpoint) and every
    row_number window is partitioned by the range-partition label."""
    import re

    df = queries["e_lorenz_gini"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    assert "rangepartitioning" not in phys.lower(), phys
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)", opt):
        if "row_number" in m.group(1):
            assert "_rp" in m.group(2), m.group(0)


def test_cooccurrence_topk_is_take_ordered(spark, sf_dir, queries):
    """The final top-50 must be TakeOrderedAndProject (distributed
    partial top-k) and the pair expansion must not introduce a
    CartesianProduct. r14 single-shuffle form: the top-100 vocabulary
    cut is its own TakeOrdered job whose 100 rows become literals, so
    the returned plan must NOT carry the old corpus-scale second pass
    — no collect_list (the groupBy(doc_id) token rollup) and no join
    (counts re-attach via a 100-key map literal)."""
    plan = _physical(queries["t_cooccurrence_pmi"](spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "collect_list" not in plan, plan
    assert "Join" not in plan, plan


def test_systematic_resample_no_range_exchange_no_global_window(
        spark, sf_dir, queries):
    """p_systematic_resample rides global_cumsum (the TeraSort
    prefix-sum primitive): the final plan carries no range exchange
    (materialized once, pre-checkpoint) and every running-sum window
    is partitioned by the range-partition label — no unpartitioned
    data window anywhere."""
    import re

    df = queries["p_systematic_resample"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    assert "rangepartitioning" not in phys.lower(), phys
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)", opt):
        spec = m.group(1)
        if "unboundedpreceding" in spec and "currentrow" in spec:
            assert "_rp" in m.group(2), m.group(0)


def test_window_funnel_one_scan_one_user_shuffle(spark, sf_dir, queries):
    """e_window_funnel's DP must be ONE events scan into one
    user-keyed aggregate — never the oracle's 3-way event self-join
    (no Join node at all), no window over raw events."""
    import re

    plan = _physical(queries["e_window_funnel"](spark, sf_dir))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan


def test_rolling_p90_single_scan_no_join(spark, sf_dir, queries):
    """r15: the trailing window is a RANGE window over the day index
    of the daily rollup — ONE events scan, no join of any kind (the
    r14 scatter+join form is gone), no checkpoint RDD."""
    import re
    plan = _physical(queries["e_rolling_p90"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "ExistingRDD" not in plan, plan
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, plan


def test_semivariogram_no_bnlj_no_cartesian(spark, sf_dir, queries):
    """c50's 8-shift scatter must resolve to equi-joins on
    (tile, y, x) exactly like the c47 adjacency scatter."""
    plan = _physical(queries["c50_semivariogram"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_zipf_and_textrank_vocab_cut_is_take_ordered(spark, sf_dir,
                                                     queries):
    """Both corpus diagnostics take their head via TakeOrdered
    (distributed partial top-k), never a global sort of the
    vocabulary."""
    plan = _physical(queries["t_zipf_check"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_code_detect_no_shuffle(spark, sf_dir, queries):
    """t_code_detect is a pure per-row projection: ZERO exchanges."""
    plan = _physical(queries["t_code_detect"](spark, sf_dir))
    assert "Exchange" not in plan.split("== Initial Plan ==")[0], plan


def test_mattr_no_shuffle(spark, sf_dir, queries):
    """t_mattr_diversity's window slide is in-array: ZERO exchanges."""
    plan = _physical(queries["t_mattr_diversity"](spark, sf_dir))
    assert "Exchange" not in plan.split("== Initial Plan ==")[0], plan


def test_dn_retention_single_events_scan(spark, sf_dir, queries):
    """The (user, day) frame is derived once and self-joined — the
    events parquet must be scanned exactly once."""
    import re

    plan = _physical(queries["e_dn_retention"](spark, sf_dir))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, plan


def test_skew_report_take_ordered(spark, sf_dir, queries):
    """The top-20 heavy keys must be TakeOrderedAndProject — never a
    global sort of the key population."""
    plan = _physical(queries["x_key_skew_report"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_reads_pruned_postings(spark, sf_dir, queries):
    """Round-14 verdict #6: t_bm25_topk rides the term-hash-
    partitioned postings store — the scan must carry a
    PartitionFilters prune on the bucket column (the inverted-index
    seek), exactly like the hybrid's lexical side."""
    import re

    plan = _physical(queries["t_bm25_topk"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    assert "b#" in m.group(1) or " b " in m.group(1) or "b IN" in m.group(1), \
        m.group(0)
