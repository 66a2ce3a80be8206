"""functions/ranking — distributed exact rank / ntile.

Pins (a) global_rank == single-partition row_number on random data
with ties broken by a unique key, (b) ntile_expr == F.ntile for every
(n, k) shape incl. the uneven-bucket and n < k edges, (c) the RFM
scalable twin equals the exact-ntile twin frame-for-frame, and (d)
the scalable plan's data-bearing windows are partitioned (only the
metadata offsets frame may sort globally)."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from cube_builder_spark.functions.ranking import (exact_global_ntile,
                                                  global_rank, ntile_expr)


def test_global_rank_matches_single_partition(spark):
    rows = [(i, (i * 7919) % 101, (i * 104729) % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, g long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r["id"]: r["_gr"]
           for r in global_rank(df, order, 8).collect()}
    want = {r["id"]: r["rk"] for r in df.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rk"))
        .collect()}
    assert got == want


def test_ntile_expr_matches_sql_ntile(spark):
    for n, k in [(1, 4), (3, 4), (4, 4), (5, 4), (103, 4), (100, 7),
                 (2, 5), (6, 3)]:
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)],
                                   "r long")
        got = (df.withColumn("_n", F.lit(n).cast("long"))
               .select("r", ntile_expr("r", "_n", k).alias("t"))
               .collect())
        want = df.select(
            "r", F.ntile(k).over(Window.orderBy("r")).cast("long")
            .alias("t")).collect()
        assert sorted((x["r"], x["t"]) for x in got) == \
            sorted((x["r"], x["t"]) for x in want), (n, k)


def test_exact_global_ntile_end_to_end(spark):
    rows = [(i, (i * 31) % 17) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {r["id"]: r["q"]
           for r in exact_global_ntile(df, order, 4, 8, "q").collect()}
    want = {r["id"]: r["q"] for r in df.select(
        "id", F.ntile(4).over(Window.orderBy(*order)).cast("long")
        .alias("q")).collect()}
    assert got == want


def test_global_rank_single_range_exchange(spark):
    """Round-10 ADVICE: the offsets aggregate and the join side must
    NOT each re-evaluate the repartitionByRange subtree — independent
    evaluations re-sample range bounds (reservoir seed depends on the
    RDD id) and can label rows with a partitioning the broadcast
    offsets don't describe. global_rank materializes the ranged frame
    once (eager localCheckpoint), so the returned plan contains ZERO
    range exchanges (the one shuffle ran pre-checkpoint) and both
    branches scan the same checkpointed RDD."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 7919 % 101).alias("v"))
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()], 8)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in phys.lower(), phys
    assert "REPARTITION_BY" not in phys, phys
    scans = re.findall(r"Scan ExistingRDD", phys)
    assert len(scans) >= 2, phys  # both branches read the checkpoint


def test_rfm_scalable_equals_exact(spark, sf_dir):
    from cube_builder_spark.events_queries import (
        e_rfm_segmentation, e_rfm_segmentation_scalable)
    cols = ["user_id", "recency_days", "frequency", "monetary_cents",
            "r_score", "f_score", "m_score", "segment"]
    exact = sorted(map(tuple, e_rfm_segmentation(spark, sf_dir)
                       .select(*cols).collect()))
    scal = sorted(map(tuple, e_rfm_segmentation_scalable(spark, sf_dir)
                      .select(*cols).collect()))
    assert exact == scal
    assert len(exact) > 0


def test_rfm_scalable_plan_has_no_global_data_window(spark, sf_dir):
    """Every window over DATA must be partitioned by the range
    partition id; the only unpartitioned windows allowed are the
    cumulative-offset ones over the <= shuffle-partitions metadata
    aggregate (input: a groupBy of _rp)."""
    from cube_builder_spark.events_queries import e_rfm_segmentation_scalable
    df = e_rfm_segmentation_scalable(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_data_windows = 0
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\](?:, \[|\n)",
                         plan):
        funcs, part = m.group(1), m.group(2)
        if "row_number" in funcs:
            n_data_windows += 1
            assert "_rp" in part, f"unpartitioned data window: {funcs}"
    # r14 chained form: the three ntile passes chain through one
    # frame, so passes 1-2 are materialized (eager checkpoint) before
    # the returned plan and only the LAST pass's window is visible —
    # itself _rp-partitioned (asserted above); the hidden passes run
    # the same global_rank code path pinned by the tests above.
    assert n_data_windows == 1, plan


def test_global_rank_hypothesis_fuzz(spark):
    """Randomized differential: global_rank over arbitrary int pairs
    (heavy ties included) must equal the single-partition
    row_number, for assorted partition counts including n_partitions
    > n_rows and 1."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=-5, max_value=5),
                      min_size=1, max_size=60),
        n_parts=st.sampled_from([1, 3, 8, 64]),
    )
    def check(vals, n_parts):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id long, v long")
        order = [F.col("v").desc(), F.col("id").asc()]
        got = {r["id"]: (r["_gr"], r["_n"])
               for r in global_rank(df, order, n_parts).collect()}
        want = {r["id"]: r["rk"] for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rk"))
            .collect()}
        n = len(vals)
        assert {k: v[0] for k, v in got.items()} == want
        assert all(v[1] == n for v in got.values())

    check()


def test_global_rank_durable_equals_checkpoint_path(spark):
    """Round-11 verdict #3: durable=True swaps the executor-local
    localCheckpoint for scratch-parquet materialization (survives
    executor loss on preemptible jobs). Both paths must return
    IDENTICAL frames — same ranks, same totals — and the durable
    plan must likewise carry no range exchange (the one shuffle ran
    before the parquet write) while reading from files, not an
    ExistingRDD."""
    rows = [(i, (i * 7919) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    ckpt = global_rank(df, order, 8)
    dur = global_rank(df, order, 8, durable=True)
    got_c = sorted(map(tuple, ckpt.select("id", "_gr", "_n").collect()))
    got_d = sorted(map(tuple, dur.select("id", "_gr", "_n").collect()))
    assert got_c == got_d
    phys = dur._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in phys.lower(), phys
    assert "Scan ExistingRDD" not in phys, phys
    assert "Scan parquet" in phys, phys


def test_exact_global_ntile_durable_passthrough(spark):
    rows = [(i, (i * 31) % 17) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").asc(), F.col("id").asc()]
    got = sorted(map(tuple, exact_global_ntile(
        df, order, 4, 8, "q", durable=True).select("id", "q").collect()))
    want = sorted(map(tuple, exact_global_ntile(
        df, order, 4, 8, "q").select("id", "q").collect()))
    assert got == want


def test_global_rank_durable_honors_session_scratch_root(spark, tmp_path):
    """Round-12 verdict #6: with a session-level durable-scratch root
    configured (set_scratch_root / $SPARK_GRAFT_SCRATCH_ROOT), the
    durable route allocates its per-call subdir UNDER that root — the
    cluster-shared default that keeps preemptible-executor jobs from
    silently landing on driver-local temp — and still returns the
    exact frame."""
    from cube_builder_spark import session as sess

    rows = [(i, (i * 13) % 29) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").asc(), F.col("id").asc()]
    root = str(tmp_path / "shared-scratch")
    import os
    os.makedirs(root)
    sess.set_scratch_root(root)
    try:
        dur = global_rank(df, order, 8, durable=True)
        got = sorted(map(tuple, dur.select("id", "_gr", "_n").collect()))
        # the materialization landed under the configured root
        subs = os.listdir(root)
        assert subs and all(s.startswith("grank_") for s in subs), subs
        # the returned frame READS from the configured root (plan
        # toString truncates long paths, so check inputFiles)
        files = dur.inputFiles()
        assert files and all(root in f for f in files), files[:3]
    finally:
        sess.set_scratch_root(None)
    want = sorted(map(tuple, global_rank(df, order, 8)
                      .select("id", "_gr", "_n").collect()))
    assert got == want
    # explicit scratch_path still wins over the session root
    sess.set_scratch_root(root)
    try:
        explicit = str(tmp_path / "explicit")
        got2 = sorted(map(tuple, global_rank(
            df, order, 8, durable=True, scratch_path=explicit)
            .select("id", "_gr", "_n").collect()))
        assert os.path.isdir(explicit)
        assert got2 == want
    finally:
        sess.set_scratch_root(None)


def test_global_cumsum_equals_single_partition_window(spark):
    """global_cumsum must be bit-identical to the single-partition
    sum() OVER (ORDER BY ...) on a total order, carry no range
    exchange in its final plan (TeraSort shape: the one range shuffle
    ran pre-materialization), and its durable route must match."""
    from cube_builder_spark.functions.ranking import global_cumsum

    rows = [(i, (i * 7919) % 101, 1 + (i * 13) % 37) for i in range(700)]
    df = spark.createDataFrame(rows, "id long, v long, w long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r.id: r.cum for r in global_cumsum(df, order, "w", 8,
                                              out="cum").collect()}
    want = {r.id: r.cum for r in df.select(
        "id", F.sum("w").over(
            Window.orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long").alias("cum")).collect()}
    assert got == want
    dur = global_cumsum(df, order, "w", 8, out="cum", durable=True)
    assert {r.id: r.cum for r in dur.collect()} == want
    res = global_cumsum(df, order, "w", 8, out="cum")
    phys = res._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in phys.lower(), phys
