"""e_trajectory_hausdorff_pruned — lossless-prune guarantees.

The pruned query must return the exact twin's top-20 on a corpus big
enough (> 21 eligible users) to take the seed + band + verify path,
and its plan must be free of the all-pairs BroadcastNestedLoopJoin
the unpruned twin compiles to. sf0.001 (< 21 users) exercises the
exact-fallback branch against the same oracle in
tests/test_queries_oracle; here we pin the pruned path explicitly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    """30 purchase-active users (3-6 points each, several tight
    clusters so the top-20 is non-degenerate), plus sub-2-point users
    and non-purchase noise rows."""
    rows = []
    eid = 0
    for u in range(30):
        n_pts = 3 + (u % 4)
        base_x = 1_000_000 + (u // 3) * 500 + (u % 3) * 7
        base_y = 2_000 + (u % 5) * 40
        for j in range(n_pts):
            eid += 1
            rows.append((eid, (base_x + j * 11) * 60, u,
                         "purchase", (base_y + j * 3) / 100.0, "{}"))
        eid += 1
        rows.append((eid, base_x * 60, u, "view", 0.0, "{}"))
    for u in (100, 101):  # single-point users: ineligible
        eid += 1
        rows.append((eid, 999_000 * 60, u, "purchase", 5.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, "
              "event_type string, value double, props string"
    ).select("event_id", F.timestamp_seconds("sec").alias("ts"),
             "user_id", "event_type", "value", "props")
    out = str(tmp_path_factory.mktemp("haus_synth"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet"))
    return out


def _rows(df):
    return [(r["user_a"], r["user_b"], r["hausdorff_sq"])
            for r in df.collect()]


def test_pruned_equals_exact_on_pruned_path(spark, synth_dir):
    from cube_builder_spark.events_queries import (
        e_trajectory_hausdorff, e_trajectory_hausdorff_pruned)
    exact = _rows(e_trajectory_hausdorff(spark, synth_dir))
    pruned = _rows(e_trajectory_hausdorff_pruned(spark, synth_dir))
    assert len(exact) == 20
    assert pruned == exact


def test_pruned_plan_has_no_all_pairs_join(spark, synth_dir):
    from cube_builder_spark.events_queries import (
        e_trajectory_hausdorff, e_trajectory_hausdorff_pruned)
    pruned = e_trajectory_hausdorff_pruned(spark, synth_dir)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the unpruned twin DOES compile to the all-pairs BNLJ — prove the
    # assertion above is load-bearing
    twin = e_trajectory_hausdorff(spark, synth_dir)
    twin_plan = twin._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in twin_plan


def test_fallback_under_21_users(spark, sf_dir):
    from cube_builder_spark.events_queries import (
        e_trajectory_hausdorff, e_trajectory_hausdorff_pruned)
    exact = _rows(e_trajectory_hausdorff(spark, sf_dir))
    pruned = _rows(e_trajectory_hausdorff_pruned(spark, sf_dir))
    assert pruned == exact
