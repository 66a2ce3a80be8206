"""security.apply_policy — governed-view rewriting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.security import Policy, apply_policy, role_views


@pytest.fixture()
def tbl(spark):
    return spark.createDataFrame(
        [(1, "alice", "A", 100), (2, "bob", "B", 200),
         (3, "carol", "A", 300)],
        "id long, name string, seg string, bal long")


def test_row_filter_and_masks(spark, tbl):
    v = apply_policy(tbl, Policy(
        row_filter="seg = 'A'",
        column_masks={"name": "concat(substr(name, 1, 1), '***')"}))
    rows = sorted((r.id, r.name, r.seg, r.bal) for r in v.collect())
    assert rows == [(1, "a***", "A", 100), (3, "c***", "A", 300)]
    # schema order preserved (downstream column-compatibility contract)
    assert v.columns == tbl.columns


def test_mask_referencing_other_column_and_no_filter(spark, tbl):
    v = apply_policy(tbl, Policy(
        column_masks={"bal": "bal div 100 * 100", "id": "id * 10"}))
    rows = sorted((r.id, r.bal) for r in v.collect())
    assert rows == [(10, 100), (20, 200), (30, 300)]
    assert v.count() == 3


def test_unknown_masked_column_rejected(spark, tbl):
    with pytest.raises(ValueError, match="ssn"):
        apply_policy(tbl, Policy(column_masks={"ssn": "'x'"}))


def test_role_views(spark, tbl):
    views = role_views(tbl, {
        "admin": Policy(),
        "analyst": Policy(row_filter="seg = 'B'"),
    })
    assert views["admin"].count() == 3
    assert [r.id for r in views["analyst"].collect()] == [2]


def test_row_filter_pushes_down_to_scan(spark, tmp_path):
    """The governed view must cost the ungoverned read: the row filter
    reaches the parquet scan as a pushed filter."""
    p = str(tmp_path / "gov")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("seg")).write.parquet(p)
    df = spark.read.parquet(p)
    v = apply_policy(df, Policy(row_filter="seg = 3",
                                column_masks={"id": "id * 2"}))
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "seg" in plan.split(
        "PushedFilters")[1][:80]
