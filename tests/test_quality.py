"""Data-quality framework: one-pass compilation, violation detection
on known-bad data, FK orphans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.quality import (TableChecks, check_foreign_key,
                                        run_table_checks)


def _bad_df(spark):
    rows = [(1, 10.0, "A"), (1, -5.0, "B"),      # dup key, low range
            (2, 20.0, None), (3, 999.0, "A")]    # null status, high range
    return spark.createDataFrame(rows, "k long, v double, status string")


def test_checks_detect_each_violation_kind(spark):
    rep = run_table_checks(TableChecks(
        df=_bad_df(spark),
        not_null=["status"],
        ranges={"v": (0.0, 100.0)},
        in_set={"status": ["A", "B"]},
        unique=[["k"]],
    ), "t").collect()
    by = {r.check_name: r for r in rep}
    assert by["t.status not_null"].n_violations == 1
    assert by["t.v range[0.0,100.0]"].n_violations == 2   # -5 and 999
    assert by["t.status in_set"].n_violations == 1        # null fails set
    assert by["t.(k) unique"].n_violations == 1           # one dup row
    assert all(r.n_rows == 4 for r in rep)
    assert not any(r.passed for r in rep)


def test_clean_table_passes_in_one_aggregation(spark, sf_dir):
    from cube_builder_spark.tables import load_tables
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    rep = run_table_checks(TableChecks(
        df=orders, not_null=["o_orderkey"],
        ranges={"o_totalprice": (0.0, 1e9)},
        unique=[["o_orderkey"]]), "orders")
    rows = rep.collect()
    assert all(r.passed for r in rows)
    # one scan: the plan reads the orders parquet exactly once
    # after execution AQE prints Final AND Initial sections — count
    # scans in the final section only
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    n_scans = sum(1 for ln in plan.splitlines()
                  if "Scan parquet" in ln and "orders" in ln)
    assert n_scans == 1


def test_fk_orphans_counted(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = check_foreign_key(child, "fk", parent, "pk", "t.fk -> p.pk") \
        .collect()[0]
    assert rep.n_rows == 4
    assert rep.n_violations == 2   # 99 and NULL both reference nothing
    assert not rep.passed
