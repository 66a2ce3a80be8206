"""Execution-metrics introspection: scan rows, shuffle volume, spill."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.metrics import (collect_metrics, metric_total,
                                        shuffle_bytes, spill_bytes)
from cube_builder_spark.tables import load_tables


def test_scan_rows_metric_matches_count(spark, sf_dir):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    n = orders.count()
    agg = orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()   # metrics populate after execution
    scanned = metric_total(agg, "numOutputRows", "Scan")
    assert scanned == n


def test_shuffle_and_spill_metrics(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    j = (t["lineitem"].join(t["orders"],
                            F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("o_orderstatus")
         .agg(F.count(F.lit(1)).alias("n")))
    j.collect()
    rows = collect_metrics(j)
    assert rows and all(isinstance(m["value"], int) for m in rows)
    # a shuffle join must report shuffle volume; nothing here should spill
    assert shuffle_bytes(j) > 0
    assert spill_bytes(j) == 0


def test_broadcast_join_reports_no_big_shuffle(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "nation"])
    j = (t["lineitem"]
         .join(F.broadcast(t["nation"]),
               F.col("l_suppkey") % 25 == F.col("n_nationkey"))
         .agg(F.count(F.lit(1)).alias("n")))
    j.collect()
    # broadcast join: shuffle volume limited to the final 1-row agg
    assert shuffle_bytes(j) < 1 << 16
