"""Accuracy pins for x_hll_distinct (deterministic md5-based HLL, so
these asserts are exact re-run-stable facts, not flaky tolerances)."""

from __future__ import annotations

import math

from cube_builder_spark.queries import all_queries


def _run(spark, sf_dir):
    return all_queries()["x_hll_distinct"](spark, sf_dir).collect()[0]


def test_hll_raw_regime_accurate(spark):
    """Above the 2.5m small-range threshold (n=2000, m=256) the raw
    harmonic-mean estimate lands within ~2x the theoretical standard
    error (1.04/sqrt(256) = 6.5%). Pinned at sf0.01 explicitly (the
    session fixture runs at sf0.001, which is the small-range
    regime)."""
    r = _run(spark, "/root/testdata/sf0.01")
    assert r.n_exact == 2000
    assert abs(r.estimate - r.n_exact) / r.n_exact < 0.13


def test_hll_small_range_linear_counting(spark):
    """Below 2.5m the raw estimate is biased high (the documented HLL
    small-range regime); n_buckets_used is the linear-counting
    sufficient statistic, and LC = m*ln(m/empty) recovers accuracy.
    The ln stays OUT of the oracle surface (not bit-portable across
    engines) — this test applies it Python-side."""
    r = _run(spark, "/root/testdata/sf0.001")
    assert r.n_exact == 200
    assert r.estimate > r.n_exact * 1.2          # raw is biased high here
    empty = 256 - r.n_buckets_used
    lc = 256 * math.log(256 / empty)
    assert abs(lc - r.n_exact) / r.n_exact < 0.10


def test_hll_registers_merge_associatively(spark, sf_dir):
    """The sketch property that matters at 100 TB: building one sketch
    over the whole table equals max-merging sketches built over
    disjoint halves — register-wise max is the merge."""
    from pyspark.sql import functions as F
    from cube_builder_spark.tables import load_tables

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    hx = F.md5(F.col("l_partkey").cast("string"))
    tail = F.substring(hx, 3, 12)
    lz = F.length(F.regexp_extract(tail, "^0*", 0))
    first = F.substring(tail, lz + 1, 1)
    dz = (F.when(first == "1", 3).when(first.isin("2", "3"), 2)
          .when(first.isin("4", "5", "6", "7"), 1).otherwise(0))
    rho = F.when(lz == 12, 49).otherwise(4 * lz + dz + 1)
    plane = li.select(F.substring(hx, 1, 2).alias("bucket"),
                      rho.alias("r"), "l_orderkey")
    whole = {r.bucket: r.r for r in
             plane.groupBy("bucket").agg(F.max("r").alias("r")).collect()}
    h1 = {r.bucket: r.r for r in
          plane.filter(F.col("l_orderkey") % 2 == 0)
          .groupBy("bucket").agg(F.max("r").alias("r")).collect()}
    h2 = {r.bucket: r.r for r in
          plane.filter(F.col("l_orderkey") % 2 == 1)
          .groupBy("bucket").agg(F.max("r").alias("r")).collect()}
    merged = {b: max(h1.get(b, 0), h2.get(b, 0)) for b in set(h1) | set(h2)}
    assert merged == whole
