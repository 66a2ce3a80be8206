"""Materialized views (fingerprint invalidation) and ANALYZE stats +
join advisor."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.matview import MaterializedView
from cube_builder_spark.stats import (advise_join, analyze, load_stats,
                                      save_stats)


def _write_input(spark, path, hi):
    spark.range(hi).select(F.col("id"), (F.col("id") % 7).alias("g")) \
        .coalesce(1).write.mode("overwrite").parquet(path)


def test_matview_builds_once_and_invalidates_on_input_change(
        spark, tmp_path):
    src = str(tmp_path / "src")
    _write_input(spark, src, 100)
    builds = []

    def build(sp):
        builds.append(1)
        return (sp.read.parquet(src).groupBy("g")
                .agg(F.count(F.lit(1)).alias("n")))

    mv = MaterializedView(str(tmp_path / "mv"), "counts", build, [src])
    assert mv.is_stale()
    assert mv.refresh(spark) is True
    assert mv.refresh(spark) is False          # fingerprint unchanged
    assert len(builds) == 1
    assert mv.read(spark).count() == 7

    _write_input(spark, src, 210)              # input changed
    assert mv.is_stale()
    assert mv.refresh(spark) is True
    assert len(builds) == 2
    total = mv.read(spark).agg(F.sum("n")).collect()[0][0]
    assert total == 210


def test_matview_read_never_rebuilds(spark, tmp_path):
    src = str(tmp_path / "src2")
    _write_input(spark, src, 10)
    mv = MaterializedView(str(tmp_path / "mv2"), "v",
                          lambda sp: sp.read.parquet(src), [src])
    with pytest.raises(FileNotFoundError):
        mv.read(spark)
    mv.refresh(spark)
    _write_input(spark, src, 99)
    # stale but read serves the materialized data, no implicit rebuild
    assert mv.is_stale()
    assert mv.read(spark).count() == 10


def test_analyze_and_join_advice(spark, sf_dir, tmp_path):
    li = analyze(spark, os.path.join(sf_dir, "lineitem.parquet"),
                 "lineitem", ["l_orderkey", "l_returnflag"])
    na = analyze(spark, os.path.join(sf_dir, "nation.parquet"),
                 "nation", ["n_nationkey"])
    assert li.n_rows > 1000 and li.n_bytes > 0
    # default NDV is HLL++ (approx, 5% rsd) — within the ~10% the
    # join advisor needs, not bit-exact
    assert abs(na.columns["n_nationkey"]["ndv"] - 25) <= 3
    assert na.columns["n_nationkey"]["null_frac"] == 0.0
    assert abs(li.columns["l_returnflag"]["ndv"] - 3) <= 1
    # exact opt-in agrees to within the advertised 10% the advisor
    # needs (and exactly, on these cardinalities)
    na_exact = analyze(spark, os.path.join(sf_dir, "nation.parquet"),
                       "nation", ["n_nationkey"], exact_ndv=True)
    assert na_exact.columns["n_nationkey"]["ndv"] == 25

    # stats round-trip
    save_stats(li, str(tmp_path / "stats"))
    assert load_stats(str(tmp_path / "stats"), "lineitem") == li

    # tiny nation side -> broadcast it
    adv = advise_join(li, na, "l_orderkey", "n_nationkey")
    assert adv.strategy == "broadcast_right"
    # joining lineitem on returnflag (3 keys) must flag skew
    adv2 = advise_join(li, na, "l_returnflag", "n_nationkey",
                       broadcast_threshold=1)
    assert adv2.skew_warning and "l_returnflag" in adv2.skew_warning


def test_recommend_conf_scales_with_input():
    from cube_builder_spark.stats import recommend_conf
    small = recommend_conf(10 * 1024 * 1024, total_cores=32)
    # tiny input: floor at core count so every core has work
    assert small["spark.sql.shuffle.partitions"] == "32"
    big = recommend_conf(1 << 40, total_cores=32)        # 1 TB
    # 1 TB * 3x inflation / 128MB ≈ 24576 partitions
    assert int(big["spark.sql.shuffle.partitions"]) > 20000
    assert big["spark.sql.adaptive.enabled"] == "true"
