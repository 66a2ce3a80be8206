"""Bucketed cube store: co-located layout survives the session.

The property under test is the 100 TB one: after write_bucketed_cube,
aggregations and joins keyed on (a superset of) the bucket key run
with NO shuffle Exchange — the on-disk layout replaces the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cube_builder_spark.sinks.bucketed import (plan_has_exchange,
                                               read_bucketed,
                                               write_bucketed_cube)


@pytest.fixture()
def cube_df(spark):
    return spark.range(2000).select(
        (F.col("id") % 8).alias("tile_id"),
        (F.col("id") % 256).alias("pixel_id"),
        (F.col("id") % 4).cast("string").alias("band"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   (F.col("id") % 16).cast("int")).alias("date"),
        (F.col("id") * 37 % 10000).alias("value"))


def test_bucketed_roundtrip_and_agg_without_exchange(spark, cube_df, tmp_path):
    write_bucketed_cube(cube_df, "cube_b", str(tmp_path / "cube_b"),
                        n_buckets=8)
    back = read_bucketed(spark, "cube_b")
    assert back.count() == 2000
    # value fidelity
    assert (back.agg(F.sum("value")).first()[0]
            == cube_df.agg(F.sum("value")).first()[0])
    # groupBy on the bucket key: the bucketed scan IS the partitioning
    agg = back.groupBy("tile_id", "pixel_id").agg(F.sum("value"))
    assert not plan_has_exchange(agg), agg._jdf.queryExecution().executedPlan().toString()
    # superset key groupBy also elides (hash(tile,pixel) ⊆ clustering)
    agg2 = back.groupBy("tile_id", "pixel_id", "band").agg(F.max("value"))
    assert not plan_has_exchange(agg2)
    spark.sql("DROP TABLE IF EXISTS cube_b")


def test_bucketed_join_colocated(spark, cube_df, tmp_path):
    write_bucketed_cube(cube_df, "cube_x", str(tmp_path / "x"), n_buckets=8)
    write_bucketed_cube(cube_df.withColumn("value", F.col("value") + 1),
                        "cube_y", str(tmp_path / "y"), n_buckets=8)
    x = read_bucketed(spark, "cube_x")
    y = (read_bucketed(spark, "cube_y")
         .select("tile_id", "pixel_id",
                 F.col("band").alias("band_y"), F.col("date").alias("date_y"),
                 F.col("value").alias("value_y")))
    # cross-cube per-pixel join on EXACTLY the bucket key: Spark only
    # reuses the bucket layout for exact-key joins (a superset key
    # disables the bucketed scan — verified), which is why the bucket
    # key is the subset key (tile_id, pixel_id) and band/date are
    # payload
    joined = x.join(y, ["tile_id", "pixel_id"])
    # same bucketing both sides -> shuffle-free sort-merge join;
    # disable broadcast so the test exercises the bucket path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not plan_has_exchange(joined)
        # per-pixel stack match: |join| = sum over (tile,pixel) of n^2
        expected = (cube_df.groupBy("tile_id", "pixel_id").count()
                    .agg(F.sum(F.col("count") * F.col("count"))).first()[0])
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS cube_x")
    spark.sql("DROP TABLE IF EXISTS cube_y")


def test_bucketed_sort_prunes_rowgroups(spark, cube_df, tmp_path):
    """sortBy(band, date) gives parquet tight min/max on the band
    predicate; the filter must reach the scan as a pushed filter."""
    write_bucketed_cube(cube_df, "cube_s", str(tmp_path / "s"), n_buckets=8)
    scan = read_bucketed(spark, "cube_s").filter(F.col("band") == "2")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "band" in plan
    assert scan.count() == 500
    spark.sql("DROP TABLE IF EXISTS cube_s")
