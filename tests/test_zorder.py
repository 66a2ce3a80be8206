"""Z-order layout: interleave correctness, partition-range
disjointness (the tight-file-stats property), pruning power."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.functions import zorder
from cube_builder_spark.tables import load_tables


def _interleave_py(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y",
                     zorder.z_value(F.col("x"), F.col("y")).alias("z")
                     ).collect()
    for r in rows:
        assert r.z == _interleave_py(r.x, r.y)


def test_layout_partitions_cover_disjoint_z_ranges(spark, sf_dir):
    """Each output partition must own a contiguous, non-overlapping
    z-range — that is what makes per-file min/max stats tight after a
    z-ordered write."""
    t = load_tables(spark, sf_dir, ["orders"])
    pts = t["orders"].select(
        (F.col("o_orderkey") % 1024).alias("x"),
        ((F.col("o_orderkey") * 7919) % 1024).alias("y"))
    laid = zorder.layout(pts, "x", "y", bits=10, npartitions=8)
    ranges = (laid
              .withColumn("z", zorder.z_value(F.col("x"), F.col("y")))
              .withColumn("pid", F.spark_partition_id())
              .groupBy("pid")
              .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
              .orderBy("lo")
              .collect())
    assert len(ranges) >= 2
    for a, b in zip(ranges, ranges[1:]):
        assert a.hi <= b.lo  # disjoint, ordered ranges


def test_bbox_pruning_skips_most_cells(spark, sf_dir):
    """A small bbox over z-ordered cells must scan a minority of
    cells — the whole point of the layout."""
    from cube_builder_spark.relational import REGISTRY
    fn = {n: f for n, f, _ in REGISTRY}["x_zorder_bbox_prune"]
    r = fn(spark, sf_dir).collect()[0]
    assert r.rows_matched <= r.rows_scanned <= r.rows_total
    assert r.n_scanned_cells < r.n_cells
