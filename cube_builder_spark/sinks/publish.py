"""K4/K5 — catalog publish: Item rows for composed / identity products.

Reference (``processing.py:1038-1271``): after blend, an Item row per
(cube, tile, period) records the item id
``'{CUBE}_V{version}_{tile}_{yyyymmdd}'``, asset paths, bbox/footprint,
and cloud cover. Spark-native: append rows to the ``items`` table; bbox
comes from the tile rectangle columns, cloud_cover from the quality
aggregation (C11) — no file moves, the cube lives in Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_id(cube: str, version: int, tile_col, date_str: str):
    """'{CUBE}_V{version:03d}_{tile:03d}_{yyyymmdd}' (build_cube_path /
    publish_datacube naming, processing.py:1082-1143)."""
    return F.concat(
        F.lit(f"{cube}_V{version:03d}_"),
        F.format_string("%03d", tile_col.cast("int")),
        F.lit(f"_{date_str}"))


def publish_items(quality_stats: DataFrame, cube: str, version: int,
                  period_start: str, period_end: str) -> DataFrame:
    """Build items rows for one period from per-tile quality stats
    (columns: tile_id, clear_pixels, not_clear_pixels)."""
    ymd = period_start.replace("-", "")
    return quality_stats.select(
        item_id(cube, version, F.col("tile_id"), ymd).alias("item_id"),
        "tile_id",
        F.lit(f"{period_start}_{period_end}").alias("period"),
        F.lit(period_start).cast("date").alias("start_date"),
        F.lit(period_end).cast("date").alias("end_date"),
        (F.col("not_clear_pixels") * 100.0
         / F.nullif(F.col("clear_pixels") + F.col("not_clear_pixels"), F.lit(0))
         ).alias("cloud_cover"),
    )


def write_cube(df: DataFrame, path: str, partition_cols: list[str] = ("tile_id",)):
    """The cube store: Parquet partitioned by the work-unit key so
    tile/period predicates become partition pruning at any scale."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
