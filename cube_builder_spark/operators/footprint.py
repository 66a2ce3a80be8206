"""C19 — footprint / extent of valid data per scene.

Reference: ``image.py:665-694`` (raster_convexhull: shapes of
valid-data mask -> shapely convex hull) and ``image.py:697-708``
(raster_extent: dataset bbox). The exact convex hull needs per-shape
geometry libs; the Spark-native equivalent is the block-level
valid-bbox aggregation the survey recommends (SURVEY §2.3 C19): one
groupBy with min/max of valid pixel coordinates — an envelope that
contains the hull, computed with zero Python and one shuffle at any
scale. The full hull (rasterio/shapely in ``applyInPandas``) slots in
behind the same output schema when those libs are present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pixelplane import valid_col


def valid_extent(px: DataFrame, ncols: int = 32) -> DataFrame:
    """Envelope of valid pixels per (tile_id, date): pixel_id unrolls
    row-major into a (y, x) grid of ``ncols`` columns. Emits the bbox,
    the valid count, and the WKT envelope polygon (built from integer
    coordinates so the string is engine-portable)."""
    x = (F.col("pixel_id") % ncols).alias("x")
    y = F.expr(f"pixel_id div {ncols}").alias("y")
    valid = px.filter(valid_col()).select("tile_id", "date", x, y)
    ext = valid.groupBy("tile_id", "date").agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        F.count(F.lit(1)).alias("n_valid"))
    wkt = F.concat(
        F.lit("POLYGON(("),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit("))"))
    return ext.select("tile_id", "date", "xmin", "xmax", "ymin", "ymax",
                      "n_valid", wkt.alias("extent_wkt"))
