"""C1 — Merge/mosaic: first-valid-pixel-wins across overlapping scenes.

Reference (``processing.py:329-367``): for one (tile, date, band) the
warped scenes are mosaicked in order; a pixel is written only where the
canvas is still nodata ("efetive_data_pixels"), and in combined-
collection mode the DATASOURCE provenance index records which dataset
supplied each pixel.

Spark shape: the per-pixel "canvas fill order" is a conditional
row_number over (tile, pixel, date) ordered by the scene priority; the
winner is the first valid observation. Single shuffle on the mosaic
key; no iteration over scenes.

(The geometric warp half of C1 — rasterio.warp.reproject — lives in
``sources/raster_reader.py`` as an executor-side pandas UDF; this
module is the mosaic reduction, which is where the data volume is.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pixelplane import BAND_NODATA, valid_col


def mosaic_first_valid(scenes: DataFrame, order_cols: list | None = None,
                       keys: tuple[str, ...] = ("tile_id", "pixel_id", "date")) -> DataFrame:
    """Reduce overlapping scene observations to one pixel per ``keys``
    slot (default (tile_id, pixel_id, date); add band for multi-band
    jobs): first valid wins, with DATASOURCE.

    ``scenes`` columns: ``keys`` + value, source_idx, scene_order
    (priority; lower = preferred).
    """
    if order_cols is None:
        order_cols = [F.col("scene_order").asc()]
    w = Window.partitionBy(*keys, "is_valid").orderBy(*order_cols)
    ranked = (scenes.withColumn("is_valid", valid_col())
              .withColumn("rn", F.row_number().over(w)))
    win = F.col("is_valid") & (F.col("rn") == 1)
    return (
        ranked.groupBy(*keys)
        .agg(F.max(F.when(win, F.col("value"))).alias("win_value"),
             F.max(F.when(win, F.col("source_idx"))).alias("win_source"),
             F.count(F.lit(1)).alias("n_scenes"))
        .select(
            *keys,
            F.coalesce("win_value", F.lit(BAND_NODATA)).alias("merge_value"),
            F.coalesce("win_source", F.lit(255)).cast("long").alias("datasource"),
            "n_scenes",
        )
    )


def empty_fill(expected: DataFrame, observed: DataFrame,
               keys: list[str], nodata: int = BAND_NODATA) -> DataFrame:
    """S11 — dense-timeline fill (maestro.py:550-564, image.py:147-192):
    synthesize an all-nodata observation for every expected
    (tile, period) with no scene, via left anti/outer join + coalesce —
    no file synthesis needed in the Spark-native design."""
    obs = observed.withColumn("observed", F.lit(True))
    return (
        expected.join(obs, keys, "left")
        .withColumn("observed", F.coalesce("observed", F.lit(False)))
        .withColumn("fill_value",
                    F.when(F.col("observed"), F.col("value")).otherwise(F.lit(nodata)))
    )
