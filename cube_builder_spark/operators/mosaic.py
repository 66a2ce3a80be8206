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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pixelplane import BAND_NODATA, valid_col


def mosaic_first_valid(scenes: DataFrame, order_key=None,
                       keys: tuple[str, ...] = ("tile_id", "pixel_id", "date")) -> DataFrame:
    """Reduce overlapping scene observations to one pixel per ``keys``
    slot (default (tile_id, pixel_id, date); add band for multi-band
    jobs): first valid wins, with DATASOURCE.

    ``scenes`` columns: ``keys`` + value, source_idx, scene_order
    (priority; lower = preferred). ``order_key`` is a MAX key (struct
    compared lexicographically); default prefers the lowest
    scene_order. One groupBy — no window, a single shuffle with
    map-side partial aggregation, like the reference's streaming
    canvas fill but associative.
    """
    if order_key is None:
        order_key = F.struct((-F.col("scene_order")).alias("k1"))
    win = F.when(valid_col(), F.struct(
        order_key.alias("k"),
        F.struct(F.col("value").alias("value"),
                 F.col("source_idx").alias("source_idx")).alias("p")))
    return (
        scenes.groupBy(*keys)
        .agg(F.max(win).alias("w"), F.count(F.lit(1)).alias("n_scenes"))
        .select(
            *keys,
            F.coalesce("w.p.value", F.lit(BAND_NODATA)).alias("merge_value"),
            F.coalesce("w.p.source_idx", F.lit(255)).cast("long").alias("datasource"),
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
