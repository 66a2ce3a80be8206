"""Block-array raster path — the production representation at scale.

The pixel-per-row plane (``pixelplane.py``) is the oracle-checkable
representation; at 100 TB a 512×512 block must travel as ONE row with an
``array<short>`` payload (262k pixels/row), exactly like the reference's
rasterio block windows (``processing.py:493,764``). This module is the
blend family (C2-C6) over that representation: ``applyInPandas`` over
(tile_id, block_id) groups running the same vectorized numpy kernel the
reference runs per window — Arrow moves the arrays, numpy does the
reduction, Spark partitions by block so each group is one task-local
stack.

Equivalence with the window implementation in ``blend.py`` is asserted
by tests/test_blocks.py on the same synthetic data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pixelplane import BAND_NODATA, CLEAR_VALUES

BLEND_BLOCK_SCHEMA = (
    "tile_id long, block_id long, lcf array<long>, provenance array<long>, "
    "datasource array<long>, med array<double>, clearob array<long>, totalob array<long>"
)


def blend_blocks(blocks: DataFrame, clear_values=None, nodata: int = BAND_NODATA,
                 quality_nodata: int = 0) -> DataFrame:
    """C2-C6 over block rows.

    ``blocks`` columns: tile_id, block_id, date, doy, efficacy,
    values/quality/sources array<long> — one row per (tile, block,
    date). Scene order inside each group: efficacy desc, date desc
    (processing.py:635-654).
    """
    clear_vals = np.array(clear_values or CLEAR_VALUES)

    def _blend(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["efficacy", "date"], ascending=[False, False])
        arr = np.stack(pdf["values"].to_numpy())          # (n_scenes, n_px)
        qual = np.stack(pdf["quality"].to_numpy())
        doys = pdf["doy"].to_numpy()
        sources = np.stack(pdf["sources"].to_numpy())
        npx = arr.shape[1]
        cols = np.arange(npx)

        clear = np.isin(qual, clear_vals)
        valid = arr != nodata
        has_clear = clear.any(axis=0)
        has_valid = valid.any(axis=0)
        first_clear = np.argmax(clear, axis=0)
        first_valid = np.argmax(valid, axis=0)
        pick = np.where(has_clear, first_clear, first_valid)
        won = has_clear | has_valid

        lcf = np.where(won, arr[pick, cols], nodata)
        prov = np.where(won, doys[pick], -1)
        dsrc = np.where(won, sources[pick, cols], 255)

        stack = np.ma.masked_where(~clear, arr)
        med = np.ma.median(stack, axis=0)
        med = np.where(has_clear, med.filled(float(nodata)), float(nodata))

        clearob = clear.sum(axis=0)
        totalob = (qual != quality_nodata).sum(axis=0)

        return pd.DataFrame({
            "tile_id": [int(pdf["tile_id"].iloc[0])],
            "block_id": [int(pdf["block_id"].iloc[0])],
            "lcf": [lcf.astype(np.int64)],
            "provenance": [prov.astype(np.int64)],
            "datasource": [dsrc.astype(np.int64)],
            "med": [med.astype(np.float64)],
            "clearob": [clearob.astype(np.int64)],
            "totalob": [totalob.astype(np.int64)],
        })

    return blocks.groupBy("tile_id", "block_id").applyInPandas(_blend, BLEND_BLOCK_SCHEMA)


def pixels_to_blocks(pixels: DataFrame, efficacy: DataFrame,
                     block_size: int = 256) -> DataFrame:
    """Pack the pixel-row plane into block rows (test bridge between the
    two representations; production data arrives already blocked from
    the raster reader). Pixels must be dense per (tile, block, date) —
    missing pixels are filled with (nodata, quality_nodata)."""
    px = (pixels.join(F.broadcast(efficacy.select("tile_id", "date", "efficacy")),
                      ["tile_id", "date"])
          .withColumn("block_id", F.expr(f"pixel_id div {block_size}"))
          .withColumn("slot", F.col("pixel_id") % block_size))
    # dense fill: cross the (tile, block, date) frame with all slots
    frame = (px.groupBy("tile_id", "block_id", "date")
             .agg(F.first("doy").alias("doy"), F.first("efficacy").alias("efficacy")))
    slots = px.sparkSession.range(block_size).select(F.col("id").alias("slot"))
    dense = (frame.crossJoin(F.broadcast(slots))
             .join(px.select("tile_id", "block_id", "date", "slot", "value",
                             "quality", "source_idx"),
                   ["tile_id", "block_id", "date", "slot"], "left")
             .withColumn("value", F.coalesce("value", F.lit(BAND_NODATA)))
             .withColumn("quality", F.coalesce("quality", F.lit(0)))
             .withColumn("source_idx", F.coalesce("source_idx", F.lit(255))))
    return (dense.groupBy("tile_id", "block_id", "date", "doy", "efficacy")
            .agg(F.array_sort(F.collect_list(
                F.struct("slot", "value", "quality", "source_idx"))).alias("z"))
            .select("tile_id", "block_id", "date", "doy", "efficacy",
                    F.col("z.value").alias("values"),
                    F.col("z.quality").alias("quality"),
                    F.col("z.source_idx").alias("sources")))


def blocks_to_pixels(blended: DataFrame, block_size: int = 256) -> DataFrame:
    """Unpack blend_blocks output back to pixel rows (for comparisons
    and pixel-level consumers)."""
    ex = blended.select(
        "tile_id", "block_id",
        F.posexplode(F.arrays_zip("lcf", "provenance", "datasource",
                                  "med", "clearob", "totalob")).alias("slot", "v"))
    return ex.select(
        "tile_id",
        (F.col("block_id") * block_size + F.col("slot")).alias("pixel_id"),
        F.col("v.lcf").alias("lcf_value"),
        F.col("v.provenance").alias("provenance"),
        F.col("v.datasource").alias("datasource"),
        F.col("v.med").alias("med_value"),
        F.col("v.clearob").alias("clearob"),
        F.col("v.totalob").alias("totalob"))
