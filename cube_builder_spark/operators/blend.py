"""Temporal compositing — the blend family (C2–C6, C11, C16).

Reference semantics (``cube_builder/utils/processing.py:541-967``):
scenes of a (tile, period) are ordered by ``100*efficacy/resolution``
descending; per pixel the first *clear* observation wins; pixels never
clear fall back to the first *valid* (non-nodata, possibly cloudy)
observation; never-valid pixels stay nodata. PROVENANCE carries the
day-of-year of whichever observation won, DATASOURCE its source index.
MED is the masked median of clear observations (``processing.py:890-894``),
TOTALOB counts non-nodata quality observations (``processing.py:826-833``),
CLEAROB counts clear observations (``processing.py:896-899``).

Spark-first shape: one broadcast join of per-scene efficacy (tiny:
tiles × dates) + one shuffle partitioned by (tile_id, pixel_id) where
two conditional ``row_number`` windows pick the winning observation,
then a single partial-aggregated groupBy. No per-pixel Python; entire
plan is Catalyst/whole-stage-codegen. At 100 TB the shuffle key is the
pixel-block key, matching the reference's per-block fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pixelplane import (BAND_NODATA, CLEAR_VALUES, NOT_CLEAR_VALUES,
                          clear_col, valid_col)


def scene_efficacy(pixels: DataFrame, clear_values=None, not_clear_values=None) -> DataFrame:
    """C11 (_qa_statistics, processing.py:1386-1448): per-scene clear /
    not-clear ratios. efficacy = 100*clear/total (over all pixels);
    cloud_ratio = 100*not_clear/(clear+not_clear) (image area excludes
    nodata). Unrounded doubles: int/int division is bit-identical in
    any engine, while round(x, 2) is not oracle-stable."""
    clear = F.col("quality").isin(*(clear_values or CLEAR_VALUES))
    not_clear = F.col("quality").isin(*(not_clear_values or NOT_CLEAR_VALUES))
    return (
        pixels.groupBy("tile_id", "date")
        .agg(
            F.count(F.lit(1)).alias("total_pixels"),
            F.sum(clear.cast("long")).alias("clear_pixels"),
            F.sum(not_clear.cast("long")).alias("not_clear_pixels"),
        )
        .select(
            "tile_id", "date", "total_pixels", "clear_pixels", "not_clear_pixels",
            (F.col("clear_pixels") * 100.0 / F.col("total_pixels")).alias("efficacy"),
            (F.col("not_clear_pixels") * 100.0
             / F.nullif(F.col("clear_pixels") + F.col("not_clear_pixels"), F.lit(0))
             ).alias("cloud_ratio"),
        )
    )


def _ranked(pixels: DataFrame, order_cols: list, clear_values=None,
            nodata: int = BAND_NODATA,
            keys: tuple[str, ...] = ("tile_id", "pixel_id")) -> DataFrame:
    """Attach first-clear / first-valid pick flags via conditional
    row_number windows (partitioned by pixel × predicate). ``keys`` is
    the composite work-unit key — (tile, pixel) for one period, plus
    period/band columns when one job blends a whole cube."""
    pix = (pixels
           .withColumn("is_clear", F.col("quality").isin(*(clear_values or CLEAR_VALUES)))
           .withColumn("is_valid", F.col("value") != nodata))
    w_clear = Window.partitionBy(*keys, "is_clear").orderBy(*order_cols)
    w_valid = Window.partitionBy(*keys, "is_valid").orderBy(*order_cols)
    return (pix
            .withColumn("rn_clear", F.row_number().over(w_clear))
            .withColumn("rn_valid", F.row_number().over(w_valid)))


def _first(cond, col):
    return F.max(F.when(cond, F.col(col)))


def blend_lcf(pixels: DataFrame, efficacy: DataFrame | None = None,
              order_cols: list | None = None, clear_values=None,
              not_clear_values=None, nodata: int = BAND_NODATA,
              keys: tuple[str, ...] = ("tile_id", "pixel_id")) -> DataFrame:
    """C2 + C6: LCF best-pixel composite with PROVENANCE and DATASOURCE.

    ``order_cols`` overrides the scene ordering (C16 temporal priority,
    timeline.py:208-249, plugs in here). Default: efficacy desc then
    date desc — the reference's ``sorted(mask_tuples, reverse=True)``
    on (efficacy, date-key) tuples (processing.py:654).
    """
    if order_cols is None:
        if efficacy is None:
            efficacy = scene_efficacy(pixels, clear_values, not_clear_values)
        pixels = pixels.join(
            F.broadcast(efficacy.select("tile_id", "date", "efficacy")),
            ["tile_id", "date"])
        order_cols = [F.desc("efficacy"), F.desc("date")]
    ranked = _ranked(pixels, order_cols, clear_values, nodata, keys)
    first_clear = F.col("is_clear") & (F.col("rn_clear") == 1)
    first_valid = F.col("is_valid") & (F.col("rn_valid") == 1)
    return (
        ranked.groupBy(*keys)
        .agg(
            _first(first_clear, "value").alias("clear_value"),
            _first(first_clear, "doy").alias("clear_doy"),
            _first(first_clear, "source_idx").alias("clear_source"),
            _first(first_valid, "value").alias("valid_value"),
            _first(first_valid, "doy").alias("valid_doy"),
            _first(first_valid, "source_idx").alias("valid_source"),
        )
        .select(
            *keys,
            F.coalesce("clear_value", "valid_value", F.lit(nodata)).alias("lcf_value"),
            F.coalesce("clear_doy", "valid_doy", F.lit(-1)).cast("long").alias("provenance"),
            F.coalesce("clear_source", "valid_source", F.lit(255)).cast("long").alias("datasource"),
        )
    )


def blend_med(pixels: DataFrame, clear_values=None,
              nodata: int = BAND_NODATA,
              keys: tuple[str, ...] = ("tile_id", "pixel_id")) -> DataFrame:
    """C3: exact median of clear observations; nodata when none clear
    (processing.py:890-894 numpy.ma.median semantics). F.median is the
    exact interpolating median (matches numpy/DuckDB), NOT
    percentile_approx."""
    return (
        pixels.groupBy(*keys)
        .agg(F.median(F.when(F.col("quality").isin(*(clear_values or CLEAR_VALUES)),
                             F.col("value")).cast("double")).alias("med_raw"))
        .select(*keys,
                F.coalesce(F.col("med_raw"), F.lit(float(nodata))).alias("med_value"))
    )


def observation_counts(pixels: DataFrame, quality_nodata: int = 0,
                       clear_values=None,
                       keys: tuple[str, ...] = ("tile_id", "pixel_id")) -> DataFrame:
    """C4 TOTALOB + C5 CLEAROB in one grouped pass."""
    return (
        pixels.groupBy(*keys)
        .agg(
            F.sum((F.col("quality") != quality_nodata).cast("long")).alias("totalob"),
            F.sum(F.col("quality").isin(*(clear_values or CLEAR_VALUES))
                  .cast("long")).alias("clearob"),
        )
    )


def blend_all(pixels: DataFrame, efficacy: DataFrame | None = None,
              order_cols: list | None = None, clear_values=None,
              not_clear_values=None, nodata: int = BAND_NODATA,
              keys: tuple[str, ...] = ("tile_id", "pixel_id")) -> DataFrame:
    """C2–C6 in ONE grouped pass: LCF picks (value/provenance/
    datasource), exact MED, TOTALOB and CLEAROB all come out of the
    same (keys)-partitioned aggregation — one shuffle for the whole
    blend family instead of three aggregations stitched with joins.
    This is the production shape: at scale the joins would re-shuffle
    cube-sized intermediates for no reason."""
    if order_cols is None:
        if efficacy is None:
            efficacy = scene_efficacy(pixels, clear_values, not_clear_values)
        pixels = pixels.join(
            F.broadcast(efficacy.select("tile_id", "date", "efficacy")),
            ["tile_id", "date"])
        order_cols = [F.desc("efficacy"), F.desc("date")]
    ranked = _ranked(pixels, order_cols, clear_values, nodata, keys)
    first_clear = F.col("is_clear") & (F.col("rn_clear") == 1)
    first_valid = F.col("is_valid") & (F.col("rn_valid") == 1)
    clear = F.col("quality").isin(*(clear_values or CLEAR_VALUES))
    return (
        ranked.groupBy(*keys)
        .agg(
            _first(first_clear, "value").alias("clear_value"),
            _first(first_clear, "doy").alias("clear_doy"),
            _first(first_clear, "source_idx").alias("clear_source"),
            _first(first_valid, "value").alias("valid_value"),
            _first(first_valid, "doy").alias("valid_doy"),
            _first(first_valid, "source_idx").alias("valid_source"),
            F.median(F.when(clear, F.col("value")).cast("double")).alias("med_raw"),
            F.sum((F.col("quality") != 0).cast("long")).alias("totalob"),
            F.sum(clear.cast("long")).alias("clearob"),
        )
        .select(
            *keys,
            F.coalesce("clear_value", "valid_value", F.lit(nodata)).alias("lcf_value"),
            F.coalesce("clear_doy", "valid_doy", F.lit(-1)).cast("long").alias("provenance"),
            F.coalesce("clear_source", "valid_source", F.lit(255)).cast("long").alias("datasource"),
            F.coalesce(F.col("med_raw"), F.lit(float(nodata))).alias("med_value"),
            "totalob", "clearob",
        )
    )


def temporal_priority_order(ref_doy: int) -> list:
    """C16: nearest-to-reference-day-first ordering
    (timeline.py:208-249); ties resolved to the earlier date, matching
    Python min() taking the first of equals on the sorted timeline."""
    return [F.abs(F.col("doy") - F.lit(ref_doy)).asc(), F.col("date").asc()]
