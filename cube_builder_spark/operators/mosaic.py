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


# Packed-argmax bit budget (the hash-aggregable fast path): one signed
# 64-bit long carries [priority:19][value+2^31:33][source_idx:8] = 60
# bits. Domain contract of the ENGINE's pixel plane: integer pixel
# values fit int32 (the reference's rasters are uint8..int32 DNs;
# BAND_NODATA=-9999), DATASOURCE index < 256 (255 = nodata marker),
# and <2^19 scenes ever overlap one (tile, pixel, date) slot.
_PRI_BITS, _VAL_BITS, _SRC_BITS = 19, 33, 8
_VAL_BIAS = 1 << 31


def mosaic_first_valid(scenes: DataFrame, order_key=None,
                       keys: tuple[str, ...] = ("tile_id", "pixel_id", "date"),
                       priority=None) -> DataFrame:
    """Reduce overlapping scene observations to one pixel per ``keys``
    slot (default (tile_id, pixel_id, date); add band for multi-band
    jobs): first valid wins, with DATASOURCE.

    ``scenes`` columns: ``keys`` + value, source_idx, scene_order
    (priority; lower = preferred). One groupBy — no window, a single
    shuffle with map-side partial aggregation, like the reference's
    streaming canvas fill but associative.

    Two physical shapes for the argmax:

    - **Packed fast path** (default, and whenever ``priority`` — a
      LONG column, HIGHER = preferred, ∈ [0, 2^19) — is given): the
      (priority, value, source_idx) triple is bit-packed into one
      long, so the aggregate is ``max(long)`` and Spark plans a
      HashAggregate inside whole-stage codegen. The struct form plans
      a SortAggregate (struct buffers aren't hash-aggregable), which
      re-sorts every input partition — measured 3x slower on the
      standalone mosaic at sf0.1 (c1 1.36s → 0.45s min-of-3; the bare
      aggregate itself is ~10x) and strictly worse at scale, where the map-side
      sort is O(rows log rows) per task against the hash path's O(rows).
      Ties on ``priority`` break by highest value then highest
      source_idx — deterministic by construction (the packed compare
      IS lexicographic over the bit fields). Domain (pixel-plane
      contract, asserted at runtime): |value| < 2^31, 0 ≤ source_idx
      < 256.

    - **General struct path**: pass ``order_key`` (a MAX key struct,
      compared lexicographically) for orderings the bit budget can't
      express — float priorities, >int32 values. SortAggregate, same
      semantics, no domain constraint.
    """
    if order_key is not None:
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
                F.coalesce("w.p.source_idx", F.lit(255)).cast("long")
                 .alias("datasource"),
                "n_scenes",
            )
        )
    if priority is None:
        # lowest scene_order preferred → invert onto [0, 2^19)
        priority = F.lit((1 << _PRI_BITS) - 1) - F.col("scene_order")
    in_domain = (
        (priority >= 0) & (priority < (1 << _PRI_BITS))
        & (F.col("value") > -_VAL_BIAS) & (F.col("value") < _VAL_BIAS)
        & (F.col("source_idx") >= 0) & (F.col("source_idx") < (1 << _SRC_BITS)))
    packed = (
        priority.cast("long") * F.lit(1 << (_VAL_BITS + _SRC_BITS))
        + (F.col("value").cast("long") + F.lit(_VAL_BIAS)) * F.lit(1 << _SRC_BITS)
        + F.col("source_idx").cast("long"))
    # assert_true returns NULL when the predicate holds (and fails the
    # job with the message otherwise), so the when-chain both guards
    # the domain and keeps invalid observations out of the max
    win = F.when(
        valid_col() & in_domain.isNotNull() & in_domain, packed
    ).when(
        valid_col(),
        F.assert_true(F.lit(False), F.lit(
            "mosaic_first_valid packed-argmax domain violated "
            "(|value| >= 2^31, source_idx >= 256, priority >= 2^19, "
            "or a NULL priority/value/source_idx on a valid "
            "observation); pass order_key= for the general path")).cast("long"))
    w = F.col("w")
    return (
        scenes.groupBy(*keys)
        .agg(F.max(win).alias("w"), F.count(F.lit(1)).alias("n_scenes"))
        .select(
            *keys,
            F.coalesce(
                F.shiftrightunsigned(w, _SRC_BITS)
                 .bitwiseAND(F.lit((1 << _VAL_BITS) - 1)) - F.lit(_VAL_BIAS),
                F.lit(BAND_NODATA)).alias("merge_value"),
            F.coalesce(w.bitwiseAND(F.lit((1 << _SRC_BITS) - 1)),
                       F.lit(255)).cast("long").alias("datasource"),
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
