"""Block-array blend path must agree exactly with the window (pixel-row)
implementation on the same synthetic plane — proving the production
representation and the oracle representation compute the same cube."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.operators import blend
from cube_builder_spark.operators.blocks import (blend_blocks,
                                                 blocks_to_pixels,
                                                 pixels_to_blocks)
from cube_builder_spark.pixelplane import pixel_plane


@pytest.fixture(scope="module")
def plane(spark, sf_dir):
    return pixel_plane(spark, sf_dir).cache()


def test_block_blend_equals_window_blend(spark, plane):
    eff = blend.scene_efficacy(plane)
    blocks = pixels_to_blocks(plane, eff, block_size=64)
    block_out = blocks_to_pixels(blend_blocks(blocks), block_size=64)

    lcf = blend.blend_lcf(plane)
    med = blend.blend_med(plane)
    counts = blend.observation_counts(plane)
    expected = (lcf.join(med, ["tile_id", "pixel_id"])
                .join(counts, ["tile_id", "pixel_id"]))

    joined = (expected.alias("w").join(
        block_out.alias("b"), ["tile_id", "pixel_id"], "inner"))
    n_expected = expected.count()
    assert joined.count() == n_expected

    mismatches = joined.filter(
        (F.col("w.lcf_value") != F.col("b.lcf_value"))
        | (F.col("w.provenance") != F.col("b.provenance"))
        | (F.col("w.datasource") != F.col("b.datasource"))
        | (F.abs(F.col("w.med_value") - F.col("b.med_value")) > 1e-9)
        | (F.col("w.clearob") != F.col("b.clearob"))
        | (F.col("w.totalob") != F.col("b.totalob")))
    bad = mismatches.limit(5).collect()
    assert not bad, f"block vs window mismatch: {bad}"


def test_block_blend_dense_fill_pixels_stay_nodata(spark, plane):
    """Pixels with no observation at all must come out nodata/-1/255."""
    eff = blend.scene_efficacy(plane)
    blocks = pixels_to_blocks(plane, eff, block_size=64)
    out = blocks_to_pixels(blend_blocks(blocks), block_size=64)
    observed = plane.select("tile_id", "pixel_id").distinct()
    ghost = out.join(observed, ["tile_id", "pixel_id"], "left_anti")
    bad = ghost.filter((F.col("lcf_value") != -9999)
                       | (F.col("provenance") != -1)
                       | (F.col("clearob") != 0)).limit(5).collect()
    assert not bad, f"ghost pixels got data: {bad}"
