"""Blend-family golden test: the reference's worked two-date example
(processing.py:549-581 docstring scenario, Fmask mask config), expected
values derived from the actual blend() algorithm semantics
(processing.py:764-902): first clear wins in efficacy order, fallback
to first valid, nodata otherwise; provenance follows the winner.

(Note: the reference docstring's printed matrices are illustrative and
internally inconsistent — e.g. the LCF "411" and the MED "402" — the
code paths are the ground truth these expectations encode.)
"""

from __future__ import annotations

from datetime import date

import pytest

from cube_builder_spark.operators.blend import (blend_lcf, blend_med,
                                                observation_counts,
                                                scene_efficacy)

FMASK_CLEAR = [0, 1]
FMASK_NOT_CLEAR = [2, 3, 4]
QUALITY_NODATA = 255
NODATA = -9999

Q10 = [0, 0, 2, 4, 0, 1, 1, 4, 0, 2, 2, 4]
V10 = [702, 876, 7000, 9000, 687, 444, 421, 9113, 1241, 1548, 2111, 1987]
Q15 = [0, 0, 255, 255, 0, 1, 1, 1, 0, 0, 0, 0]
V15 = [854, 756, 9800, 9454, 945, 400, 402, 422, 869, 975, 788, 799]


@pytest.fixture(scope="module")
def pixels(spark):
    rows = []
    for pid in range(12):
        rows.append((0, pid, date(2020, 1, 10), 10, Q10[pid], V10[pid], 0))
        rows.append((0, pid, date(2020, 1, 15), 15, Q15[pid], V15[pid], 1))
    return spark.createDataFrame(
        rows, "tile_id long, pixel_id long, date date, doy long, quality long, "
              "value long, source_idx long")


def test_scene_efficacy(pixels):
    eff = {r.date.isoformat(): r.efficacy
           for r in scene_efficacy(pixels, FMASK_CLEAR, FMASK_NOT_CLEAR).collect()}
    assert eff["2020-01-10"] == pytest.approx(100.0 * 6 / 12)
    assert eff["2020-01-15"] == pytest.approx(100.0 * 10 / 12)


def test_blend_lcf_golden(pixels):
    out = {r.pixel_id: r for r in blend_lcf(
        pixels, clear_values=FMASK_CLEAR, not_clear_values=FMASK_NOT_CLEAR,
        nodata=NODATA).collect()}
    # 15/1 has higher efficacy -> ordered first
    expected_value = [854, 756, 9800, 9454, 945, 400, 402, 422, 869, 975, 788, 799]
    expected_prov = [15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15]
    # pixels 2,3 are never clear -> first *valid* from the best scene
    expected_source = [1] * 12
    for pid in range(12):
        assert out[pid].lcf_value == expected_value[pid], f"pixel {pid}"
        assert out[pid].provenance == expected_prov[pid], f"pixel {pid}"
        assert out[pid].datasource == expected_source[pid], f"pixel {pid}"


def test_blend_lcf_fallback_to_worse_scene(spark):
    """A pixel not clear anywhere and nodata in the best scene falls
    back to the valid value of the worse scene (processing.py:836-877
    two-pass)."""
    rows = [
        (0, 0, date(2020, 1, 10), 10, 2, 7000, 0),   # cloudy but valid
        (0, 0, date(2020, 1, 15), 15, 2, NODATA, 1),  # best scene: nodata
        # make 15/1 the better scene via another clear pixel
        (0, 1, date(2020, 1, 10), 10, 2, 1, 0),
        (0, 1, date(2020, 1, 15), 15, 0, 2, 1),
    ]
    pixels = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, date date, doy long, quality long, "
              "value long, source_idx long")
    out = {r.pixel_id: r for r in blend_lcf(
        pixels, clear_values=FMASK_CLEAR, not_clear_values=FMASK_NOT_CLEAR,
        nodata=NODATA).collect()}
    assert out[0].lcf_value == 7000
    assert out[0].provenance == 10
    assert out[0].datasource == 0
    assert out[1].lcf_value == 2 and out[1].provenance == 15


def test_blend_med_golden(pixels):
    out = {r.pixel_id: r.med_value for r in blend_med(
        pixels, clear_values=FMASK_CLEAR, nodata=NODATA).collect()}
    assert out[0] == pytest.approx((702 + 854) / 2)   # 778 (docstring)
    assert out[1] == pytest.approx((876 + 756) / 2)   # 816
    assert out[2] == NODATA                           # never clear
    assert out[3] == NODATA
    assert out[4] == pytest.approx((687 + 945) / 2)   # 816
    assert out[5] == pytest.approx(422.0)
    assert out[6] == pytest.approx(411.5)
    assert out[11] == pytest.approx(799.0)


def test_observation_counts(pixels):
    out = {r.pixel_id: r for r in observation_counts(
        pixels, quality_nodata=QUALITY_NODATA, clear_values=FMASK_CLEAR).collect()}
    assert out[0].totalob == 2 and out[0].clearob == 2
    assert out[2].totalob == 1 and out[2].clearob == 0   # q=255 on 15/1
    assert out[3].totalob == 1 and out[3].clearob == 0
    assert out[5].totalob == 2 and out[5].clearob == 2


def test_blend_medoid_hand_computed(spark):
    """C26 medoid on a hand-worked 3-observation stack.

    One pixel, explicit band2, clear obs (b1, b2, doy):
      A = (0, 0, 1), B = (10, 0, 2), C = (12, 4, 3)
      sd(A) = (10+0) + (12+4) = 26
      sd(B) = (10+0) + (2+4)  = 16   <- medoid
      sd(C) = (12+4) + (2+4)  = 22
    Plus a cloudy obs (excluded) and a second pixel with NO clear obs
    (nodata fill) and a tie pixel (two identical obs -> earlier doy).
    """
    from pyspark.sql import functions as F

    from cube_builder_spark.operators.blend import blend_medoid

    rows = [
        # tile, pixel, doy, quality, value(b1), b2
        (0, 0, 1, 4, 0, 0),
        (0, 0, 2, 5, 10, 0),
        (0, 0, 3, 6, 12, 4),
        (0, 0, 4, 9, 999, 999),   # not clear: excluded
        (0, 1, 1, 2, 5, 5),       # pixel 1: never clear
        (0, 2, 1, 4, 7, 7),       # pixel 2: exact tie -> doy 1 wins
        (0, 2, 2, 4, 7, 7),
    ]
    px = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, doy long, quality long, "
              "value long, b2 long")
    out = {r.pixel_id: r for r in
           blend_medoid(px, band2=F.col("b2")).collect()}
    assert (out[0].medoid_value, out[0].medoid_doy, out[0].n_clear) == (10, 2, 3)
    assert (out[1].medoid_value, out[1].medoid_doy, out[1].n_clear) == (-9999, -1, 0)
    assert (out[2].medoid_value, out[2].medoid_doy, out[2].n_clear) == (7, 1, 2)
