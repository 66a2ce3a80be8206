"""C15 histogram matching vs the numpy reference algorithm
(skimage match_histograms' _match_cumulative_cdf: unique+counts →
quantiles → np.interp)."""

from __future__ import annotations

import numpy as np
import pytest

from cube_builder_spark.operators.histogram import (apply_histogram_match,
                                                    histogram_match)


def numpy_match(src: np.ndarray, ref: np.ndarray) -> dict[int, float]:
    s_vals, s_counts = np.unique(src, return_counts=True)
    r_vals, r_counts = np.unique(ref, return_counts=True)
    s_q = np.cumsum(s_counts) / src.size
    r_q = np.cumsum(r_counts) / ref.size
    mapped = np.interp(s_q, r_q, r_vals.astype(float))
    return dict(zip(s_vals.tolist(), mapped.tolist()))


@pytest.mark.parametrize("seed", [1, 7])
def test_histogram_match_equals_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 50, 400)
    ref = rng.integers(20, 90, 400)
    rows = [(0, i, int(s), int(r)) for i, (s, r) in enumerate(zip(src, ref))]
    df = spark.createDataFrame(rows, "tile_id long, pixel_id long, sv long, rv long")
    from pyspark.sql import functions as F
    out = histogram_match(
        df.select("tile_id", "pixel_id", F.col("sv").alias("value")),
        df.select("tile_id", "pixel_id", F.col("rv").alias("value")),
        keys=["tile_id"])
    got = {r.src_value: r.matched for r in out.collect()}
    expected = numpy_match(src, ref)
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=1e-9), f"value {v}"


def test_apply_histogram_match_roundtrip(spark):
    from pyspark.sql import functions as F
    src = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 20), (0, 2, 10)],
        "tile_id long, pixel_id long, value long")
    ref = spark.createDataFrame(
        [(0, 0, 100), (0, 1, 200), (0, 2, 100)],
        "tile_id long, pixel_id long, value long")
    mapping = histogram_match(src, ref, keys=["tile_id"])
    out = apply_histogram_match(src, mapping, keys=["tile_id"]).collect()
    by_pixel = {r.pixel_id: r.matched for r in out}
    # identical shapes: 10 (q=2/3) -> 100, 20 (q=1) -> 200
    assert by_pixel[0] == pytest.approx(100.0)
    assert by_pixel[1] == pytest.approx(200.0)
    assert by_pixel[2] == pytest.approx(100.0)
