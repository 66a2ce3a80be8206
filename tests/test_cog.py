"""K1 GeoTIFF sink: stdlib encoder roundtrip + Spark export fan-out."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cube_builder_spark.sinks.cog import (export_band_tiffs, read_cog,
                                          read_geotiff_band, write_cog_band,
                                          write_geotiff_band)


def test_geotiff_roundtrip():
    arr = (np.arange(16 * 32, dtype=np.int32) % 20001 - 10000).astype(np.int16)
    arr = arr.reshape(16, 32)
    buf = write_geotiff_band(arr, pixel_size=(10.0, 10.0),
                             origin=(500000.0, 8000000.0), nodata=-9999)
    got = read_geotiff_band(buf)
    assert np.array_equal(got["array"], arr)
    assert got["pixel_size"] == (10.0, 10.0)
    assert got["origin"] == (500000.0, 8000000.0)
    assert got["nodata"] == -9999


def test_geotiff_uncompressed_roundtrip():
    arr = np.full((4, 8), 7, np.int16)
    got = read_geotiff_band(write_geotiff_band(arr, compress=False))
    assert np.array_equal(got["array"], arr)


def test_cog_roundtrip_and_pyramid():
    rng = np.random.default_rng(7)
    arr = rng.integers(-10000, 10000, size=(300, 520), dtype=np.int16)
    buf = write_cog_band(arr, tile=64, pixel_size=(10.0, 10.0),
                         origin=(500000.0, 8000000.0), nodata=-9999)
    got = read_cog(buf)
    assert np.array_equal(got["array"], arr)
    assert got["tile"] == 64
    assert got["pixel_size"] == (10.0, 10.0)
    assert got["origin"] == (500000.0, 8000000.0)
    assert got["nodata"] == -9999
    # pyramid: nearest 2x decimation until a level fits one tile
    want_levels = []
    lv = arr
    while min(lv.shape) > 64:
        lv = lv[::2, ::2]
        want_levels.append(lv)
    assert len(got["overviews"]) == len(want_levels) == 3
    for got_lv, want_lv in zip(got["overviews"], want_levels):
        assert np.array_equal(got_lv, want_lv)
    assert got["overview_subfile_types"] == [1, 1, 1]


def test_cog_layout_is_cloud_optimized():
    """IFDs lead the file; tile data runs smallest-overview -> full
    res, so header + overviews are one small range request."""
    arr = np.arange(256 * 256, dtype=np.int32).astype(np.int16).reshape(256, 256)
    got = read_cog(write_cog_band(arr, tile=64))
    assert got["ifds_lead_data"]
    assert got["overview_data_first"]
    assert len(got["overviews"]) == 2


def test_cog_single_tile_image():
    arr = np.full((40, 52), -3, np.int16)
    got = read_cog(write_cog_band(arr, tile=64))
    assert np.array_equal(got["array"], arr)
    assert got["overviews"] == []


def test_export_band_cogs(spark, tmp_path):
    rows = [(t, "2020-01-01_2020-01-08", "B04", p, (t * 100 + p) % 3000)
            for t in (0, 1) for p in range(64)]
    cube = spark.createDataFrame(
        rows, "tile_id long, period string, band string, pixel_id long, value long")
    out = str(tmp_path / "cogs")
    manifest = export_band_tiffs(cube, out, ncols=32, cog=True,
                                 cog_tile=16).collect()
    assert len(manifest) == 2
    m = {r.tile_id: r for r in manifest}
    got = read_cog(open(m[1].path, "rb").read())
    assert got["array"].shape == (2, 32)
    assert got["array"][0, 0] == 100
    assert got["origin"][0] == 1 * 32 * 30.0


def test_export_band_tiffs(spark, tmp_path):
    rows = [(t, "2020-01-01_2020-01-08", b, p, (t * 100 + p) % 3000)
            for t in (0, 1) for b in ("B04", "NDVI") for p in range(64)]
    cube = spark.createDataFrame(
        rows, "tile_id long, period string, band string, pixel_id long, value long")
    out = str(tmp_path / "tiffs")
    manifest = export_band_tiffs(cube, out, ncols=32).collect()
    assert len(manifest) == 4
    m = {(r.tile_id, r.band): r for r in manifest}
    buf = open(m[(1, "B04")].path, "rb").read()
    got = read_geotiff_band(buf)
    assert got["array"].shape == (2, 32)
    assert got["array"][0, 0] == 100          # pixel 0 of tile 1
    assert got["origin"][0] == 1 * 32 * 30.0  # tile offset georeferencing
