"""K1 GeoTIFF sink: stdlib encoder roundtrip + Spark export fan-out."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cube_builder_spark.sinks.cog import (export_band_tiffs,
                                          read_geotiff_band,
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
