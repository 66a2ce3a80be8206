"""S5/S7/S9 stdlib archive reading: zip, SAFE-style zip, Landsat tgz
members decoded through the stdlib GeoTIFF codec (no GDAL)."""

from __future__ import annotations

import io
import tarfile
import zipfile

import numpy as np
import pytest

from cube_builder_spark.sinks.cog import write_geotiff_band
from cube_builder_spark.sources.raster_reader import (open_raster,
                                                      probe_integrity,
                                                      read_member_bytes)


def _tiff(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(-100, 100, (4, 6), dtype=np.int16)
    return write_geotiff_band(arr, origin=(100.0, 200.0), nodata=-9999)


def test_zip_single_member_roundtrip(tmp_path):
    p = tmp_path / "scene.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("scene/B04.tif", _tiff(1))
    got = open_raster(str(p))
    assert got["array"].shape == (4, 6)
    assert got["origin"] == (100.0, 200.0)


def test_safe_zip_band_group_resolution(tmp_path):
    p = tmp_path / "S2A_MSIL2A_X.SAFE.zip"
    with zipfile.ZipFile(p, "w") as zf:
        # band present at two resolutions; the SAFE group (B04 -> 10m)
        # must pick R10m (sentinel2.py:77-111)
        zf.writestr("GRANULE/L2A/IMG_DATA/R10m/T23_B04_10m.tif", _tiff(2))
        zf.writestr("GRANULE/L2A/IMG_DATA/R20m/T23_B04_20m.tif", _tiff(3))
        zf.writestr("GRANULE/L2A/IMG_DATA/R20m/T23_SCL_20m.tif", _tiff(4))
    b04 = read_member_bytes(str(p), band="B04")
    ref = _tiff(2)
    assert b04 == ref
    scl = open_raster(str(p), band="SCL")
    assert scl["array"].shape == (4, 6)


def test_landsat_tgz_member_synthesis(tmp_path):
    p = tmp_path / "LC08_L2SP_220064_20200101_20210101_02_T1.tar.gz"
    sceneid = "LC08_L2SP_220064_20200101_20210101_02_T1"
    with tarfile.open(p, "w:gz") as tf:
        data = _tiff(5)
        info = tarfile.TarInfo(f"{sceneid}_SR_B4.TIF")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    # exact member synthesis
    got = open_raster(str(p), band="SR_B4", sceneid=sceneid)
    assert got["nodata"] == -9999
    # suffix fallback when sceneid unknown
    raw = read_member_bytes(str(p), band="SR_B4")
    assert raw == _tiff(5)


def test_jp2_member_located_but_codec_gated(tmp_path):
    p = tmp_path / "x.SAFE.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("R10m/T_B04_10m.jp2", b"\x00\x00\x00\x0cjP  \r\n\x87\n")
    with pytest.raises(NotImplementedError, match="JP2"):
        open_raster(str(p), band="B04")


def test_probe_deep_read_flags_corrupt_archive(tmp_path):
    good = tmp_path / "ok.zip"
    with zipfile.ZipFile(good, "w") as zf:
        zf.writestr("a/B04.tif", _tiff(6))
    assert probe_integrity(str(good), read_bytes=True) == (True, None)
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"PK\x03\x04 this is not really a zip")
    ok, err = probe_integrity(str(bad), read_bytes=True)
    assert not ok and err


def test_remote_tgz_member_over_http(tmp_path):
    """S9 remote half: the archive streams over HTTP into spooled
    scratch (gzip has no random access — GDAL's /vsitar//vsicurl also
    decompresses sequentially), then the member resolves exactly as in
    the local path."""
    import http.server
    import threading

    sceneid = "LC08_L2SP_220064_20200101_20210101_02_T1"
    p = tmp_path / f"{sceneid}.tar.gz"
    data = _tiff(11)
    with tarfile.open(p, "w:gz") as tf:
        info = tarfile.TarInfo(f"{sceneid}_SR_B5.TIF")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    class _Quiet(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

    handler = lambda *a, **kw: _Quiet(*a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/{p.name}"
        got = read_member_bytes(url, band="SR_B5", sceneid=sceneid)
        assert got == data
        # suffix fallback without a sceneid, same remote path
        assert read_member_bytes(url, band="SR_B5") == data
    finally:
        srv.shutdown()
