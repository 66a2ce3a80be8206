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


def test_local_plain_tar_member(tmp_path):
    """S9: plain .tar containers resolve members like .tar.gz."""
    sceneid = "LC08_L2SP_220064_20200101_20210101_02_T1"
    p = tmp_path / f"{sceneid}.tar"
    data = _tiff(21)
    with tarfile.open(p, "w") as tf:
        info = tarfile.TarInfo(f"{sceneid}_SR_B4.TIF")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    assert read_member_bytes(str(p), band="SR_B4", sceneid=sceneid) == data


def test_remote_plain_tar_member_is_ranged(tmp_path):
    """S9 remote half for UNCOMPRESSED tars: member headers walk over
    HTTP ranges and only the resolved member's data range transfers —
    a fat sibling member must never be fetched (the /vsitar//vsicurl
    pattern; .tar.gz still streams, DEFLATE has no random access)."""
    import http.server
    import re
    import threading

    sceneid = "LC08_L2SP_220064_20200101_20210101_02_T1"
    p = tmp_path / f"{sceneid}.tar"
    data = _tiff(22)
    filler = bytes(bytearray(range(256)) * 8192)        # 2 MB sibling
    with tarfile.open(p, "w") as tf:
        fi = tarfile.TarInfo(f"{sceneid}_BIG_ANC.dat")
        fi.size = len(filler)
        tf.addfile(fi, io.BytesIO(filler))
        info = tarfile.TarInfo(f"{sceneid}_SR_B4.TIF")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    served = {"bytes": 0}

    class _Range(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            path = self.translate_path(self.path)
            with open(path, "rb") as fh:
                body = fh.read()
            m = re.match(r"bytes=(\d+)-(\d*)$",
                         self.headers.get("Range", "") or "")
            if not m:
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                served["bytes"] += len(body)
                return
            lo = int(m.group(1))
            hi = int(m.group(2)) if m.group(2) else len(body) - 1
            hi = min(hi, len(body) - 1)
            chunk = body[lo:hi + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {lo}-{hi}/{len(body)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
            served["bytes"] += len(chunk)

    handler = lambda *a, **kw: _Range(*a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/{p.name}"
        got = read_member_bytes(url, band="SR_B4", sceneid=sceneid)
        assert got == data
        total = p.stat().st_size
        assert total > 2_000_000
        # header walk + one small member — the 2 MB filler never moves
        assert served["bytes"] < total - 1_900_000, served
    finally:
        srv.shutdown()
