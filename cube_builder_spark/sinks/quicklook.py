"""K2/K3 — quicklook PNG + full-res RGB composite.

Reference: ``processing.py:1291-1324`` (generate_quick_look: stack 3
bands, linear-rescale to 0–255, write PNG) and ``processing.py:970-989``
(generate_rgb: same at native resolution into a 3-band GeoTIFF).

Spark-native: the rescale is the C13 column expression; the PNG
encode is an ``applyInPandas`` over (tile, period) groups emitting one
image per group. The encoder is pure stdlib (zlib + struct — PNG is
just zlib-compressed filtered scanlines), so this sink is REAL, not a
stub, with zero native dependencies. GeoTIFF/COG export (K1) is the
equally dependency-free ``write_cog_band`` (``sinks/cog.py``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rescale import linear_scale


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png_rgb(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB PNG (stdlib only)."""
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))  # filter 0
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def decode_png_rgb(png: bytes) -> np.ndarray:
    """Minimal decoder for PNGs produced by encode_png_rgb (filter 0
    only) — used by tests to verify a true roundtrip."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", 0
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2), "not encode_png_rgb output"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = [np.frombuffer(raw[i * stride + 1:(i + 1) * stride], np.uint8)
            for i in range(len(raw) // stride)]
    return np.stack(rows).reshape(len(rows), w, 3)


def rgb_scaled(wide: DataFrame, r: str, g: str, b: str,
               input_range=(0.0, 10000.0), nodata: int = -9999) -> DataFrame:
    """K3/C13: per-pixel 0–255 channel values (linear scale with clip;
    nodata maps to 0 = transparent black, processing.py:1310-1316)."""
    def chan(c):
        return (F.when(F.col(c) == nodata, F.lit(0))
                .otherwise(linear_scale(F.col(c), input_range).cast("int")))
    return wide.select(
        "tile_id", "period", "pixel_id",
        chan(r).alias("r8"), chan(g).alias("g8"), chan(b).alias("b8"))


def quicklook_png(scaled: DataFrame, ncols: int = 32) -> DataFrame:
    """K2: one PNG per (tile, period) from the scaled channel rows.
    pixel_id unrolls row-major into an (h, ncols) image."""
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pixel_id")
        n = int(pdf["pixel_id"].max()) + 1
        h = (n + ncols - 1) // ncols
        img = np.zeros((h * ncols, 3), np.uint8)
        idx = pdf["pixel_id"].to_numpy()
        img[idx, 0] = pdf["r8"].to_numpy(np.uint8)
        img[idx, 1] = pdf["g8"].to_numpy(np.uint8)
        img[idx, 2] = pdf["b8"].to_numpy(np.uint8)
        png = encode_png_rgb(img.reshape(h, ncols, 3))
        return pd.DataFrame([{
            "tile_id": pdf["tile_id"].iloc[0], "period": pdf["period"].iloc[0],
            "width": ncols, "height": h, "png": png}])

    return (scaled.groupBy("tile_id", "period").applyInPandas(
        build, "tile_id long, period string, width int, height int, png binary"))
