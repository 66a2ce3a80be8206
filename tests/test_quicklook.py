"""K2/K3 quicklook sink: real PNG bytes, verified by roundtrip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cube_builder_spark.sinks.quicklook import (decode_png_rgb, encode_png_rgb,
                                                quicklook_png, rgb_scaled)


def test_png_encoder_roundtrip():
    rgb = (np.arange(16 * 32 * 3, dtype=np.int64) % 256).astype(np.uint8)
    rgb = rgb.reshape(16, 32, 3)
    png = encode_png_rgb(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(decode_png_rgb(png), rgb)


def test_quicklook_pngs_encode_scaled_channels(spark):
    rows = [(1, "p1", pid, v, 10000 - v, (v * 3) % 10001)
            for pid, v in [(0, 0), (1, 2500), (2, 5000), (3, 10000),
                           (31, 7500), (32, 1234)]]
    rows.append((1, "p1", 63, -9999, -9999, -9999))  # nodata pixel
    wide = spark.createDataFrame(
        rows, "tile_id long, period string, pixel_id long, B04 long, B03 long, B02 long")
    scaled = rgb_scaled(wide, "B04", "B03", "B02")
    out = quicklook_png(scaled, ncols=32).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (32, 2)
    img = decode_png_rgb(bytes(r.png))
    assert img.shape == (2, 32, 3)
    # pixel 3 = (row 0, col 3): B04=10000 -> 255
    assert img[0, 3, 0] == 255
    # pixel 0: B04=0 -> 0, B03=10000 -> 255
    assert (img[0, 0, 0], img[0, 0, 1]) == (0, 255)
    # nodata pixel 63 -> transparent black (0,0,0)
    assert tuple(img[1, 31]) == (0, 0, 0)
    # unset grid slots default to 0
    assert tuple(img[1, 1]) == (0, 0, 0)
    # truncation semantics: 2500/10000*255 = 63.75 -> 63
    assert img[0, 1, 0] == 63


def test_qa_cirrus_only_for_oli(spark):
    """C8 provenance conditional: same QA word, different datasource."""
    from cube_builder_spark.operators.masking import (
        MEDIUM, qa_pixel_clear_with_provenance)
    qa_clear_with_cirrus = (1 << 6) | (2 << 14)   # clear bit set, cirrus HIGH-ish
    rows = [(qa_clear_with_cirrus, 0), (qa_clear_with_cirrus, 2)]
    df = spark.createDataFrame(rows, "qa long, datasource long")
    clear = qa_pixel_clear_with_provenance(
        F.col("qa"), F.col("datasource"), oli_sources=[0, 1],
        clear_bits=[6, 7], not_clear_bits=[1, 2, 3, 4], nodata=1,
        cloud_conf_min=MEDIUM, shadow_conf_min=MEDIUM, cirrus_conf_min=MEDIUM)
    got = {r.datasource: r.c for r in
           df.select("datasource", clear.alias("c")).collect()}
    assert got[0] is False   # OLI: cirrus rule fires
    assert got[2] is True    # non-OLI: cirrus field ignored
