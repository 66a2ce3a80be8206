"""C19 — footprint / extent / convex hull of valid data per scene.

Reference: ``image.py:665-694`` (raster_convexhull: shapes of
valid-data mask -> shapely convex hull) and ``image.py:697-708``
(raster_extent: dataset bbox). No geometry libs needed: a convex-hull
vertex of a pixel set is always the min-x or max-x pixel of its row
(any pixel strictly between them sits on the segment joining them, so
it cannot be extreme). That makes the scale shape a pure JVM
reduction: ``groupBy(scene, y).agg(min(x), max(x))`` shrinks each
scene from millions of pixels to <= 2 candidates per raster row
map-side, and only those candidates reach the tiny per-scene
``applyInPandas`` monotone chain. At 100 TB the full pixel plane
never leaves the scan stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pixelplane import valid_col


def valid_extent(px: DataFrame, ncols: int = 32) -> DataFrame:
    """Envelope of valid pixels per (tile_id, date): pixel_id unrolls
    row-major into a (y, x) grid of ``ncols`` columns. Emits the bbox,
    the valid count, and the WKT envelope polygon (built from integer
    coordinates so the string is engine-portable)."""
    x = (F.col("pixel_id") % ncols).alias("x")
    y = F.expr(f"pixel_id div {ncols}").alias("y")
    valid = px.filter(valid_col()).select("tile_id", "date", x, y)
    ext = valid.groupBy("tile_id", "date").agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        F.count(F.lit(1)).alias("n_valid"))
    wkt = F.concat(
        F.lit("POLYGON(("),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymin"), F.lit(", "),
        F.col("xmax"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymax"), F.lit(", "),
        F.col("xmin"), F.lit(" "), F.col("ymin"), F.lit("))"))
    return ext.select("tile_id", "date", "xmin", "xmax", "ymin", "ymax",
                      "n_valid", wkt.alias("extent_wkt"))


def monotone_chain_strict(pts: np.ndarray) -> list[tuple[int, int]]:
    """Andrew's monotone chain over integer points, keeping only STRICT
    corners (collinear edge-interior points are dropped). Input must be
    unique and lexicographically sorted; output is CCW starting at the
    lexicographically smallest vertex. Degenerate sets (all collinear)
    yield the two segment endpoints; a single point yields itself."""
    pts = [tuple(int(v) for v in p) for p in pts]
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(ps):
        h: list[tuple[int, int]] = []
        for p in ps:
            while len(h) >= 2 and cross(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(p)
        return h

    lower, upper = half(pts), half(pts[::-1])
    return lower[:-1] + upper[:-1]


_FOOTPRINT_SCHEMA = ("part string, tile_id bigint, date date, seq bigint, "
                     "x bigint, y bigint, n_vertices bigint, area2 bigint, "
                     "n_valid bigint")


def _footprint_rows(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    tile_id, date = key
    ys = pdf["y"].to_numpy(np.int64)
    xmins = pdf["xmin"].to_numpy(np.int64)
    xmaxs = pdf["xmax"].to_numpy(np.int64)
    n_valid = int(pdf["nrow"].sum())
    xmin, xmax = int(xmins.min()), int(xmaxs.max())
    ymin, ymax = int(ys.min()), int(ys.max())
    rows = []
    corners = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    ext_area2 = 2 * (xmax - xmin) * (ymax - ymin)
    for i, (ex, ey) in enumerate(corners):
        rows.append(("extent", tile_id, date, i, ex, ey, 4, ext_area2, n_valid))
    # np.unique(axis=0) both dedups and lex-sorts the candidate points
    pts = np.unique(np.concatenate([np.stack([xmins, ys], axis=1),
                                    np.stack([xmaxs, ys], axis=1)]), axis=0)
    hull = monotone_chain_strict(pts)
    area2 = abs(sum(hx * ny - nx * hy
                    for (hx, hy), (nx, ny) in zip(hull, hull[1:] + hull[:1])))
    for i, (hx, hy) in enumerate(hull):
        rows.append(("hull", tile_id, date, i, hx, hy, len(hull), area2, n_valid))
    return pd.DataFrame(rows, columns=["part", "tile_id", "date", "seq", "x",
                                       "y", "n_vertices", "area2", "n_valid"])


def footprint_suite(px: DataFrame, ncols: int = 32) -> DataFrame:
    """C19 full footprint: per (tile_id, date) emit the valid-data
    envelope as 4 CCW corner rows (part='extent') AND the exact strict
    convex hull of valid pixel centers as CCW vertex rows from the
    lex-min vertex (part='hull'), each with twice-the-shoelace-area
    (integer-exact) and the valid-pixel count.

    Scale shape: one map-side-combined groupBy(scene, y) reduces the
    pixel plane to <=2 candidate points per raster row; the per-scene
    chain then runs on <=2*height points inside applyInPandas."""
    x = (F.col("pixel_id") % ncols).alias("x")
    y = F.expr(f"pixel_id div {ncols}").alias("y")
    valid = px.filter(valid_col()).select("tile_id", "date", x, y)
    rowagg = valid.groupBy("tile_id", "date", "y").agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.count(F.lit(1)).alias("nrow"))
    return (rowagg.groupBy("tile_id", "date")
            .applyInPandas(_footprint_rows, _FOOTPRINT_SCHEMA))
