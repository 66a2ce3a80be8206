"""Hierarchical grid generation (C18).

Reference (``cube_builder/grids.py:32-182``) generates equal-area grids
with pyproj + PostGIS. The core tiling math is pure arithmetic once the
bbox is in grid-CRS meters: tiles of ``tile_factor × shape × resolution``
meters laid out from the origin, named ``'{ix:03d}{iy:03d}'``
(grids.py:54-65). Implemented here proj-free over a meters bbox; tile
polygons are axis-aligned rectangles, so every later spatial predicate
(R9) is column arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def create_tiles(bbox: tuple[float, float, float, float], tile_size_m: float,
                 grid_name: str = "GRID") -> list[dict]:
    """Generate tile rows covering ``bbox`` (xmin, ymin, xmax, ymax in
    grid-CRS meters). ix grows east from xmin, iy grows south from ymax
    (reference _create_tiles, grids.py:32-77)."""
    xmin, ymin, xmax, ymax = bbox
    nx = max(1, math.ceil((xmax - xmin) / tile_size_m))
    ny = max(1, math.ceil((ymax - ymin) / tile_size_m))
    tiles = []
    for ix in range(nx):
        for iy in range(ny):
            tiles.append({
                "grid": grid_name,
                "tile_id": f"{ix:03d}{iy:03d}",
                "xmin": xmin + ix * tile_size_m,
                "xmax": xmin + (ix + 1) * tile_size_m,
                "ymax": ymax - iy * tile_size_m,
                "ymin": ymax - (iy + 1) * tile_size_m,
            })
    return tiles


def create_hierarchical_grids(bbox: tuple[float, float, float, float],
                              base_tile_size_m: float,
                              factors: list[int],
                              names: list[str]) -> dict[str, list[dict]]:
    """Hierarchy like BDC_SM/MD/LG (tile_factor [[10,10],[20,20],[40,40]]
    in grid-bdc-md.json): each level multiplies the base tile size."""
    return {name: create_tiles(bbox, base_tile_size_m * factor, grid_name=name)
            for name, factor in zip(names, factors)}


def tiles_df(spark: SparkSession, tiles: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        tiles, schema="grid string, tile_id string, xmin double, xmax double, ymax double, ymin double")


def tile_intersects(df: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float) -> DataFrame:
    """R9 bbox-intersect as column arithmetic (replaces ST_Intersects)."""
    from pyspark.sql import functions as F
    return df.filter((F.col("xmin") < xmax) & (F.col("xmax") > xmin)
                     & (F.col("ymin") < ymax) & (F.col("ymax") > ymin))
