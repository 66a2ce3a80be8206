"""Source-operator tests: S4 local directory scan, S10 scene-id
parsers, S8 baseline offset."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cube_builder_spark.operators.rescale import baseline_offset
from cube_builder_spark.sources.local_scan import filter_assets, scan_directory
from cube_builder_spark.sources.sceneid import parse_scene_id


def test_scan_directory_classifies_band_and_date(spark, tmp_path):
    """S4 (local_accessor.py:120-209): glob + regex classification."""
    d = tmp_path / "scenes"
    (d / "t001").mkdir(parents=True)
    names = [
        "S2A_MSIL2A_20200105T103021_B04.tif",
        "S2A_MSIL2A_20200105T103021_B8A.tif",
        "S2A_MSIL2A_20200105T103021_SCL.tif",
        "t001/S2A_MSIL2A_20200121T103021_B04.tif",
        "S2A_MSIL2A_20200105T103021_B04.txt",   # wrong extension
        "README.tif.md",                         # not a tif
    ]
    for n in names:
        (d / n).write_bytes(b"fake-cog")
    assets = scan_directory(spark, str(d)).orderBy("path")
    rows = assets.select("band", F.col("date").cast("string").alias("dt"),
                         "path").collect()
    assert len(rows) == 4
    assert {r.band for r in rows} == {"B04", "B8A", "SCL"}
    assert {r.dt for r in rows} == {"2020-01-05", "2020-01-21"}
    # recursive lookup found the nested file
    assert any("/t001/" in r.path for r in rows)

    windowed = filter_assets(assets, bands=["B04"], start="2020-01-10")
    got = windowed.select(F.col("date").cast("string").alias("dt")).collect()
    assert [r.dt for r in got] == ["2020-01-21"]


def test_parse_scene_id_families(spark):
    """S10: Landsat split-parse, Sentinel-2 regex incl. baseline,
    fallback platform for CBERS-style ids."""
    ids = [
        ("LC08_L2SP_223064_20200112_20210101_02_T1",),
        ("S2A_MSIL2A_20200112T103021_N0400_R122_T23LLB",),
        ("S2B_MSIL1C_20200112T103021_N0301_R122_T23LLC",),
        ("CBERS_4_AWFI_20200112_154_117_L4",),
    ]
    df = spark.createDataFrame(ids, "sceneid string")
    parsed = parse_scene_id(F.col("sceneid"))
    out = {r.sceneid: r for r in
           df.select("sceneid", *[c.alias(n) for n, c in parsed.items()]).collect()}
    ls = out[ids[0][0]]
    assert (ls.platform, ls.wrs_path, ls.wrs_row) == ("LC8", 223, 64)
    assert ls.sensing_date == "20200112" and ls.baseline_major is None
    s2 = out[ids[1][0]]
    assert (s2.platform, s2.baseline_major, s2.mgrs_tile) == ("S2A", 4, "23LLB")
    s2b = out[ids[2][0]]
    assert (s2b.level, s2b.baseline_major) == ("1C", 3)
    cb = out[ids[3][0]]
    assert cb.platform == "CBERS_4" and cb.sensing_date == "20200112"


def test_baseline_offset_semantics(spark):
    """S8 (sentinel2.py:136-174): offset only for baseline >= 4,
    negatives clamp to nodata, nodata passthrough."""
    rows = [(5000, 4), (900, 4), (1000, 4), (5000, 3), (-9999, 4)]
    df = spark.createDataFrame(rows, "v long, bl long")
    out = df.select(baseline_offset(F.col("v"), F.col("bl"), -9999).alias("h"))
    assert [r.h for r in out.collect()] == [4000, -9999, 0, 5000, -9999]


def test_classify_assets_on_manifest(spark):
    """S4 classification works on a pure path manifest (no files):
    band via per-band regex, date via try_to_date (bad timestamps and
    wrong extensions drop instead of erroring)."""
    from cube_builder_spark.sources.local_scan import classify_assets
    paths = [
        ("/d/S2A_MSIL2A_20200105T103021_T23LLA_B04.tif",),
        ("/d/S2A_MSIL2A_20200105T103021_T23LLA_SCL.tif",),
        ("/d/S2A_MSIL2A_NODATET103021_T23LLA_B04.tif",),    # bad timestamp
        ("/d/S2A_MSIL2A_20200105T103021_T23LLA_B04.jp2",),  # bad extension
        ("/d/S2A_MSIL2A_20200199T103021_T23LLA_B04.tif",),  # invalid date
    ]
    out = classify_assets(spark.createDataFrame(paths, "path string")).collect()
    assert {(r.band, str(r.date)) for r in out} == {
        ("B04", "2020-01-05"), ("SCL", "2020-01-05")}


def test_dispatch_uri_file_scheme_archives():
    """S6: file:// URIs are local for EVERY container kind — never
    wrapped in /vsicurl."""
    from cube_builder_spark.sources.raster_reader import dispatch_uri
    z = dispatch_uri("file:///mnt/s/S2B.SAFE.zip", band="B8A")
    assert z["kind"] == "sentinel_safe_zip"
    assert z["gdal_path"] == "/vsizip//mnt/s/S2B.SAFE.zip"
    assert z["band_group"] == "20m"
    t = dispatch_uri("file:///mnt/l/LC08.tar.gz", band="B04", sceneid="LC08_X")
    assert t["gdal_path"] == "/vsitar//mnt/l/LC08.tar.gz/LC08_X_B04.TIF"
    r = dispatch_uri("https://h/scene.zip")
    assert r["gdal_path"] == "/vsizip//vsicurl/https://h/scene.zip"
