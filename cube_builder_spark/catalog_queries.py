"""Catalog-plane oracle queries: timeline (C17), grids (C18), cube
metadata creation (§3.2), item publish (K4)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import catalog
from .grids import create_tiles, tiles_df
from .pixelplane import PIXELS_SQL, pixel_plane
from .sinks.publish import publish_items
from .timeline import timeline_rows

REGISTRY: list[tuple[str, object, str | None]] = []


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY.append((name, fn, sql))
        return fn
    return deco


# C17 -------------------------------------------------------------------------

@register("c17_timeline_cyclic16", """
SELECT strftime(s, '%Y-%m-%d') || '_' || strftime(e, '%Y-%m-%d') AS period,
       s AS start_date, e AS end_date
FROM (
  SELECT DATE '2020-01-01' + CAST(16 * x AS INTEGER) AS s,
         least(DATE '2020-01-01' + CAST(16 * x + 15 AS INTEGER), DATE '2020-12-31') AS e
  FROM generate_series(0, 22) AS g(x)
)
""")
def c17_timeline_cyclic16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17 (timeline.py:76-205): cyclic year / 16-day — 23 periods in
    2020 with the short last period ending 12-31 (reference
    test_cycle_year_16days)."""
    rows = timeline_rows("cyclic", date(2020, 1, 1), date(2020, 12, 31),
                         "day", 16, cycle=dict(unit="year", step=1))
    return spark.createDataFrame(
        rows, schema="period string, start_date date, end_date date")


@register("c17_timeline_seasonal", """
SELECT * FROM (VALUES
  ('2019-12-21_2020-03-20', DATE '2019-12-21', DATE '2020-03-20'),
  ('2020-03-21_2020-06-20', DATE '2020-03-21', DATE '2020-06-20'),
  ('2020-06-21_2020-09-21', DATE '2020-06-21', DATE '2020-09-21'),
  ('2020-09-22_2020-12-20', DATE '2020-09-22', DATE '2020-12-20'),
  ('2020-12-21_2021-03-20', DATE '2020-12-21', DATE '2021-03-20')
) AS t(period, start_date, end_date)
""")
def c17_timeline_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17 seasonal intervals — golden case from the reference
    test_continuous_with_interval_season (prior/next-year spanning)."""
    rows = timeline_rows(
        "continuous", date(2020, 1, 1), date(2020, 12, 31), "month", 3,
        intervals=["12-21_03-20", "03-21_06-20", "06-21_09-21", "09-22_12-20"])
    return spark.createDataFrame(
        rows, schema="period string, start_date date, end_date date")


# C18 -------------------------------------------------------------------------

@register("c18_grid_tiles", """
SELECT 'BDC_MD' AS grid, printf('%03d%03d', ix, iy) AS tile_id,
       ix * 105600e0 AS xmin, (ix + 1) * 105600e0 AS xmax,
       316800e0 - iy * 105600e0 AS ymax, 316800e0 - (iy + 1) * 105600e0 AS ymin
FROM generate_series(0, 3) AS t1(ix) CROSS JOIN generate_series(0, 2) AS t2(iy)
""")
def c18_grid_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 (grids.py:32-77): tile layout over a meters bbox, names
    '{ix:03d}{iy:03d}'."""
    tiles = create_tiles((0.0, 0.0, 4 * 105600.0, 3 * 105600.0), 105600.0,
                         grid_name="BDC_MD")
    return tiles_df(spark, tiles)


# §3.2 cube creation ----------------------------------------------------------

@register("meta_cube_band_summary", """
SELECT * FROM (VALUES
  ('LC8-16D_IDT-1', CAST(7 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
  ('LC8-16D-1',     CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
  ('S2-16D_IDT-1',  CAST(7 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
  ('S2-16D-1',      CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT))
) AS t(collection, n_bands, n_expression_bands, n_auto_bands)
""")
def meta_cube_band_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 create-cube (controller.py:100-286): identity + composed
    collections with NDVI/EVI expression bands and the LCF auto bands
    (CLEAROB/TOTALOB/PROVENANCE)."""
    bands = catalog.bands_df(spark, [catalog.LC8_16D, catalog.S2_16D])
    auto = ["CLEAROB", "TOTALOB", "PROVENANCE", "DATASOURCE"]
    return (bands.groupBy("collection").agg(
        F.count(F.lit(1)).alias("n_bands"),
        F.sum(F.col("expression").isNotNull().cast("long")).alias("n_expression_bands"),
        F.sum(F.col("name").isin(auto).cast("long")).alias("n_auto_bands")))


@register("meta_auto_band_attributes", """
SELECT * FROM (VALUES
  ('LC8-16D-1', 'CLEAROB',    'uint8', 0e0,  0e0, 255e0),
  ('LC8-16D-1', 'TOTALOB',    'uint8', 0e0,  0e0, 255e0),
  ('LC8-16D-1', 'PROVENANCE', 'int16', -1e0, 1e0, 366e0),
  ('S2-16D-1',  'CLEAROB',    'uint8', 0e0,  0e0, 255e0),
  ('S2-16D-1',  'TOTALOB',    'uint8', 0e0,  0e0, 255e0),
  ('S2-16D-1',  'PROVENANCE', 'int16', -1e0, 1e0, 366e0)
) AS t(collection, name, data_type, nodata, min_value, max_value)
""")
def meta_auto_band_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-band attribute golden check (constants.py:25-74)."""
    bands = catalog.bands_df(spark, [catalog.LC8_16D, catalog.S2_16D])
    return (bands.filter(F.col("name").isin("CLEAROB", "TOTALOB", "PROVENANCE", "DATASOURCE")
                         & ~F.col("collection").contains("IDT"))
            .select("collection", "name", "data_type", "nodata", "min_value", "max_value"))


# K4 --------------------------------------------------------------------------

@register("k4_publish_items", f"""
WITH {PIXELS_SQL},
qa AS (
  SELECT tile_id,
         sum(CASE WHEN quality IN (4,5,6) THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN quality IN (2,3,7,8,9,10,11) THEN 1 ELSE 0 END) AS nc
  FROM pixels GROUP BY tile_id
)
SELECT 'S2-16D-1_V001_' || printf('%03d', CAST(tile_id AS INTEGER)) || '_20200101' AS item_id,
       tile_id, '2020-01-01_2020-01-16' AS period,
       DATE '2020-01-01' AS start_date, DATE '2020-01-16' AS end_date,
       1e2 * nc / NULLIF(c + nc, 0) AS cloud_cover
FROM qa
""")
def k4_publish_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 publish_datacube (processing.py:1038-1155): one Item per
    (cube, tile, period) with id naming and cloud cover."""
    px = pixel_plane(spark, sf_dir)
    stats = px.groupBy("tile_id").agg(
        F.sum(F.col("quality").isin(4, 5, 6).cast("long")).alias("clear_pixels"),
        F.sum(F.col("quality").isin(2, 3, 7, 8, 9, 10, 11).cast("long")).alias("not_clear_pixels"))
    return publish_items(stats, "S2-16D-1", 1, "2020-01-01", "2020-01-16")


# K6 --------------------------------------------------------------------------

@register("k6_asset_export", f"""
WITH {PIXELS_SQL},
periods(period, ps, pe) AS (
  VALUES ('2020-01-01_2020-01-08', DATE '2020-01-01', DATE '2020-01-08'),
         ('2020-01-09_2020-01-16', DATE '2020-01-09', DATE '2020-01-16')
),
scenes AS (
  SELECT DISTINCT p.tile_id, per.period, p.doy, p.source_idx
  FROM pixels p JOIN periods per ON p.date BETWEEN per.ps AND per.pe
)
SELECT tile_id, period, count(*) AS n_assets,
       -- serialized: raw list cells crash the harness canonicalizer
       array_to_string(
         list_sort(list('file:///assets/t' || tile_id || '/d' || doy
                        || '/s' || source_idx || '.tif')), ';') AS links
FROM scenes GROUP BY tile_id, period
""")
def k6_asset_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 merge-asset export (maestro.py:619-626): the per
    (tile, period) asset-list dump — in Spark-native form a DataFrame
    ready for df.write.json instead of driver-side file writes."""
    px = pixel_plane(spark, sf_dir)
    periods = spark.createDataFrame(
        [("2020-01-01_2020-01-08", "2020-01-01", "2020-01-08"),
         ("2020-01-09_2020-01-16", "2020-01-09", "2020-01-16")],
        "period string, ps string, pe string").select(
            "period", F.col("ps").cast("date"), F.col("pe").cast("date"))
    scenes = (px.join(F.broadcast(periods),
                      (F.col("date") >= F.col("ps")) & (F.col("date") <= F.col("pe")))
              .select("tile_id", "period", "doy", "source_idx").distinct())
    link = F.concat(F.lit("file:///assets/t"), F.col("tile_id"),
                    F.lit("/d"), F.col("doy"),
                    F.lit("/s"), F.col("source_idx"), F.lit(".tif"))
    return (scenes.groupBy("tile_id", "period")
            .agg(F.count(F.lit(1)).alias("n_assets"),
                 F.array_join(F.sort_array(F.collect_list(link)),
                              ";").alias("links")))


# K7 --------------------------------------------------------------------------

@register("k7_empty_merge_cleanup", f"""
WITH {PIXELS_SQL},
per_scene AS (
  -- CAST: DuckDB sum() over ints is HUGEINT -> pandas float64
  SELECT tile_id, date, doy,
         CAST(sum(CASE WHEN value <> -9999 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
  FROM pixels GROUP BY tile_id, date, doy
)
SELECT tile_id, date, doy, n_valid,
       n_valid = 0 AS removable
FROM per_scene
""")
def k7_empty_merge_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 clear_merge (celery/utils.py:63-81, tasks.py:531-535):
    identity scenes with zero valid pixels are flagged removable (the
    composite stays); in Spark-native form this is a filter before the
    identity write, not a file deletion."""
    px = pixel_plane(spark, sf_dir)
    return (px.groupBy("tile_id", "date", "doy")
            .agg(F.sum((F.col("value") != -9999).cast("long")).alias("n_valid"))
            .select("tile_id", "date", "doy", "n_valid",
                    (F.col("n_valid") == 0).alias("removable")))


# §3.3 complete timeline -------------------------------------------------------

@register("p_missing_periods", f"""
WITH {PIXELS_SQL},
periods(period, ps, pe) AS (
  VALUES ('2020-01-01_2020-01-08', DATE '2020-01-01', DATE '2020-01-08'),
         ('2020-01-09_2020-01-16', DATE '2020-01-09', DATE '2020-01-16'),
         ('2020-01-17_2020-01-24', DATE '2020-01-17', DATE '2020-01-24')
),
tiles AS (SELECT t.x AS tile_id FROM generate_series(0, 7) AS t(x)),
published AS (
  SELECT DISTINCT p.tile_id, per.period
  FROM pixels p JOIN periods per ON p.date BETWEEN per.ps AND per.pe
)
SELECT t.tile_id, per.period
FROM tiles t CROSS JOIN periods per
LEFT JOIN published pub ON pub.tile_id = t.tile_id AND pub.period = per.period
WHERE pub.tile_id IS NULL
""")
def p_missing_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 complete_cube_timeline (controller.py:712-724,
    tasks.py:577-620): expected tiles × periods anti-joined against
    published items -> the re-run work list. The third period is past
    the data's end, so every tile reports it missing."""
    px = pixel_plane(spark, sf_dir)
    periods = spark.createDataFrame(
        [("2020-01-01_2020-01-08", "2020-01-01", "2020-01-08"),
         ("2020-01-09_2020-01-16", "2020-01-09", "2020-01-16"),
         ("2020-01-17_2020-01-24", "2020-01-17", "2020-01-24")],
        "period string, ps string, pe string").select(
            "period", F.col("ps").cast("date"), F.col("pe").cast("date"))
    tiles = spark.range(8).select(F.col("id").alias("tile_id"))
    published = (px.join(F.broadcast(periods),
                         (F.col("date") >= F.col("ps")) & (F.col("date") <= F.col("pe")))
                 .select("tile_id", "period").distinct())
    expected = tiles.crossJoin(periods.select("period"))
    return expected.join(published, ["tile_id", "period"], "left_anti")


# §3.2 quicklook triple + BandSRC provenance ------------------------------------

@register("meta_quicklook_rgb", """
SELECT * FROM (VALUES
  ('LC8-16D_IDT-1', 'sr_band4', 'sr_band3', 'sr_band2'),
  ('LC8-16D-1',     'sr_band4', 'sr_band3', 'sr_band2'),
  ('S2-16D_IDT-1',  'B04', 'B03', 'B02'),
  ('S2-16D-1',      'B04', 'B03', 'B02')
) AS t(collection, red, green, blue)
""")
def meta_quicklook_rgb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quicklook RGB triple rows (controller.py:204-209) derived from
    the red/green/blue common-name bands of the fixture cubes."""
    return catalog.quicklook_df(spark, [catalog.LC8_16D, catalog.S2_16D])


@register("meta_band_provenance", """
SELECT * FROM (VALUES
  ('LC8-16D_IDT-1', 'EVI',  'sr_band2'), ('LC8-16D_IDT-1', 'EVI',  'sr_band4'),
  ('LC8-16D_IDT-1', 'EVI',  'sr_band5'), ('LC8-16D_IDT-1', 'NDVI', 'sr_band4'),
  ('LC8-16D_IDT-1', 'NDVI', 'sr_band5'),
  ('LC8-16D-1', 'EVI',  'sr_band2'), ('LC8-16D-1', 'EVI',  'sr_band4'),
  ('LC8-16D-1', 'EVI',  'sr_band5'), ('LC8-16D-1', 'NDVI', 'sr_band4'),
  ('LC8-16D-1', 'NDVI', 'sr_band5'),
  ('S2-16D_IDT-1', 'EVI',  'B02'), ('S2-16D_IDT-1', 'EVI',  'B04'),
  ('S2-16D_IDT-1', 'EVI',  'B8A'), ('S2-16D_IDT-1', 'NDVI', 'B04'),
  ('S2-16D_IDT-1', 'NDVI', 'B8A'),
  ('S2-16D-1', 'EVI',  'B02'), ('S2-16D-1', 'EVI',  'B04'),
  ('S2-16D-1', 'EVI',  'B8A'), ('S2-16D-1', 'NDVI', 'B04'),
  ('S2-16D-1', 'NDVI', 'B8A')
) AS t(collection, band, src_band)
""")
def meta_band_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BandSRC rows (controller.py:199-202): which source bands feed
    each expression band, parsed from the index formulas."""
    return catalog.band_src_df(spark, [catalog.LC8_16D, catalog.S2_16D])
