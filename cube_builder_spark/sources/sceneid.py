"""S10 — scene-id parsers as column expressions.

Reference: ``maestro.py:756-777`` (``_parse_landsat`` /
``_detect_landsat_platform``: underscore-split Landsat product ids)
and ``drivers/datasets/sentinel/sentinel2.py:223-295``
(``SentinelParser``: Sentinel-2 product-id regex incl. processing
baseline ``N####``). Both are pure string → fields functions, so they
map to ``F.regexp_extract`` columns that Catalyst codegens — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LANDSAT_RE = r"^(L[COTEM]0[0-9])_(\w{4})_(\d{3})(\d{3})_(\d{8})_\d{8}_(\d{2})_(\w+)$"
SENTINEL_RE = r"^(S2[AB])_MSIL(1C|2A)_(\d{8})T\d{6}_N(\d{2})(\d{2})_R\d{3}_T(\w{5})$"


def synth_scene_id(source_idx: Column, tile_id: Column, doy: Column) -> Column:
    """Deterministic synthetic scene ids per platform family (the test
    substrate for the parsers; shapes follow the reference fixtures)."""
    ymd = F.concat(F.lit("2020"),
                   F.lpad(((doy - 1) % 12 + 1).cast("string"), 2, "0"),
                   F.lpad(((doy * 7) % 28 + 1).cast("string"), 2, "0"))
    path = F.lpad((tile_id + 220).cast("string"), 3, "0")
    row = F.lpad((tile_id % 4 + 64).cast("string"), 3, "0")
    mgrs = F.concat(F.lit("23LL"), F.substring(F.lit("ABCDEFGH"),
                                               (tile_id % 8 + 1).cast("int"), 1))
    return (
        F.when(source_idx == 0,
               F.concat(F.lit("LC08_L2SP_"), path, row, F.lit("_"), ymd,
                        F.lit("_20210101_02_T1")))
        .when(source_idx == 1,
              F.concat(F.lit("S2A_MSIL2A_"), ymd,
                       F.lit("T103021_N"),
                       F.when(doy % 2 == 0, F.lit("0400")).otherwise(F.lit("0301")),
                       F.lit("_R122_T"), mgrs))
        .otherwise(F.concat(F.lit("CBERS_4_AWFI_"), ymd,
                            F.lit("_154_117_L4"))))


def parse_landsat(sceneid: Column) -> dict[str, Column]:
    """maestro.py:756-777: platform (digits stripped of leading 0),
    processing level, WRS path/row, sensing date, collection."""
    plat = F.regexp_extract(sceneid, LANDSAT_RE, 1)
    return {
        "platform": F.when(plat != "", F.concat(
            F.substring(plat, 1, 2),
            F.regexp_replace(F.substring(plat, 3, 2), "^0", ""))),
        "level": F.nullif(F.regexp_extract(sceneid, LANDSAT_RE, 2), F.lit("")),
        "path": F.nullif(F.regexp_extract(sceneid, LANDSAT_RE, 3), F.lit("")).cast("int"),
        "row": F.nullif(F.regexp_extract(sceneid, LANDSAT_RE, 4), F.lit("")).cast("int"),
        "sensing_date": F.nullif(F.regexp_extract(sceneid, LANDSAT_RE, 5), F.lit("")),
    }


def parse_sentinel2(sceneid: Column) -> dict[str, Column]:
    """sentinel2.py:223-295: satellite, level, sensing date, processing
    baseline major/minor (drives the S8 offset), MGRS tile."""
    return {
        "platform": F.nullif(F.regexp_extract(sceneid, SENTINEL_RE, 1), F.lit("")),
        "level": F.nullif(F.regexp_extract(sceneid, SENTINEL_RE, 2), F.lit("")),
        "sensing_date": F.nullif(F.regexp_extract(sceneid, SENTINEL_RE, 3), F.lit("")),
        "baseline_major": F.nullif(
            F.regexp_extract(sceneid, SENTINEL_RE, 4), F.lit("")).cast("int"),
        "baseline_minor": F.nullif(
            F.regexp_extract(sceneid, SENTINEL_RE, 5), F.lit("")).cast("int"),
        "mgrs_tile": F.nullif(F.regexp_extract(sceneid, SENTINEL_RE, 6), F.lit("")),
    }


def parse_scene_id(sceneid: Column) -> dict[str, Column]:
    """Dispatch on id shape (the S6 URI-dispatcher analogue for ids):
    Landsat fields where the Landsat regex matches, else Sentinel-2,
    else platform from the first two underscore fields (CBERS/MODIS
    style)."""
    ls, s2 = parse_landsat(sceneid), parse_sentinel2(sceneid)
    is_ls = F.regexp_extract(sceneid, LANDSAT_RE, 1) != ""
    is_s2 = F.regexp_extract(sceneid, SENTINEL_RE, 1) != ""
    fallback_plat = F.concat_ws(
        "_", F.split(sceneid, "_")[0], F.split(sceneid, "_")[1])
    return {
        "platform": (F.when(is_ls, ls["platform"])
                     .when(is_s2, s2["platform"]).otherwise(fallback_plat)),
        "level": F.when(is_ls, ls["level"]).when(is_s2, s2["level"]),
        "sensing_date": (F.when(is_ls, ls["sensing_date"])
                         .when(is_s2, s2["sensing_date"])
                         .otherwise(F.regexp_extract(sceneid, r"_(\d{8})_", 1))),
        "baseline_major": F.when(is_s2, s2["baseline_major"]),
        "wrs_path": F.when(is_ls, ls["path"]),
        "wrs_row": F.when(is_ls, ls["row"]),
        "mgrs_tile": F.when(is_s2, s2["mgrs_tile"]),
    }
