"""S5–S7, S9, S12, S13 — raster readers: URI dispatch + executor-side
windowed read/warp.

Reference: ``drivers/datasets/__init__.py:34-101`` (dataset_from_uri:
zip/tar/SAFE/Landsat-tgz detection), ``drivers/datasets/base.py:30-135``
(generic rasterio open + windowed read), ``sentinel2.py:44-111`` (SAFE
subdataset by band group), ``landsat.py:24-43`` (tgz member synthesis),
``image.py:293-306`` (integrity probe), ``processing.py:418-443``
(remote reachability probe).

Spark-native split:
- **URI dispatch, member-path synthesis, SAFE band-group resolution**
  are pure string logic — implemented and tested here with no I/O.
- **The actual GDAL open/read/warp** needs rasterio, which is not in
  this container: ``open_raster`` raises a clear ``NotImplementedError``
  unless rasterio imports. The executor-side entry point
  (``read_assets``) is a ``mapInPandas`` over asset rows — exactly the
  reference's one-Celery-task-per-asset shape, Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:                                    # gated: not in this container
    import rasterio                     # type: ignore
except ImportError:                     # pragma: no cover
    rasterio = None

# SAFE band → resolution group (sentinel2.py:44-76)
SAFE_BAND_GROUPS = {
    "B02": "10m", "B03": "10m", "B04": "10m", "B08": "10m",
    "B05": "20m", "B06": "20m", "B07": "20m", "B8A": "20m",
    "B11": "20m", "B12": "20m", "SCL": "20m",
    "B01": "60m", "B09": "60m", "B10": "60m",
    "TCI": "10m",
}


def dispatch_uri(uri: str, band: str | None = None,
                 sceneid: str | None = None) -> dict:
    """S6 (dataset_from_uri, drivers/datasets/__init__.py:34-101):
    classify a URI and produce the concrete GDAL path to open."""
    low = uri.lower()
    if low.endswith(".safe.zip") or (".safe" in low and low.endswith(".zip")):
        kind = "sentinel_safe_zip"
        vsi = f"/vsizip/{uri}" if "://" not in uri else f"/vsizip//vsicurl/{uri}"
    elif low.endswith(".zip"):
        kind = "zip"
        vsi = f"/vsizip/{uri}" if "://" not in uri else f"/vsizip//vsicurl/{uri}"
    elif low.endswith((".tar.gz", ".tgz")):
        kind = "landsat_tgz"
        base = f"/vsitar/{uri}" if "://" not in uri else f"/vsitar//vsicurl/{uri}"
        member = landsat_tgz_member(sceneid or "", band or "")
        vsi = f"{base}/{member}" if member else base
    elif "://" in uri and not uri.startswith("file://"):
        kind = "remote"
        vsi = f"/vsicurl/{uri}"
    else:
        kind = "local"
        vsi = uri.removeprefix("file://")
    out = {"kind": kind, "gdal_path": vsi}
    if kind == "sentinel_safe_zip" and band:
        out["band_group"] = SAFE_BAND_GROUPS.get(band, "20m")
    return out


def landsat_tgz_member(sceneid: str, band: str) -> str:
    """S9 (landsat.py:24-43): member path '{scene_id}_{band}.TIF'
    inside the tarball."""
    if not sceneid or not band:
        return ""
    return f"{sceneid}_{band}.TIF"


def open_raster(uri: str, band: str | None = None, sceneid: str | None = None):
    """S5 (base.py:30-135): open any raster URI via rasterio. Gated on
    the library being present; the dispatch above is library-free."""
    if rasterio is None:
        raise NotImplementedError(
            "rasterio is not available in this container; dispatch_uri() "
            "resolved the GDAL path — wire rasterio.open(gdal_path) here "
            "in an environment with GDAL")
    info = dispatch_uri(uri, band, sceneid)
    return rasterio.open(info["gdal_path"])          # pragma: no cover


def probe_integrity(uri: str, read_bytes: bool = False) -> tuple[bool, str | None]:
    """S12 (check_file_integrity, image.py:293-306): open (optionally
    read) to validate. Without rasterio: existence + non-empty check
    for local files, so the probe pipeline stays executable."""
    import os
    path = uri.removeprefix("file://")
    if rasterio is not None:                          # pragma: no cover
        try:
            with rasterio.open(dispatch_uri(uri)["gdal_path"]) as ds:
                if read_bytes:
                    ds.read(1)
            return True, None
        except Exception as e:
            return False, str(e)
    if "://" in uri and not uri.startswith("file://"):
        return False, "remote probe requires rasterio/GDAL"
    if not os.path.exists(path):
        return False, "missing"
    if os.path.getsize(path) == 0:
        return False, "empty file"
    return True, None


def probe_assets_df(assets: DataFrame, read_bytes: bool = False) -> DataFrame:
    """S12/S20 executor-side probe: mapInPandas over asset rows →
    (link, valid, error). One Arrow batch per partition; at scale this
    is the reference's threaded validation fan-out (image.py:107-114)
    as a distributed map."""
    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [probe_integrity(u, read_bytes) for u in pdf["link"]]
            yield pd.DataFrame({
                "link": pdf["link"],
                "valid": [ok for ok, _ in results],
                "error": [err for _, err in results]})

    return assets.select("link").mapInPandas(
        probe, "link string, valid boolean, error string")


def decode_geotiff_pixels(files: DataFrame, extra_cols: list[str] = ()) -> DataFrame:
    """Executor-side raster decode WITHOUT rasterio: parse the stdlib
    GeoTIFF format (sinks/cog.py) from binaryFile content into pixel
    rows (row-major pixel_id, nodata preserved as sentinel values).

    This is the same mapInPandas slot rasterio-based S5 plugs into —
    one Arrow batch of (path, content, metadata) per partition in, a
    pixel-row (or block-row) frame out. ``extra_cols`` pass through
    (band, date, tile_id... from the S4 path classification).
    """
    from ..sinks.cog import read_geotiff_band

    extra_cols = list(extra_cols)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "pixel_id": [], "value": []}
            for c in extra_cols:
                out[c] = []
            for i in range(len(pdf)):
                got = read_geotiff_band(bytes(pdf["content"].iloc[i]))
                arr = got["array"].reshape(-1)
                out["path"].extend([pdf["path"].iloc[i]] * len(arr))
                out["pixel_id"].extend(range(len(arr)))
                out["value"].extend(int(v) for v in arr)
                for c in extra_cols:
                    out[c].extend([pdf[c].iloc[i]] * len(arr))
            yield pd.DataFrame(out)

    schema = ("path string, pixel_id long, value long"
              + "".join(f", {c} string" for c in extra_cols))
    return files.mapInPandas(parse, schema)
