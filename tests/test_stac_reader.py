"""S1-S3 STAC ingestion (canned transport) + S5-S9/S12 reader dispatch."""

from __future__ import annotations

import pytest

from cube_builder_spark.sources.raster_reader import (dispatch_uri,
                                                      landsat_tgz_member,
                                                      open_raster,
                                                      probe_assets_df,
                                                      probe_integrity)
from cube_builder_spark.sources.stac import (StacClient, adapt_safe_items,
                                             features_to_asset_rows,
                                             search_images)


def _feature(fid, dt, assets):
    return {"id": fid, "properties": {"datetime": dt, "platform": "S2A"},
            "assets": assets}


def _canned_transport(pages):
    calls = []

    def transport(url, params=None, payload=None):
        calls.append((url, params, payload))
        page = (payload or params or {}).get("page", 1)
        return {"features": pages[page - 1] if page <= len(pages) else []}

    transport.calls = calls
    return transport


def test_stac_v1_search_paginates(spark):
    page1 = [_feature(f"S2_{i}", "2020-01-05T10:30:21Z",
                      {"B04": {"href": f"https://x/{i}/B04.tif"}})
             for i in range(3)]
    page2 = [_feature("S2_last", "2020-01-21T10:30:21Z",
                      {"B04": {"href": "https://x/last/B04.tif"}})]
    t = _canned_transport([page1, page2])
    client = StacClient("https://stac.example", "1.0.0", transport=t)
    feats = client.search("S2_L2A", [0, 0, 1, 1], "2020-01-01", "2020-01-31",
                          limit=3)
    assert len(feats) == 4
    # v1 path POSTs /search with a JSON body
    url, params, payload = t.calls[0]
    assert url.endswith("/search") and payload["collections"] == ["S2_L2A"]


def test_stac_legacy_search_uses_query_params(spark):
    t = _canned_transport([[ _feature("old", "2020-01-05T00:00:00Z", {}) ]])
    client = StacClient("https://stac.example", "0.9.0", transport=t)
    client.search("LC8", [0, 0, 1, 1], "2020-01-01", "2020-01-31")
    url, params, payload = t.calls[0]
    assert url.endswith("/stac/search") and payload is None
    assert params["time"] == "2020-01-01/2020-01-31"


def test_safe_adaptation_and_band_aliasing(spark):
    zip_asset = {"href": "https://x/S2A.SAFE.zip"}
    feats = [_feature("S2A_MSIL2A_20200105T103021_N0400_R122_T23LLB",
                      "2020-01-05T10:30:21Z",
                      {"asset": zip_asset, "sr_band4": {"href": "https://x/b4.tif"}})]
    adapted = adapt_safe_items(feats, ["B04", "B8A", "SCL"])
    # every requested band now points at the single zip asset
    assert all(adapted[0]["assets"][b]["href"] == zip_asset["href"]
               for b in ["B8A", "SCL"])
    rows = features_to_asset_rows(adapted, ["B04", "B8A", "SCL"], "S2_L2A", 7)
    by_band = {r["band"]: r for r in rows}
    # sr_band4 aliased to B04 and kept its own href
    assert by_band["B04"]["link"] == "https://x/b4.tif"
    assert by_band["B8A"]["link"] == zip_asset["href"]
    assert by_band["B04"]["date"] == "2020-01-05"
    assert by_band["B04"]["tile_id"] == "7"


def test_search_images_builds_assets_df(spark):
    feats = [[_feature("S1", "2020-01-05T00:00:00Z",
                       {"B04": {"href": "file:///d/B04.tif", "nodata": 0}})]]
    client = StacClient("https://s", transport=_canned_transport(feats))
    df = search_images(spark, client, "COLL", ["B04"], [0, 0, 1, 1],
                       "2020-01-01", "2020-01-31", tile_id=3)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].band == "B04" and rows[0].nodata == 0.0


def test_dispatch_uri_families():
    d = dispatch_uri("https://x/S2A_MSIL2A.SAFE.zip", band="B04")
    assert d["kind"] == "sentinel_safe_zip"
    assert d["gdal_path"].startswith("/vsizip//vsicurl/")
    assert d["band_group"] == "10m"
    assert dispatch_uri("https://x/scene.zip")["kind"] == "zip"
    t = dispatch_uri("https://x/LC08.tar.gz", band="B4",
                     sceneid="LC08_L2SP_223064_20200112_20210101_02_T1")
    assert t["kind"] == "landsat_tgz"
    assert t["gdal_path"].endswith("LC08_L2SP_223064_20200112_20210101_02_T1_B4.TIF")
    assert dispatch_uri("https://x/plain.tif")["kind"] == "remote"
    assert dispatch_uri("file:///d/x.tif") == {"kind": "local", "gdal_path": "/d/x.tif"}
    assert landsat_tgz_member("SC", "B1") == "SC_B1.TIF"


def test_open_raster_without_rasterio(tmp_path):
    import cube_builder_spark.sources.raster_reader as rr
    if rr.rasterio is not None:
        pytest.skip("rasterio present: GDAL path takes over")
    # stdlib path is real now: a missing file is a missing file
    with pytest.raises(FileNotFoundError):
        open_raster("file:///d/x.tif")
    # non-TIFF payloads (e.g. JP2 magic) stay honestly gated
    jp2 = tmp_path / "x.jp2"
    jp2.write_bytes(b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        open_raster(f"file://{jp2}")


def test_probe_integrity_and_distributed_probe(spark, tmp_path):
    good = tmp_path / "ok.tif"
    good.write_bytes(b"bytes")
    empty = tmp_path / "empty.tif"
    empty.write_bytes(b"")
    assert probe_integrity(f"file://{good}") == (True, None)
    assert probe_integrity(f"file://{empty}")[1] == "empty file"
    assert probe_integrity(str(tmp_path / "nope.tif"))[1] == "missing"

    assets = spark.createDataFrame(
        [(f"file://{good}",), (f"file://{empty}",), ("https://x/y.tif",)],
        "link string")
    out = {r.link: (r.valid, r.error) for r in probe_assets_df(assets).collect()}
    assert out[f"file://{good}"] == (True, None)
    assert out[f"file://{empty}"][0] is False
    assert out["https://x/y.tif"][0] is False
