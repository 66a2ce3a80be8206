"""Endpoint-parity facade: drive the reference's API surface
end-to-end — create grid + cube, list periods, start a build, page
items, check status/meta/completion."""

from __future__ import annotations

from datetime import date

import pytest

from cube_builder_spark.api import ROUTES, CubeService
from cube_builder_spark.catalog import CubeDefinition
from tests.test_build_cube_job import synth_observations


@pytest.fixture()
def svc(tmp_path):
    return CubeService(str(tmp_path / "api"))


def _defn():
    return CubeDefinition(
        name="S2-16D", version=1, composite_function="LCF",
        grid="G_SM", resolution=10.0, quality_band="SCL",
        temporal_schema={"schema": "continuous", "unit": "day", "step": 8},
        bands=[{"name": "B04", "common_name": "red",
                "data_type": "int16", "nodata": -9999},
               {"name": "B8A", "common_name": "nir",
                "data_type": "int16", "nodata": -9999},
               {"name": "SCL", "common_name": "quality",
                "data_type": "uint8", "nodata": 0}],
        indexes={"NDVI": "10000 * (B8A - B04) / (B8A + B04)"})


def test_routes_cover_every_reference_endpoint():
    paths = {p for _m, p in ROUTES}
    for must in ["/", "/cube-status", "/cubes", "/cubes/<cube_id>",
                 "/cubes/<cube_id>/tiles", "/cubes/<cube_id>/complete",
                 "/cubes/<cube_id>/items", "/cubes/<cube_id>/meta",
                 "/start", "/list-merges", "/grids", "/create-grids",
                 "/list-periods", "/composite-functions", "/tasks"]:
        assert must in paths, f"missing route {must}"
    assert len(ROUTES) >= 18


def test_catalog_and_grid_routes(svc):
    assert svc.status()["message"] == "Running"
    assert {c["alias"] for c in svc.composite_functions()} \
        == {"IDT", "LCF", "MED"}
    svc.create_grids("G", kind="hierarchical",
                     bbox=(0.0, 0.0, 200000.0, 200000.0),
                     base_tile_size_m=100000.0, factors=[1, 2],
                     names=["G_SM", "G_MD"])
    assert [g["name"] for g in svc.list_grids()] == ["G_MD", "G_SM"]
    assert svc.list_grids("G_SM")["tiles"]

    svc.create_cube(_defn(), parameters={"grid": "G_SM"})
    assert svc.list_cubes() == [{"name": "S2-16D", "version": 1}]
    assert svc.list_cubes("S2-16D")["parameters"]["grid"] == "G_SM"
    svc.update_cube("S2-16D", title="Sentinel 16-day")
    svc.update_parameters("S2-16D", stac_url="https://example/stac")
    assert svc.list_cubes("S2-16D")["parameters"]["title"] \
        == "Sentinel 16-day"
    assert svc.list_tiles("S2-16D")

    periods = svc.list_periods("continuous", date(2020, 1, 1),
                               date(2020, 1, 16), "day", 8)
    assert [p["period"] for p in periods] \
        == ["2020-01-01_2020-01-08", "2020-01-09_2020-01-16"]


def test_build_items_status_complete(spark, sf_dir, svc):
    svc.create_cube(_defn(), parameters={"grid": "G_SM"})
    obs = synth_observations(spark, sf_dir)
    res = svc.start(spark, "S2-16D", obs,
                    start=date(2020, 1, 1), end=date(2020, 1, 16), step=8)
    assert res["cube"] == "S2-16D"

    status = svc.cube_status(spark, "S2-16D")
    assert status["finished"] and status["done"] > 0

    items_p1 = svc.list_items(spark, "S2-16D", page=1, per_page=3).collect()
    items_p2 = svc.list_items(spark, "S2-16D", page=2, per_page=3).collect()
    assert len(items_p1) == 3
    assert not {r.item_id for r in items_p1} & {r.item_id for r in items_p2}

    meta = svc.cube_meta(spark, "S2-16D")
    assert meta["n_items"] > 0 and meta["start_date"].startswith("2020-01")

    # timeline already fully published -> extending it reports exactly
    # the missing tail periods
    missing = svc.complete_cube(spark, "S2-16D",
                                timeline_end=date(2020, 2, 1), step=8)
    assert missing and all(p.split("_")[0] > "2020-01-16" or
                           p.split("_")[0] > "2020-01-09"
                           for p in missing)
    assert "2020-01-01_2020-01-08" not in missing

    merges = svc.list_merges(spark, "S2-16D").collect()
    assert merges and merges[0].status == "done"
    tasks = svc.tasks(spark)
    assert tasks and tasks[0]["cube"] == "S2-16D"


def test_concurrent_different_cube_saves_never_clobber(tmp_path):
    """Round-10 ADVICE: the single-file read-merge-replace allowed an
    interleaving where writer B (read before A's replace landed)
    dropped A's cube. One-file-per-cube makes the claim structural:
    two services over the SAME workdir, each creating a DIFFERENT
    cube with an interleaved save order, must both survive a fresh
    rehydrate — plus legacy single-file catalogs still migrate."""
    import dataclasses
    import json
    import os

    wd = str(tmp_path / "shared")
    svc_a = CubeService(wd)
    svc_b = CubeService(wd)   # both rehydrated BEFORE either save
    defn_a = _defn()
    defn_b = dataclasses.replace(_defn(), name="LC8-16D")
    # interleave: B's in-memory state predates A's save; under the
    # old format B's later save would replace the whole file and
    # drop A's entry
    svc_a.create_cube(defn_a)
    svc_b.create_cube(defn_b)
    names = {c["name"] for c in CubeService(wd).list_cubes()}
    assert names == {"S2-16D", "LC8-16D"}
    # per-cube files on disk, no monolith
    assert sorted(os.listdir(os.path.join(wd, "catalog"))) == \
        ["LC8-16D.json", "S2-16D.json"]

    # legacy migration: a pre-round-11 catalog.json rehydrates AND is
    # migrated for real — per-cube files written, single file retired
    legacy = {"OLD-CUBE": {"defn": dataclasses.asdict(
        dataclasses.replace(_defn(), name="OLD-CUBE")),
        "parameters": {"p": 1}, "out_dir": None}}
    with open(os.path.join(wd, "catalog.json"), "w") as fh:
        json.dump(legacy, fh)
    svc = CubeService(wd)
    assert {c["name"] for c in svc.list_cubes()} == \
        {"S2-16D", "LC8-16D", "OLD-CUBE"}
    assert os.path.exists(os.path.join(wd, "catalog", "OLD-CUBE.json"))
    assert not os.path.exists(os.path.join(wd, "catalog.json"))
    assert os.path.exists(os.path.join(wd, "catalog.json.migrated"))
    # deletion-safety: the retired legacy file is no longer
    # load-bearing — every cube survives a fresh rehydrate without it
    os.remove(os.path.join(wd, "catalog.json.migrated"))
    assert {c["name"] for c in CubeService(wd).list_cubes()} == \
        {"S2-16D", "LC8-16D", "OLD-CUBE"}
    # a per-cube file wins over a stale legacy entry of the same name
    with open(os.path.join(wd, "catalog.json"), "w") as fh:
        json.dump(legacy, fh)   # stale legacy reappears (old backup)
    svc = CubeService(wd)
    svc.update_cube("OLD-CUBE", title="migrated")
    assert CubeService(wd).list_cubes("OLD-CUBE")[
        "parameters"]["title"] == "migrated"


def test_corrupt_cube_file_moved_aside(tmp_path):
    import os
    wd = str(tmp_path / "c")
    svc = CubeService(wd)
    svc.create_cube(_defn())
    path = os.path.join(wd, "catalog", "S2-16D.json")
    with open(path, "w") as fh:
        fh.write("{not json")
    with pytest.warns(RuntimeWarning, match="unreadable"):
        svc2 = CubeService(wd)
    assert svc2.list_cubes() == []
    assert os.path.exists(path + ".corrupt")


def test_schema_invalid_cube_file_moved_aside(tmp_path):
    """Round-11 ADVICE: a per-cube file that PARSES but has the wrong
    shape (non-dict, missing 'defn', unexpected defn keys) must take
    the same move-aside-and-skip path as unparseable JSON — not raise
    TypeError/KeyError out of __init__ and brick the service. Other
    (healthy) cubes must survive the rehydrate."""
    import dataclasses
    import json
    import os
    wd = str(tmp_path / "c")
    svc = CubeService(wd)
    svc.create_cube(_defn())
    svc.create_cube(dataclasses.replace(_defn(), name="LC8-16D"))
    bad_shapes = [
        ["not", "a", "dict"],                       # non-dict record
        {"parameters": {}},                         # missing 'defn'
        {"defn": {"name": "X", "bogus_key": 1}},    # wrong defn keys
    ]
    for bad in bad_shapes:
        path = os.path.join(wd, "catalog", "S2-16D.json")
        for leftover in (path, path + ".corrupt"):
            if os.path.exists(leftover):
                os.remove(leftover)
        with open(path, "w") as fh:
            json.dump(bad, fh)
        with pytest.warns(RuntimeWarning, match="invalid shape"):
            svc2 = CubeService(wd)
        assert [c["name"] for c in svc2.list_cubes()] == ["LC8-16D"]
        assert os.path.exists(path + ".corrupt")
        assert not os.path.exists(path)


def test_legacy_migration_never_rewrites_existing_per_cube_file(tmp_path):
    """Round-11 ADVICE: the migration pass must only materialize
    legacy entries that LACK a per-cube file. An existing per-cube
    file is already authoritative — a process that rehydrated before
    another's post-migration update must not clobber the newer file
    during its own migration. Detected byte-exactly: the pre-existing
    per-cube file is pretty-printed, so any rewrite (json.dump is
    compact) would change its bytes."""
    import dataclasses
    import json
    import os
    wd = str(tmp_path / "c")
    svc = CubeService(wd)
    svc.create_cube(_defn())
    path = os.path.join(wd, "catalog", "S2-16D.json")
    with open(path) as fh:
        rec = json.load(fh)
    rec["parameters"] = {"title": "newer-update"}
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=2)   # canary formatting
    with open(path, "rb") as fh:
        before = fh.read()
    # stale legacy file names the SAME cube plus one legacy-only cube
    legacy = {
        "S2-16D": {"defn": dataclasses.asdict(_defn()),
                   "parameters": {"title": "stale"}, "out_dir": None},
        "OLD-CUBE": {"defn": dataclasses.asdict(
            dataclasses.replace(_defn(), name="OLD-CUBE")),
            "parameters": {}, "out_dir": None},
    }
    with open(os.path.join(wd, "catalog.json"), "w") as fh:
        json.dump(legacy, fh)
    svc2 = CubeService(wd)
    # legacy-only entry materialized, legacy file retired
    assert os.path.exists(os.path.join(wd, "catalog", "OLD-CUBE.json"))
    assert os.path.exists(os.path.join(wd, "catalog.json.migrated"))
    # the pre-existing per-cube file was NOT rewritten (byte-equal)
    with open(path, "rb") as fh:
        assert fh.read() == before
    # and its (newer) content won the rehydrate
    assert svc2.list_cubes("S2-16D")["parameters"][
        "title"] == "newer-update"


def test_shape_invalid_file_recovers_from_valid_legacy_record(tmp_path):
    """Round-12 review: parity between the two corruption classes —
    when a shape-invalid per-cube file masks a VALID legacy catalog
    entry, the cube must be recovered from the legacy record (as the
    unparseable-JSON path already did), re-persisted, and survive
    future restarts."""
    import dataclasses
    import json
    import os
    wd = str(tmp_path / "c")
    os.makedirs(os.path.join(wd, "catalog"))
    legacy = {"S2-16D": {"defn": dataclasses.asdict(_defn()),
                         "parameters": {"p": 1}, "out_dir": None}}
    with open(os.path.join(wd, "catalog.json"), "w") as fh:
        json.dump(legacy, fh)
    path = os.path.join(wd, "catalog", "S2-16D.json")
    with open(path, "w") as fh:
        json.dump(["wrong", "shape"], fh)
    with pytest.warns(RuntimeWarning, match="recovered from the legacy"):
        svc = CubeService(wd)
    assert [c["name"] for c in svc.list_cubes()] == ["S2-16D"]
    assert svc.list_cubes("S2-16D")["parameters"]["p"] == 1
    assert os.path.exists(path + ".corrupt")
    # re-persisted from the recovered record: survives a restart with
    # the legacy file retired
    assert os.path.exists(path)
    assert [c["name"] for c in CubeService(wd).list_cubes()] == ["S2-16D"]


def test_quarantine_never_overwrites_prior_corrupt_file(tmp_path):
    """A second quarantine of the same path must pick a fresh suffix
    — earlier quarantined evidence is never destroyed."""
    import os
    wd = str(tmp_path / "c")
    svc = CubeService(wd)
    svc.create_cube(_defn())
    path = os.path.join(wd, "catalog", "S2-16D.json")
    with open(path, "w") as fh:
        fh.write("{first bad")
    with pytest.warns(RuntimeWarning):
        CubeService(wd)
    with open(path, "w") as fh:
        fh.write("{second bad")
    with pytest.warns(RuntimeWarning):
        CubeService(wd)
    with open(path + ".corrupt") as fh:
        assert fh.read() == "{first bad"
    with open(path + ".corrupt-2") as fh:
        assert fh.read() == "{second bad"


def test_quarantine_tolerates_racing_process(tmp_path, monkeypatch):
    """Round-12 ADVICE: two services rehydrating concurrently must not
    clobber each other's quarantined evidence or crash __init__. The
    race is simulated at the os.link seam: the 'loser' finds the
    suffix taken (FileExistsError -> next suffix) and then the source
    already moved (FileNotFoundError -> treated as handled, service
    still constructs)."""
    import os
    wd = str(tmp_path / "c")
    svc = CubeService(wd)
    svc.create_cube(_defn())
    path = os.path.join(wd, "catalog", "S2-16D.json")
    with open(path, "w") as fh:
        fh.write("{bad json")

    real_link = os.link
    state = {"raced": False}

    def racing_link(src, dst, **kw):
        # first claim attempt: a concurrent process already took the
        # suffix AND moved the source before our retry
        if not state["raced"] and dst.endswith(".corrupt"):
            state["raced"] = True
            real_link(src, dst, **kw)   # the racer's claim
            os.unlink(src)              # the racer's move completes
            raise FileExistsError(dst)
        return real_link(src, dst, **kw)

    monkeypatch.setattr(os, "link", racing_link)
    with pytest.warns(RuntimeWarning, match="racing process"):
        svc2 = CubeService(wd)  # must not raise FileNotFoundError
    assert svc2.list_cubes() == []
    # the racer's evidence survives, exactly once
    with open(path + ".corrupt") as fh:
        assert fh.read() == "{bad json"
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".corrupt-2")
