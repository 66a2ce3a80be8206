"""cube_builder_spark.cli — the reference's CLI surface."""

from __future__ import annotations

import json

from cube_builder_spark.cli import LOAD_DATA_RECORDS, main


def test_load_data_prints_and_writes_seed(tmp_path, capsys):
    out = str(tmp_path / "seed.json")
    assert main(["load-data", "--output", out]) == 0
    printed = json.loads(capsys.readouterr().out)
    written = json.loads(open(out).read())
    assert printed == written == LOAD_DATA_RECORDS
    aliases = {c["alias"] for c in printed["composite_functions"]}
    assert aliases == {"MED", "LCF", "IDT"}  # reference cli.py:44-59


def test_configure_and_show_parameters_roundtrip(tmp_path, capsys):
    from cube_builder_spark.api import CubeDefinition, CubeService
    wd = str(tmp_path / "wd")
    svc = CubeService(wd)
    svc.create_cube(CubeDefinition(
        name="CLI-CUBE", version=1, composite_function="LCF",
        grid="G_SM", resolution=10.0, quality_band="SCL",
        temporal_schema={"schema": "continuous", "unit": "day",
                         "step": 8},
        bands=[{"name": "B04", "common_name": "red",
                "data_type": "int16", "nodata": -9999},
               {"name": "SCL", "common_name": "quality",
                "data_type": "uint8", "nodata": 0}]))
    # the CLI builds its own service over the same workdir; the
    # service must rehydrate the cube from disk for this to work
    rc = main(["configure", "CLI-CUBE", "--workdir", wd,
               "--set", "cloud_cover=42"])
    assert rc == 0
    capsys.readouterr()
    assert main(["show-parameters", "CLI-CUBE", "--workdir", wd]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown.get("cloud_cover") == "42"
