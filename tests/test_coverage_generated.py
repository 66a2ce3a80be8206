"""COVERAGE.md must equal a fresh generation (round-12 verdict #8:
keep the registry-to-document link machine-checked). A query added,
removed, or renamed without running `python tools/gen_coverage.py`
fails here — the generated appendix cannot silently drift the way a
hand-maintained table can."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_matches_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_coverage", os.path.join(REPO, "tools", "gen_coverage.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        on_disk = fh.read()
    assert on_disk == gen.render(), (
        "COVERAGE.md is stale — run `python tools/gen_coverage.py`")
