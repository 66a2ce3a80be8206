"""Materialized views with input-fingerprint invalidation.

The reference recomputes derived products (quicklooks, indexes,
timeline overviews) unconditionally per run; its only reuse is
file-existence checks (`maestro.py:488-617`). A warehouse wants
derived tables that (a) serve reads from materialized parquet, and
(b) rebuild EXACTLY when an input changed — not on a timer, not
always, not never.

Invalidation here is by input fingerprint: the (path, size, mtime) of
every file under each input root, hashed. That is the same signal a
file-based lakehouse (or `REFRESH MATERIALIZED VIEW` driven by a
manifest diff) keys on, works for plain parquet directories and for
SnapshotStore roots alike (a new snapshot commit changes the manifest
listing), and costs one directory walk — no data read.

`refresh()` is the only writer; `read()` never rebuilds implicitly
(a read path that can silently kick off a full recompute is an
operational foot-gun at 100 TB — staleness is surfaced instead).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(roots: list[str]) -> str:
    h = hashlib.sha256()
    for root in sorted(roots):
        for dirpath, dirs, files in os.walk(root):
            dirs.sort()
            for f in sorted(files):
                if f.startswith(".") or f.endswith(".crc"):
                    continue
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                h.update(f"{os.path.relpath(p, root)}|{st.st_size}|"
                         f"{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


class MaterializedView:
    def __init__(self, root: str, name: str,
                 build: Callable[[SparkSession], DataFrame],
                 inputs: list[str]):
        self.dir = os.path.join(root, name)
        self.meta_path = os.path.join(self.dir, "_mv.json")
        self.data_dir = os.path.join(self.dir, "data")
        self.build = build
        self.inputs = inputs

    def _meta(self) -> dict | None:
        if not os.path.exists(self.meta_path):
            return None
        with open(self.meta_path) as fh:
            return json.load(fh)

    def is_stale(self) -> bool:
        meta = self._meta()
        return meta is None or meta["fingerprint"] != _fingerprint(self.inputs)

    def refresh(self, spark: SparkSession, force: bool = False) -> bool:
        """Rebuild iff an input changed (or force). Returns whether a
        rebuild ran. The fingerprint is taken BEFORE the build: if an
        input changes mid-build, the view records the pre-build state
        and the next refresh() sees it stale again — never silently
        current."""
        if not force and not self.is_stale():
            return False
        fp = _fingerprint(self.inputs)
        self.build(spark).write.mode("overwrite").parquet(self.data_dir)
        os.makedirs(self.dir, exist_ok=True)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"fingerprint": fp, "inputs": self.inputs}, fh)
        os.replace(tmp, self.meta_path)
        return True

    def read(self, spark: SparkSession) -> DataFrame:
        """Serve the materialized data (never rebuilds — check
        `is_stale()` to decide whether to refresh first)."""
        if self._meta() is None:
            raise FileNotFoundError(
                f"materialized view never built: {self.dir}")
        return spark.read.parquet(self.data_dir)
