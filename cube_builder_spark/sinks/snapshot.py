"""Snapshot-versioned parquet store — time travel for cube products.

The reference reprocesses periods in place (`processing.py` re-runs a
merge/blend and overwrites the COGs; consumers see the change
immediately and the old product is gone). At warehouse scale that is
not acceptable: a reprocessing job must publish a NEW version while
running readers keep a consistent view, and a bad publish must be
revertible without recomputation. This store implements the minimal
manifest-log design behind Delta/Iceberg, over plain parquet:

- data files are immutable, written once under `data/`;
- each commit writes a JSON manifest `_manifests/v{N}.json` listing
  EXACTLY the files visible at that version (append = parent's list +
  new files; overwrite = new files only);
- readers resolve a version (default: latest) to its file list and
  read only those files — a reader holding version N is unaffected by
  later commits;
- rollback is a METADATA commit: a new version re-pointing at an old
  version's files (no data movement, instant);
- vacuum deletes files referenced by NO retained manifest.

Single-writer by assumption (the reference's Celery queue serializes
publishes the same way); the manifest is written last, so a crashed
commit leaves only unreferenced data files for vacuum to collect —
never a corrupt table.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..tables import local_df

_MANIFESTS = "_manifests"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, _MANIFESTS), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest log -------------------------------------------------
    def versions(self) -> list[int]:
        mdir = os.path.join(self.root, _MANIFESTS)
        return sorted(int(f[1:-5]) for f in os.listdir(mdir)
                      if f.startswith("v") and f.endswith(".json"))

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFESTS, f"v{version:05d}.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _commit(self, files: list[str], op: str,
                parent: int | None,
                extra: dict | None = None,
                ts: float | None = None) -> int:
        import time
        version = (self.versions() or [0])[-1] + 1
        manifest = {"version": version, "op": op, "parent": parent,
                    "ts": time.time() if ts is None else ts,
                    "files": sorted(files)}
        if extra:
            manifest.update(extra)
            # sequence-number back-fill: callers can't know the commit
            # version up front, so None seqs mean "this commit"
            fs = manifest.get("file_seq")
            if fs is not None:
                manifest["file_seq"] = {
                    p: (version if s is None else s)
                    for p, s in fs.items()}
            for d in manifest.get("deletes") or []:
                if d.get("seq") is None:
                    d["seq"] = version
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(version))  # atomic publish
        return version

    def version_at(self, timestamp: float) -> int:
        """Latest version committed at or before ``timestamp`` (unix
        seconds) — Delta's ``timestampAsOf`` resolution rule. Commits
        from pre-timestamp stores fall back to the manifest file's
        mtime. Raises if ``timestamp`` predates the first commit."""
        best = None
        for v in self.versions():
            m = self._read_manifest(v)
            ts = m.get("ts")
            if ts is None:
                ts = os.path.getmtime(self._manifest_path(v))
            if ts <= timestamp:
                best = v
        if best is None:
            raise ValueError(
                f"timestamp {timestamp} predates the first commit")
        return best

    # -- branch refs (Nessie/Iceberg-style named heads) ----------------
    # The manifest log stays one global append-only sequence of commit
    # ids; refs.json maps branch name -> head commit. Absent refs.json
    # (pre-branch stores) resolves main to the latest commit, so every
    # existing store keeps working unchanged.
    def _refs_path(self) -> str:
        return os.path.join(self.root, _MANIFESTS, "refs.json")

    def _read_refs(self) -> dict[str, int]:
        try:
            with open(self._refs_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _write_refs(self, refs: dict[str, int]) -> None:
        tmp = self._refs_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(refs, fh)
        os.replace(tmp, self._refs_path())

    def head(self, branch: str = "main") -> int | None:
        refs = self._read_refs()
        if branch in refs:
            return refs[branch]
        if branch == "main":
            vs = self.versions()
            return vs[-1] if vs else None
        raise ValueError(f"unknown branch {branch!r}")

    def branches(self) -> dict[str, int | None]:
        refs = self._read_refs()
        refs.setdefault("main", self.head("main"))
        return refs

    def create_branch(self, name: str,
                      from_version: int | None = None) -> int | None:
        """Point a new named ref at ``from_version`` (default: main's
        head). Metadata-only — no data moves, instant at any scale
        (the Nessie/Iceberg branch recipe)."""
        if name == "main":
            raise ValueError("main exists implicitly")
        refs = self._read_refs()
        if name in refs:
            raise ValueError(f"branch {name!r} already exists")
        head = self.head("main") if from_version is None else from_version
        refs.setdefault("main", self.head("main"))
        refs[name] = head
        self._write_refs(refs)
        return head

    def _is_ancestor(self, anc: int | None, desc: int | None) -> bool:
        """Walk desc's parent chain looking for anc. A None ancestor
        (empty branch point) is an ancestor of everything; a chain
        broken by expired manifests is treated as unprovable."""
        if anc is None:
            return True
        v = desc
        while v is not None:
            if v == anc:
                return True
            try:
                v = self._read_manifest(v).get("parent")
            except OSError:
                return False
        return False

    def merge_branch(self, name: str) -> int:
        """Fast-forward main to the branch head. Requires main's head
        to be an ancestor of the branch head (no commits landed on
        main since the branch point) — a diverged merge raises rather
        than guessing a three-way data merge; rebase by re-running
        the branch job on fresh main, the same discipline Nessie
        enforces by default."""
        refs = self._read_refs()
        if name not in refs:
            raise ValueError(f"unknown branch {name!r}")
        b_head = refs[name]
        m_head = self.head("main")
        if not self._is_ancestor(m_head, b_head):
            raise ValueError(
                f"branch {name!r} (head v{b_head}) has diverged from "
                f"main (head v{m_head}): fast-forward only")
        refs["main"] = b_head
        del refs[name]
        self._write_refs(refs)
        return b_head

    def _advance(self, branch: str, version: int) -> None:
        refs = self._read_refs()
        if branch != "main" and branch not in refs:
            raise ValueError(f"unknown branch {branch!r}")
        refs.setdefault("main", None)
        refs[branch] = version
        if refs.get("main") is None and branch == "main":
            refs["main"] = version
        self._write_refs(refs)

    # -- write path ---------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append",
              branch: str = "main", ts: float | None = None) -> int:
        """Commit ``df`` as a new version on ``branch`` (default
        main). ``mode='append'`` adds its files to the branch head's
        view; ``'overwrite'`` replaces the view. Data lands under a
        unique subdir first; the manifest commit is the only
        publication point, and the ref advance after it is what makes
        the commit visible on the branch.

        ``ts`` overrides the manifest's commit timestamp (for
        deterministic ``version_at`` / timestampAsOf scenarios —
        tests and the x_timestamp_travel oracle query); default is
        wall-clock."""
        sub = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("error").parquet(sub)
        new_files = sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith("."))
        return self.commit_staged(new_files, mode, mode=mode,
                                  branch=branch, ts=ts)

    def commit_staged(self, new_files: list[str], op: str,
                      mode: str = "append", branch: str = "main",
                      ts: float | None = None) -> int:
        """THE append/overwrite commit tail, shared by every staged-
        files writer (write, PartitionedStore.write, quality.
        publish_with_audit): parent = the branch head, merge-on-read
        state carried forward on append (Iceberg: an equality delete
        applies only to data files with a STRICTLY OLDER sequence
        number, so this append's rows are untouched by existing
        deletes; overwrite resets both), manifest commit, ref
        advance. One implementation on purpose — round 12 found a
        hand-rolled copy of this block in publish_with_audit that had
        drifted (no ref advance, no delete carry) and silently
        orphaned audited batches; a single helper makes the next rule
        change land everywhere at once. occ_append stays separate:
        its parent comes from the conflict-checked rebase, not the
        current head."""
        parent = self.head(branch)
        pm = self._read_manifest(parent) \
            if (parent is not None and mode == "append") else {}
        base = pm.get("files", [])
        file_seq = dict(pm.get("file_seq") or {})
        file_seq.update({p: None for p in new_files})
        extra = {"file_seq": file_seq}
        if pm.get("deletes"):
            extra["deletes"] = [dict(d) for d in pm["deletes"]]
        v = self._commit(base + list(new_files), op, parent,
                         extra=extra, ts=ts)
        self._advance(branch, v)
        return v

    def rollback(self, to_version: int) -> int:
        """Metadata-only revert of MAIN: new version = ``to_version``'s
        file list. Instant at any scale."""
        tm = self._read_manifest(to_version)
        extra = {k: tm[k] for k in ("file_seq", "deletes") if k in tm}
        v = self._commit(tm["files"], f"rollback[{to_version}]",
                         self.head("main"), extra=extra or None)
        self._advance("main", v)
        return v

    # -- read path ----------------------------------------------------
    def read(self, spark: SparkSession,
             version: int | None = None,
             branch: str = "main",
             timestamp: float | None = None) -> DataFrame:
        """The table AS OF ``version`` (default: the branch's head),
        or AS OF ``timestamp`` (unix seconds; resolved through
        ``version_at`` — mutually exclusive with ``version``).
        Empty-log or empty-file-list versions are an error — there is
        nothing to infer a schema from."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        v = self.head(branch) if version is None else version
        if v is None:
            raise FileNotFoundError(f"branch {branch!r} has no commits")
        m = self._read_manifest(v)
        files = m["files"]
        if not files:
            raise FileNotFoundError(f"version {v} is empty")
        deletes = m.get("deletes") or []
        if not deletes:
            return spark.read.parquet(*files)
        return self._apply_deletes(spark, m)

    def _apply_deletes(self, spark: SparkSession, m: dict) -> DataFrame:
        """Merge-on-read: a row in data file F (sequence s_F) is
        suppressed iff some equality-delete file D with seq > s_F
        matches its key — Iceberg's sequence rule, which is what makes
        a re-insert AFTER a delete survive. Physical shape: one scan
        per distinct data-file sequence (a lit tag, no shuffle), one
        BROADCAST anti-join per distinct delete key-set (delete files
        are key-only and delta-sized by contract — at 100 TB they
        broadcast while the data plane streams through unshuffled)."""
        file_seq = m.get("file_seq") or {}
        by_seq: dict[int, list[str]] = {}
        for p in m["files"]:
            by_seq.setdefault(int(file_seq.get(p, 0)), []).append(p)
        data = None
        for s, paths in sorted(by_seq.items()):
            part = spark.read.parquet(*paths).withColumn(
                "_fseq", F.lit(s))
            data = part if data is None else data.unionByName(part)
        by_keys: dict[tuple, list] = {}
        for d in m["deletes"]:
            by_keys.setdefault(tuple(d["key_cols"]), []).append(d)
        for key_cols, ds in sorted(by_keys.items()):
            dels = None
            for d in ds:
                one = spark.read.parquet(*d["paths"]).select(
                    *[F.col(c).alias(f"_d_{c}") for c in key_cols]
                ).withColumn("_dseq", F.lit(int(d["seq"])))
                dels = one if dels is None else dels.unionByName(one)
            cond = F.col("_dseq") > F.col("_fseq")
            for c in key_cols:
                # null-safe NOT used on purpose: a NULL key never
                # matches a delete (delete_keys' NULL-row safety rule)
                cond = cond & (F.col(c) == F.col(f"_d_{c}"))
            data = data.join(F.broadcast(dels), on=cond,
                             how="left_anti")
        return data.drop("_fseq")

    # -- maintenance --------------------------------------------------
    # -- stream idempotence ledger (sidecar, no file references) ------
    def _ledger_path(self) -> str:
        return os.path.join(self.root, _MANIFESTS, "stream_ledger.json")

    def _read_ledger(self) -> dict[str, int]:
        """run_id → highest batch_id folded in by expire(). Insertion
        order = fold order (oldest-expired run first)."""
        try:
            with open(self._ledger_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _write_ledger(self, ledger: dict[str, int]) -> None:
        tmp = self._ledger_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(ledger, fh)
        os.replace(tmp, self._ledger_path())

    def expire(self, keep_last: int,
               ledger_max_runs: int | None = None) -> list[int]:
        """Drop all but the newest ``keep_last`` manifests (readers of
        dropped versions lose time travel; current data unaffected).

        Stream idempotence survives WITHOUT pinning data: before a
        run's newest stream manifest (one carrying a batch_id) is
        dropped, its (run_id, batch_id) high-water mark is folded into
        a tiny sidecar ledger that write_stream_batch consults on
        replay — the Delta (txnAppId, txnVersion) recipe, kept apart
        from file-bearing manifests so vacuum() can reclaim an expired
        run's data files (round-7 advisor fix: retaining the manifest
        itself pinned one full snapshot's files per stream restart,
        forever).

        ``ledger_max_runs`` bounds the sidecar (Delta's
        setTransactionRetentionDuration analogue): keep only the most
        recently folded N runs' entries. Default None keeps all —
        entries are two small strings each; prune only when run_ids
        are generated per-restart and restarts are unbounded."""
        vs = self.versions()
        dropped = vs[:-keep_last] if keep_last > 0 else vs
        # a named ref's head must survive expiry — dropping it would
        # orphan the branch (its manifest IS its file list); main's
        # head is protected by the keep_last window itself
        protected = set(self._read_refs().values())
        dropped = [v for v in dropped if v not in protected]
        drop_set = set(dropped)
        ledger = self._read_ledger()
        changed = False
        for v in vs:
            m = self._read_manifest(v)
            bid = m.get("batch_id")
            if bid is not None and v in drop_set:
                rid = m.get("run_id", "batch")
                if bid > ledger.get(rid, -1):
                    ledger.pop(rid, None)   # re-insert: newest-last
                    ledger[rid] = bid
                    changed = True
        if ledger_max_runs is not None and len(ledger) > ledger_max_runs:
            ledger = dict(list(ledger.items())[-ledger_max_runs:])
            changed = True
        if changed:
            self._write_ledger(ledger)
        for v in dropped:
            os.remove(self._manifest_path(v))
        return dropped

    def data_files(self) -> list[str]:
        """Sorted physical parquet set under this store's data dir —
        the 'what is actually on disk' probe the orphan/zero-copy
        scenarios compare before and after an operation."""
        out = []
        for dirpath, _dirs, files in os.walk(os.path.join(self.root,
                                                          "data")):
            out.extend(os.path.join(dirpath, f) for f in files
                       if f.endswith(".parquet") and not f.startswith("."))
        return sorted(out)

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO retained manifest (crash
        leftovers and expired-version files)."""
        referenced: set[str] = set()
        for v in self.versions():
            m = self._read_manifest(v)
            referenced.update(m["files"])
            for d in m.get("deletes") or []:
                referenced.update(d["paths"])
        removed = []
        droot = os.path.join(self.root, "data")
        for dirpath, _dirs, files in os.walk(droot, topdown=False):
            for f in files:
                p = os.path.join(dirpath, f)
                # only data files: _SUCCESS markers and checksums are
                # harmless and never referenced by manifests
                if f.endswith(".parquet") and not f.startswith(".") \
                        and p not in referenced:
                    os.remove(p)
                    removed.append(p)
            if dirpath != droot and not os.listdir(dirpath):
                os.rmdir(dirpath)
        return removed


def snapshot_diff(store: SnapshotStore, spark: SparkSession,
                  v_old: int, v_new: int,
                  key_cols: list[str],
                  include_payload: bool = False) -> DataFrame:
    """Semantic diff between two versions keyed by ``key_cols``:
    one row per added / removed / changed key (unchanged rows are
    filtered out — at scale the diff is delta-sized, not
    table-sized). `change` ∈ {added, removed, changed}.

    Shape: ONE full-outer join on the key, non-key columns compared
    as structs — no per-column join, no collect. This is the review
    tool for a reprocessing publish: 'what did version N+1 actually
    change?' before flipping readers to it."""
    old = store.read(spark, v_old)
    new = store.read(spark, v_new)
    non_key = [c for c in old.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*non_key).alias("_o"))
    n = new.select(*[F.col(c).alias(f"_k_{c}") for c in key_cols],
                   F.struct(*non_key).alias("_n"))
    cond = None
    for c in key_cols:
        eq = F.col(c) == F.col(f"_k_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    change = (F.when(F.col("_o").isNull(), F.lit("added"))
              .when(F.col("_n").isNull(), F.lit("removed"))
              .when(F.col("_o") != F.col("_n"), F.lit("changed")))
    keys = [F.coalesce(F.col(c), F.col(f"_k_{c}")).alias(c)
            for c in key_cols]
    payload = ([F.col("_o").alias("old"), F.col("_n").alias("new")]
               if include_payload else [])
    return (j.select(change.alias("change"), *keys, *payload)
            .filter(F.col("change").isNotNull()))


def incremental_mv(mv_old: DataFrame, diff: DataFrame, group_col: str,
                   sums: dict[str, str],
                   count_col: str = "n_rows") -> DataFrame:
    """Incrementally maintain a per-group (count, SUM...) materialized
    aggregate from a payload-carrying CDC diff (``snapshot_diff(...,
    include_payload=True)``) — the classic self-maintainable-aggregate
    delta rules (Gupta & Mumick's materialized-view maintenance; the
    mechanism behind Delta/Snowflake incremental MVs).

    Each diff row contributes up to two signed deltas: the OLD side
    (removed/changed) subtracts (count 1, old values) under the OLD
    group, the NEW side (added/changed) adds under the NEW group — so
    updates that MOVE a row between groups maintain both groups
    correctly. The deltas union with the old MV rows and one groupBy
    re-sums; groups whose count reaches zero drop, matching a full
    recompute exactly (SUM/COUNT are exact integers, so incremental
    and recomputed MVs are bit-identical, not approximately equal).

    At 100 TB the point IS this shape: the work scales with the DELTA
    (changed keys) plus the MV size (groups), never with the table.
    ``sums`` maps MV column -> source column."""
    o = (diff.filter(F.col("change").isin("removed", "changed"))
         .select(F.col(f"old.{group_col}").alias(group_col),
                 F.lit(-1).cast("long").alias(count_col),
                 *[(-F.col(f"old.{src}")).cast("long").alias(dst)
                   for dst, src in sums.items()]))
    n = (diff.filter(F.col("change").isin("added", "changed"))
         .select(F.col(f"new.{group_col}").alias(group_col),
                 F.lit(1).cast("long").alias(count_col),
                 *[F.col(f"new.{src}").cast("long").alias(dst)
                   for dst, src in sums.items()]))
    base = mv_old.select(group_col, F.col(count_col).cast("long"),
                         *[F.col(dst).cast("long") for dst in sums])
    return (base.unionByName(o).unionByName(n)
            .groupBy(group_col)
            .agg(F.sum(count_col).alias(count_col),
                 *[F.sum(dst).alias(dst) for dst in sums])
            .filter(F.col(count_col) > 0))


def build_bloom_index(store: SnapshotStore, spark: SparkSession,
                      column: str, k: int = 3,
                      mbits: int = 4096) -> str:
    """Per-FILE Bloom index sidecar (Delta's bloom-filter-index
    analogue): one pass over the current version computes, for every
    data file, a small deterministic Bloom mask over ``column``
    (functions/bloom's exact affine hashes), persisted as
    ``_manifests/bloom_<column>.json``. Point lookups then skip files
    whose mask rejects the key — the data-skipping statistic footer
    min/max CANNOT provide on a hash-distributed (non-clustered)
    column, which is exactly where z-order/range pruning stops
    working.

    Build shape: one distributed scan tagged with
    ``_metadata.file_path``, explode of k positions, one
    map-side-combined groupBy((file, word)) bit_or, then a bounded
    collect of files x mbits/64 longs (64 longs per file at the
    default — sidecar stays metadata-sized up to very large file
    counts; past that, shard the sidecar like any manifest)."""
    from ..functions.bloom import _bit_of, positions

    head = store.head("main")
    files = store._read_manifest(head)["files"]
    df = (spark.read.parquet(*files)
          .select(F.col(column).alias("_k"),
                  F.col("_metadata.file_path").alias("_p")))
    pos = df.select(
        "_p", F.explode(F.array(*positions(F.col("_k"), k, mbits)))
        .alias("pos"))
    words = (pos.groupBy("_p",
                         F.floor(F.col("pos") / 64).cast("int").alias("w"))
             .agg(F.bit_or(_bit_of(F.col("pos"))).alias("bits"))
             .collect())
    import re as _re
    masks: dict[str, list[int]] = {}
    for r in words:
        # _metadata.file_path is a URI (file:/x, file:///x) — normalize
        # back to the manifest's plain os path
        path = _re.sub(r"^file:/+", "/", r._p)
        masks.setdefault(path, [0] * (mbits // 64))[int(r.w)] = int(r.bits)
    sidecar = os.path.join(store.root, _MANIFESTS,
                           f"bloom_{column}.json")
    tmp = sidecar + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"column": column, "k": k, "mbits": mbits,
                   "version": head, "masks": masks}, fh)
    os.replace(tmp, sidecar)
    return sidecar


def _bloom_might_contain(value, mask: list[int], k: int,
                         mbits: int) -> bool:
    """Driver-side twin of functions/bloom.might_contain — same affine
    positions, pure Python."""
    from ..functions.bloom import _PRIMES, _REDUCER
    folded = int(value) % _REDUCER
    if folded < 0:
        folded += _REDUCER
    for j in range(k):
        p = (folded * _PRIMES[j] + j) % mbits
        if not (mask[p // 64] >> (p % 64)) & 1:
            return False
    return True


def bloom_point_read(store: SnapshotStore, spark: SparkSession,
                     column: str, value,
                     version: int | None = None):
    """Point lookup through the Bloom sidecar: files whose mask
    rejects ``value`` are skipped WITHOUT opening them; files missing
    from the sidecar (appended after the index build) are
    conservatively read. Returns (DataFrame, n_read, n_total); the
    exact equality filter still applies — skipping is an optimization,
    never a filter. No false negatives by Bloom construction; false
    positives cost one extra file read each."""
    v = store.head("main") if version is None else version
    files = store._read_manifest(v)["files"]
    sidecar = os.path.join(store.root, _MANIFESTS,
                           f"bloom_{column}.json")
    try:
        with open(sidecar) as fh:
            idx = json.load(fh)
    except OSError:
        idx = {"masks": {}, "k": 3, "mbits": 4096}
    masks = idx["masks"]
    keep = [f for f in files
            if f not in masks
            or _bloom_might_contain(value, masks[f],
                                    idx["k"], idx["mbits"])]
    if not keep:
        # every file rejected: provably no match — empty frame with
        # the right schema (read one file's schema lazily, filter false)
        return (spark.read.parquet(files[0]).filter(F.lit(False)),
                0, len(files))
    return (spark.read.parquet(*keep).filter(F.col(column) == F.lit(value)),
            len(keep), len(files))


def merge_upsert(store: SnapshotStore, spark: SparkSession,
                 updates: DataFrame, key_col: str) -> tuple[int, int]:
    """Copy-on-write MERGE (whenMatched update-all / whenNotMatched
    insert-all, keyed on ``key_col``) as a snapshot commit — the
    upsert-publish the reference's in-place COG overwrite approximates
    without isolation (processing.py re-runs a period over the live
    product; here readers keep their version until the merge commits).

    Physical shape, Delta's MERGE strategy over plain parquet:
      1. footer min/max pruning finds the files that CAN hold a
         matched key — every other file carries over BY REFERENCE;
      2. touched files rewrite with matched rows REMOVED (broadcast
         anti-join against the update keys — the update set is
         delta-sized by contract);
      3. the full update batch appends as new files (updated rows +
         brand-new rows land together);
      4. one manifest commit makes all of it visible atomically.

    A batch carrying the same non-NULL key twice is REJECTED before
    anything commits: the key is the store's row IDENTITY (delete_keys
    / scd2_merge / CDC replication all key on it), and since step 3
    appends the WHOLE batch, both rows would land — two live rows for
    one identity, the silent corruption Delta's MERGE reports as
    "multiple source rows matched". Deduplicate upstream
    (last-per-key) and re-submit; NULL-key rows are exempt (they
    never match and insert independently, SQL MERGE semantics).

    Returns (new_version, n_files_rewritten). At 100 TB the rewrite
    is O(files-holding-matched-keys) on a clustered table, the
    anti-join broadcasts, and a crash anywhere before the manifest
    write leaves only vacuumable orphans. NULL-key base rows never
    match (anti-join null semantics) and are preserved. Refuses on
    pending merge-on-read deletes for the same reason delete_keys
    does: the rewrite would re-sequence touched files past them."""
    import pyarrow.parquet as pq

    dup = (updates.filter(F.col(key_col).isNotNull())
           .groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 1).limit(4).collect())
    if dup:
        keys = ", ".join(str(r[key_col]) for r in dup[:3])
        raise ValueError(
            f"merge_upsert: update batch carries duplicate {key_col} "
            f"values ({keys}{', …' if len(dup) > 3 else ''}) — the "
            "whole batch appends, so both rows would survive as two "
            "live rows for one identity; deduplicate to one row per "
            "key (last-per-key) and re-submit")

    head = store.head("main")
    m = store._read_manifest(head)
    if m.get("deletes"):
        raise ValueError(
            "pending merge-on-read deletes: run materialize_deletes() "
            "before merge_upsert()")
    file_seq = m.get("file_seq") or {}
    keys = updates.select(key_col).dropDuplicates()

    # driver-side key values for footer pruning (same strategy as
    # delete_keys): a MERGE batch is delta-sized by contract, so the
    # key list collects; past the cap, fall back to the global
    # [min, max] envelope — still correct, just coarser (a batch
    # mixing low update keys with high insert keys overlaps
    # everything under the envelope, which is exactly why the
    # per-key test is the default)
    max_pruning_keys = 100_000
    kvals = [r[0] for r in keys.limit(max_pruning_keys + 1).collect()]
    if len(kvals) > max_pruning_keys:
        env = keys.agg(F.min(key_col), F.max(key_col)).collect()[0]
        probe = [(env[0], env[1])] if env[0] is not None else []
    else:
        probe = [(v, v) for v in kvals if v is not None]

    def may_match(path: str) -> bool:
        if not probe:
            return False        # all-NULL update keys match nothing
        try:
            meta = pq.ParquetFile(path).metadata
        except Exception:
            return True
        if meta.num_row_groups == 0:
            return False
        idx = next((i for i in range(meta.num_columns)
                    if meta.row_group(0).column(i).path_in_schema
                    == key_col), None)
        if idx is None:
            return True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return True
            if any(st.min <= hi and lo <= st.max for lo, hi in probe):
                return True
        return False

    touched = [f for f in m["files"] if may_match(f)]
    kept = [f for f in m["files"] if f not in set(touched)]
    new_files = list(kept)
    new_seq = {p: file_seq.get(p, 0) for p in kept}
    if touched:
        sub = os.path.join(store.root, "data", uuid.uuid4().hex)
        (spark.read.parquet(*touched)
         .join(F.broadcast(keys), key_col, "left_anti")
         .write.mode("error").parquet(sub))
        rewritten = sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith("."))
        new_files += rewritten
        new_seq.update({p: None for p in rewritten})
    subu = os.path.join(store.root, "data", uuid.uuid4().hex)
    updates.write.mode("error").parquet(subu)
    upserted = sorted(
        os.path.join(subu, f) for f in os.listdir(subu)
        if f.endswith(".parquet") and not f.startswith("."))
    new_files += upserted
    new_seq.update({p: None for p in upserted})
    v = store._commit(new_files, f"merge[{key_col}]", head,
                      extra={"file_seq": new_seq})
    store._advance("main", v)
    return v, len(touched)


def minmax_dirty_groups(mv_old: DataFrame, diff: DataFrame,
                        group_col: str,
                        mins: dict[str, str],
                        maxs: dict[str, str]) -> DataFrame:
    """Groups whose stored MIN/MAX may be invalidated by this diff:
    a removed (or changed-away) row whose old value TIES the group's
    stored extreme. Conservative — removing one of several tied rows
    flags the group even though the extreme survives — which is the
    correct trade: recomputing a falsely-flagged group is cheap and
    exact, missing a truly-dirty one is silent corruption."""
    old_side = (diff.filter(F.col("change").isin("removed", "changed"))
                .select(F.col(f"old.{group_col}").alias(group_col),
                        *[F.col(f"old.{src}").alias(f"_o_{dst}")
                          for dst, src in {**mins, **maxs}.items()]))
    j = old_side.join(mv_old, group_col)
    cond = F.lit(False)
    for dst in mins:
        cond = cond | (F.col(f"_o_{dst}") <= F.col(dst))
    for dst in maxs:
        cond = cond | (F.col(f"_o_{dst}") >= F.col(dst))
    return j.filter(cond).select(group_col).dropDuplicates()


def incremental_mv_minmax(mv_old: DataFrame, diff: DataFrame,
                          base_new: DataFrame, group_col: str,
                          mins: dict[str, str], maxs: dict[str, str],
                          count_col: str = "n_rows") -> DataFrame:
    """Incrementally maintain a per-group (count, MIN..., MAX...) MV
    from a payload-carrying CDC diff — the NON-self-maintainable half
    of Gupta-Mumick view maintenance. SUM/COUNT roll forward from
    deltas alone (`incremental_mv`); MIN/MAX only half do: an INSERT
    merges with least()/greatest(), but a DELETE that removes the
    stored extreme cannot be repaired from the delta — the new extreme
    lives in rows the diff never mentions. The standard refinement
    (what Snowflake/Materialize do under the hood) recomputes ONLY the
    affected groups:

    - clean existing groups: count += deltas, min = least(stored,
      min(added values)), max = greatest(stored, max(added)) —
      delta-sized work;
    - DIRTY groups (a removed old value ties the stored extreme, per
      `minmax_dirty_groups`): recomputed exactly from ``base_new``
      restricted to those groups — a semi-joined scan, not a full
      re-aggregation;
    - brand-new groups: aggregated from the diff's added side alone;
    - groups whose count reaches zero drop.

    At 100 TB the work is O(diff + MV + rows-of-dirty-groups); a
    workload where every delete hits a group extreme degenerates to
    the full recompute it genuinely requires. Exact integers
    throughout — incremental and recomputed MVs are bit-identical.
    ``base_new`` MUST be the post-diff version's table (e.g.
    ``store.read(spark, v_new)``)."""
    vals = {**mins, **maxs}
    dirty = minmax_dirty_groups(mv_old, diff, group_col, mins, maxs)

    def agg_exprs():
        return ([F.count(F.lit(1)).cast("long").alias(count_col)]
                + [F.min(F.col(src)).cast("long").alias(dst)
                   for dst, src in mins.items()]
                + [F.max(F.col(src)).cast("long").alias(dst)
                   for dst, src in maxs.items()])

    # exact recompute of dirty groups from the new base (semi-join
    # keeps the scan restricted; the groupBy only sees dirty rows)
    recomputed = (base_new.join(dirty, group_col, "left_semi")
                  .groupBy(group_col).agg(*agg_exprs()))

    new_side = (diff.filter(F.col("change").isin("added", "changed"))
                .select(F.col(f"new.{group_col}").alias(group_col),
                        *[F.col(f"new.{src}").alias(src)
                          for src in dict.fromkeys(vals.values())]))
    added = new_side.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_add_n"),
        *[F.min(F.col(src)).cast("long").alias(f"_add_min_{dst}")
          for dst, src in mins.items()],
        *[F.max(F.col(src)).cast("long").alias(f"_add_max_{dst}")
          for dst, src in maxs.items()])
    removed_n = (diff.filter(F.col("change").isin("removed", "changed"))
                 .groupBy(F.col(f"old.{group_col}").alias(group_col))
                 .agg(F.count(F.lit(1)).cast("long").alias("_rm_n")))

    clean = (mv_old.join(dirty, group_col, "left_anti")
             .join(added, group_col, "left")
             .join(removed_n, group_col, "left")
             .select(
                 group_col,
                 (F.col(count_col) + F.coalesce(F.col("_add_n"), F.lit(0))
                  - F.coalesce(F.col("_rm_n"), F.lit(0)))
                 .cast("long").alias(count_col),
                 *[F.least(F.col(dst), F.col(f"_add_min_{dst}"))
                   .cast("long").alias(dst) for dst in mins],
                 *[F.greatest(F.col(dst), F.col(f"_add_max_{dst}"))
                   .cast("long").alias(dst) for dst in maxs])
             .filter(F.col(count_col) > 0))

    # brand-new groups: in the added side, known to neither MV nor
    # dirty set — their aggregates come from the diff alone
    brand_new = (added.join(mv_old.select(group_col), group_col, "left_anti")
                 .join(dirty, group_col, "left_anti")
                 .select(group_col,
                         F.col("_add_n").alias(count_col),
                         *[F.col(f"_add_min_{dst}").alias(dst)
                           for dst in mins],
                         *[F.col(f"_add_max_{dst}").alias(dst)
                           for dst in maxs]))
    cols = [group_col, count_col, *mins, *maxs]
    # The three branches are DISJOINT by group (clean excludes dirty;
    # brand-new excludes both), so the closing aggregate is an
    # identity — but it is load-bearing: returning the raw union
    # exposes Spark's partition-preserving union execution to the
    # NEXT maintenance cycle, where a nested union whose children
    # disagree on partition count aborts with "Can't zip RDDs with
    # unequal numbers of partitions" (observed 8 vs 3x8 on the
    # randomized test; a plain repartition gets elided as redundant
    # because the union ADVERTISES the children's hash partitioning).
    # Ending in an aggregate — the same shape incremental_mv has —
    # yields a single well-partitioned output. MV-sized, trivial.
    return (clean.select(*cols)
            .unionByName(recomputed.select(*cols))
            .unionByName(brand_new.select(*cols))
            .groupBy(group_col)
            .agg(F.max(count_col).alias(count_col),
                 *[F.max(dst).alias(dst) for dst in {**mins, **maxs}]))


def delete_keys(store: SnapshotStore, spark: SparkSession,
                keys: list, key_col: str) -> tuple[int, int]:
    """Targeted row deletion (the GDPR/right-to-erasure path): rewrite
    ONLY the data files whose parquet footer min/max for ``key_col``
    can contain a deleted key — every other file carries over into the
    new version BY REFERENCE (zero bytes moved). Returns
    (new_version, n_files_rewritten).

    This is the Delta DELETE file-pruning strategy: at scale a delete
    of k keys touches O(k) files of a z-ordered/clustered table, not
    the whole dataset. Files without footer stats are conservatively
    rewritten. The rewrite itself is one filtered read of the touched
    files — the anti-join is a literal IN filter for bounded key
    lists."""
    import pyarrow.parquet as pq

    current = store.head("main")
    cm = store._read_manifest(current)
    if cm.get("deletes"):
        # a merge-on-write rewrite would re-sequence the touched files
        # PAST the pending equality deletes, silently resurrecting
        # their rows — fold the sidecars in first
        raise ValueError(
            "pending merge-on-read deletes: run materialize_deletes() "
            "before a merge-on-write delete_keys()")
    files = cm["files"]
    skeys = sorted(keys)

    def may_contain(path: str) -> bool:
        try:
            meta = pq.ParquetFile(path).metadata
        except Exception:
            return True
        if meta.num_row_groups == 0:
            # a zero-row-group file (a filtered rewrite that emptied a
            # partition, an empty append) holds no rows at all — it
            # cannot contain a deleted key, and probing row_group(0)
            # for the column index would raise IndexError (found by
            # the round-12 delete-plane randomized differential)
            return False
        idx = None
        for i in range(meta.num_columns):
            if meta.row_group(0).column(i).path_in_schema == key_col:
                idx = i
                break
        if idx is None:
            return True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return True
            if any(st.min <= k <= st.max for k in skeys):
                return True
        return False

    touched = [f for f in files if may_contain(f)]
    kept = [f for f in files if f not in set(touched)]
    new_files = list(kept)
    if touched:
        sub = os.path.join(store.root, "data", uuid.uuid4().hex)
        # NOT isin(keys) is NULL (not true) for NULL keys — keep
        # NULL-key rows explicitly so only the targeted keys vanish
        (spark.read.parquet(*touched)
         .filter(F.col(key_col).isNull() | ~F.col(key_col).isin(keys))
         .write.mode("error").parquet(sub))
        new_files += sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith("."))
    version = store._commit(new_files, f"delete[{key_col}]", current)
    store._advance("main", version)
    return version, len(touched)


def delete_keys_mor(store: SnapshotStore, spark: SparkSession,
                    keys: DataFrame, key_cols: list[str],
                    branch: str = "main") -> int:
    """Merge-on-read DELETE (Iceberg equality-delete / Delta deletion-
    vector analogue): commit a NEW version whose DATA FILE LIST IS
    UNCHANGED — the delete is a small key-only parquet sidecar the
    read path anti-joins away. Contrast `delete_keys`, which rewrites
    the touched files at commit time (merge-on-write).

    Why both exist: at 100 TB a GDPR delete of a few thousand keys
    under merge-on-write rewrites every footer-matching file NOW —
    minutes of I/O on the write path; merge-on-read commits in
    milliseconds and defers the rewrite to `materialize_deletes` /
    compaction, paying a broadcast anti-join per read until then.
    That is exactly Delta's deletion-vector trade.

    Sequence semantics: the delete's seq = this commit's version; it
    suppresses matching keys only in data files with STRICTLY OLDER
    seqs, so rows (re-)appended after the delete are untouched."""
    head = store.head(branch)
    if head is None:
        raise FileNotFoundError(f"branch {branch!r} has no commits")
    m = store._read_manifest(head)
    sub = os.path.join(store.root, "data", uuid.uuid4().hex + "-del")
    keys.select(*key_cols).dropDuplicates().write.mode(
        "error").parquet(sub)
    paths = sorted(os.path.join(sub, f) for f in os.listdir(sub)
                   if f.endswith(".parquet") and not f.startswith("."))
    deletes = [dict(d) for d in m.get("deletes") or []]
    deletes.append({"paths": paths, "key_cols": list(key_cols),
                    "seq": None})
    extra = {"deletes": deletes}
    if m.get("file_seq"):
        extra["file_seq"] = m["file_seq"]
    v = store._commit(m["files"], f"delete-mor[{','.join(key_cols)}]",
                      head, extra=extra)
    store._advance(branch, v)
    return v


def materialize_deletes(store: SnapshotStore, spark: SparkSession,
                        max_pruning_keys: int = 100_000
                        ) -> tuple[int, int]:
    """Fold pending merge-on-read deletes into the data files (the
    compaction half of the deletion-vector trade): rewrite ONLY the
    files that can contain a deleted key — parquet footer min/max
    pruning, same strategy as `delete_keys` — and commit a clean
    manifest with no delete entries. Untouched files carry over BY
    REFERENCE with their sequence numbers intact. Returns
    (new_version, n_files_rewritten).

    Pruning needs the key values driver-side; delete sidecars are
    delta-sized by contract, but if they exceed ``max_pruning_keys``
    the rewrite falls back to anti-joining every file (correct,
    unpruned) instead of collecting unbounded state."""
    import pyarrow.parquet as pq

    head = store.head("main")
    m = store._read_manifest(head)
    deletes = m.get("deletes") or []
    if not deletes:
        return head, 0
    file_seq = m.get("file_seq") or {}
    max_dseq = {}      # key_cols tuple -> newest delete seq
    for d in deletes:
        kc = tuple(d["key_cols"])
        max_dseq[kc] = max(max_dseq.get(kc, -1), int(d["seq"]))

    # driver-side pruning keys, bounded
    prunable: dict[tuple, list] | None = {}
    single_key = [kc for kc in max_dseq if len(kc) == 1]
    total = 0
    for d in deletes:
        kc = tuple(d["key_cols"])
        if kc not in single_key:
            prunable = None
            break
        vals = [r[0] for r in
                spark.read.parquet(*d["paths"]).limit(
                    max_pruning_keys + 1).collect()]
        total += len(vals)
        if total > max_pruning_keys:
            prunable = None
            break
        prunable.setdefault(kc, []).extend(vals)

    def may_contain(path: str, col: str, vals: list) -> bool:
        try:
            meta = pq.ParquetFile(path).metadata
        except Exception:
            return True
        if meta.num_row_groups == 0:
            return False        # zero rows — nothing to suppress
        idx = next((i for i in range(meta.num_columns)
                    if meta.row_group(0).column(i).path_in_schema
                    == col), None)
        if idx is None:
            return True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return True
            if any(st.min <= k <= st.max
                   for k in vals if k is not None):
                return True
        return False

    touched = []
    for p in m["files"]:
        s = int(file_seq.get(p, 0))
        applicable = [kc for kc, ds in max_dseq.items() if ds > s]
        if not applicable:
            continue
        if prunable is None or any(
                may_contain(p, kc[0], prunable[kc])
                for kc in applicable):
            touched.append(p)
    kept = [p for p in m["files"] if p not in set(touched)]
    new_files = list(kept)
    new_seq = {p: file_seq.get(p, 0) for p in kept}
    if touched:
        # read ONLY the touched files through the MoR anti-join view
        sub_m = dict(m, files=touched,
                     file_seq={p: file_seq.get(p, 0) for p in touched})
        clean = store._apply_deletes(spark, sub_m)
        sub = os.path.join(store.root, "data", uuid.uuid4().hex)
        clean.write.mode("error").parquet(sub)
        rewritten = sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.endswith(".parquet") and not f.startswith("."))
        new_files += rewritten
        new_seq.update({p: None for p in rewritten})
    v = store._commit(new_files, "materialize-deletes", head,
                      extra={"file_seq": new_seq})
    store._advance("main", v)
    return v, len(touched)


def metadata_stats(store: SnapshotStore, spark: SparkSession,
                   columns: list[str],
                   version: int | None = None) -> DataFrame:
    """Metadata-ONLY aggregates — count(*) plus per-column
    min/max/null-count resolved entirely from the parquet footers of
    the manifest's file list, zero data bytes read. This is Iceberg's
    metadata-table / Delta's count(*)-from-stats fast path: at 100 TB
    a row count or a column range is a manifest-sized walk (one footer
    fetch per file — already resident for any engine that plans
    predicates), not a table scan. Correct BY CONSTRUCTION against
    the store's own invariants: data files are immutable and
    merge-on-WRITE deletes rewrite the touched files, so footer stats
    describe exactly the live rows of the version. Pending
    merge-on-READ deletes break that premise (footers still count
    suppressed rows), so such versions are rejected — materialize
    first.

    Integer-statistic columns only (the exactness contract — parquet
    string stats may be truncated); raises TypeError otherwise, and
    ValueError when a footer lacks the needed statistics. Returns one
    row per requested column: (column, n_rows, n_nulls, min_val,
    max_val)."""
    import pyarrow.parquet as pq

    v = store.head("main") if version is None else version
    vm = store._read_manifest(v)
    if vm.get("deletes"):
        raise ValueError(
            "version has pending merge-on-read deletes: footer stats "
            "would overcount; run materialize_deletes() first")
    files = vm["files"]
    n_rows = 0
    acc = {c: {"nulls": 0, "min": None, "max": None} for c in columns}
    for path in files:
        meta = pq.ParquetFile(path).metadata
        n_rows += meta.num_rows
        idx = {}
        for i in range(meta.num_columns):
            name = meta.row_group(0).column(i).path_in_schema \
                if meta.num_row_groups else None
            if name in acc:
                idx[name] = i
        missing = [c for c in columns
                   if c not in idx and meta.num_row_groups]
        if missing:
            raise ValueError(f"{path} lacks column(s) {missing}")
        for rg in range(meta.num_row_groups):
            for c, i in idx.items():
                st = meta.row_group(rg).column(i).statistics
                if st is None or st.null_count is None:
                    raise ValueError(f"{path} rg{rg} has no stats for {c}")
                a = acc[c]
                a["nulls"] += st.null_count
                nvals = meta.row_group(rg).column(i).num_values
                if nvals and not st.has_min_max:
                    raise ValueError(f"{path} rg{rg} no min/max for {c}")
                if nvals:
                    if not isinstance(st.min, int):
                        raise TypeError(
                            f"{c}: integer-statistic columns only "
                            f"(footer min is {type(st.min).__name__})")
                    a["min"] = (st.min if a["min"] is None
                                else min(a["min"], st.min))
                    a["max"] = (st.max if a["max"] is None
                                else max(a["max"], st.max))
    rows = [(c, n_rows, acc[c]["nulls"], acc[c]["min"], acc[c]["max"])
            for c in columns]
    return local_df(spark, 
        rows, "col_name string, n_rows long, n_nulls long, "
              "min_val long, max_val long")


def read_merged_schema(store: SnapshotStore, spark: SparkSession,
                       version: int | None = None) -> DataFrame:
    """Schema-evolution read: union the schemas of every file in the
    version (columns added by later appends come back as NULL for
    older files) — `mergeSchema`, scoped to the manifest's file
    list."""
    vs = store.versions()
    v = vs[-1] if version is None else version
    files = store._read_manifest(v)["files"]
    return (spark.read.option("mergeSchema", "true").parquet(*files))


def _active_run_id(df: DataFrame) -> str:
    """Best-effort run id for idempotent stream commits: the session's
    single active streaming query's runId (the foreachBatch case), else
    the plain-batch constant.

    Two or more active streams are AMBIGUOUS — guessing (or falling
    back to the shared constant) would let two concurrent streams share
    one (run_id, batch_id) ledger, silently skipping batches — so that
    case raises and the caller must pass run_id explicitly. Zero active
    streams is the plain-batch path, but foreachBatch hands the batch a
    CLONED session whose StreamingQueryManager may not list the query,
    so foreachBatch callers should not rely on the default either (see
    write_stream_batch's usage example); the fallback is logged."""
    active = []
    try:
        active = list(df.sparkSession.streams.active)
    except Exception:
        pass
    if len(active) == 1:
        return str(active[0].runId)
    if len(active) > 1:
        raise ValueError(
            f"{len(active)} streaming queries are active — the commit "
            "ledger cannot infer which one this batch belongs to; pass "
            "run_id=str(query.runId) to write_stream_batch explicitly")
    import logging
    logging.getLogger(__name__).info(
        "write_stream_batch: no visible active stream; using the shared "
        "'batch' run_id (pass run_id explicitly from foreachBatch — the "
        "cloned session may hide the query)")
    return "batch"


def write_stream_batch(store: SnapshotStore, df: DataFrame,
                       batch_id: int, mode: str = "append",
                       run_id: str | None = None) -> int | None:
    """Idempotent foreachBatch sink: commit a micro-batch as a new
    snapshot version EXACTLY ONCE. Structured Streaming re-delivers a
    batch after a failure/restart with the SAME batch_id; the manifest
    records (run_id, batch_id) — the Delta idempotent-writer
    (txnAppId, txnVersion) recipe — and a replayed batch of the SAME
    run is skipped (returns None), so the table never double-counts.
    A stream restarted with a FRESH checkpoint restarts batch ids at 0
    under a NEW run_id and its commits land; comparing batch_id alone
    would silently drop them all.

    ``run_id`` defaults to the DataFrame's streaming-query run id when
    exactly one is visibly active, else a per-store constant (plain
    batch callers); >1 active streams raise. foreachBatch should pass
    it EXPLICITLY — the batch gets a cloned session whose
    StreamingQueryManager may not list the query, and the fallback
    constant would merge two streams' ledgers.

    Usage::

        q = (stream.writeStream.foreachBatch(
                lambda b, i: write_stream_batch(
                    store, b, i, run_id=checkpoint_name))
             .start())

    (any per-stream-stable token works as run_id — the checkpoint
    location is the natural one, mirroring Delta's txnAppId.)
    """
    if run_id is None:
        run_id = _active_run_id(df)
    found_run = False
    for v in reversed(store.versions()):
        m = store._read_manifest(v)
        bid = m.get("batch_id")
        if bid is None:
            continue  # non-stream commit interleaved; keep scanning
        if m.get("run_id", run_id) == run_id:
            # last commit of THIS run found: replay iff not newer
            if batch_id <= bid:
                return None
            found_run = True
            break
        # a different run's commit: keep scanning for ours
    if not found_run:
        # this run's manifests may have been expire()d — the sidecar
        # ledger keeps its batch high-water mark without pinning files
        led = store._read_ledger().get(run_id)
        if led is not None and batch_id <= led:
            return None
    sub = os.path.join(store.root, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(sub)
    new_files = sorted(
        os.path.join(sub, f) for f in os.listdir(sub)
        if f.endswith(".parquet") and not f.startswith("."))
    parent = store.head("main")
    pm = store._read_manifest(parent) \
        if (parent is not None and mode == "append") else {}
    base = pm.get("files", [])
    version = (store.versions() or [0])[-1] + 1
    manifest = {"version": version, "op": f"stream[{batch_id}]",
                "mode": mode, "parent": parent, "batch_id": batch_id,
                "run_id": run_id, "files": sorted(base + new_files)}
    # carry merge-on-read state exactly as SnapshotStore.write does:
    # this batch's files get seq = this version, so pending equality
    # deletes (strictly older) never suppress freshly streamed rows
    file_seq = dict(pm.get("file_seq") or {})
    file_seq.update({p: version for p in new_files})
    manifest["file_seq"] = file_seq
    if pm.get("deletes"):
        manifest["deletes"] = [dict(d) for d in pm["deletes"]]
    tmp = store._manifest_path(version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, store._manifest_path(version))
    store._advance("main", version)
    return version


def optimize_zorder(store: SnapshotStore, spark: SparkSession,
                    xcol: str, ycol: str, bits: int = 10,
                    npartitions: int | None = None) -> int:
    """OPTIMIZE ... ZORDER BY over the store: rewrite the CURRENT
    version's data Morton-clustered (each output file owns a disjoint
    z-range ⇒ tight min/max on both axes ⇒ bbox file pruning) and
    commit it as a new version. Metadata history is preserved — the
    un-clustered version remains readable until expired, so the
    rewrite is safely abortable at any point (manifest-last
    invariant)."""
    from ..functions.zorder import layout

    current = store.read(spark)
    laid = layout(current, xcol, ycol, bits=bits,
                  npartitions=npartitions)
    return store.write(laid, mode="overwrite")


# -- hidden partitioning + partition-spec evolution (Iceberg-style) ----------
#
# The store's partition layout is METADATA, not schema: writers declare a
# transform over a data column (day(ts), month(ts), identity(k)); the
# store derives each file's partition value at write time and records it
# in a sidecar (path -> {spec_id, pv}), so readers never see a partition
# column and never mention one in queries. Because the binding is
# per-FILE, the spec can EVOLVE without rewriting history: old files
# keep their old spec, new files use the new one, and a pruned read
# evaluates every file under the spec it was written with — exactly the
# Iceberg partition-spec-evolution contract the reference's fixed
# directory layout (Item.assets paths) cannot express.

_TRANSFORMS = ("day", "month", "identity")


def _partition_expr(spec: dict):
    col = F.col(spec["column"])
    if spec["transform"] == "day":
        return F.datediff(col.cast("date"), F.to_date(F.lit("1970-01-01")))
    if spec["transform"] == "month":
        return F.year(col) * 12 + F.month(col) - 1
    if spec["transform"] == "identity":
        return col.cast("long")
    raise ValueError(f"unknown transform {spec['transform']!r}")


def _pv_time_range(spec: dict, pv: int):
    """[start, end) wall-time coverage of partition value ``pv`` —
    the inverse the pruner needs. None = not a time transform."""
    import datetime
    if spec["transform"] == "day":
        start = datetime.datetime(1970, 1, 1) + datetime.timedelta(days=pv)
        return start, start + datetime.timedelta(days=1)
    if spec["transform"] == "month":
        y, m = divmod(pv, 12)
        nxt = (y + 1, 1) if m == 11 else (y, m + 2)
        return (datetime.datetime(y, m + 1, 1),
                datetime.datetime(nxt[0], nxt[1], 1))
    return None


class PartitionedStore:
    """Hidden-partitioning facade over a SnapshotStore: same manifest
    log, same versions/branches/time travel, plus a spec registry
    (``_manifests/specs.json``) and a per-file partition sidecar
    (``_manifests/filemeta.json``). Both sidecars are tiny metadata —
    at 100 TB the file count, not the data, bounds them, and the
    pruner's work is O(files), all driver-side, exactly like an
    Iceberg manifest scan."""

    def __init__(self, store: SnapshotStore):
        self.store = store

    # -- spec registry ------------------------------------------------
    def _specs_path(self) -> str:
        return os.path.join(self.store.root, _MANIFESTS, "specs.json")

    def _read_specs(self) -> dict:
        try:
            with open(self._specs_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"current": None, "specs": {}}

    def set_partition_spec(self, transform: str, column: str) -> int:
        """Register (or re-activate) a spec; future writes use it.
        Pure metadata — no files move. Returns the spec id."""
        if transform not in _TRANSFORMS:
            raise ValueError(f"unknown transform {transform!r}")
        reg = self._read_specs()
        for sid, spec in reg["specs"].items():
            if spec == {"transform": transform, "column": column}:
                reg["current"] = int(sid)
                break
        else:
            sid = len(reg["specs"]) + 1
            reg["specs"][str(sid)] = {"transform": transform,
                                      "column": column}
            reg["current"] = sid
        with open(self._specs_path(), "w") as fh:
            json.dump(reg, fh)
        return int(reg["current"])

    # -- file partition sidecar ---------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.store.root, _MANIFESTS, "filemeta.json")

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    # -- write / read -------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append",
              branch: str = "main") -> int:
        """Commit ``df`` laid out by the CURRENT spec (one directory
        per partition value, partition column hidden — derived, never
        stored in the data files)."""
        reg = self._read_specs()
        if reg["current"] is None:
            return self.store.write(df, mode=mode, branch=branch)
        spec_id = reg["current"]
        spec = reg["specs"][str(spec_id)]
        sub = os.path.join(self.store.root, "data", uuid.uuid4().hex)
        df.withColumn("_pv", _partition_expr(spec)) \
            .write.mode("error").partitionBy("_pv").parquet(sub)
        new_files, meta = [], self._read_meta()
        for dp, _dirs, fs in os.walk(sub):
            for f in fs:
                if f.endswith(".parquet") and not f.startswith("."):
                    path = os.path.join(dp, f)
                    pv = int(os.path.basename(dp).split("=", 1)[1])
                    new_files.append(path)
                    meta[path] = {"spec_id": spec_id, "pv": pv}
        with open(self._meta_path(), "w") as fh:
            json.dump(meta, fh)
        # same merge-on-read carry as SnapshotStore.write — the one
        # shared commit tail (commit_staged)
        return self.store.commit_staged(sorted(new_files), mode,
                                        mode=mode, branch=branch)

    def read_pruned(self, spark: SparkSession, column: str,
                    lo, hi, version: int | None = None,
                    branch: str = "main"):
        """The table AS OF ``version`` restricted to files whose
        partition can intersect ``lo <= column < hi`` — each file
        judged under ITS OWN spec (evolution-safe); files with no
        partition metadata or a different partition column are
        conservatively kept. Returns (DataFrame, n_read, n_total);
        the caller still applies the exact row predicate — pruning is
        a file-skipping optimization, never a filter."""
        v = self.store.head(branch) if version is None else version
        files = self.store._read_manifest(v)["files"]
        meta, reg = self._read_meta(), self._read_specs()
        keep = []
        for f in files:
            m = meta.get(f)
            if m is None:
                keep.append(f)
                continue
            spec = reg["specs"][str(m["spec_id"])]
            if spec["column"] != column:
                keep.append(f)
                continue
            rng = _pv_time_range(spec, m["pv"])
            if rng is None or (rng[0] < hi and lo < rng[1]):
                keep.append(f)
        if not keep:
            raise FileNotFoundError(
                f"no files overlap [{lo}, {hi}) at version {v}")
        m = self.store._read_manifest(v)
        if m.get("deletes"):
            # merge-on-read composes with pruning: apply the equality
            # deletes over the KEPT files only (a restricted manifest)
            sub = dict(m, files=keep)
            return (self.store._apply_deletes(spark, sub),
                    len(keep), len(files))
        return spark.read.parquet(*keep), len(keep), len(files)


# -- CHECK constraints (round 9) ----------------------------------------------

class ConstraintViolation(ValueError):
    """A checked_write batch broke a table CHECK constraint."""

    def __init__(self, name: str, expr: str, n_bad: int):
        super().__init__(
            f"CHECK constraint {name!r} ({expr}) violated by "
            f"{n_bad} row(s); commit refused")
        self.name = name
        self.expr = expr
        self.n_bad = n_bad


def _constraints_path(store: SnapshotStore) -> str:
    return os.path.join(store.root, "_constraints.json")


def add_check_constraint(store: SnapshotStore, name: str,
                         expr: str) -> None:
    """Register a persisted CHECK constraint (the Delta ``ALTER TABLE
    ADD CONSTRAINT ... CHECK`` analogue): ``expr`` is a SQL boolean
    expression over the table's columns that every row of every
    subsequent ``checked_write`` batch must satisfy. Stored in a tiny
    metadata sidecar — pure metadata, no scan of existing data (like
    Delta, the constraint governs FUTURE writes; validating history
    is a separate audit query)."""
    path = _constraints_path(store)
    cons: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as fh:
            cons = json.load(fh)
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists")
    cons[name] = expr
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cons, fh)
    os.replace(tmp, path)


def check_constraints(store: SnapshotStore) -> dict[str, str]:
    path = _constraints_path(store)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)


def checked_write(store: SnapshotStore, df: DataFrame,
                  mode: str = "append", branch: str = "main") -> int:
    """Commit ``df`` only if every registered CHECK constraint holds on
    every row — the transactional enforcement Delta performs inside
    the write txn: a violating batch changes NOTHING (no new version,
    no orphan data files, head untouched).

    Shape: all constraints fuse into ONE validation pass —
    ``sum(CASE WHEN NOT c THEN 1)`` per constraint in a single
    aggregate over the batch (the x_data_quality_rules fusion), so
    enforcement costs one scan regardless of constraint count. The
    scan happens BEFORE any file is written: at 100 TB an aborted
    post-write cleanup is the expensive path (delete churn on object
    stores), while re-scanning an accepted batch is cheap because the
    write re-reads it immediately anyway.

    NULL semantics are SQL-standard (and Delta's): a row violates only
    when the expression is FALSE — an expression that evaluates to
    NULL passes (guard with ``x IS NOT NULL AND ...`` to reject
    NULLs explicitly).

    CONTRACT: ``df`` must be DETERMINISTIC. The validation aggregate
    and the subsequent write each evaluate the plan once; a
    nondeterministic batch (rand(), unseeded sampling, an unstable
    LIMIT) could pass validation yet commit rows that were never
    validated. Pre-materialize such a batch (write it to scratch
    parquet, or use ``quality.publish_with_audit`` — its
    write-audit-publish staging validates the EXACT files that get
    committed, the right shape for nondeterministic or 100 TB
    batches where a localCheckpoint pin is not an option)."""
    cons = check_constraints(store)
    if cons:
        names = list(cons)
        agg = df.agg(*[
            F.sum(F.when(~F.expr(cons[n]), 1).otherwise(0))
            .cast("long").alias(f"c{i}")
            for i, n in enumerate(names)])
        row = agg.collect()[0]
        for i, n in enumerate(names):
            bad = row[f"c{i}"] or 0
            if bad > 0:
                raise ConstraintViolation(n, cons[n], bad)
    return store.write(df, mode=mode, branch=branch)


# -- SCD Type-2 dimension maintenance (round 9) -------------------------------

def scd2_merge(store: SnapshotStore, spark: SparkSession,
               updates: DataFrame, key_col: str, attr_cols: list[str],
               effective: str) -> tuple[int, int, int]:
    """Kimball SCD Type-2 dimension maintenance as ONE atomic store
    commit — the warehouse ETL twin of events_queries' e_scd2_intervals
    (which DERIVES intervals from a log; this APPLIES an update batch
    to a stored dimension).

    The dimension table carries ``{key} , {attrs...}, valid_from,
    valid_to (NULL = current), is_current, sk`` where ``sk`` is the
    surrogate ``key|valid_from``. For each update row (key + new
    attribute values) effective at ``effective`` (a DATE string):

    - a key whose CURRENT attributes all match is a NO-OP (the batch
      row is dropped — standard SCD2 idempotence; a batch with no
      effective change commits nothing and the head is untouched);
    - otherwise the current row (if any) is CLOSED (valid_to set,
      is_current false) and a NEW current row inserted;
    - EXCEPT when ``effective`` equals the current row's valid_from
      (same-day correction / two batches with one effective date):
      the change is applied IN PLACE — the current row is rewritten
      with the new attributes under its existing sk, no zero-length
      history row ("latest change on the same day wins"; a close +
      insert would collide on sk = key|valid_from).

    A RETRO-DATED batch (effective before a changed key's current
    valid_from) is REJECTED before anything commits: it would close
    the current row with a negative validity interval and corrupt the
    history every point-in-time join reads — retroactive corrections
    are a history SPLICE, not a merge. Likewise a batch carrying the
    SAME key twice is REJECTED (ValueError)
    before anything commits: both rows would flow to one
    sk = key|effective and merge_upsert would land both — two
    "current" rows for one key, the surrogate-key collision class the
    same-day rule closes for the cross-batch case (round-10 verdict
    punch #6). The probe is no-op-aware (round-11 ADVICE, tightened
    round 12): an at-least-once upstream that repeats a key whose
    copies ALL match the stored current row is a harmless idempotent
    replay — nothing would land — so it must not hard-fail; a
    duplicated key with ANY surviving copy is rejected, including the
    changed+unchanged mix, whose net intent (last-wins no-op vs
    first-wins change) an unordered batch cannot express.
    Deduplicate upstream (e.g. last-per-key by a batch sequence
    column) and re-submit; the check is one map-side-combinable
    aggregate with a 1-row bounded collect.

    Attribute comparison is NULL-safe (``eqNullSafe``). Physically the
    closed+new rows flow through ``merge_upsert`` on ``sk`` — footer-
    pruned copy-on-write, one manifest commit — so readers see the old
    dimension until the whole batch lands. Returns
    (version, n_closed, n_inserted); version is the pre-merge head
    when the batch was a full no-op.

    At 100 TB: the join against the dimension is update-batch-sized on
    the probe side (broadcast candidate), the rewrite is
    O(files-holding-changed-keys) on a key-clustered dimension, and
    history rows are never rewritten — exactly Delta's recommended
    SCD2 MERGE recipe."""
    cur = (store.read(spark)
           .filter(F.col("is_current"))
           .select(F.col(key_col).alias("_k"),
                   F.col("valid_from").alias("_vf"),
                   *[F.col(c).alias(f"_a_{c}") for c in attr_cols]))
    j = updates.join(cur, updates[key_col] == cur["_k"], "left")
    same = None
    for c in attr_cols:
        eq = updates[c].eqNullSafe(F.col(f"_a_{c}"))
        same = eq if same is None else (same & eq)
    changed = j.filter(F.col("_k").isNull() | ~same)
    # Duplicate-key probe (r11 ADVICE, tightened by the r12 review):
    # a key repeated where EVERY copy matches the stored current row
    # is an idempotent at-least-once replay — all copies drop in the
    # no-op filter above, nothing would land, so rejecting it would
    # break exactly the callers the no-op rule exists for. But any
    # RAW-batch duplicate key with at least one SURVIVING copy is
    # ambiguous — two changed copies would collide on one surrogate
    # key, and a changed+unchanged mix hides an ordering intent
    # (last-wins would be a net no-op; first-wins a change) this
    # merge cannot see — so both shapes are rejected before anything
    # commits. Probe 4 so "exactly 3 duplicated keys" and "more than
    # 3" render differently (only the first 3 are named).
    dup_raw = (updates.groupBy(F.col(key_col).alias("_dk"))
               .agg(F.count(F.lit(1)).alias("_nraw"))
               .filter(F.col("_nraw") > 1).select("_dk"))
    dup = (changed.select(updates[key_col].alias("_ck"))
           .join(dup_raw, F.col("_ck") == F.col("_dk"))
           .select(F.col("_dk").alias(key_col))
           .distinct().limit(4).collect())
    if dup:
        keys = ", ".join(str(r[key_col]) for r in dup[:3])
        raise ValueError(
            f"scd2_merge: update batch carries duplicate {key_col} "
            f"values with at least one effective change ({keys}"
            f"{', …' if len(dup) > 3 else ''}) — colliding or "
            "order-ambiguous on one surrogate key; deduplicate to "
            "one row per key (last-per-key) and re-submit")
    eff = F.lit(effective).cast("date")
    # Same-day change (effective == the current row's valid_from —
    # an intra-day correction or two batches applied with the same
    # effective date): closing AND inserting would put TWO rows under
    # one sk = key|valid_from in a single merge batch, silently losing
    # one (round-9 advisor, medium). Instead the change is applied
    # IN PLACE: the close row is suppressed, and the insert row's sk
    # (key|effective == key|valid_from) matches the stored current
    # row, so merge_upsert rewrites it with the new attributes —
    # "latest change on the same day wins", no zero-length history row.
    # Retro-dated updates are REJECTED before anything commits: an
    # effective date BEFORE the key's current valid_from would close
    # the current row with valid_to < valid_from (a negative validity
    # interval) and insert an out-of-order "current" — corrupted
    # history that every downstream point-in-time join then reads.
    # Correcting history retroactively is a SPLICE operation (rewrite
    # the affected key's whole interval chain), not a merge; reject
    # loudly so the caller reaches for the right tool.
    retro = (changed.filter(F.col("_k").isNotNull() & (eff < F.col("_vf")))
             .select(F.col("_k"), F.col("_vf")).limit(4).collect())
    if retro:
        keys = ", ".join(f"{r['_k']} (current since {r['_vf']})"
                         for r in retro[:3])
        raise ValueError(
            f"scd2_merge: effective date {effective} precedes the "
            f"current valid_from for {key_col} {keys}"
            f"{', …' if len(retro) > 3 else ''} — a retro-dated batch "
            "would create a negative validity interval; splice history "
            "explicitly instead of merging out of order")
    same_day = F.col("_k").isNotNull() & F.col("_vf").eqNullSafe(eff)
    closed = (changed.filter(F.col("_k").isNotNull() & ~same_day)
              .select(F.col("_k").alias(key_col),
                      *[F.col(f"_a_{c}").alias(c) for c in attr_cols],
                      F.col("_vf").alias("valid_from"),
                      eff.alias("valid_to"),
                      F.lit(False).alias("is_current")))
    inserted = (changed
                .select(updates[key_col].alias(key_col),
                        *[updates[c].alias(c) for c in attr_cols],
                        eff.alias("valid_from"),
                        F.lit(None).cast("date").alias("valid_to"),
                        F.lit(True).alias("is_current")))
    sk = F.concat_ws("|", F.col(key_col).cast("string"),
                     F.col("valid_from").cast("string"))
    batch = (closed.unionByName(inserted)
             .withColumn("sk", sk)
             .localCheckpoint(eager=True))
    n_closed = batch.filter(~F.col("is_current")).count()
    n_inserted = batch.filter(F.col("is_current")).count()
    if n_closed == 0 and n_inserted == 0:
        return store.head("main"), 0, 0
    version, _n = merge_upsert(store, spark, batch, "sk")
    return version, n_closed, n_inserted


# -- Optimistic concurrency control (round 9) ---------------------------------

class ConcurrentCommitConflict(RuntimeError):
    """An occ_append found a LOGICALLY conflicting commit (overwrite /
    delete / merge) between its read snapshot and the current head."""

    def __init__(self, expected: int | None, head: int | None,
                 blocking_op: str, blocking_version: int):
        if blocking_op == "unprovable-history":
            why = ("an intervening manifest was expired, so "
                   "conflict-freedom cannot be proven")
        elif blocking_op == "unrelated-history":
            why = ("the read snapshot is not an ancestor of the "
                   "current head")
        else:
            why = (f"v{blocking_version} ({blocking_op!r}) is not a "
                   "blind append")
        super().__init__(
            f"commit read snapshot v{expected} but head is v{head}: "
            f"{why} — rebase impossible, re-run on the fresh head")
        self.expected = expected
        self.head = head
        self.blocking_op = blocking_op
        self.blocking_version = blocking_version


def occ_append(store: SnapshotStore, df: DataFrame,
               expected_head: int | None) -> tuple[int, bool]:
    """APPEND with Delta's optimistic-concurrency commit protocol: the
    writer declares the head it READ (``expected_head``); at commit
    time, if the head moved, the intervening commits are checked for
    LOGICAL conflicts —

    - every intervening commit is a blind ``append`` → this append
      cannot conflict with them (disjoint new files, no rows removed),
      so it REBASES silently onto the current head (Delta: two
      concurrent blind appends both succeed);
    - any intervening overwrite / rollback / merge / MoR delete →
      ``ConcurrentCommitConflict``; the caller re-reads and re-runs.
      The data files written before the check are cleaned up eagerly
      (no vacuum debt from a failed txn).

    Returns (version, rebased). The check runs AFTER the data files
    land (the slow part) and immediately before the manifest commit —
    the same shrink-the-race-window ordering Delta uses; the manifest
    rename is the single atomic publication point (single-process
    atomicity here, matching the store's documented scope)."""
    sub = os.path.join(store.root, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(sub)
    new_files = sorted(
        os.path.join(sub, f) for f in os.listdir(sub)
        if f.endswith(".parquet") and not f.startswith("."))
    head = store.head("main")
    rebased = False
    if head != expected_head:
        # walk MAIN's parent chain from head back to the read snapshot
        # — commits on other branches (e.g. WAP staging) are invisible
        # to main readers and must not block a main append
        v = head
        chain = []
        try:
            while v is not None and v != expected_head:
                m = store._read_manifest(v)
                chain.append((v, m.get("op", "")))
                v = m.get("parent")
        except OSError:
            # an intervening manifest was EXPIRED: conflict-freedom is
            # unprovable, and the staged data subdir must not be left
            # orphaned (round-9 advisor — the other two failure
            # branches rmtree; this one didn't)
            import shutil
            shutil.rmtree(sub, ignore_errors=True)
            raise ConcurrentCommitConflict(
                expected_head, head, "unprovable-history",
                head if head is not None else -1)
        if v != expected_head:
            import shutil
            shutil.rmtree(sub, ignore_errors=True)
            raise ConcurrentCommitConflict(
                expected_head, head, "unrelated-history",
                head if head is not None else -1)
        for cv, op in chain:
            if op != "append":
                import shutil
                shutil.rmtree(sub, ignore_errors=True)
                raise ConcurrentCommitConflict(expected_head, head, op, cv)
        rebased = True
    pm = store._read_manifest(head) if head is not None else {}
    base = pm.get("files", [])
    file_seq = dict(pm.get("file_seq") or {})
    file_seq.update({p: None for p in new_files})
    extra = {"file_seq": file_seq}
    if pm.get("deletes"):
        extra["deletes"] = [dict(d) for d in pm["deletes"]]
    v = store._commit(base + new_files, "append", head, extra=extra)
    store._advance("main", v)
    return v, rebased


# -- Shallow clone (round 10) --------------------------------------------------

def shallow_clone(src: SnapshotStore, dest_root: str,
                  branch: str = "main") -> SnapshotStore:
    """Delta ``CREATE TABLE ... SHALLOW CLONE`` (Iceberg: snapshot-ref
    export): a NEW table whose first manifest REFERENCES the source's
    current data files by (absolute) path — zero data bytes move, the
    clone is a metadata-only O(1) commit at any table size.

    Independence afterwards is structural:

    - the clone's appends/overwrites/deletes land under ITS root and
      never touch the source;
    - the clone's ``vacuum()`` walks only ``dest_root/data``, so the
      source's files are out of reach by construction (Delta's rule:
      vacuum on a shallow clone never deletes source files);
    - MoR seq-number semantics survive because the clone's first
      manifest takes the SOURCE's head version number: every later
      clone commit gets a strictly larger sequence than any carried
      file_seq/delete seq, so carried equality-deletes keep applying
      to exactly the files they applied to at clone time.

    Shared caveat (same as Delta): expiring + vacuuming the SOURCE
    breaks the clone's reads of still-referenced source files — the
    clone pins nothing in the source's manifest log."""
    import time

    head = src.head(branch)
    if head is None:
        raise ValueError("cannot shallow-clone an empty store")
    m = src._read_manifest(head)
    dest = SnapshotStore(dest_root)
    if dest.versions():
        raise ValueError("shallow_clone target must be empty")
    manifest = {"version": head, "op": "clone", "parent": None,
                "ts": time.time(), "files": m["files"],
                "cloned_from": src.root, "source_version": head}
    if m.get("file_seq"):
        manifest["file_seq"] = dict(m["file_seq"])
    if m.get("deletes"):
        manifest["deletes"] = [dict(d) for d in m["deletes"]]
    tmp = dest._manifest_path(head) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, dest._manifest_path(head))
    dest._advance("main", head)
    return dest


# -- Incremental (changes-since) scan (round 10) -------------------------------

class NonAppendInRange(RuntimeError):
    """incremental_read found a non-append commit inside the range —
    file-level incremental semantics are only sound across pure
    appends (Iceberg's incremental scan raises the same way)."""


def incremental_read(store: SnapshotStore, spark: SparkSession,
                     v_from: int, v_to: int | None = None) -> DataFrame:
    """Iceberg-style INCREMENTAL SCAN: the rows appended strictly
    AFTER version ``v_from`` up to and including ``v_to`` (default:
    main head), resolved at FILE level from the manifests alone — the
    consumer tails a 100 TB table by reading only the new files,
    never rescanning history.

    Walks ``v_to``'s parent chain down to ``v_from`` and requires
    every intervening commit to be an append (op 'append'; a clone
    root is the chain's origin, never intervening): an overwrite /
    rollback / merge / MoR delete inside the range rewrites or
    retracts prior rows, so "the appended files" no longer equals
    "the change" and the scan raises ``NonAppendInRange`` (callers
    fall back to ``snapshot_diff``, the semantic CDC path). The
    append-only walk also guarantees file lists are cumulative, so
    the new-file set is exactly set(v_to.files) - set(v_from.files)
    — metadata-only, no data touched until the returned lazy read."""
    def _is_blind_append(m: dict) -> bool:
        # the streaming sink's append-mode commits are cumulative
        # blind appends too (write_stream_batch: files = parent's +
        # new, MoR state carried forward unchanged); mode is recorded
        # in the manifest since round 10 and defaults to append — no
        # earlier caller ever streamed an overwrite
        op = m.get("op", "")
        return op == "append" or (op.startswith("stream[")
                                  and m.get("mode", "append") == "append")

    head = store.head("main") if v_to is None else v_to
    if head is None:
        raise FileNotFoundError(f"no snapshots at {store.root}")
    # walk first, classify after: a non-ancestor v_from must raise
    # ValueError even when a non-append sits below head (the advice
    # 'fall back to snapshot_diff' would be wrong for that caller)
    v = head
    chain: list[tuple[int, dict]] = []
    while v is not None and v != v_from:
        m = store._read_manifest(v)
        chain.append((v, m))
        v = m.get("parent")
    if v != v_from:
        raise ValueError(
            f"v{v_from} is not an ancestor of v{head} on main")
    for cv, m in chain:
        if not _is_blind_append(m):
            raise NonAppendInRange(
                f"v{cv} is {m.get('op')!r}, not a blind append — "
                "file-level incremental read unsound; use "
                "snapshot_diff for semantic changes")
    base = set(store._read_manifest(v_from)["files"])
    new_files = [p for p in store._read_manifest(head)["files"]
                 if p not in base]
    if not new_files:
        # schema-stable empty result from the head's schema
        return store.read(spark, head).limit(0)
    return spark.read.parquet(*new_files)


def branch_diff(store: SnapshotStore, spark: SparkSession,
                branch_a: str, branch_b: str,
                key_cols: list[str]) -> DataFrame:
    """Nessie/Iceberg-style branch COMPARE: the rows present on one
    branch head but not the other, keyed by ``key_cols`` — the "what
    would this merge change" readout a branched workflow reviews
    before fast-forwarding (git diff for tables). Returns the union
    of both exclusive sides with a ``side`` column naming the branch
    that holds each row.

    Scale shape: two branch reads + two key anti-joins — each
    shuffle is keyed and spillable, the exclusive sides are
    merge-delta-sized in practice, and nothing materializes the
    branches jointly. On a key-clustered table the anti-joins prune
    to the files whose key ranges overlap the other side's."""
    a = store.read(spark, branch=branch_a)
    b = store.read(spark, branch=branch_b)
    only_a = (a.join(b.select(*key_cols), key_cols, "left_anti")
              .withColumn("side", F.lit(branch_a)))
    only_b = (b.join(a.select(*key_cols), key_cols, "left_anti")
              .withColumn("side", F.lit(branch_b)))
    return only_a.unionByName(only_b)
