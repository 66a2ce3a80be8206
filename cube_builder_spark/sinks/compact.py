"""Small-file compaction — bin-packed rewrite of a parquet dataset.

Incremental and streaming writes (streaming/incremental.py appends one
file set per micro-batch; the e2e plan writes per-period partitions)
accumulate files far below the ideal scan granule. At 100 TB the cost
is real: every file costs a driver listing entry, a footer read, and a
task-scheduling slot — a million 1 MB files turns a 2-minute scan into
an hour of overhead. Compaction rewrites undersized files into
~target-size outputs WITHOUT touching well-sized files, preserving
partition directory values (the Delta/Iceberg OPTIMIZE bin-packing
strategy, over plain parquet).

Shape: the plan is driver-side (one file listing — metadata, bounded
by file count, the same listing any scan pays), the data path is
executor-side: one `spark.read.parquet(small_files...)` per partition
batch coalesced to ceil(bytes/target) output files. Reading ONLY the
undersized files means the rewrite moves the minimum possible bytes —
a fully-compacted dataset is a no-op.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionPlan:
    """What a compaction run would do (driver-side metadata only)."""
    partition_dir: str          # dataset-relative ('' for unpartitioned)
    small_files: list[str]      # absolute paths to rewrite
    small_bytes: int
    n_outputs: int              # ceil(small_bytes / target)
    kept_files: int             # already >= threshold, untouched


def _parquet_files(root: str) -> dict[str, list[tuple[str, int]]]:
    """{partition_dir_rel: [(abs_path, bytes)]} for a parquet dataset
    laid out as root[/key=value...]/part-*.parquet."""
    out: dict[str, list[tuple[str, int]]] = {}
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        rel = "" if rel == "." else rel
        for f in files:
            if f.endswith(".parquet") and not f.startswith("."):
                p = os.path.join(dirpath, f)
                out.setdefault(rel, []).append((p, os.path.getsize(p)))
    return out


def plan_compaction(root: str, target_bytes: int = 128 * 1024 * 1024,
                    small_ratio: float = 0.5) -> list[CompactionPlan]:
    """Bin-packing plan: per partition directory, files under
    ``small_ratio * target_bytes`` are rewrite candidates; they pack
    into ceil(total/target) outputs. Partitions with fewer than two
    small files are skipped (nothing to merge)."""
    threshold = int(target_bytes * small_ratio)
    plans = []
    for part_dir, files in sorted(_parquet_files(root).items()):
        small = sorted((p, b) for p, b in files if b < threshold)
        if len(small) < 2:
            continue
        total = sum(b for _p, b in small)
        plans.append(CompactionPlan(
            partition_dir=part_dir,
            small_files=[p for p, _b in small],
            small_bytes=total,
            n_outputs=max(1, math.ceil(total / target_bytes)),
            kept_files=len(files) - len(small)))
    return plans


def compact(spark: SparkSession, root: str,
            target_bytes: int = 128 * 1024 * 1024,
            small_ratio: float = 0.5) -> list[CompactionPlan]:
    """Execute the plan: per affected partition, read ONLY the
    undersized files, coalesce to the planned output count, write to a
    scratch dir, then atomically swap (remove originals, move new
    files in). Well-sized files are never read or rewritten.

    `coalesce` (not repartition) keeps the rewrite shuffle-free — the
    packing goal is file-count reduction, not re-clustering; layout
    changes belong to the z-order/bucketed sinks."""
    plans = plan_compaction(root, target_bytes, small_ratio)
    for plan in plans:
        part_abs = os.path.join(root, plan.partition_dir) \
            if plan.partition_dir else root
        tmp = os.path.join(part_abs, "_compact_tmp")
        (spark.read.parquet(*plan.small_files)
         .coalesce(plan.n_outputs)
         .write.mode("overwrite").parquet(tmp))
        for old in plan.small_files:
            os.remove(old)
        # start numbering AFTER the highest surviving compact-N file:
        # a well-sized compact output from a PRIOR run stays in place,
        # and re-using its name would silently clobber its rows
        n = 1 + max(
            (int(f[len("compact-"):-len(".parquet")])
             for f in os.listdir(part_abs)
             if f.startswith("compact-") and f.endswith(".parquet")
             and f[len("compact-"):-len(".parquet")].isdigit()),
            default=-1)
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet") and not f.startswith("."):
                os.replace(os.path.join(tmp, f),
                           os.path.join(part_abs,
                                        f"compact-{n:05d}.parquet"))
                n += 1
        for leftover in os.listdir(tmp):
            os.remove(os.path.join(tmp, leftover))
        os.rmdir(tmp)
    return plans
