"""ANALYZE-style table statistics and a join-strategy advisor.

Spark's AQE re-plans joins at runtime from observed shuffle sizes;
that is reactive — the first execution still pays for a wrong initial
choice, and cross-job planning (which table to bucket, which side to
pre-filter) needs numbers BEFORE any job runs. This module computes
the classic optimizer statistics in ONE pass per table and persists
them next to the data:

- n_rows, on-disk bytes (from the file listing — free);
- per column: null fraction, min/max (pruning bounds), and NDV —
  exact via count(distinct) for requested columns (one aggregation,
  Spark expands distincts in the same scan).

`advise_join` then applies the textbook rules: broadcast the side
whose estimated in-memory size clears the threshold, else prefer
shuffle-hash when one side is much smaller, else sort-merge; a join
key whose NDV is tiny relative to rows flags skew (salt or AQE skew
join).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class TableStats:
    name: str
    n_rows: int
    n_bytes: int                      # on-disk parquet bytes
    columns: dict                     # col -> {null_frac, min, max, ndv}

    @property
    def bytes_per_row(self) -> float:
        return self.n_bytes / self.n_rows if self.n_rows else 0.0


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f))
                     for f in files if f.endswith(".parquet"))
    return total


def analyze(spark: SparkSession, path: str, name: str,
            columns: list[str], exact_ndv: bool = False) -> TableStats:
    """One aggregation pass over one scan for all requested columns.

    NDV defaults to ``approx_count_distinct(col, 0.05)``: HLL++ folds
    map-side with no per-column expand, where an exact count_distinct
    at 100 TB expands the aggregation once PER COLUMN — and the join
    advisor only needs NDV to ~10% to pick a strategy. ``exact_ndv``
    opts back into the exact count."""
    df = spark.read.parquet(path)
    ndv = (F.count_distinct if exact_ndv
           else lambda c: F.approx_count_distinct(c, 0.05))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"_null_{c}"),
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            ndv(F.col(c)).alias(f"_ndv_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    n = int(row["_n"])
    cols = {}
    for c in columns:
        mn, mx = row[f"_min_{c}"], row[f"_max_{c}"]
        cols[c] = {
            "null_frac": (int(row[f"_null_{c}"]) / n) if n else 0.0,
            "min": mn if not hasattr(mn, "isoformat") else mn.isoformat(),
            "max": mx if not hasattr(mx, "isoformat") else mx.isoformat(),
            "ndv": int(row[f"_ndv_{c}"]),
        }
    return TableStats(name=name, n_rows=n, n_bytes=_dir_bytes(path),
                      columns=cols)


def save_stats(stats: TableStats, stats_dir: str) -> str:
    os.makedirs(stats_dir, exist_ok=True)
    p = os.path.join(stats_dir, f"{stats.name}.json")
    with open(p, "w") as fh:
        json.dump(asdict(stats), fh)
    return p


def load_stats(stats_dir: str, name: str) -> TableStats:
    with open(os.path.join(stats_dir, f"{name}.json")) as fh:
        return TableStats(**json.load(fh))


# parquet is compressed+encoded; in-memory rows decompress ~3x
_INMEM_FACTOR = 3.0


@dataclass
class JoinAdvice:
    strategy: str          # broadcast_left | broadcast_right |
    #                        shuffle_hash | sort_merge
    skew_warning: str | None
    est_left_bytes: int
    est_right_bytes: int


def advise_join(left: TableStats, right: TableStats,
                left_key: str, right_key: str,
                broadcast_threshold: int = 10 * 1024 * 1024,
                skew_ratio: int = 1000) -> JoinAdvice:
    lb = int(left.n_bytes * _INMEM_FACTOR)
    rb = int(right.n_bytes * _INMEM_FACTOR)
    if rb <= broadcast_threshold or lb <= broadcast_threshold:
        strategy = "broadcast_right" if rb <= lb else "broadcast_left"
    elif min(lb, rb) * 3 < max(lb, rb):
        # one side much smaller: hash-build it per partition
        strategy = "shuffle_hash"
    else:
        strategy = "sort_merge"
    warn = None
    for st, key in ((left, left_key), (right, right_key)):
        col = st.columns.get(key)
        if col and col["ndv"] and st.n_rows / max(col["ndv"], 1) \
                >= skew_ratio:
            warn = (f"{st.name}.{key}: ~{st.n_rows // max(col['ndv'], 1)}"
                    " rows/key — salt the key or rely on AQE skew join")
    return JoinAdvice(strategy=strategy, skew_warning=warn,
                      est_left_bytes=lb, est_right_bytes=rb)


def recommend_conf(total_input_bytes: int, total_cores: int = 32,
                   target_partition_bytes: int = 128 * 1024 * 1024,
                   max_partition_bytes: int = 128 * 1024 * 1024) -> dict:
    """Size the shuffle for a job BEFORE it runs, from ANALYZE totals:

    - ``spark.sql.shuffle.partitions`` = enough partitions that each
      holds ≈ target bytes of (decompressed) data, floored at the
      cluster's core count so every core has work — the knob AQE can
      only coalesce DOWN from, so the static value must be the upper
      envelope;
    - ``spark.sql.files.maxPartitionBytes`` controls scan granularity
      (split big files, not small ones);
    - ``spark.sql.autoBroadcastJoinThreshold`` left at default unless
      the caller knows better — advise_join handles per-join choices.

    The estimate inflates parquet bytes by the in-memory factor; at
    100 TB input with 128 MB targets this yields ~2.4M partitions,
    which is why real deployments ALSO enable AQE coalescing — the
    recommendation is the safe ceiling, not the final runtime value.
    """
    import math
    inmem = int(total_input_bytes * _INMEM_FACTOR)
    parts = max(total_cores,
                math.ceil(inmem / target_partition_bytes))
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(max_partition_bytes),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }


def equi_depth_histogram(df, column: str, buckets: int = 16):
    """Equi-depth (equi-height) histogram — the optimizer statistic
    behind Spark CBO's `spark.sql.statistics.histogram.enabled` and
    every selectivity estimator that has to survive skew (an
    equi-WIDTH histogram collapses under hot values; equal-mass
    buckets keep per-bucket selectivity error bounded at 1/buckets).

    Exact and engine-stable: one groupBy(value) → counts (map-side
    combined, NDV-sized output), one cumulative window over the
    value-ordered counts, then integer bucket assignment
    ``(cum_before * buckets) // total`` — a distinct value belongs
    wholly to the bucket its FIRST row falls in (values never split,
    the real histogram contract), all in int64 so both engines place
    every row identically. Per bucket: lo/hi bounds, row count, NDV.

    Scale note: the window runs over the VALUE-COUNT table (NDV
    rows), not the data; for NDV beyond one partition the same
    statistic distributes as the classic two-pass prefix sum
    (range-partition values, per-partition totals broadcast as
    offsets). The reference keeps no optimizer stats at all — this
    extends the ANALYZE plane (stats.analyze) the way Spark itself
    would."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(column).alias("v")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    total = counts.agg(F.sum("cnt").alias("n_rows"))
    return (cum.crossJoin(F.broadcast(total))
            .select("v", "cnt",
                    F.expr(f"(before * {int(buckets)}) div n_rows")
                    .alias("bucket_id"))
            .groupBy("bucket_id")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                 F.sum("cnt").alias("n_rows"),
                 F.count(F.lit(1)).alias("ndv")))
