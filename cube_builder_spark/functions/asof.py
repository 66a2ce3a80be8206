"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the LATEST right-side row with the same keys
and ``ts <= left.ts`` (backward as-of; ties at equal ts count as
"before"). The classic uses in a training-data pipeline: attribute an
event to the most recent prior exposure, join features to labels
as-of the label time without leakage.

Shape: NOT a join. Both sides are tagged and unioned, then ONE
window per key-partition ordered by (ts, side) carries the last seen
right-side values forward; left rows emit with the carried values.
That is one sort-shuffle of |L|+|R| rows — versus a range join whose
per-key candidate sets are quadratic-prone and whose inequality
predicate defeats hash joins. DuckDB's native ``ASOF LEFT JOIN``
serves as the independent oracle.

The right side must be unique per (keys, ts) — pre-aggregate
(e.g. keep max event_id) if it is not; with duplicates the carried
row within one instant is order-undefined in ANY engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts_col: str, right_cols: list[str],
              prefix: str = "r_") -> DataFrame:
    """Backward as-of join: left rows + the latest right-side
    ``right_cols`` (and the matched ts, all ``prefix``-ed) with
    ``right.ts <= left.ts`` per ``keys``; NULLs when no prior right
    row exists."""
    lpay = [c for c in left.columns if c not in keys and c != ts_col]
    rpay = [ts_col] + right_cols
    l_rows = left.select(
        *keys, F.col(ts_col).alias("_ord"), F.lit(1).alias("_side"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(prefix + c)
          for c in rpay])
    r_rows = right.select(
        *keys, F.col(ts_col).alias("_ord"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(prefix + c) for c in rpay])
    u = l_rows.unionByName(r_rows)
    # right rows (side 0) sort before left rows at the same instant,
    # making the join inclusive (ts_right <= ts_left)
    w = (Window.partitionBy(*keys).orderBy("_ord", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(prefix + c, ignorenulls=True).over(w).alias(prefix + c)
               for c in rpay]
    return (u.select(*keys, F.col("_ord").alias(ts_col), "_side",
                     *lpay, *carried)
            .filter(F.col("_side") == 1)
            .drop("_side"))
