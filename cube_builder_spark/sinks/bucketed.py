"""Bucketed cube store — cross-session co-located layout.

The round-1 lesson (pixelplane.py): one explicit repartition on the
subset key ``(tile_id, pixel_id)`` serves every downstream wide
operation because that key is a subset of every blend/mosaic/join key.
That win lives only as long as the session cache. This sink persists
the SAME property to disk: ``bucketBy(n, tile_id, pixel_id)`` writes
each hash bucket as its own file set and records the layout in the
catalog, so every later session's scan comes up already clustered —
joins between two same-bucketed cubes (cross-cube reuse,
identity-vs-composite comparisons) and groupBys on any superset of
the bucket key run with ZERO exchange, at any scale.

At 100 TB this is the difference between re-shuffling the full cube
on every incremental job and never shuffling it again after the
initial build. The reference has no analogue (its unit of reuse is
the per-(tile, band, date) COG file, maestro.py:488-617 re-lists and
re-opens them per run); bucketing is the Spark-native upgrade of that
file-grain reuse.

``sortBy(band, date)`` inside each bucket additionally gives parquet
row groups tight min/max bounds on the two hottest predicates
(band-subset reads in cross-cube reuse, period scans in incremental
update), so those filters prune at the row-group level instead of
decoding the full bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_cube(df: DataFrame, table: str, path: str,
                        n_buckets: int = 32,
                        bucket_cols: tuple[str, str] = ("tile_id", "pixel_id"),
                        sort_cols: tuple[str, ...] = ("band", "date",
                                                      "period")) -> None:
    """Persist ``df`` as an external bucketed parquet table.

    The writer produces exactly ``n_buckets`` hash buckets on
    ``bucket_cols``; within each bucket files are sorted by
    ``sort_cols``. Downstream scans of this table expose
    ``HashPartitioning(bucket_cols, n_buckets)`` to Catalyst, so any
    aggregation or join keyed on a superset of ``bucket_cols`` (with a
    matching bucket count on the other side) elides its shuffle.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # keep only sort columns the frame actually has (the composite
    # cube carries `period`, an identity plane carries `date`)
    present = [c for c in sort_cols if c in df.columns]
    writer = (df.write.mode("overwrite")
              .bucketBy(n_buckets, *bucket_cols))
    if present:
        writer = writer.sortBy(*present)
    (writer.option("path", path)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket layout
    (no shuffle for bucket-key aggregations/joins)."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    property bucketed consumers must NOT have."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
