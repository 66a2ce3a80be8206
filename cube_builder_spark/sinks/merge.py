"""Row-level MERGE INTO for partitioned parquet tables.

Reference behavior: the metadata plane lives in PostgreSQL and every
writer is a get-or-create/upsert keyed on natural ids
(``processing.py:76-98`` get_or_create_model; ``maestro.py:344-420``
item upsert per (name, collection)). On Spark the equivalent storage
primitive is Delta/Iceberg ``MERGE INTO``; this module provides the
same semantics on plain parquet, dependency-free.

MERGE plan, Spark-first:

1. Source rows name the touched partitions (distinct partition-column
   values — a small driver-side list, one per work unit).
2. Read ONLY those partitions of the target (filter on partition
   columns → pure partition pruning; untouched partitions are never
   opened).
3. Full-outer join target-slice with source on the merge keys:
   matched → source wins (WHEN MATCHED THEN UPDATE), source-only →
   insert (WHEN NOT MATCHED THEN INSERT), target-only → keep.
4. Dynamic partition overwrite writes back exactly the touched
   partitions; every other partition's files are untouched.

At 100 TB the cost is proportional to the touched partitions, not the
table — the same property a Delta MERGE with partition-pruning
predicates has. The non-atomicity window of plain parquet (overwrite
is not a snapshot swap) is the one thing Delta/Iceberg would add; on
a production lake swap `upsert_partitioned` for `DeltaTable.merge`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_dataframes(target: DataFrame, source: DataFrame,
                     keys: list[str]) -> DataFrame:
    """The pure MERGE expression: source updates/inserts into target
    by ``keys``; unmatched target rows pass through. Columns = target's
    (source must carry the same schema)."""
    cols = target.columns
    t = target.alias("t")
    s = source.withColumn("__from_source", F.lit(True)).alias("s")
    joined = t.join(s, keys, "full_outer")   # USING-join coalesces keys
    src_side = F.col("__from_source").isNotNull()
    return joined.select(*[
        F.col(c) if c in keys
        else F.when(src_side, F.col(f"s.{c}"))
              .otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols])


def merge_into_parquet(spark: SparkSession, target_path: str,
                       source: DataFrame, keys: list[str],
                       partition_cols: list[str] | None = None) -> dict:
    """MERGE ``source`` into the parquet table at ``target_path``.

    With ``partition_cols`` (which must be a subset of ``keys`` or
    functionally determined by the source rows), only the partitions
    present in the source are read and rewritten. Without them the
    whole table is rewritten — fine for small dimension tables, wrong
    for fact tables (partition them).
    """
    # Duplicate non-NULL merge keys in the source are rejected before
    # anything is written: the full-outer join would emit one row per
    # (target, source-dup) pair — two live rows for one identity,
    # Delta's "multiple source rows matched" corruption (same guard
    # and rationale as sinks/snapshot.merge_upsert). NULL keys never
    # match under the USING join and insert independently.
    nn = source
    for k in keys:
        nn = nn.filter(F.col(k).isNotNull())
    dup = (nn.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 1).limit(4).collect())
    if dup:
        shown = ", ".join(
            "(" + ", ".join(str(r[k]) for k in keys) + ")"
            for r in dup[:3])
        raise ValueError(
            f"merge_into_parquet: source carries duplicate key tuples "
            f"({shown}{', …' if len(dup) > 3 else ''}) over {keys} — "
            "deduplicate to one row per key (last-per-key) and "
            "re-submit")

    if not os.path.exists(target_path):
        writer = source.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(target_path)
        return {"created": True, "touched_partitions": None}

    target = spark.read.parquet(target_path)
    source = source.select(*target.columns)      # align column order

    if partition_cols:
        units = [tuple(r) for r in
                 source.select(*partition_cols).distinct().collect()]
        cond = None
        for vals in units:
            c = None
            for col, v in zip(partition_cols, vals):
                e = F.col(col).eqNullSafe(F.lit(v))
                c = e if c is None else (c & e)
            cond = c if cond is None else (cond | c)
        slice_df = target.filter(cond)
        merged = merge_dataframes(slice_df, source, keys)
        # localCheckpoint: materialize before overwriting the very
        # files the plan reads (plain-parquet stand-in for snapshot
        # isolation)
        # pinned count — see streaming/incremental.upsert_partitioned
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        (merged.localCheckpoint(eager=True)
         .repartition(n, *partition_cols)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*partition_cols).parquet(target_path))
        return {"created": False, "touched_partitions": len(units)}

    merged = merge_dataframes(target, source, keys).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(target_path)
    return {"created": False, "touched_partitions": None}
