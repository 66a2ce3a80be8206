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


# parquet is compressed+encoded; in-memory rows decompress ~3x
_INMEM_FACTOR = 3.0

# Tests set True to simulate the 100 TB regime: every stats-gated hint
# then degrades to "no hint, let AQE decide", and the plan invariants
# assert THAT plan has no forced broadcast of a linear-scaling table.
FORCE_NO_BROADCAST_HINTS = False


def _table_bytes(sf_dir: str, name: str) -> int | None:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dirs, files in os.walk(path)
            for f in files if f.endswith(".parquet"))
    except OSError:
        return None


def broadcast_if_small(df: DataFrame, sf_dir: str, name: str,
                       threshold: int = 10 * 1024 * 1024) -> DataFrame:
    """Stats-gated broadcast hint for LINEAR-scaling tables.

    A bare ``F.broadcast(customer)`` wins at sf0.1 and OOMs a 100x
    cluster — AND disables AQE's ability to choose. Dropping the hint
    entirely is scale-safe but pays AQE's sequential query-stage
    materialization (measured +0.5s on a 5-join TPC-H Q5 at sf0.1).
    This is the middle path the round-4 review prescribed ("gate hints
    on ANALYZE stats"): hint ONLY when the table's actual on-disk
    bytes x decompression inflation fit the broadcast threshold — the
    same estimate stats.advise_join uses. At 100x the gate fails and
    the plan degrades to AQE's choice, never a forced broadcast.
    Fixed-size dims (nation/region) keep their unconditional hints."""
    if FORCE_NO_BROADCAST_HINTS:
        return df
    nbytes = _table_bytes(sf_dir, name)
    if nbytes is not None and nbytes * _INMEM_FACTOR < threshold:
        from pyspark.sql import functions as F
        return F.broadcast(df)
    return df


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
