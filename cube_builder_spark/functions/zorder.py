"""Z-order (Morton) layout — multi-dimensional clustering for the
write path.

A 100 TB tile/raster store laid out in ingest order scatters
spatially-adjacent tiles across files, so a bbox query reads
everything. Sorting the write by the Morton interleave of (x, y)
places spatial neighbors in the same output files, which makes
parquet/Delta file-level min/max statistics tight per file — a bbox
query then prunes most files at planning time. This is the same
mechanism as Delta's OPTIMIZE ZORDER BY, expressed with plain
`repartitionByRange + sortWithinPartitions`.

The interleave uses literal shift amounts (a Python loop over bit
index), so the whole z-value is one codegen'd integer expression —
no UDF, no higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton interleave of two ``bits``-bit non-negative ints:
    bit i of x → bit 2i of z, bit i of y → bit 2i+1. Exact int64 for
    bits ≤ 31."""
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * \
            F.lit(1 << (2 * i + 1))
    return z


def layout(df: DataFrame, xcol: str, ycol: str, bits: int = 10,
           npartitions: int | None = None) -> DataFrame:
    """Cluster ``df`` for writing: range-partition AND sort by the
    z-value, so each output partition (→ file) covers one contiguous
    z-range ⇒ a compact spatial block ⇒ tight per-file min/max stats
    on BOTH x and y. ``repartitionByRange`` samples the z
    distribution, so skewed spatial density still yields balanced
    files."""
    z = z_value(F.col(xcol), F.col(ycol), bits).alias("_z")
    with_z = df.withColumn("_z", z)
    n = npartitions or df.sparkSession.sparkContext.defaultParallelism
    return (with_z.repartitionByRange(n, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))
