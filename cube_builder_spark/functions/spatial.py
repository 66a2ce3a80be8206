"""Spatial neighbor search — grid-binned distance joins.

The reference's spatial plane is rectangle algebra (tile bboxes,
`controller.py:518-538`, `maestro.py:285-294`); PostGIS handles its
point work. A Spark-native engine needs the distributed counterpart:
an ALL-PAIRS-WITHIN-RADIUS self-join that never goes O(n²). The
standard shape (Zhang et al., "Spatial join on Hadoop"-family; what
Sedona's distance join compiles to) is fixed-grid binning:

- bin every point into a square cell of side == the radius r;
- any pair within r lies in the SAME or an ADJACENT cell (|dx| <= r
  means the cell indices differ by at most 1), so candidates are the
  3x3 cell neighborhood — the pair space is bounded by local density
  x 9, not n²;
- one side replicates to its 9 neighbor cells, the other stays home;
  an equi-join on the cell key produces each unordered pair EXACTLY
  once (the home cell of b falls in a's neighborhood once, and the
  id_a < id_b filter kills the mirrored candidate);
- the exact integer distance test verifies.

At 100 TB the cell key is the shuffle key: replication is a constant
9x on one side, per-cell candidate lists are bounded by physical
density, and a hot cell (degenerate data) is a data-quality signal
the ``max_cell`` cap surfaces rather than hides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_self_join(pts: DataFrame, radius: int,
                     id_col: str = "id", x_col: str = "x",
                     y_col: str = "y",
                     max_cell: int | None = None) -> DataFrame:
    """All pairs (id_a < id_b) with squared Euclidean distance
    <= radius² over integer coordinates — exact, via 3x3 grid-cell
    candidate generation. Returns (id_a, id_b, dist2).

    ``max_cell`` (optional) drops HOME cells holding more than that
    many points before pair generation — the skew guard for
    degenerate inputs (a cell with 10^5 coincident points means the
    radius is wrong for the data, not that the engine should emit
    10^10 pairs). Lossy when it fires; None (default) is exact.
    """
    cell = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        (F.col(x_col).cast("long") - (F.col(x_col).cast("long") % radius))
        .alias("cx"),
        (F.col(y_col).cast("long") - (F.col(y_col).cast("long") % radius))
        .alias("cy"))
    home = cell.select(F.col("id").alias("id_b"),
                       F.col("x").alias("xb"), F.col("y").alias("yb"),
                       "cx", "cy")
    if max_cell is not None:
        from pyspark.sql import Window
        n = F.count(F.lit(1)).over(Window.partitionBy("cx", "cy"))
        home = home.withColumn("_n", n).filter(
            F.col("_n") <= max_cell).drop("_n")
    # replicate the probe side to its 9-cell neighborhood; the home
    # side stays put — the join is a plain two-key equi-join (hash
    # shuffle on the cell key, no theta join, no cartesian)
    off = F.explode(F.array(*[
        F.struct(F.lit(dx * radius).alias("ox"), F.lit(dy * radius).alias("oy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)]))
    probe = (cell.select(F.col("id").alias("id_a"),
                         F.col("x").alias("xa"), F.col("y").alias("ya"),
                         "cx", "cy", off.alias("o"))
             .select("id_a", "xa", "ya",
                     (F.col("cx") + F.col("o.ox")).alias("cx"),
                     (F.col("cy") + F.col("o.oy")).alias("cy")))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (probe.join(home, ["cx", "cy"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", d2.alias("dist2"))
            .filter(F.col("dist2") <= radius * radius))
