"""C15 — Histogram matching (radiometric normalization across dates).

Reference (``image.py:195-246`` + orchestration ``tasks.py:369-385``):
each date's band is matched to the best (highest-efficacy) date's
histogram via skimage ``match_histograms``, computed only on jointly
valid pixels, then written back over the source.

skimage's algorithm is CDF matching: per distinct source value v,
q(v) = cumulative fraction of source pixels <= v; the mapped value is
the linear interpolation of the reference's (quantile -> value) curve
at q(v). Re-expressed here as pure window/group DataFrame algebra:

1. join source & reference on pixel, keep jointly-valid pixels;
2. per-key CDFs = groupBy(value) + one ordered cumulative-sum window;
3. interleave both CDFs on quantile and bracket each source quantile
   with last/first IGNORE NULLS windows (prev/next reference point);
4. np.interp's formula  r1 + (q - q1) * (r2 - r1) / (q2 - q1)  with
   edge clamping — all Catalyst expressions, no Python.

Scale: everything is partitioned by the group key (tile); the CDFs are
tiny (distinct int16 values), so the windows run on small per-tile
slices while the pixel join is the only big operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_cdf(df: DataFrame, keys: list[str], value_col: str = "value") -> DataFrame:
    """Distinct-value cumulative distribution per key group."""
    counts = df.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (Window.partitionBy(*keys).orderBy(value_col)
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(*keys)
    return counts.select(
        *keys, F.col(value_col),
        (F.sum("cnt").over(w_cum) * 1.0 / F.sum("cnt").over(w_all)).alias("q"))


def histogram_match(source: DataFrame, reference: DataFrame,
                    keys: list[str], value_col: str = "value") -> DataFrame:
    """Map each distinct source value to its reference-matched value.

    ``source`` / ``reference``: valid-pixel rows with ``keys`` +
    ``value_col`` (already restricted to jointly-valid pixels by the
    caller, mirroring image.py:227-238).
    Returns one row per (keys, source value): ``matched`` double.
    """
    src_cdf = value_cdf(source, keys, value_col)
    ref_cdf = value_cdf(reference, keys, value_col)
    events = (
        src_cdf.select(*keys, F.col("q"), F.lit(1).alias("is_src"),
                       F.col(value_col).alias("src_value"),
                       F.lit(None).cast("double").alias("ref_value"))
        .unionAll(
            ref_cdf.select(*keys, F.col("q"), F.lit(0).alias("is_src"),
                           F.lit(None).cast(src_cdf.schema[value_col].dataType).alias("src_value"),
                           F.col(value_col).cast("double").alias("ref_value")))
    )
    # reference rows sort before source rows at equal quantile so an
    # exact quantile hit brackets to itself (np.interp exact-x case)
    order = [F.col("q").asc(), F.col("is_src").asc()]
    w_prev = (Window.partitionBy(*keys).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(*keys).orderBy(*order)
              .rowsBetween(0, Window.unboundedFollowing))
    ref_q = F.when(F.col("ref_value").isNotNull(), F.col("q"))
    out = (events
           .withColumn("prev_r", F.last("ref_value", ignorenulls=True).over(w_prev))
           .withColumn("prev_q", F.last(ref_q, ignorenulls=True).over(w_prev))
           .withColumn("next_r", F.first("ref_value", ignorenulls=True).over(w_next))
           .withColumn("next_q", F.first(ref_q, ignorenulls=True).over(w_next))
           .filter(F.col("is_src") == 1))
    interp = (F.when(F.col("prev_r").isNull(), F.col("next_r"))          # left clamp
              .when(F.col("next_r").isNull(), F.col("prev_r"))           # right clamp
              .when(F.col("q") == F.col("prev_q"), F.col("prev_r"))      # exact hit
              .otherwise(F.col("prev_r")
                         + (F.col("q") - F.col("prev_q"))
                         * (F.col("next_r") - F.col("prev_r"))
                         / (F.col("next_q") - F.col("prev_q"))))
    return out.select(*keys, F.col("src_value"), interp.alias("matched"))


def apply_histogram_match(source: DataFrame, mapping: DataFrame,
                          keys: list[str], value_col: str = "value") -> DataFrame:
    """Apply the (small, broadcastable) value mapping back to the
    source pixels — the write-back half of image.py:242-246."""
    m = mapping.withColumnRenamed("src_value", value_col)
    return source.join(F.broadcast(m), [*keys, value_col], "left")
