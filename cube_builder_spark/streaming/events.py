"""Streaming event-time operators: the Structured Streaming twins of
``events_queries`` (windowed aggregation with watermark, session
windows), plus a streaming cube-update shape.

These run micro-batch over any streaming source; tests drive them with
a file source + memory sink via ``processAllAvailable`` so a bounded
batch flows through the streaming engine end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up_long
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      schema: T.StructType = EVENT_SCHEMA) -> DataFrame:
    """File-based streaming source (swap for kafka/... in production;
    the downstream plans are source-agnostic)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark (streaming twin
    of e_tumbling_window)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(round_half_up_long(F.col("value"), 100)) / 100.0)
                 .alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "total_value"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Native session windows (streaming twin of e_sessionize)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(round_half_up_long(F.col("value"), 100)) / 100.0)
                 .alias("total_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events", "total_value"))


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a bounded streaming query to completion into a memory sink
    (test/dev harness)."""
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return q


def stream_stream_view_purchase(views: DataFrame, purchases: DataFrame,
                                watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase
    pairs with the same user's views from the preceding hour.

    Both sides carry a watermark and the join condition bounds v_ts
    relative to ts, so Spark can EXPIRE join state: a buffered view is
    dropped once the purchase-side watermark passes v_ts + 1 hour —
    state stays proportional to the lookback window, not the stream
    history. This is the streaming twin of the batch e_interval_join
    (inner pairs; the zero-view purchases need the batch side's left
    join, which streaming append mode cannot express)."""
    v = (views.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("v_user"),
                 F.col("ts").alias("v_ts")))
    p = (purchases.withWatermark("ts", watermark)
         .select("event_id", "user_id", "ts"))
    return p.join(
        v, F.expr("v_user = user_id AND "
                  "v_ts > ts - INTERVAL 1 HOUR AND v_ts <= ts"))
