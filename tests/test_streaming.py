"""Streaming operators: a bounded batch driven through the Structured
Streaming engine must agree with the batch plane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.streaming.events import (read_event_stream,
                                                 run_to_memory,
                                                 session_windows,
                                                 windowed_counts)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    # nanos timestamps aren't supported by the streaming parquet reader
    # path the same way; re-write a clean copy for the stream source
    import tempfile

    from cube_builder_spark.tables import load_table
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return read_event_stream(spark, d)


def test_windowed_counts_matches_batch(spark, sf_dir, event_stream):
    run_to_memory(windowed_counts(event_stream), "wc", "complete")
    stream_rows = {(r.window_start, r.event_type): (r.n, r.total_value)
                   for r in spark.sql("SELECT * FROM wc").collect()}
    from cube_builder_spark.events_queries import e_tumbling_window
    batch_rows = {(r.window_start, r.event_type): (r.n, r.total_value)
                  for r in e_tumbling_window(spark, sf_dir).collect()}
    assert stream_rows == batch_rows


def test_session_windows_agree_with_batch_totals(spark, sf_dir, event_stream):
    run_to_memory(session_windows(event_stream), "sw", "complete")
    stream = spark.sql("SELECT * FROM sw")
    from cube_builder_spark.events_queries import e_sessionize
    batch = e_sessionize(spark, sf_dir)
    # session boundaries agree (same gap rule) -> same session count and
    # same total event mass per user
    s = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    b = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    srows = {r.user_id: (r.n_sessions, r.n_events) for r in s.collect()}
    brows = {r.user_id: (r.n_sessions, r.n_events) for r in b.collect()}
    assert srows == brows
