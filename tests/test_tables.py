"""tables.py: footer-stat slice estimator, predicate-aware broadcast
gate, and the session-scoped table cache (round 8 — the q5 fix the
round-7 verdict prescribed)."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cube_builder_spark import tables
from cube_builder_spark.tables import (broadcast_if_small, load_table,
                                       slice_bytes)


@pytest.fixture()
def dated_dir(tmp_path):
    """A 4-row-group 'orders' table date-sorted so row-group min/max
    stats are disjoint — the 100 TB time-ordered-ingest layout."""
    n = 4000
    dates = [datetime.datetime(1995 + i // 1000, 1, 1)
             + datetime.timedelta(days=(i % 1000) // 3) for i in range(n)]
    t = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_comment": pa.array(["x" * 50] * n),
    })
    pq.write_table(t, tmp_path / "orders.parquet", row_group_size=1000)
    assert pq.ParquetFile(tmp_path / "orders.parquet").num_row_groups == 4
    return str(tmp_path)


def test_slice_bytes_prunes_disjoint_row_groups(dated_dir):
    whole = slice_bytes(dated_dir, "orders", "o_orderdate")
    assert whole is not None and whole > 0
    # one year ~ one row group of four
    one = slice_bytes(dated_dir, "orders", "o_orderdate",
                      datetime.datetime(1996, 1, 1),
                      datetime.datetime(1997, 1, 1))
    assert 0 < one < whole * 0.5
    # a range touching nothing prunes to zero bytes
    none = slice_bytes(dated_dir, "orders", "o_orderdate",
                       datetime.datetime(2010, 1, 1),
                       datetime.datetime(2011, 1, 1))
    assert none == 0
    # missing column -> None (caller falls back to whole-table bytes)
    assert slice_bytes(dated_dir, "orders", "no_such_col") is None


def test_slice_bytes_interpolates_within_group(dated_dir):
    """A predicate covering half of one group's [min, max] charges
    roughly half that group's bytes (uniformity assumption)."""
    full_group = slice_bytes(dated_dir, "orders", "o_orderdate",
                             datetime.datetime(1995, 1, 1),
                             datetime.datetime(1996, 1, 1))
    half_group = slice_bytes(dated_dir, "orders", "o_orderdate",
                             datetime.datetime(1995, 1, 1),
                             datetime.datetime(1995, 6, 15))
    assert 0 < half_group < full_group
    assert abs(half_group - full_group / 2) < full_group * 0.2


def test_predicate_gate_broadcasts_slice_not_table(dated_dir, spark):
    """The whole-table estimate fails a tight threshold; the two-year
    slice estimate passes it — exactly the q5 case. The hint is
    observable as a new (hinted) DataFrame object."""
    df = spark.read.parquet(os.path.join(dated_dir, "orders.parquet"))
    whole = slice_bytes(dated_dir, "orders", "o_orderdate")
    threshold = int(whole * 0.5)          # whole table can't pass
    out_plain = broadcast_if_small(df, dated_dir, "orders",
                                   threshold=threshold)
    assert out_plain is df                # no hint without the predicate
    out_pred = broadcast_if_small(
        df, dated_dir, "orders", threshold=threshold,
        predicate=("o_orderdate", datetime.datetime(1995, 1, 1),
                   datetime.datetime(1996, 1, 1)))
    assert out_pred is not df             # slice estimate earned the hint
    # an empty slice is always broadcastable
    out_none = broadcast_if_small(
        df, dated_dir, "orders", threshold=1,
        predicate=("o_orderdate", datetime.datetime(2010, 1, 1),
                   datetime.datetime(2011, 1, 1)))
    assert out_none is not df


def test_predicate_gate_respects_force_off(dated_dir, spark):
    df = spark.read.parquet(os.path.join(dated_dir, "orders.parquet"))
    old = tables.FORCE_NO_BROADCAST_HINTS
    tables.FORCE_NO_BROADCAST_HINTS = True
    try:
        out = broadcast_if_small(
            df, dated_dir, "orders", threshold=1 << 40,
            predicate=("o_orderdate", None, None))
        assert out is df
    finally:
        tables.FORCE_NO_BROADCAST_HINTS = old


def test_predicate_gate_falls_back_without_stats(tmp_path, spark):
    """Unusable footer stats (missing column) degrade to the
    whole-table estimate, never a looser gate."""
    t = pa.table({"k": pa.array(range(100), pa.int64())})
    pq.write_table(t, tmp_path / "dim.parquet")
    df = spark.read.parquet(str(tmp_path / "dim.parquet"))
    out = broadcast_if_small(df, str(tmp_path), "dim", threshold=1,
                             predicate=("nope", 0, 10))
    assert out is df                      # tiny threshold: whole-table fails


def test_load_table_cache_hit_and_mtime_invalidation(dated_dir, spark):
    a = load_table(spark, dated_dir, "orders")
    b = load_table(spark, dated_dir, "orders")
    assert a is b                         # session-scoped cache hit
    path = os.path.join(dated_dir, "orders.parquet")
    os.utime(path, (os.path.getmtime(path) + 5,) * 2)
    c = load_table(spark, dated_dir, "orders")
    assert c is not a                     # rewritten table re-reads
