"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

``streaming/events.py`` covers the declarative path (watermark +
``session_window``); this is the arbitrary-stateful path for semantics
the built-ins can't express (e.g. emitting a row only when a session
CLOSES, carrying custom per-session accumulators). State is keyed by
user_id and partitioned by Spark's state store, so at any scale each
task owns a disjoint user range and state never shuffles between
micro-batches.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value_cents", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value_cents", T.LongType()),
])

GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _us(ts) -> int:
    if isinstance(ts, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=ts.tzinfo)
        return int((ts - epoch).total_seconds() * 1_000_000)
    return int(ts.value // 1_000)  # pandas Timestamp (ns)


def _dt(us: int) -> datetime.datetime:
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)


def sessionize_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit one row per CLOSED session; open sessions persist in the
    state store across micro-batches and time out on the event clock."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, cents = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "session_start": _dt(start_us),
            "session_end": _dt(last_us), "n_events": n,
            "total_value_cents": cents}])
        return

    events = sorted(
        (( _us(ts), int(round(float(v) * 100)))
         for pdf in pdfs
         for ts, v in zip(pdf["ts"], pdf["value"].fillna(0.0))),
        key=lambda e: e[0])
    closed = []
    cur = list(state.get) if state.exists else None
    for ts_us, cents in events:
        if cur is None:
            cur = [ts_us, ts_us, 0, 0]
        elif ts_us - cur[1] > GAP_US:
            closed.append(tuple(cur))
            cur = [ts_us, ts_us, 0, 0]
        cur[1] = max(cur[1], ts_us)
        cur[2] += 1
        cur[3] += cents
    if cur is not None:
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[1] // 1000 + GAP_US // 1000)
    if closed:
        yield pd.DataFrame([{
            "user_id": user_id, "session_start": _dt(s),
            "session_end": _dt(e), "n_events": n,
            "total_value_cents": c} for s, e, n, c in closed])


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events (streaming, with ts/user_id/value) -> closed sessions."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                sessionize_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
