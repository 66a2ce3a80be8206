"""Streaming CEP: ordered funnel pattern matching with
``applyInPandasWithState``.

The batch funnel (events_queries.e_funnel) is three chained window
passes; a STREAM can't window over history it hasn't seen, and events
arrive OUT OF ORDER — a click can arrive before the view that
justifies it. This operator is the complex-event-processing shape
(Flink CEP / MATCH_RECOGNIZE): per (user, day), buffer candidate
timestamps in keyed state and emit a conversion only when it is
WATERMARK-STABLE — the whole (view < click < purchase) triple lies
below the event-time watermark, so no late arrival can ever produce
an earlier triple, making the streaming answer equal to the batch
recomputation by construction rather than by luck.

State is bounded: one min-view scalar plus click/purchase candidate
lists pruned against it (a click at or before the first view can
never participate; same for purchases), all cleared on emission, and
an event-time timeout reclaims state for users who never convert.
At scale the state store partitions by (user, day) and never
shuffles between micro-batches.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stateful import _dt, _us

FUNNEL_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("day", T.DateType()),
    T.StructField("view_ts", T.TimestampType()),
    T.StructField("click_ts", T.TimestampType()),
    T.StructField("purchase_ts", T.TimestampType()),
])

FUNNEL_STATE = T.StructType([
    T.StructField("done", T.BooleanType()),
    T.StructField("views", T.ArrayType(T.LongType())),
    T.StructField("clicks", T.ArrayType(T.LongType())),
    T.StructField("purchases", T.ArrayType(T.LongType())),
])

_GIVE_UP_US = 7 * 24 * 3600 * 1_000_000  # reclaim non-converting state


def funnel_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    """Invoked with new rows AND on event-time timeouts: a timeout is
    how a watermark advance re-examines a buffered partial match in a
    no-data micro-batch (Spark only calls timed-out groups there), so
    every invocation runs the same match-against-watermark logic."""
    user_id, day = key
    done, views, clicks, purchases = (
        state.get if state.exists else (False, [], [], []))
    if not state.hasTimedOut:
        for pdf in pdfs:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                us = _us(ts)
                if et == "view":
                    views.append(us)
                elif et == "click":
                    clicks.append(us)
                elif et == "purchase":
                    purchases.append(us)
    wm_us = state.getCurrentWatermarkMs() * 1000
    if done:
        if state.hasTimedOut:      # give-up horizon reached: reclaim
            state.remove()
        else:                      # more same-day events: keep the
            state.update((True, [], [], []))   # marker (no re-emit)
            state.setTimeoutTimestamp(wm_us // 1000 + _GIVE_UP_US // 1000)
        return
    newest = max(views + clicks + purchases, default=None)
    if newest is None:
        state.remove()
        return
    fin_views = [v for v in views if v < wm_us]
    v = min(fin_views) if fin_views else None
    out = None
    if v is not None:
        fin_clicks = [c for c in clicks if c < wm_us and c > v]
        c = min(fin_clicks) if fin_clicks else None
        if c is not None:
            fin_purch = [p for p in purchases if p < wm_us and p > c]
            p = min(fin_purch) if fin_purch else None
            if p is not None:
                out = (v, c, p)
    if out is not None:
        # keep the done-marker until the give-up horizon: removing it
        # now would let a second, later triple re-emit for this day
        state.update((True, [], [], []))
        state.setTimeoutTimestamp(wm_us // 1000 + _GIVE_UP_US // 1000)
        yield pd.DataFrame([{
            "user_id": user_id, "day": day,
            "view_ts": _dt(out[0]), "click_ts": _dt(out[1]),
            "purchase_ts": _dt(out[2])}])
        return
    # no stable match. Abandoned (watermark a full horizon past the
    # newest buffered event — nothing new can complete the pattern in
    # bounded memory): reclaim AFTER the match attempt, so a watermark
    # that jumps far in one no-data batch still emits stable triples
    # before any state is given up.
    if wm_us > newest + _GIVE_UP_US:
        state.remove()
        return
    # prune: only the min view matters; clicks/purchases at or before
    # it can never participate in a future match
    if v is not None:
        views = [v]
        clicks = [c for c in clicks if c > v]
        purchases = [p for p in purchases if p > v]
    state.update((False, views, clicks, purchases))
    # wake on the next watermark advance to re-examine stability
    state.setTimeoutTimestamp(max(wm_us // 1000 + 1, 1))


def funnel_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """view -> click -> purchase conversions per (user, day), emitted
    exactly once each, watermark-stable (see module docstring)."""
    ev = (events.withWatermark("ts", watermark)
          .filter(F.col("event_type").isin("view", "click", "purchase"))
          .select("user_id",
                  F.to_date(F.date_trunc("day", "ts")).alias("day"),
                  "event_type", "ts"))
    return (ev.groupBy("user_id", "day")
            .applyInPandasWithState(
                funnel_fn, FUNNEL_OUTPUT, FUNNEL_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))
