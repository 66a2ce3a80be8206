"""Temporal composition timeline algebra (C17) + temporal priority (C16).

Clean-room reimplementation of the reference's timeline semantics
(``cube_builder/utils/timeline.py:29-249``), verified against the golden
cases in ``tests/test_timeline.py`` of the reference:

- ``continuous`` schema: periods of ``step`` units starting exactly at
  start_date (day unit) / rolling to unit boundaries (month/year);
- ``cyclic`` schema: periods restart at each cycle boundary (e.g. every
  year), the last period of a cycle clipped short at the cycle end;
- ``intervals`` (seasonal) like ``'12-21_03-20'``: named mm-dd windows,
  possibly crossing the year boundary, generated per year.

Driver-side pure Python (no I/O); the result becomes the ``periods``
DataFrame cross-joined with tiles.
"""

from __future__ import annotations

import calendar
from datetime import date, timedelta


def _add_months(d: date, months: int) -> date:
    m = d.month - 1 + months
    y = d.year + m // 12
    m = m % 12 + 1
    day = min(d.day, calendar.monthrange(y, m)[1])
    return date(y, m, day)


class _Intervals:
    """mm-dd interval windows (reference Intervals, timeline.py:29-73)."""

    def __init__(self, specs: list[str]):
        self.specs = specs

    def index_for(self, ref: date) -> int:
        for i, spec in enumerate(self.specs):
            if f"{ref.month:02d}-{ref.day:02d}" == spec.split("_")[0]:
                return i if i < len(self.specs) else 0
        return 0

    def element(self, idx: int) -> tuple[str, str]:
        spec = self.specs[idx if idx < len(self.specs) else 0]
        start, end = spec.split("_")
        return start, end

    @staticmethod
    def resolve(ref: date, mmdd: str, sum_year: bool = True, roll_next: bool = False) -> date:
        m, d = int(mmdd.split("-")[0]), int(mmdd.split("-")[1])
        if sum_year and ref.month > m:
            return date(ref.year + 1, m, d)
        if not sum_year and ref.month < m:
            return date(ref.year - 1, m, d)
        if roll_next:
            return date(ref.year + 1, m, d)
        return date(ref.year, m, d)


def _next_start(d: date, step: int, unit: str,
                intervals: _Intervals | None = None, roll_next: bool = False) -> date:
    if intervals is not None:
        idx = intervals.index_for(d)
        start_el, _ = intervals.element(idx + 1)
        return _Intervals.resolve(d, start_el, sum_year=True, roll_next=roll_next)
    if unit == "day":
        return d + timedelta(days=step)
    if unit == "month":
        return _add_months(d, step).replace(day=1)
    if unit == "year":
        return date(d.year + step, 1, 1)
    raise ValueError(f"unknown unit {unit!r}")


def _period_end(start: date, step: int, unit: str,
                intervals: _Intervals | None = None) -> date:
    if intervals is None:
        return _next_start(start, step, unit) - timedelta(days=1)
    idx = intervals.index_for(start)
    _, end_el = intervals.element(idx)
    return _Intervals.resolve(start, end_el)


def _continuous(start: date, end: date, unit: str, step: int,
                cut_start: date | None = None, cut_end: date | None = None,
                intervals: _Intervals | None = None, full_period: bool = True,
                relative: bool = False) -> list[tuple[date, date]]:
    sp = start
    ep = _period_end(sp, step, unit, intervals)
    periods = [(sp, ep)]
    while True:
        sp = _next_start(sp, step, unit, intervals, roll_next=relative)
        ep = _period_end(sp, step, unit, intervals)
        if start <= sp and end >= ep:
            periods.append((sp, ep))
        elif start <= sp <= end < ep:
            if intervals is None and not full_period:
                periods.append((sp, end))
            else:
                periods.append((sp, ep))
        if ep > end:
            break
    if cut_start and cut_end:
        result = [p for p in periods if cut_start <= p[0] <= cut_end]
        # no period begins inside the cut window: the window itself is
        # the period (reference timeline.py:162-165)
        return result or [(cut_start, cut_end)]
    return periods


def mount_timeline(schema: str, start_date: date, end_date: date, unit: str,
                   step: int, cycle: dict | None = None,
                   intervals: list[str] | None = None) -> list[tuple[date, date]]:
    """Mount the timeline (reference Timeline.mount, timeline.py:187-205)."""
    if start_date > end_date:
        raise ValueError(
            f'The End date "{end_date}" must not be lower than Start Date "{start_date}"')
    step = int(step)
    if schema.lower() == "cyclic":
        cyc_intervals = _Intervals(cycle["intervals"]) if cycle.get("intervals") else None
        cyc_unit, cyc_step = cycle["unit"], int(cycle["step"])
        first = start_date.replace(day=1, month=1 if cyc_unit == "year" else start_date.month)
        cycles = _continuous(first, end_date, cyc_unit, cyc_step,
                             intervals=cyc_intervals, relative=True)
        periods: list[tuple[date, date]] = []
        for c_start, c_end in cycles:
            if cyc_intervals is not None:
                for spec in cyc_intervals.specs:
                    sm, sd = (int(x) for x in spec.split("_")[0].split("-"))
                    em, ed = (int(x) for x in spec.split("_")[1].split("-"))
                    periods += _continuous(
                        start_date, end_date, unit, step,
                        cut_start=date(c_start.year, sm, sd),
                        cut_end=date(c_end.year, em, ed),
                        intervals=cyc_intervals, relative=True)
            else:
                periods += _continuous(c_start, c_end, unit, step,
                                       cut_start=start_date, cut_end=end_date,
                                       full_period=False)
        return periods
    ivals = _Intervals(intervals) if intervals else None
    if ivals is not None:
        start_el, _ = ivals.element(0)
        start = _Intervals.resolve(start_date, start_el, sum_year=False)
        return _continuous(start, end_date, unit, step, intervals=ivals)
    return _continuous(start_date, end_date, unit, step,
                       cut_start=start_date, cut_end=end_date)


def temporal_priority_timeline(day_of_year: int, timeline: list[str]) -> list[str]:
    """C16 (timeline.py:208-249): order dates nearest-first around the
    period's reference day; ties go to the earlier date."""
    if not timeline:
        return []
    ordered = sorted(timeline)
    ref = date.fromisoformat(ordered[0]) + timedelta(days=day_of_year - 1)
    return sorted(ordered, key=lambda t: (abs(date.fromisoformat(t) - ref), t))


def timeline_rows(schema: str, start_date: date, end_date: date, unit: str,
                  step: int, cycle: dict | None = None,
                  intervals: list[str] | None = None) -> list[dict]:
    """Timeline as rows for a periods DataFrame."""
    return [
        {"period": f"{s.isoformat()}_{e.isoformat()}", "start_date": s, "end_date": e}
        for s, e in mount_timeline(schema, start_date, end_date, unit, step, cycle, intervals)
    ]
