"""Timeline algebra golden cases, ported from the reference's
tests/test_timeline.py (behavioral parity for C17/C16)."""

from __future__ import annotations

from datetime import date, timedelta

import pytest

from cube_builder_spark.timeline import mount_timeline, temporal_priority_timeline

START, END = date(2020, 1, 1), date(2020, 12, 31)


def test_continuous_step_month():
    tl = mount_timeline("Continuous", START, END, "month", 1)
    assert len(tl) == 12
    assert tl[0] == (date(2020, 1, 1), date(2020, 1, 31))
    assert tl[1] == (date(2020, 2, 1), date(2020, 2, 29))
    assert tl[-1] == (date(2020, 12, 1), date(2020, 12, 31))


def test_continuous_step_day():
    tl = mount_timeline("Continuous", START, END, "day", 16)
    assert len(tl) == 23
    ref = START
    for s, e in tl:
        assert s == ref
        assert e == ref + timedelta(days=15)
        ref += timedelta(days=16)
    assert tl[-1][-1].year == 2021


def test_continuous_step_day_start06():
    start = date(2020, 6, 12)
    tl = mount_timeline("Continuous", start, END, "day", 16)
    assert len(tl) == 13
    assert tl[0][0] == start
    assert tl[-1][-1].year == 2021


def test_cycle_year_16days():
    tl = mount_timeline("Cyclic", START, END, "day", 16, cycle=dict(unit="year", step=1))
    assert len(tl) == 23
    assert tl[-1][-1] == date(2020, 12, 31)
    assert (tl[-1][-1] - tl[-1][0]).days < 16
    ref = START
    for s, e in tl[:-1]:
        assert s == ref
        assert e == ref + timedelta(days=15)
        ref += timedelta(days=16)


def test_cycle_year_16days_starting_half():
    tl = mount_timeline("Cyclic", date(2020, 6, 15), END, "day", 16,
                        cycle=dict(unit="year", step=1))
    assert len(tl) == 12
    assert tl[0][0] == date(2020, 6, 25)
    assert tl[-1][-1] == date(2020, 12, 31)
    assert (tl[-1][-1] - tl[-1][0]).days < 16


def test_cycle_3month():
    tl = mount_timeline("Cyclic", START, END, "month", 3, cycle=dict(unit="year", step=1))
    assert len(tl) == 4
    assert tl[0] == (date(2020, 1, 1), date(2020, 3, 31))
    assert tl[-1] == (date(2020, 10, 1), date(2020, 12, 31))


def test_cycle_with_interval():
    tl = mount_timeline("Cyclic", date(2000, 1, 1), date(2002, 12, 31), "month", 3,
                        cycle=dict(unit="year", step=1, intervals=["08-01_10-31"]))
    assert len(tl) == 3
    for (s, e), year in zip(tl, (2000, 2001, 2002)):
        assert s == date(year, 8, 1)
        assert e == date(year, 10, 31)


def test_continuous_with_interval_season():
    tl = mount_timeline("Continuous", START, END, "month", 3,
                        intervals=["12-21_03-20", "03-21_06-20",
                                   "06-21_09-21", "09-22_12-20"])
    assert len(tl) == 5
    assert tl[0][0] == date(2019, 12, 21)
    assert tl[-1][-1] == date(2021, 3, 20)


def test_invalid_date_limit():
    with pytest.raises(ValueError, match="must not be lower than Start Date"):
        mount_timeline("Continuous", date(2021, 9, 30), date(2020, 10, 15), "month", 1)


def test_temporal_priority_day15_monthly():
    timeline = ["2020-01-01", "2020-01-07", "2020-01-12", "2020-01-15",
                "2020-01-18", "2020-01-23", "2020-01-28", "2020-02-01"]
    assert temporal_priority_timeline(15, timeline) == [
        "2020-01-15", "2020-01-12", "2020-01-18", "2020-01-07",
        "2020-01-23", "2020-01-28", "2020-01-01", "2020-02-01"]


def test_temporal_priority_last_day_of_period():
    timeline = ["2020-12-12", "2020-12-15", "2020-12-01", "2020-12-07",
                "2020-12-18", "2020-12-28", "2020-12-23", "2021-01-01"]
    assert temporal_priority_timeline(31, timeline) == sorted(timeline, reverse=True)


def test_temporal_priority_day42_quarter():
    timeline = ["2019-04-01", "2019-04-18", "2019-04-25",
                "2019-05-03", "2019-05-31", "2019-06-13"]
    assert temporal_priority_timeline(42, timeline) == [
        "2019-05-03", "2019-04-25", "2019-05-31", "2019-04-18",
        "2019-06-13", "2019-04-01"]


def test_temporal_priority_16days_year_cycle():
    timeline = ["2019-12-19", "2019-12-20", "2019-12-25", "2019-12-26"]
    assert temporal_priority_timeline(2, timeline) == [
        "2019-12-20", "2019-12-19", "2019-12-25", "2019-12-26"]
