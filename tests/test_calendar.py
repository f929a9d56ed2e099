"""Calendar/time intelligence (parity:
/root/reference/tests/test_time.py + cubes/calendar.py semantics)."""

from datetime import datetime

import pytest

from cubes_spark.calendar import (
    Calendar,
    CalendarMemberConverter,
    add_time_units,
    month_to_quarter,
)

REF = datetime(1996, 6, 15, 14, 35, 22)


@pytest.fixture
def cal():
    return Calendar(now=REF)


def test_path_units(cal):
    assert cal.path(REF, ["year", "month", "day"]) == [1996, 6, 15]
    assert cal.path(REF, ["year", "quarter"]) == [1996, 2]
    assert cal.path(REF, ["hour", "minute"]) == [14, 35]
    assert cal.path(REF, []) == []


def test_weekday_respects_first_weekday():
    # 1996-06-15 is a Saturday (weekday 5 with Monday start)
    assert Calendar(now=REF).path(REF, ["weekday"]) == [5]
    assert Calendar(first_weekday="sunday", now=REF).path(REF, ["weekday"]) \
        == [6]


def test_truncate_time(cal):
    assert cal.truncate_time(REF, "year") == datetime(1996, 1, 1)
    assert cal.truncate_time(REF, "quarter") == datetime(1996, 4, 1)
    assert cal.truncate_time(REF, "month") == datetime(1996, 6, 1)
    assert cal.truncate_time(REF, "day") == datetime(1996, 6, 15)
    assert cal.truncate_time(REF, "hour") == datetime(1996, 6, 15, 14)
    # week starts Monday 1996-06-10
    assert cal.truncate_time(REF, "week") == datetime(1996, 6, 10)


def test_add_time_units_clamps_month_end():
    jan31 = datetime(1996, 1, 31)
    assert add_time_units(jan31, "month", 1) == datetime(1996, 2, 29)
    assert add_time_units(jan31, "year", 1) == datetime(1997, 1, 31)
    assert add_time_units(jan31, "quarter", 1) == datetime(1996, 4, 30)


def test_named_relative_paths(cal):
    ymd = ["year", "month", "day"]
    assert cal.named_relative_path("today", ymd) == [1996, 6, 15]
    assert cal.named_relative_path("yesterday", ymd) == [1996, 6, 14]
    assert cal.named_relative_path("tomorrow", ymd) == [1996, 6, 16]
    assert cal.named_relative_path("90daysago", ymd) == [1996, 3, 17]
    assert cal.named_relative_path("2weeksforward", ymd) == [1996, 6, 29]
    # truncated forms snap to period start before shifting
    assert cal.named_relative_path("lastmonth", ymd) == [1996, 5, 1]
    assert cal.named_relative_path("nextmonth", ymd) == [1996, 7, 1]
    assert cal.named_relative_path("last2years", ymd) == [1994, 1, 1]


def test_since_period_start(cal):
    assert cal.since_period_start("year", "day", REF) == 166
    assert cal.since_period_start("day", "hour", REF) == 14
    assert cal.since_period_start("hour", "minute", REF) == 35


def test_member_converter_expands_relative(tpch_browser):
    from cubes_spark.query.cells import cuts_from_string

    converters = {"time": CalendarMemberConverter(Calendar(now=REF))}
    cuts = cuts_from_string(tpch_browser.cube, "date:lastmonth",
                            role_member_converters=converters)
    assert cuts[0].path == [1996, 5, 1]
    # non-relative values pass through untouched
    cuts = cuts_from_string(tpch_browser.cube, "date:1995",
                            role_member_converters=converters)
    assert cuts[0].path == ["1995"]


def test_browser_relative_cut_end_to_end(spark):
    from cubes_spark.demo import tpch_workspace
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    browser = ws.browser("sales", calendar=Calendar(now=REF))
    relative = browser.aggregate(cell="date@ym:lastmonth",
                                 aggregates=["fact_count"])
    explicit = browser.aggregate(cell="date@ym:1996,5",
                                 aggregates=["fact_count"])
    assert relative.summary["fact_count"] \
        == explicit.summary["fact_count"] > 0
