"""Calendar/time intelligence: date paths, truncation, relative named
references and the member converter for ``role: "time"`` dimensions.

Parity: /root/reference/cubes/calendar.py:98-314 (Calendar, path,
truncate_time, named_relative_path, CalendarMemberConverter) — same
grammar (``today``, ``yesterday``, ``tomorrow``, ``<N><unit>ago``,
``<N><unit>forward``, ``last<N><unit>``, ``next<N><unit>``) and the
same truncation rules, re-implemented on the stdlib (no dateutil).

Spark notes: the calendar expands *query-side* cut strings into plain
level paths before any plan is built, so relative time costs nothing at
execution — the resulting cut compiles to ordinary column predicates
that push down to the parquet scan.
"""

from __future__ import annotations

import re
from calendar import monthrange
from datetime import datetime, timedelta
from typing import Any, Iterable, List, Optional

from cubes_spark.errors import ArgumentError, ConfigurationError

__all__ = [
    "Calendar",
    "CalendarMemberConverter",
    "add_time_units",
    "calendar_hierarchy_units",
    "month_to_quarter",
]

#: Units a time hierarchy level may play (parity: calendar.py:24-25)
CALENDAR_UNITS = ["year", "quarter", "month", "day", "hour", "minute",
                  "weekday"]

_UNIT_ORDER = {
    "year": 8, "quarter": 7, "month": 6, "week": 5,
    "day": 4, "hour": 3, "minute": 2, "second": 1,
}

_WEEKDAY_NUMBERS = {
    "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
    "friday": 4, "saturday": 5, "sunday": 6,
}

RELATIVE_FINE_TIME_RX = re.compile(
    r"(?P<offset>\d+)?(?P<unit>\w+)(?P<direction>(ago|forward))"
)

RELATIVE_TRUNCATED_TIME_RX = re.compile(
    r"(?P<direction>(last|next))(?P<offset>\d+)?(?P<unit>\w+)"
)


def month_to_quarter(month: int) -> int:
    return ((month - 1) // 3) + 1


def calendar_hierarchy_units(hierarchy: Any) -> List[str]:
    """Units for a time hierarchy's levels: ``level.role`` or the level
    name (parity: calendar.py:73-95)."""
    units = []
    for level in hierarchy.levels:
        role = level.role or level.name
        if role not in CALENDAR_UNITS:
            raise ArgumentError(
                f"Unknown time role '{role}' for level '{level}'"
            )
        units.append(role)
    return units


def _add_months(time: datetime, months: int) -> datetime:
    total = time.year * 12 + (time.month - 1) + months
    year, month = divmod(total, 12)
    month += 1
    day = min(time.day, monthrange(year, month)[1])
    return time.replace(year=year, month=month, day=day)


def add_time_units(time: datetime, unit: str, amount: int) -> datetime:
    """Add ``amount`` ``unit``s to ``time`` (month/quarter/year clamp
    the day like dateutil's relativedelta; parity: calendar.py:98-117)."""
    if unit == "hour":
        return time + timedelta(hours=amount)
    if unit == "day":
        return time + timedelta(days=amount)
    if unit == "week":
        return time + timedelta(days=amount * 7)
    if unit == "month":
        return _add_months(time, amount)
    if unit == "quarter":
        return _add_months(time, amount * 3)
    if unit == "year":
        return _add_months(time, amount * 12)
    raise ArgumentError(f"Unknown unit {unit} for addition.")


class Calendar:
    """Date/time path provider (parity: calendar.py:120-290).

    ``first_weekday``: 0 = Monday … 6 = Sunday, or a weekday name.
    ``now``: optional fixed reference instant — deterministic queries
    and tests pin it; defaults to the wall clock.
    """

    def __init__(self, first_weekday: Any = 0,
                 now: Optional[datetime] = None) -> None:
        if isinstance(first_weekday, str):
            try:
                self.first_weekday = _WEEKDAY_NUMBERS[first_weekday.lower()]
            except KeyError:
                raise ConfigurationError(
                    f"Unknown weekday name {first_weekday}"
                )
        else:
            value = int(first_weekday)
            if value < 0 or value >= 7:
                raise ConfigurationError(f"Invalid weekday number {value}")
            self.first_weekday = value
        self._now = now

    def now(self) -> datetime:
        return self._now or datetime.now()

    def path(self, time: datetime, units: Iterable[str]) -> list:
        """Calendar path of `time` for `units` (parity: 152-176)."""
        if not units:
            return []
        if hasattr(units, "levels"):
            units = calendar_hierarchy_units(units)
        path = []
        for unit in units:
            if unit in ("year", "month", "day", "hour", "minute"):
                value = getattr(time, unit)
            elif unit == "quarter":
                value = month_to_quarter(time.month)
            elif unit == "weekday":
                value = (time.weekday() - self.first_weekday) % 7
            else:
                raise ArgumentError(f"Unknown calendar unit '{unit}'")
            path.append(value)
        return path

    def now_path(self, units: Iterable[str]) -> list:
        return self.path(self.now(), units)

    def truncate_time(self, time: datetime, unit: str) -> datetime:
        """Truncate to calendar `unit`, honoring the week start day
        (parity: 184-221)."""
        unit_order = _UNIT_ORDER[unit]
        time = time.replace(microsecond=0)
        if unit_order > _UNIT_ORDER["minute"]:
            time = time.replace(minute=0, second=0)
        elif unit_order > _UNIT_ORDER["second"]:
            time = time.replace(second=0)

        if unit == "hour":
            pass
        elif unit == "day":
            time = time.replace(hour=0)
        elif unit == "week":
            time = time.replace(hour=0)
            back = (time.weekday() - self.first_weekday) % 7
            time = time - timedelta(days=back)
        elif unit == "month":
            time = time.replace(day=1, hour=0)
        elif unit == "quarter":
            month = (month_to_quarter(time.month) - 1) * 3 + 1
            time = time.replace(month=month, day=1, hour=0)
        elif unit == "year":
            time = time.replace(month=1, day=1, hour=0)
        else:
            raise ValueError(f"Unrecognized unit: {unit}")
        return time

    def since_period_start(self, period: str, unit: str,
                           time: Optional[datetime] = None) -> int:
        """Distance from the nearest `period` start in `unit`s
        (parity: 223-244)."""
        if not time:
            time = self.now()
        start = self.truncate_time(time, period)
        diff = time - start
        if unit == "day":
            return diff.days
        if unit == "hour":
            return diff.days * 24 + diff.seconds // 3600
        if unit == "minute":
            return diff.days * 1440 + diff.seconds // 60
        if unit == "second":
            return diff.days * 86400 + diff.seconds
        raise ValueError(f"Unrecognized period unit: {unit}")

    def named_relative_path(self, reference: str, units: Iterable[str],
                            date: Optional[datetime] = None) -> list:
        """Expand a named reference (``yesterday``, ``90daysago``,
        ``lastmonth``, ``next2weeks``…) to a path (parity: 246-290)."""
        date = date or self.now()

        truncate = False
        relative_match = RELATIVE_FINE_TIME_RX.match(reference)
        if not relative_match:
            truncate = True
            relative_match = RELATIVE_TRUNCATED_TIME_RX.match(reference)

        if reference == "today":
            pass
        elif reference == "yesterday":
            date = date - timedelta(days=1)
        elif reference == "tomorrow":
            date = date + timedelta(days=1)
        elif relative_match:
            offset_str = relative_match.group("offset")
            if offset_str:
                try:
                    offset = int(offset_str)
                except ValueError:
                    raise ArgumentError(
                        "Relative time offset should be a number"
                    )
            else:
                offset = 1

            unit = relative_match.group("unit")
            if unit.endswith("s"):
                unit = unit[:-1]
            if unit not in _UNIT_ORDER:
                raise ValueError(reference)

            direction = relative_match.group("direction")
            if direction in ("ago", "last"):
                offset = -offset
            if truncate:
                date = self.truncate_time(date, unit)
            date = add_time_units(date, unit, offset)
        else:
            raise ValueError(reference)

        return self.path(date, units)


class CalendarMemberConverter:
    """Expands single-element relative paths in cuts of ``role:"time"``
    dimensions — ``date:yesterday`` becomes the concrete calendar path
    for the cut's hierarchy (parity: calendar.py:293-309; wired like
    query/browser.py:130-144)."""

    def __init__(self, calendar: Calendar) -> None:
        self.calendar = calendar

    def __call__(self, dimension: Any, hierarchy: Any, path: list) -> list:
        if len(path) != 1:
            return path
        units = [level.role or level.name for level in hierarchy.levels]
        value = path[0]
        try:
            return self.calendar.named_relative_path(value, units)
        except ValueError:
            return [value]
