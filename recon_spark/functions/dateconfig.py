"""Date-filter configuration normalization (F2 config layer).

Parity target: ``/root/reference/src/core/validators.py:105-185``
(``_coerce_month_value`` / ``_normalize_months_config`` /
``normalize_date_filter_config``) and ``src/config.py:205-226``
(``DateFilterConfig`` with the ``"all"`` sentinel).

This is pure driver-side config handling — it runs once per pipeline
invocation, never per row, so plain Python is the right tool.  The
normalized ``(date_start, date_end, months)`` triple feeds
:func:`recon_spark.functions.normalizers.date_filter_mask`, which is the
distributed (Column-expression) half of operator F2.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable
from dataclasses import dataclass
from numbers import Integral

DATE_FILTER_ALL = "all"

#: month-name aliases accepted in config (reference validators.py:55-81)
MONTH_ALIASES: dict[str, int] = {}
for _n, _names in enumerate(
    [
        ("jan", "january"),
        ("feb", "february"),
        ("mar", "march"),
        ("apr", "april"),
        ("may",),
        ("jun", "june"),
        ("jul", "july"),
        ("aug", "august"),
        ("sep", "sept", "september"),
        ("oct", "october"),
        ("nov", "november"),
        ("dec", "december"),
    ],
    start=1,
):
    for _name in _names:
        MONTH_ALIASES[_name] = _n


@dataclass(frozen=True)
class DateFilterConfig:
    """User-facing filter config: inclusive [date_start, date_end] range
    plus a month whitelist; ``"all"`` / None / empty mean "no month filter"."""

    date_start: dt.date | str | None = None
    date_end: dt.date | str | None = None
    months: object = DATE_FILTER_ALL


def _coerce_date(value: object, field: str) -> dt.date | None:
    if value is None:
        return None
    if isinstance(value, dt.datetime):
        return value.date()
    if isinstance(value, dt.date):
        return value
    if isinstance(value, str):
        text = value.strip()
        if not text:
            return None
        try:
            return dt.date.fromisoformat(text)
        except ValueError as exc:
            raise ValueError(
                f"Invalid {field}: {value!r}. Expected a date or YYYY-MM-DD string."
            ) from exc
    raise ValueError(f"Invalid {field}: {value!r}. Expected a date or YYYY-MM-DD string.")


def _coerce_month(value: object) -> int:
    if value is None:
        raise ValueError("Month values must be provided as names or 1-12.")
    if isinstance(value, Integral) and not isinstance(value, bool):
        month = int(value)
    else:
        text = str(value).strip().lower()
        if not text:
            raise ValueError("Month values must be provided as names or 1-12.")
        if text.isdigit():
            month = int(text)
        elif text in MONTH_ALIASES:
            month = MONTH_ALIASES[text]
        else:
            raise ValueError(f"Invalid month value: {value!r}. Expected a month name or number.")
    if not 1 <= month <= 12:
        raise ValueError(f"Invalid month value: {value!r}. Expected a month number between 1 and 12.")
    return month


def _normalize_months(months: object) -> tuple[int, ...] | None:
    if months is None:
        return None
    if isinstance(months, str):
        text = months.strip()
        if not text or text.lower() == DATE_FILTER_ALL:
            return None
        values: list[object] = [months]
    elif isinstance(months, Integral) and not isinstance(months, bool):
        values = [months]
    elif isinstance(months, Iterable):
        values = list(months)
    else:
        raise ValueError(
            f"Invalid months configuration: {months!r}. Expected a month name or iterable."
        )
    values = [v for v in values if v is not None and not (isinstance(v, str) and not v.strip())]
    if not values:
        return None
    is_all = [isinstance(v, str) and v.strip().lower() == DATE_FILTER_ALL for v in values]
    if all(is_all):
        return None
    if any(is_all):
        raise ValueError("Months cannot include 'all' alongside specific month values.")
    return tuple(sorted({_coerce_month(v) for v in values}))


def normalize_date_filter_config(
    cfg: DateFilterConfig | None = None,
) -> tuple[dt.date | None, dt.date | None, tuple[int, ...] | None]:
    """Validate + normalize a :class:`DateFilterConfig` into the
    ``(date_start, date_end, months)`` triple the engines consume.

    Raises ``ValueError`` on unparseable dates/months, ``"all"`` mixed with
    specific months, or an inverted range.
    """
    cfg = cfg or DateFilterConfig()
    start = _coerce_date(cfg.date_start, "date_start")
    end = _coerce_date(cfg.date_end, "date_end")
    months = _normalize_months(cfg.months)
    if start is not None and end is not None and start > end:
        raise ValueError(f"Invalid date range: date_start {start} is after date_end {end}.")
    return start, end, months


def resolve_date_args(
    date_filter: DateFilterConfig | None,
    date_start: dt.date | str | None,
    date_end: dt.date | str | None,
    months: Iterable[int] | None,
) -> tuple[object, object, Iterable[int] | None]:
    """Engine-boundary helper: an explicit ``date_filter`` config wins over
    the raw ``(date_start, date_end, months)`` kwargs (and gets validated);
    otherwise the raw triple passes through untouched."""
    if date_filter is not None:
        return normalize_date_filter_config(date_filter)
    return date_start, date_end, months
