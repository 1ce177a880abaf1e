"""F2 config-layer tests, modeled on the reference's
``tests/validators/test_date_filter_config.py:7-59`` coverage."""

import datetime as dt

import pytest

from recon_spark.functions.dateconfig import DateFilterConfig, normalize_date_filter_config


def test_defaults_to_all():
    assert normalize_date_filter_config(DateFilterConfig()) == (None, None, None)
    assert normalize_date_filter_config(None) == (None, None, None)


def test_month_names_and_numbers():
    _, _, months = normalize_date_filter_config(DateFilterConfig(months=["July", 9, "Dec"]))
    assert months == (7, 9, 12)


def test_month_dedup_and_sort():
    _, _, months = normalize_date_filter_config(DateFilterConfig(months=["dec", 12, "March", "3"]))
    assert months == (3, 12)


def test_empty_months_treated_as_all():
    assert normalize_date_filter_config(DateFilterConfig(months=[]))[2] is None
    assert normalize_date_filter_config(DateFilterConfig(months=""))[2] is None
    assert normalize_date_filter_config(DateFilterConfig(months=["", None]))[2] is None


def test_all_only_list_treated_as_all():
    assert normalize_date_filter_config(DateFilterConfig(months=["all"]))[2] is None
    assert normalize_date_filter_config(DateFilterConfig(months="ALL"))[2] is None


def test_scalar_month():
    assert normalize_date_filter_config(DateFilterConfig(months=7))[2] == (7,)
    assert normalize_date_filter_config(DateFilterConfig(months="sept"))[2] == (9,)


def test_invalid_month_raises():
    with pytest.raises(ValueError, match="Invalid month value"):
        normalize_date_filter_config(DateFilterConfig(months=["NotAMonth"]))
    with pytest.raises(ValueError, match="Invalid month value"):
        normalize_date_filter_config(DateFilterConfig(months=[13]))


def test_none_entries_filtered():
    assert normalize_date_filter_config(DateFilterConfig(months=[None, "jan"]))[2] == (1,)


def test_date_coercion():
    start, end, _ = normalize_date_filter_config(
        DateFilterConfig(date_start="2025-01-01", date_end=dt.date(2025, 6, 30))
    )
    assert start == dt.date(2025, 1, 1)
    assert end == dt.date(2025, 6, 30)


def test_blank_date_is_none():
    assert normalize_date_filter_config(DateFilterConfig(date_start="  "))[0] is None


def test_invalid_date_raises():
    with pytest.raises(ValueError, match="Invalid date_start"):
        normalize_date_filter_config(DateFilterConfig(date_start="not-a-date"))


def test_invalid_range_raises():
    with pytest.raises(ValueError, match="Invalid date range"):
        normalize_date_filter_config(
            DateFilterConfig(date_start="2025-02-01", date_end="2025-01-01")
        )


def test_all_conflict_raises():
    with pytest.raises(ValueError, match="Months cannot include 'all'"):
        normalize_date_filter_config(DateFilterConfig(months=["all", "July"]))
