"""Ordered event funnel (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

from recon_spark.operators import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2025, 1, 1) + dt.timedelta(hours=h), t) for u, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_ordered_semantics(spark):
    rows = [
        # u1 completes in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # u2 clicks BEFORE viewing -> click doesn't count; purchase needs
        # an ordered click, so u2 stops at view
        (2, 1, "click"), (2, 2, "view"), (2, 3, "purchase"),
        # u3 views only
        (3, 0, "view"),
        # u4 never views -> not in the funnel at all
        (4, 0, "click"), (4, 1, "purchase"),
    ]
    got = {
        r["step"]: (r["step_idx"], r["n_users"], r["conversion_micros"])
        for r in funnel.funnel_summary(
            _ev(spark, rows), ("view", "click", "purchase")
        ).collect()
    }
    assert got["view"] == (0, 3, 1_000_000)
    assert got["click"] == (1, 1, 333_333)
    assert got["purchase"] == (2, 1, 1_000_000)


def test_same_timestamp_counts(spark):
    # reach times use >=, so a step at the exact same instant qualifies
    rows = [(1, 0, "view"), (1, 0, "click")]
    got = {r["step"]: r["n_users"] for r in funnel.funnel_summary(
        _ev(spark, rows), ("view", "click")
    ).collect()}
    assert got == {"view": 1, "click": 1}


def test_min_reach_time_is_earliest_qualifying(spark):
    rows = [(1, 5, "view"), (1, 1, "view"), (1, 3, "click"), (1, 9, "click")]
    users = funnel.funnel_users(_ev(spark, rows), ("view", "click")).first()
    assert users["t_0"].hour == 1
    assert users["t_1"].hour == 3  # first click at/after the first view


def test_plan_is_join_based(spark):
    plan = (
        funnel.funnel_summary(_ev(spark, [(1, 0, "view")]), ("view", "click"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_cohort_retention_triangle(spark):
    rows = [
        # u1 first seen day0, active day0 and day2 (two events same day2
        # collapse to one activity)
        (1, 0, "view"), (1, 48, "click"), (1, 50, "purchase"),
        # u2 first seen day1 only
        (2, 24, "view"),
        # u3 first seen day0, active day1
        (3, 1, "view"), (3, 25, "click"),
    ]
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in funnel.cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2025-01-01", 0): 2,  # u1, u3
        ("2025-01-01", 1): 1,  # u3
        ("2025-01-01", 2): 1,  # u1 (both day-2 events = one active day)
        ("2025-01-02", 0): 1,  # u2
    }
