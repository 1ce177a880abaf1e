"""Ordered event-funnel analysis — per-user sequential conversion through
a list of event types (view -> click -> purchase), the canonical product
analytics shape the reference's KPI layer has no counterpart for.

Semantics: a user reaches step *k* if an event of ``steps[k]`` exists at
or after their step *k-1* reach time; the reach time is the EARLIEST such
event (the standard "ordered funnel, unbounded window" definition —
``min`` over qualifying events, so re-orderings of later events cannot
change it).

Scale shape: stage *k* is one equi-join of the per-user reach frame with
the step's filtered events plus a per-user aggregate — every frame in
the chain is hash-partitioned on ``user_id``, so Catalyst plans ONE
exchange per step-event branch plus one for the seed aggregate and
reuses the partitioning through every join/groupBy in the chain (no
quadratic blowup, no windows over whole event history).  The summary
reduces |users| rows to |steps| rows with map-side partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the canonical conversion chain in the test events table (view ->
#: click -> purchase); the DuckDB oracle is generated from this tuple
DEFAULT_FUNNEL_STEPS: tuple[str, ...] = ("view", "click", "purchase")


def funnel_users(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user reach times: one row per user who performed ``steps[0]``,
    with columns ``t_0 .. t_{k-1}`` (null from the first step the user
    never reached in order)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
    cur = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], 1):
        nxt = ev.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        prev_cols = [f"t_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col)
            .agg(
                *[F.max(c).alias(c) for c in prev_cols],
                F.min(
                    F.when(F.col("__ts") >= F.col(f"t_{i - 1}"), F.col("__ts"))
                ).alias(f"t_{i}"),
            )
        )
    return cur


def funnel_summary(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel table: ``(step_idx, step, n_users, conversion_micros)`` —
    users reaching each step in order and the step-over-step conversion
    rate (first step = 1.0; micros-scaled BIGINT so the DuckDB oracle
    hash-compares exactly)."""
    users = funnel_users(events, steps, user_col, ts_col, type_col)
    counts = users.agg(
        *[F.count(f"t_{i}").alias(f"n_{i}") for i in range(len(steps))]
    )
    # melt the 1-row count frame with ONE explode — a union of per-step
    # selects would re-evaluate the whole user aggregate once per step
    entries = []
    for i, step in enumerate(steps):
        conv = (
            F.lit(1_000_000).cast("long")
            if i == 0
            else F.when(
                F.col(f"n_{i - 1}") > 0,
                F.round(F.col(f"n_{i}").cast("double") / F.col(f"n_{i - 1}") * 1_000_000)
                .cast("long"),
            )
        )
        entries.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
                conv.alias("conversion_micros"),
            )
        )
    return counts.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity DAY
    (their cohort), counted in each later day they were active.  Returns
    ``(cohort_day, day_offset, n_users)``.  Daily granularity because
    the test events span a single month; the shape is granularity-
    agnostic (swap the two truncations for weekly/monthly cohorts).

    Scale shape: one groupBy(user) for first-seen, an equi-join back to
    the per-(user, day) activity set on the same user partitioning,
    and a two-key aggregate — the same partitioning-reuse chain as the
    funnel; no windows over event history, no distinct-count (the
    activity set is already distinct per (user, day))."""
    ev = events.filter(F.col(ts_col).isNotNull()).select(
        user_col, F.to_date(ts_col).alias("__d")
    )
    # distinct (user, day) BEFORE the join: shrinks the join input to
    # active-user-days and makes the final count a plain count(*)
    act = ev.distinct()
    first_seen = act.groupBy(user_col).agg(F.min("__d").alias("cohort_day"))
    return (
        act.join(first_seen, user_col)
        .groupBy(
            "cohort_day",
            F.datediff("__d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
