"""Engine A — inherited-plan reconciliation (full-outer join + rules).

Reference: /root/reference/src/engines/match_planid.py:254-422 (join +
classification) and :124-250 (inherited tax-code rules).

Spark shape: both sides are pre-filtered to the plan scope (manual
predicate pushdown mirroring the reference; Catalyst additionally pushes
the ``isin`` into the parquet scan), then a single full-outer equi-join on
``(plan_id, ssn, gross_amt)``. pandas' ``indicator=True`` ``_merge`` column
is derived from per-side non-null marker columns. The asymmetric date
window (J2) is evaluated post-join as ``datediff BETWEEN 0 AND max_lag``.

100 TB notes: both sides shuffle on the 3-part key into a sort-merge join
(Spark cannot use broadcast-hash for a full-outer join — only BNLJ, which
would be strictly worse — so SMJ is the correct, scale-safe physical plan
here). The plan-scope filter is pushed into both parquet scans before the
shuffle; skewed ``(plan_id, ssn)`` hot keys are split by AQE skew-join
handling.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

from ..functions import normalizers as N

if TYPE_CHECKING:
    from ..functions.dateconfig import DateFilterConfig

#: src/config.py:375-382
INHERITED_PLAN_IDS = ["300004PLAT", "300004MBD", "300004MBDII"]
DEFAULT_RECONCILIATION_PLAN_IDS = INHERITED_PLAN_IDS
MAX_DATE_LAG_DAYS = 10  # src/config.py:192

STATUS = {
    "no_action": "match_no_action",
    "needs_correction": "match_needs_correction",
    "needs_review": "match_needs_review",
    "date_out_of_range": "date_out_of_range",
    "unmatched_relius": "unmatched_relius",
    "unmatched_matrix": "unmatched_matrix",
}

JOIN_KEYS = ["plan_id", "ssn", "gross_amt"]


def reconcile_relius_matrix(
    relius_clean: DataFrame,
    matrix_clean: DataFrame,
    plan_ids: Iterable[str] | None = None,
    apply_business_rules: bool = True,
    *,
    max_date_lag_days: int = MAX_DATE_LAG_DAYS,
    date_start: str | None = None,
    date_end: str | None = None,
    months: Sequence[int] | None = None,
    date_filter: "DateFilterConfig | None" = None,
) -> DataFrame:
    from recon_spark.functions.dateconfig import resolve_date_args

    date_start, date_end, months = resolve_date_args(date_filter, date_start, date_end, months)
    if plan_ids is None:
        plan_ids = DEFAULT_RECONCILIATION_PLAN_IDS
    plan_list = list(plan_ids)

    r = relius_clean.filter(F.col("plan_id").isin(plan_list))
    m = matrix_clean.filter(F.col("plan_id").isin(plan_list))
    r = r.filter(N.date_filter_mask("exported_date", date_start=date_start, date_end=date_end, months=months))
    m = m.filter(N.date_filter_mask("txn_date", date_start=date_start, date_end=date_end, months=months))

    # suffix overlapping non-key columns like pandas merge(suffixes=...)
    overlap = (set(r.columns) & set(m.columns)) - set(JOIN_KEYS)
    r = r.withColumnsRenamed({c: f"{c}_relius" for c in overlap}).withColumn(
        "_r_marker", F.lit(1)
    )
    m = m.withColumnsRenamed({c: f"{c}_matrix" for c in overlap}).withColumn(
        "_m_marker", F.lit(1)
    )

    merged = r.join(m, JOIN_KEYS, "full_outer")
    merged = merged.withColumn(
        "merge_side",
        F.when(F.col("_r_marker").isNull(), "right_only")
        .when(F.col("_m_marker").isNull(), "left_only")
        .otherwise("both"),
    ).drop("_r_marker", "_m_marker")

    # J2: asymmetric date window
    lag = N.date_lag_days("txn_date", "exported_date")
    merged = merged.withColumn("date_lag_days", lag).withColumn(
        "date_within_tolerance",
        F.coalesce(F.col("date_lag_days").between(0, max_date_lag_days), F.lit(False)),
    )

    both = F.col("merge_side") == "both"
    if apply_business_rules:
        # inherited rules (reference :124-250); note they apply to every
        # 'both' row regardless of the date window — only match_status
        # distinguishes out-of-range rows.
        is_inherited = F.col("plan_id").isin(INHERITED_PLAN_IDS)
        is_rollover = F.coalesce(
            F.col("dist_category_relius").isin("rollover", "partial_rollover"), F.lit(False)
        )
        mask_rollover = both & is_inherited & is_rollover
        mask_cash = both & is_inherited & ~is_rollover
        # layered withColumns batches: each layer only references columns
        # from earlier layers, so shared subexpressions (needs_correction
        # etc.) stay single-computed instead of being inlined N times, and
        # each batch is one analysis pass instead of one per column.
        merged = merged.withColumns({
            "expected_tax_code_1": F.when(mask_rollover | mask_cash, "4"),
            "expected_tax_code_2": F.when(mask_rollover, "G"),
        })
        merged = merged.withColumn(
            "code_matches_expected",
            (F.coalesce(F.col("tax_code_1"), F.lit("")) == F.coalesce(F.col("expected_tax_code_1"), F.lit("")))
            & (F.coalesce(F.col("tax_code_2"), F.lit("")) == F.coalesce(F.col("expected_tax_code_2"), F.lit(""))),
        )
        merged = merged.withColumn(
            "needs_correction",
            F.coalesce(
                both & F.col("expected_tax_code_1").isNotNull() & ~F.col("code_matches_expected"),
                F.lit(False),
            ),
        )
        merged = merged.withColumns({
            "suggested_tax_code_1": F.when(F.col("needs_correction"), F.col("expected_tax_code_1")),
            "suggested_tax_code_2": F.when(F.col("needs_correction"), F.col("expected_tax_code_2")),
            "correction_reason": F.when(
                F.col("needs_correction") & mask_rollover, "inherited_rollover_expected_G_and_4"
            ).when(F.col("needs_correction") & mask_cash, "inherited_cash_expected_4"),
            "action": F.when(F.col("needs_correction"), "UPDATE_1099"),
        })
    else:
        merged = merged.withColumns({
            "expected_tax_code_1": F.lit(None).cast("string"),
            "expected_tax_code_2": F.lit(None).cast("string"),
            "code_matches_expected": F.lit(None).cast("boolean"),
            "needs_correction": F.lit(False),
            "suggested_tax_code_1": F.lit(None).cast("string"),
            "suggested_tax_code_2": F.lit(None).cast("string"),
            "correction_reason": F.lit(None).cast("string"),
            "action": F.lit(None).cast("string"),
        })

    within = F.col("date_within_tolerance")
    merged = merged.withColumn(
        "match_status",
        F.when(F.col("merge_side") == "left_only", STATUS["unmatched_relius"])
        .when(F.col("merge_side") == "right_only", STATUS["unmatched_matrix"])
        .when(both & ~within, STATUS["date_out_of_range"])
        .when(both & within & F.col("needs_correction"), STATUS["needs_correction"])
        .when(both & within, STATUS["no_action"]),
    )
    return merged.withColumn(
        "new_tax_code", N.combined_tax_code("suggested_tax_code_1", "suggested_tax_code_2")
    )


#: stable projection for oracle comparison / downstream consumers
OUTPUT_COLUMNS = [
    "plan_id",
    "ssn",
    "gross_amt",
    "exported_date",
    "txn_date",
    "date_lag_days",
    "date_within_tolerance",
    "merge_side",
    "match_status",
    "dist_category_relius",
    "dist_code_1",
    "tax_code_1",
    "tax_code_2",
    "expected_tax_code_1",
    "expected_tax_code_2",
    "suggested_tax_code_1",
    "suggested_tax_code_2",
    "new_tax_code",
    "correction_reason",
    "action",
    "transaction_id",
    "matrix_account",
]
