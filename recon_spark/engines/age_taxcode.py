"""Engine B — age-based 1099-R tax-code audit (non-Roth).

Reference: /root/reference/src/engines/age_taxcode_analysis.py:117-366.

Spark shape: matrix facts LEFT JOIN demographics dim on (plan_id, ssn) —
the demo side is a deduplicated participant master. The join is left
unhinted: demographics is customer-cardinality (it grows with the data,
unlike a config dim), so a forced broadcast would bypass the
autoBroadcastJoinThreshold and OOM executors at 100x scale. AQE picks
broadcast at runtime while the dim actually fits, shuffle-hash/SMJ
otherwise. The age cascade is a single ``when`` chain (one projection,
no shuffle beyond the join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

from ..functions import normalizers as N

if TYPE_CHECKING:
    from ..functions.dateconfig import DateFilterConfig
from .match_planid import INHERITED_PLAN_IDS

#: src/config.py:450-470
NORMAL_AGE = (59, 6)  # 59.5 -> years, months
TERM_RULE_AGE = (55, 0)
NORMAL_DIST_CODE = "7"
UNDER_55_CODE = "1"
AGE_55_PLUS_CODE = "2"
EXCLUDED_CODES = ["G", "H", "11", "13", "15", "16", "17", "18", "19", "33", "4"]

STATUS_INSUFFICIENT = "age_rule_insufficient_data"
STATUS_EXCLUDED = "excluded_from_age_engine_rollover_or_inherited"
STATUS_NO_ACTION = "match_no_action"
STATUS_NEEDS_CORRECTION = "match_needs_correction"


def attach_demo_to_matrix(matrix_df: DataFrame, demo_df: DataFrame) -> DataFrame:
    """LEFT equi-join matrix -> demographics + name fallback (reference :117-160)."""
    demo = demo_df.select("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")
    out = matrix_df.drop("first_name", "last_name").join(demo, ["plan_id", "ssn"], "left")
    return out.withColumn(
        "full_name",
        F.coalesce(F.col("participant_name"), N.full_name("first_name", "last_name")),
    )


def run_age_taxcode_analysis(
    matrix_clean: DataFrame,
    demo_clean: DataFrame,
    *,
    date_start: str | None = None,
    date_end: str | None = None,
    months: Sequence[int] | None = None,
    date_filter: "DateFilterConfig | None" = None,
) -> DataFrame:
    from recon_spark.functions.dateconfig import resolve_date_args

    date_start, date_end, months = resolve_date_args(date_filter, date_start, date_end, months)
    m = matrix_clean.filter(
        N.date_filter_mask("txn_date", date_start=date_start, date_end=date_end, months=months)
    )
    df = attach_demo_to_matrix(m, demo_clean)

    # defensive re-normalization (reference :222-224; idempotent on cleaned data)
    df = df.withColumn("tax_code_1", N.norm_tax_code("tax_code_1")).withColumn(
        "tax_code_2", N.norm_tax_code("tax_code_2")
    )

    rollover_code = F.coalesce(F.col("tax_code_1").isin(EXCLUDED_CODES), F.lit(False))
    inherited = F.col("plan_id").isin(INHERITED_PLAN_IDS)
    roth = N.is_roth_plan("plan_id", case_insensitive=True)
    df = df.filter(~roth)  # Roth handled by Engine C (reference :243-244)
    df = df.withColumn("age_engine_excluded", rollover_code | inherited)

    txn_year = F.year("txn_date")
    term_year = F.year("term_date")
    dob_year = F.year("dob")
    att_59_5 = N.attained_age_by_year_end("dob", txn_year, years=NORMAL_AGE[0], months=NORMAL_AGE[1])
    att_55_term = N.attained_age_by_year_end("dob", term_year, years=TERM_RULE_AGE[0])
    att_55_txn = N.attained_age_by_year_end("dob", txn_year, years=TERM_RULE_AGE[0])

    df = df.withColumns({
        "dob_year": dob_year.cast("long"),
        "txn_year": txn_year.cast("long"),
        "term_year": term_year.cast("long"),
        "age_at_distribution_year": (txn_year - dob_year).cast("double"),
        "age_at_termination_year": (term_year - dob_year).cast("double"),
        "attained_59_5_in_txn_year": att_59_5,
        "attained_55_in_txn_year": att_55_txn,
        "attained_55_in_term_year": att_55_term,
    })

    has_term = F.col("term_year").isNotNull()
    eligible = (
        ~F.col("age_engine_excluded") & F.col("dob").isNotNull() & F.col("txn_year").isNotNull()
    )
    normal = eligible & F.col("attained_59_5_in_txn_year")
    under = eligible & ~normal
    term_55_plus = under & has_term & F.col("attained_55_in_term_year")
    term_under_55 = under & has_term & ~F.col("attained_55_in_term_year")
    dist_under_55 = under & ~has_term & ~F.col("attained_55_in_txn_year")
    dist_55_plus = under & ~has_term & F.col("attained_55_in_txn_year")

    expected1 = (
        F.when(normal, NORMAL_DIST_CODE)
        .when(term_55_plus, AGE_55_PLUS_CODE)
        .when(term_under_55, UNDER_55_CODE)
        .when(dist_under_55, UNDER_55_CODE)
        .when(dist_55_plus, AGE_55_PLUS_CODE)
    )
    reason = (
        F.when(normal, "age_59_5_or_over_normal_distribution")
        .when(term_55_plus, "terminated_at_or_after_55")
        .when(term_under_55, "terminated_before_55")
        .when(dist_under_55, "no_term_date_under_55_in_txn_year")
        .when(dist_55_plus, "no_term_date_55_plus_in_txn_year")
    )
    df = df.withColumns({
        "expected_tax_code_1": expected1,
        "expected_tax_code_2": F.lit(None).cast("string"),
    })
    df = df.withColumn(
        "code_matches_expected",
        F.coalesce(
            F.col("expected_tax_code_1").isNotNull()
            & (F.coalesce(F.col("tax_code_1"), F.lit("")) == F.col("expected_tax_code_1")),
            F.lit(False),
        ),
    )
    needs_corr = (
        F.col("expected_tax_code_1").isNotNull()
        & ~F.col("code_matches_expected")
        & ~F.col("age_engine_excluded")
    )
    df = df.withColumns({
        "match_status": F.when(F.col("code_matches_expected"), STATUS_NO_ACTION)
        .when(needs_corr, STATUS_NEEDS_CORRECTION)
        .when(F.col("age_engine_excluded"), STATUS_EXCLUDED)
        .otherwise(STATUS_INSUFFICIENT),
        "action": F.when(needs_corr, "UPDATE_1099"),
    })
    df = df.withColumns({
        "correction_reason": F.when(F.col("match_status") != STATUS_NO_ACTION, reason),
        "suggested_tax_code_1": F.when(
            F.col("match_status") != STATUS_NO_ACTION, F.col("expected_tax_code_1")
        ),
        "suggested_tax_code_2": F.lit(None).cast("string"),
    })
    return df.withColumn(
        "new_tax_code", N.combined_tax_code("suggested_tax_code_1", "suggested_tax_code_2")
    )


OUTPUT_COLUMNS = [
    "plan_id",
    "ssn",
    "gross_amt",
    "txn_date",
    "transaction_id",
    "matrix_account",
    "full_name",
    "tax_code_1",
    "tax_code_2",
    "dob",
    "term_date",
    "dob_year",
    "txn_year",
    "term_year",
    "age_at_distribution_year",
    "age_at_termination_year",
    "attained_59_5_in_txn_year",
    "attained_55_in_txn_year",
    "attained_55_in_term_year",
    "age_engine_excluded",
    "expected_tax_code_1",
    "code_matches_expected",
    "match_status",
    "suggested_tax_code_1",
    "suggested_tax_code_2",
    "new_tax_code",
    "correction_reason",
    "action",
]
