"""Engine D — IRA rollover tax-form audit (Matrix-only).

Reference: /root/reference/src/engines/ira_rollover_analysis.py:54-143.

Spark shape: pure scan -> conjunctive filter -> when-chain projection.
The plan/txn-method/tax-code scope predicates are plain column predicates
(Catalyst pushes them toward the parquet scan); no joins, no shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

from ..functions import normalizers as N

if TYPE_CHECKING:
    from ..functions.dateconfig import DateFilterConfig

IRA_PLAN_PREFIXES = ["300001", "300005"]  # src/config.py:531
IRA_PLAN_SUBSTRINGS = ["IRA"]  # src/config.py:532

STATUS_NO_ACTION = "match_no_action"
STATUS_NEEDS_CORRECTION = "match_needs_correction"
STATUS_NEEDS_REVIEW = "match_needs_review"


def run_ira_rollover_analysis(
    matrix_clean: DataFrame,
    *,
    date_start: str | None = None,
    date_end: str | None = None,
    months: Sequence[int] | None = None,
    date_filter: "DateFilterConfig | None" = None,
) -> DataFrame:
    from recon_spark.functions.dateconfig import resolve_date_args

    date_start, date_end, months = resolve_date_args(date_filter, date_start, date_end, months)
    df = matrix_clean.filter(
        N.date_filter_mask("txn_date", date_start=date_start, date_end=date_end, months=months)
    )
    # F7 scope: IRA plan ∧ check distribution ∧ G/H in either code
    df = df.filter(
        N.is_ira_plan("plan_id", IRA_PLAN_PREFIXES, IRA_PLAN_SUBSTRINGS)
        & (N.norm_space_lower("txn_method") == "check distribution")
    )
    code1 = F.coalesce(N.norm_tax_code("tax_code_1"), F.lit(""))
    code2 = F.coalesce(N.norm_tax_code("tax_code_2"), F.lit(""))
    df = df.filter(code1.isin("G", "H") | code2.isin("G", "H"))

    ftm = N.norm_compact_upper("federal_taxing_method")
    form = N.norm_compact_upper("tax_form")
    missing_ftm = ftm.isNull() | (ftm == "")
    missing_form = form.isNull() | (form == "")
    ftm_rollover = F.coalesce(ftm == "ROLLOVER", F.lit(False))
    ftm_non_rollover = ~missing_ftm & ~ftm_rollover
    form_no_tax = F.coalesce(form == "NOTAX", F.lit(False))
    form_1099r = F.coalesce(form == "1099R", F.lit(False))
    form_unknown = ~missing_form & ~form_no_tax & ~form_1099r

    no_action = ftm_rollover & form_no_tax
    correction = ftm_rollover & form_1099r

    review_reasons = N.conditional_tokens(
        (missing_ftm, "missing_federal_taxing_method"),
        (missing_form, "missing_tax_form"),
        (ftm_non_rollover, "federal_taxing_method_not_rollover"),
        (form_unknown, "unrecognized_tax_form"),
    )

    df = (
        df.withColumn(
            "match_status",
            F.when(no_action, STATUS_NO_ACTION)
            .when(correction, STATUS_NEEDS_CORRECTION)
            .otherwise(STATUS_NEEDS_REVIEW),
        )
        .withColumn(
            "action",
            F.when(correction, "UPDATE_1099").when(
                F.col("match_status") == STATUS_NEEDS_REVIEW, "INVESTIGATE"
            ),
        )
        .withColumn("suggested_tax_code_1", F.when(correction, "0"))
        .withColumn("suggested_tax_code_2", F.lit(None).cast("string"))
        .withColumn("new_tax_code", F.when(correction, "0"))
        .withColumn(
            "correction_reason",
            F.when(correction, "ira_rollover_tax_form_1099r_expected_no_tax").when(
                F.col("match_status") == STATUS_NEEDS_REVIEW,
                F.when(F.size(review_reasons) > 0, F.array_join(review_reasons, "; ")),
            ),
        )
    )
    return df


OUTPUT_COLUMNS = [
    "plan_id",
    "ssn",
    "gross_amt",
    "txn_date",
    "transaction_id",
    "matrix_account",
    "participant_name",
    "txn_method",
    "federal_taxing_method",
    "tax_form",
    "tax_code_1",
    "tax_code_2",
    "match_status",
    "action",
    "suggested_tax_code_1",
    "suggested_tax_code_2",
    "new_tax_code",
    "correction_reason",
]
