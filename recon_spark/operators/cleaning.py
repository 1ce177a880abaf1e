"""Cleaners for the four canonical input tables (SURVEY.md §2: P1/P2, F1/F2/F8,
D1-D3, C1-C13, V1-V6).

Reference behavior: /root/reference/src/cleaning/clean_{relius,matrix,
relius_demo,relius_roth_basis}.py. Each cleaner renames raw export headers to
canonical names, prunes to core columns, normalizes scalars (pure Column
exprs), attaches validation flags/issue arrays, drops rows with null match
keys, and deduplicates.

Determinism at scale: pandas' ``keep='first'`` dedup depends on file order,
which has no distributed meaning. Raw fixture tables carry an explicit
``src_order`` column; dedup is a ``row_number()`` window over the match keys
ordered by it. The window shuffle is on the same keys as the downstream
join, so at 100 TB the exchange is reused (co-partitioning), not doubled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import normalizers as N
from ..functions import validators as V
from ..plans import quality as Q
from ..sources.spec import VALIDATION_TODAY

RELIUS_COLUMN_MAP = {  # src/config.py:240-253
    "PLANID_1": "plan_id",
    "SSNUM_1": "ssn",
    "FIRSTNAM": "first_name",
    "LASTNAM": "last_name",
    "STATEADDR": "state",
    "GROSSDISTRAMT": "gross_amt",
    "EXPORTEDDATE": "exported_date",
    "DISTR1CD": "dist_code_1",
    "TAXYR": "tax_year",
    "DISTRNAM": "dist_name",
}

MATRIX_COLUMN_MAP = {  # src/config.py:277-296
    "Matrix Account": "matrix_account",
    "Client Account": "plan_id",
    "Participant SSN": "ssn",
    "Participant Name": "participant_name",
    "Participant State": "state",
    "Gross Amount": "gross_amt",
    "Transaction Date": "txn_date",
    "Transaction Type": "txn_method",
    "Tax Code": "tax_code_1",
    "Tax Code 2": "tax_code_2",
    "Tax Form": "tax_form",
    "Federal Taxing Method": "federal_taxing_method",
    "Distribution Type": "dist_type",
    "Transaction Id": "transaction_id",
    "Fed Taxable Amount": "fed_taxable_amt",
    "Roth Initial Contribution Year": "roth_initial_contribution_year",
}

DEMO_COLUMN_MAP = {  # src/config.py:266-274
    "PLANID": "plan_id",
    "SSNUM": "ssn",
    "FIRSTNAM": "first_name",
    "LASTNAM": "last_name",
    "BIRTHDATE": "dob",
    "TERM_DATE": "term_date",
}

ROTH_BASIS_COLUMN_MAP = {  # src/config.py:256-264
    "PLANID": "plan_id",
    "SSNUM": "ssn",
    "FIRSTNAM": "first_name",
    "LASTNAM": "last_name",
    "FIRSTTAXYEARROTH": "first_roth_tax_year",
    "Total": "roth_basis_amt",
}

RELIUS_MATCH_KEYS = ["plan_id", "ssn", "gross_amt", "exported_date", "tax_year"]
MATRIX_MATCH_KEYS = ["plan_id", "ssn", "gross_amt", "txn_date"]

#: F1 exclusions (src/cleaning/clean_matrix.py:219-234)
IGNORED_MATRIX_ACCOUNTS = ["07B00442", "07I00442", "07M00442"]
IGNORED_TXN_METHODS = [
    "account transfer",
    "suspense transfer",
    "ach distribution reject",
    "check stop",
]


def _rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    return df.withColumnsRenamed(mapping)


def _dedup_keep_first(df: DataFrame, keys: list[str]) -> DataFrame:
    # (src_order, src_seq) is a total order over fixture rows, so the winner
    # is deterministic across partitionings and matches the DuckDB oracle's
    # identical ORDER BY (src_order alone is a per-block constant — ties
    # would get an arbitrary winner).
    #
    # Partitioning is the (plan_id, ssn) PREFIX of the match keys, with the
    # remaining key columns leading the sort so equal full keys are adjacent
    # and a null-safe lag compare keeps each run's first row — selection-
    # identical to row_number()=1 over the full key, but the exchange is on
    # (plan_id, ssn), which every downstream consumer clusters on: Engine
    # A's 3-key full-outer SMJ and Engine C's participant window both
    # reuse it (hash partitioning on a SUBSET of the join/window keys
    # satisfies the superset clustering requirement), so at 100 TB the
    # cleaned table is shuffled exactly once.
    prefix = ["plan_id", "ssn"]
    rest = [k for k in keys if k not in prefix]
    w = Window.partitionBy(*prefix).orderBy(
        *[F.col(k).asc_nulls_first() for k in rest],
        F.col("src_order").asc(),
        F.col("src_seq").asc(),
    )
    cur = F.struct(*[F.col(k) for k in rest])
    prev = F.lag(cur).over(w)
    keep = prev.isNull() | ~prev.eqNullSafe(cur)
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")


def clean_relius(
    raw: DataFrame,
    *,
    drop_rows_missing_keys: bool = True,
    date_start: str | None = None,
    date_end: str | None = None,
    months: list[int] | None = None,
    today: str = VALIDATION_TODAY,
) -> DataFrame:
    """clean_relius (src/cleaning/clean_relius.py:203-349), Spark-first."""
    Q.validate_columns(raw, RELIUS_COLUMN_MAP, "Relius")  # S2
    df = _rename(raw, RELIUS_COLUMN_MAP)
    df = df.select(
        *[c for c in RELIUS_COLUMN_MAP.values() if c in df.columns], "src_order", "src_seq"
    )
    # one withColumns batch = one analysis pass (a per-call withColumn chain
    # re-analyzes the growing plan each time — measurable driver overhead)
    df = df.withColumns({
        "plan_id": N.norm_plan_id("plan_id"),
        "ssn": N.norm_ssn("ssn"),
        "exported_date": N.to_date_safe("exported_date"),
        "tax_year": N.to_long_safe("tax_year"),
        "gross_amt": N.to_double_safe("gross_amt"),
        "dist_code_1": N.norm_text("dist_code_1", strip=True, upper=True),
        "dist_category_relius": N.classify_dist_name("dist_name"),
        "full_name": N.full_name("first_name", "last_name"),
    })
    df = df.filter(N.date_filter_mask("exported_date", date_start=date_start, date_end=date_end, months=months))
    ssn_ok = V.ssn_valid("ssn")
    amt_ok = V.amounts_valid("gross_amt")
    date_ok = V.dates_valid("exported_date", today=today)
    code_ok = V.code_1099r_valid("dist_code_1")
    df = df.withColumns({
        "ssn_valid": ssn_ok,
        "amount_valid": amt_ok,
        "date_valid": date_ok,
        "code_1099r_valid": code_ok,
        "validation_issues": V.validation_issues(ssn_ok, amt_ok, date_ok, code_ok),
    })
    if drop_rows_missing_keys:
        df = df.na.drop(subset=RELIUS_MATCH_KEYS, how="any")
    return _dedup_keep_first(df, RELIUS_MATCH_KEYS)


def clean_matrix(
    raw: DataFrame,
    *,
    drop_rows_missing_keys: bool = True,
    date_start: str | None = None,
    date_end: str | None = None,
    months: list[int] | None = None,
    today: str = VALIDATION_TODAY,
) -> DataFrame:
    """clean_matrix (src/cleaning/clean_matrix.py:240-470), Spark-first."""
    Q.validate_columns(raw, MATRIX_COLUMN_MAP, "Matrix")  # S2
    df = _rename(raw, MATRIX_COLUMN_MAP)
    df = df.select(
        *[c for c in MATRIX_COLUMN_MAP.values() if c in df.columns], "src_order", "src_seq"
    )
    # F1: noise filters before normalization (filter ordering is free for
    # Catalyst, but matching the reference keeps row-identity semantics clear).
    # NULL account/method must NOT match the exclusion list (the reference
    # astype(str) turns NaN into 'nan', which never matches); coalesce to ''
    # so three-valued logic can't silently drop the row.
    # expressed as IS NULL OR NOT IN on the bare source column (equivalent
    # to ~coalesce(col,'').isin(list) since '' is not in the list) so the
    # predicate is parquet-pushable when the raw table is materialized
    df = df.filter(
        F.col("matrix_account").isNull()
        | ~F.col("matrix_account").cast("string").isin(IGNORED_MATRIX_ACCOUNTS)
    )
    df = df.filter(
        ~F.coalesce(F.lower(F.trim(F.col("txn_method").cast("string"))), F.lit("")).isin(
            IGNORED_TXN_METHODS
        )
    )
    df = df.withColumns({
        "plan_id": N.norm_plan_id("plan_id"),
        "ssn": N.norm_ssn("ssn"),
        "txn_date": N.to_date_safe("txn_date"),
        "gross_amt": N.to_double_safe("gross_amt"),
        "fed_taxable_amt": N.to_double_safe("fed_taxable_amt"),
        "roth_initial_contribution_year": N.to_long_safe("roth_initial_contribution_year"),
        "state": N.norm_state("state"),
        "tax_code_1": N.norm_tax_code("tax_code_1"),
        "tax_code_2": N.norm_tax_code("tax_code_2"),
        "transaction_id": N.norm_transaction_id("transaction_id"),
        "txn_method": N.norm_text("txn_method"),
        "tax_form": N.norm_text("tax_form"),
        "federal_taxing_method": N.norm_text("federal_taxing_method"),
        "dist_type": N.norm_text("dist_type"),
        "participant_name": N.norm_text("participant_name"),
    })
    df = df.filter(N.date_filter_mask("txn_date", date_start=date_start, date_end=date_end, months=months))
    ssn_ok = V.ssn_valid("ssn")
    amt_ok = V.amounts_valid("gross_amt", "fed_taxable_amt")
    date_ok = V.dates_valid("txn_date", today=today)
    code_ok = V.code_1099r_valid("tax_code_1")
    cross = V.cross_field_issues("gross_amt", "fed_taxable_amt", "tax_code_1")
    df = df.withColumns({
        "ssn_valid": ssn_ok,
        "amount_valid": amt_ok,
        "date_valid": date_ok,
        "code_1099r_valid": code_ok,
        "validation_issues": V.validation_issues(ssn_ok, amt_ok, date_ok, code_ok, cross_issues=cross),
    })
    if drop_rows_missing_keys:
        df = df.na.drop(subset=MATRIX_MATCH_KEYS, how="any")
    return _dedup_keep_first(df, MATRIX_MATCH_KEYS)


def clean_relius_demo(raw: DataFrame, *, today: str = VALIDATION_TODAY) -> DataFrame:
    """clean_relius_demo (src/cleaning/clean_relius_demo.py:61-146).

    Keep-last dedup per (plan_id, ssn) -> row_number over src_order DESC.
    """
    Q.validate_columns(raw, DEMO_COLUMN_MAP, "Relius demographics")  # S2
    df = _rename(raw, DEMO_COLUMN_MAP)
    df = df.select(*DEMO_COLUMN_MAP.values(), "src_order", "src_seq")
    df = df.withColumns({
        "ssn": N.norm_ssn("ssn"),
        "dob": N.to_date_safe("dob"),
        "term_date": N.to_date_safe("term_date"),
        "plan_id": N.norm_plan_id("plan_id"),
        "first_name": N.norm_text("first_name"),
        "last_name": N.norm_text("last_name"),
    })
    ssn_ok = V.ssn_valid("ssn")
    # date_valid is masked to NULL where term_date is null (reference :121)
    date_ok = F.when(
        F.col("term_date").isNotNull(), V.dates_valid("term_date", today=today)
    )
    df = df.withColumns({
        "ssn_valid": ssn_ok,
        "amount_valid": F.lit(None).cast("boolean"),
        "date_valid": date_ok,
        "code_1099r_valid": F.lit(None).cast("boolean"),
        "validation_issues": V.validation_issues(ssn_ok, F.lit(None).cast("boolean"), date_ok, F.lit(None).cast("boolean")),
    })
    df = df.filter(F.col("ssn").isNotNull())
    w = Window.partitionBy("plan_id", "ssn").orderBy(
        F.col("src_order").desc(), F.col("src_seq").desc()
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def clean_roth_basis(raw: DataFrame, *, today: str = VALIDATION_TODAY) -> DataFrame:
    """clean_relius_roth_basis (src/cleaning/clean_relius_roth_basis.py:92-174).

    D3: completeness-ranked dedup — keep the row with the most non-null
    {first_roth_tax_year, roth_basis_amt}, ties broken by src_order.
    """
    Q.validate_columns(raw, ROTH_BASIS_COLUMN_MAP, "Roth basis")  # S2
    df = _rename(raw, ROTH_BASIS_COLUMN_MAP)
    df = df.select(*ROTH_BASIS_COLUMN_MAP.values(), "src_order", "src_seq")
    df = df.withColumns({
        "ssn": N.norm_ssn("ssn"),
        "plan_id": N.norm_plan_id("plan_id"),
        "first_name": N.norm_text("first_name"),
        "last_name": N.norm_text("last_name"),
        "first_roth_tax_year": N.to_long_safe("first_roth_tax_year"),
        "roth_basis_amt": N.to_double_safe("roth_basis_amt"),
    })
    ssn_ok = V.ssn_valid("ssn")
    amt_ok = V.amounts_valid("roth_basis_amt")
    df = df.withColumns({
        "ssn_valid": ssn_ok,
        "amount_valid": amt_ok,
        "date_valid": F.lit(None).cast("boolean"),
        "code_1099r_valid": F.lit(None).cast("boolean"),
        "validation_issues": V.validation_issues(ssn_ok, amt_ok, F.lit(None).cast("boolean"), F.lit(None).cast("boolean")),
    })
    completeness = F.col("first_roth_tax_year").isNotNull().cast("int") + F.col(
        "roth_basis_amt"
    ).isNotNull().cast("int")
    w = Window.partitionBy("plan_id", "ssn").orderBy(
        completeness.desc(), F.col("src_order").asc(), F.col("src_seq").asc()
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
