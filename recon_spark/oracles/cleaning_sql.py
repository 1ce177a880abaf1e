"""DuckDB CTEs mirroring recon_spark.operators.cleaning (the four cleaners)."""

from __future__ import annotations

from ..sources.spec import VALIDATION_TODAY
from . import sql
from .fixtures_sql import FIXTURE_CTES

_RELIUS_KEYS = "plan_id, ssn, gross_amt, exported_date, tax_year"
_MATRIX_KEYS = "plan_id, ssn, gross_amt, txn_date"

CLEAN_CTES = f"""relius_norm AS (
  SELECT
    {sql.norm_plan_id('"PLANID_1"')} AS plan_id,
    {sql.norm_ssn('"SSNUM_1"')} AS ssn,
    "FIRSTNAM" AS first_name,
    "LASTNAM" AS last_name,
    "STATEADDR" AS state,
    TRY_CAST("GROSSDISTRAMT" AS DOUBLE) AS gross_amt,
    {sql.to_date_safe('"EXPORTEDDATE"')} AS exported_date,
    {sql.to_long_safe('"TAXYR"')} AS tax_year,
    {sql.norm_text('"DISTR1CD"', upper=True)} AS dist_code_1,
    "DISTRNAM" AS dist_name,
    {sql.classify_dist_name('"DISTRNAM"')} AS dist_category_relius,
    {sql.full_name('"FIRSTNAM"', '"LASTNAM"')} AS full_name,
    src_order, src_seq
  FROM relius_raw
),
relius_clean AS (
  SELECT *,
    {sql.ssn_valid('ssn')} AS ssn_valid,
    {sql.amounts_valid('gross_amt')} AS amount_valid,
    {sql.dates_valid('exported_date', VALIDATION_TODAY)} AS date_valid,
    {sql.code_1099r_valid('dist_code_1')} AS code_1099r_valid,
    {sql.validation_issues_joined(
        sql.ssn_valid('ssn'),
        sql.amounts_valid('gross_amt'),
        sql.dates_valid('exported_date', VALIDATION_TODAY),
        sql.code_1099r_valid('dist_code_1'),
    )} AS validation_issues
  FROM relius_norm
  WHERE plan_id IS NOT NULL AND ssn IS NOT NULL AND gross_amt IS NOT NULL
    AND exported_date IS NOT NULL AND tax_year IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY {_RELIUS_KEYS} ORDER BY src_order, src_seq) = 1
),
matrix_norm AS (
  SELECT
    {sql.norm_plan_id('"Client Account"')} AS plan_id,
    {sql.norm_ssn('"Participant SSN"')} AS ssn,
    {sql.norm_text('"Participant Name"')} AS participant_name,
    {sql.norm_text('"Participant State"', upper=True)} AS state,
    TRY_CAST("Gross Amount" AS DOUBLE) AS gross_amt,
    TRY_CAST("Fed Taxable Amount" AS DOUBLE) AS fed_taxable_amt,
    {sql.to_date_safe('"Transaction Date"')} AS txn_date,
    {sql.norm_text('"Transaction Type"')} AS txn_method,
    {sql.norm_tax_code('"Tax Code"')} AS tax_code_1,
    {sql.norm_tax_code('"Tax Code 2"')} AS tax_code_2,
    {sql.norm_text('"Tax Form"')} AS tax_form,
    {sql.norm_text('"Federal Taxing Method"')} AS federal_taxing_method,
    {sql.norm_text('"Distribution Type"')} AS dist_type,
    {sql.to_long_safe('"Roth Initial Contribution Year"')} AS roth_initial_contribution_year,
    {sql.norm_transaction_id('"Transaction Id"')} AS transaction_id,
    {sql.norm_text('"Matrix Account"')} AS matrix_account,
    src_order, src_seq
  FROM matrix_raw
  WHERE coalesce(CAST("Matrix Account" AS VARCHAR), '') NOT IN ('07B00442', '07I00442', '07M00442')
    AND coalesce(lower(trim(CAST("Transaction Type" AS VARCHAR))), '') NOT IN
        ('account transfer', 'suspense transfer', 'ach distribution reject', 'check stop')
),
matrix_clean AS (
  SELECT *,
    {sql.ssn_valid('ssn')} AS ssn_valid,
    {sql.amounts_valid('gross_amt', 'fed_taxable_amt')} AS amount_valid,
    {sql.dates_valid('txn_date', VALIDATION_TODAY)} AS date_valid,
    {sql.code_1099r_valid('tax_code_1')} AS code_1099r_valid,
    {sql.validation_issues_joined(
        sql.ssn_valid('ssn'),
        sql.amounts_valid('gross_amt', 'fed_taxable_amt'),
        sql.dates_valid('txn_date', VALIDATION_TODAY),
        sql.code_1099r_valid('tax_code_1'),
        sql.cross_tokens_matrix('gross_amt', 'fed_taxable_amt', 'tax_code_1'),
    )} AS validation_issues
  FROM matrix_norm
  WHERE plan_id IS NOT NULL AND ssn IS NOT NULL AND gross_amt IS NOT NULL AND txn_date IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY {_MATRIX_KEYS} ORDER BY src_order, src_seq) = 1
),
demo_norm AS (
  SELECT
    {sql.norm_plan_id('"PLANID"')} AS plan_id,
    {sql.norm_ssn('"SSNUM"')} AS ssn,
    {sql.norm_text('"FIRSTNAM"')} AS first_name,
    {sql.norm_text('"LASTNAM"')} AS last_name,
    {sql.to_date_safe('"BIRTHDATE"')} AS dob,
    {sql.to_date_safe('"TERM_DATE"')} AS term_date,
    src_order, src_seq
  FROM demo_raw
),
demo_clean AS (
  SELECT *,
    {sql.ssn_valid('ssn')} AS ssn_valid,
    CAST(NULL AS BOOLEAN) AS amount_valid,
    (CASE WHEN term_date IS NOT NULL THEN {sql.dates_valid('term_date', VALIDATION_TODAY)} END) AS date_valid,
    CAST(NULL AS BOOLEAN) AS code_1099r_valid,
    {sql.validation_issues_joined(
        sql.ssn_valid('ssn'),
        'CAST(NULL AS BOOLEAN)',
        "(CASE WHEN term_date IS NOT NULL THEN " + sql.dates_valid('term_date', VALIDATION_TODAY) + " END)",
        'CAST(NULL AS BOOLEAN)',
    )} AS validation_issues
  FROM demo_norm
  WHERE ssn IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY plan_id, ssn ORDER BY src_order DESC, src_seq DESC) = 1
),
basis_norm AS (
  SELECT
    {sql.norm_plan_id('"PLANID"')} AS plan_id,
    {sql.norm_ssn('"SSNUM"')} AS ssn,
    {sql.norm_text('"FIRSTNAM"')} AS first_name,
    {sql.norm_text('"LASTNAM"')} AS last_name,
    {sql.to_long_safe('"FIRSTTAXYEARROTH"')} AS first_roth_tax_year,
    TRY_CAST("Total" AS DOUBLE) AS roth_basis_amt,
    src_order, src_seq
  FROM basis_raw
),
basis_clean AS (
  SELECT *,
    {sql.ssn_valid('ssn')} AS ssn_valid,
    {sql.amounts_valid('roth_basis_amt')} AS amount_valid,
    CAST(NULL AS BOOLEAN) AS date_valid,
    CAST(NULL AS BOOLEAN) AS code_1099r_valid,
    {sql.validation_issues_joined(
        sql.ssn_valid('ssn'),
        sql.amounts_valid('roth_basis_amt'),
        'CAST(NULL AS BOOLEAN)',
        'CAST(NULL AS BOOLEAN)',
    )} AS validation_issues
  FROM basis_norm
  QUALIFY row_number() OVER (
    PARTITION BY plan_id, ssn
    ORDER BY (CAST(first_roth_tax_year IS NOT NULL AS INT) + CAST(roth_basis_amt IS NOT NULL AS INT)) DESC,
             src_order, src_seq
  ) = 1
)"""

#: full prefix for any oracle query needing cleaned tables
PRELUDE = f"WITH {FIXTURE_CTES},\n{CLEAN_CTES}"
