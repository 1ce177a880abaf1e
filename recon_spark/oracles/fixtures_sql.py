"""DuckDB rendering of the fixture derivation spec (sources/spec.py).

Must stay expression-for-expression equivalent to
:mod:`recon_spark.sources.fixtures`; both are generated from the shared
value lists in :mod:`recon_spark.sources.spec`.
"""

from __future__ import annotations

from ..sources import spec
from . import sql

O, K = "o", "k"

PLAN_ID = sql.pick(K, spec.PLAN_IDS)
SSN9 = f"lpad(CAST(({K} * {spec.SSN_MULTIPLIER}) % {spec.SSN_MODULUS} AS VARCHAR), 9, '0')"
SSN_RAW = f"""(CASE ({K}) % 6
    WHEN 1 THEN {SSN9} || '.0'
    WHEN 2 THEN substr({SSN9}, 1, 3) || '-' || substr({SSN9}, 4, 2) || '-' || substr({SSN9}, 6, 4)
    WHEN 3 THEN regexp_replace({SSN9}, '^0+', '')
    WHEN 4 THEN ' ' || {SSN9} || ' '
    ELSE {SSN9} END)"""
FIRST_NAME = f"(CASE WHEN ({K}) % 29 <> 0 THEN 'First' || CAST(({K}) % 50 AS VARCHAR) END)"
LAST_NAME = f"(CASE WHEN ({K}) % 31 <> 0 THEN 'Last' || CAST(({K}) % 73 AS VARCHAR) END)"
PARTICIPANT_NAME = (
    f"(CASE WHEN ({K}) % 37 <> 0 THEN 'First' || CAST(({K}) % 50 AS VARCHAR)"
    f" || ' ' || 'Last' || CAST(({K}) % 73 AS VARCHAR) END)"
)
STATE = sql.pick(K, spec.STATES)
DOB_RAW = (
    f"(CASE WHEN ({K}) % 19 = 0 THEN NULL WHEN ({K}) % 53 = 0 THEN 'not-a-date' "
    f"ELSE CAST(make_date(CAST(1940 + ({K}) % 61 AS INT), CAST(1 + ({K}) % 12 AS INT), "
    f"CAST(1 + ({K}) % 28 AS INT)) AS VARCHAR) END)"
)
TERM_RAW = (
    f"(CASE WHEN ({K}) % 4 <> 0 THEN CAST(make_date(CAST(2010 + ({K}) % 15 AS INT), "
    f"CAST(1 + (({K}) * 5) % 12 AS INT), CAST(1 + (({K}) * 3) % 28 AS INT)) AS VARCHAR) END)"
)

EXPORTED_DATE = (
    f"(CASE WHEN ({O}) % 101 = 0 THEN DATE '2099-01-01' "
    f"ELSE CAST(CAST(o_orderdate AS DATE) + INTERVAL {spec.EXPORT_SHIFT_MONTHS} MONTH AS DATE) END)"
)
GROSS = "(floor(o_totalprice * 100) / 100)"
TXN_DATE = f"({EXPORTED_DATE} + CAST(({O}) % 15 AS INT))"
TAX_YEAR_RAW = (
    f"(CASE WHEN ({O}) % 97 = 0 THEN NULL "
    f"WHEN ({O}) % 89 = 0 THEN CAST(year({EXPORTED_DATE}) AS VARCHAR) || '.0' "
    f"ELSE CAST(year({EXPORTED_DATE}) AS VARCHAR) END)"
)
MATRIX_ACCOUNT = (
    f"(CASE WHEN ({O}) % 23 = 0 THEN '07B00442' WHEN ({O}) % 23 = 1 THEN '07I00442' "
    f"ELSE '07C00' || lpad(CAST(({K}) % 900 AS VARCHAR), 3, '0') END)"
)
TXN_METHOD = (
    f"(CASE WHEN ({O}) % 41 = 0 THEN {sql.lit(spec.IGNORED_TXN_METHOD_MOD_41)} "
    f"WHEN ({O}) % 43 = 0 THEN {sql.lit(spec.IGNORED_TXN_METHOD_MOD_43)} "
    f"ELSE {sql.pick(O, spec.TXN_METHODS)} END)"
)
FED_TAXABLE = (
    f"(CASE WHEN ({O}) % 37 = 0 THEN floor({GROSS} * 1.2 * 100) / 100 "
    f"WHEN ({O}) % 4 = 0 THEN {GROSS} WHEN ({O}) % 4 = 1 THEN 0.0 "
    f"WHEN ({O}) % 4 = 2 THEN NULL ELSE floor({GROSS} * 0.5 * 100) / 100 END)"
)
TXN_ID_BASE = f"CAST(({O}) * 10 + 3 AS VARCHAR)"
TRANSACTION_ID = (
    f"(CASE WHEN ({O}) % 31 = 0 THEN 'TX' || {TXN_ID_BASE} "
    f"WHEN ({O}) % 5 = 0 THEN {TXN_ID_BASE} || '.0' ELSE {TXN_ID_BASE} END)"
)
RIC_YEAR = (
    f"(CASE WHEN ({K}) % 11 = 0 THEN NULL WHEN ({K}) % 13 = 0 THEN 0 "
    f"ELSE 2005 + ({K}) % 14 END)"
)

BASIS_FIRST_YEAR = (
    f"(CASE WHEN ({K}) % 13 = 0 THEN NULL WHEN ({K}) % 17 = 0 THEN '1800' "
    f"WHEN ({K}) % 23 = 0 THEN '0' ELSE CAST(2005 + ({K}) % 16 AS VARCHAR) END)"
)
BASIS_AMT = (
    f"(CASE WHEN ({K}) % 9 = 0 THEN NULL WHEN ({K}) % 21 = 0 THEN -100.0 "
    f"ELSE CAST(({K}) % 200 AS DOUBLE) * 2500.0 + 500.0 END)"
)


def _relius_select(dist_code: str, dist_name: str, src: int) -> str:
    return f"""SELECT
      {PLAN_ID} AS "PLANID_1",
      {SSN_RAW} AS "SSNUM_1",
      {FIRST_NAME} AS "FIRSTNAM",
      {LAST_NAME} AS "LASTNAM",
      {STATE} AS "STATEADDR",
      {GROSS} AS "GROSSDISTRAMT",
      CAST({EXPORTED_DATE} AS VARCHAR) AS "EXPORTEDDATE",
      {TAX_YEAR_RAW} AS "TAXYR",
      {dist_code} AS "DISTR1CD",
      {dist_name} AS "DISTRNAM",
      CAST({src} AS BIGINT) AS src_order,
      CAST({O} AS BIGINT) AS src_seq
    FROM oc"""


def _matrix_select(tax_code_1: str, txn_id: str, src: int) -> str:
    return f"""SELECT
      {MATRIX_ACCOUNT} AS "Matrix Account",
      {PLAN_ID} AS "Client Account",
      {SSN_RAW} AS "Participant SSN",
      {PARTICIPANT_NAME} AS "Participant Name",
      {STATE} AS "Participant State",
      {GROSS} AS "Gross Amount",
      CAST({TXN_DATE} AS VARCHAR) AS "Transaction Date",
      {TXN_METHOD} AS "Transaction Type",
      {tax_code_1} AS "Tax Code",
      {sql.pick(O, spec.TAX_CODES_2)} AS "Tax Code 2",
      {sql.pick(O, spec.TAX_FORMS)} AS "Tax Form",
      {sql.pick(O, spec.FED_TAXING_METHODS)} AS "Federal Taxing Method",
      {sql.pick(O, ["Rollover", "Cash", "Roth"])} AS "Distribution Type",
      {txn_id} AS "Transaction Id",
      {FED_TAXABLE} AS "Fed Taxable Amount",
      {RIC_YEAR} AS "Roth Initial Contribution Year",
      CAST({src} AS BIGINT) AS src_order,
      CAST({O} AS BIGINT) AS src_seq
    FROM oc"""


# organic near-miss twins (spec.NEAR_MISS_MOD; VERDICT r13 #7): the
# matrix-side one-field-off row per o % 35 == 34 order, mirroring
# sources/fixtures.matrix_nearmiss_raw expression-for-expression
_NM_WHERE = f"({O}) % {spec.NEAR_MISS_MOD} = {spec.NEAR_MISS_REM}"
_NM_SSN = (
    f"(CASE WHEN ({O}) % 3 = 0 THEN {SSN_RAW}"
    f" ELSE '9' || substr({SSN9}, 2, 8) END)"
)
_NM_NAME = (
    f"(CASE WHEN ({O}) % 3 = 1 THEN {PARTICIPANT_NAME}"
    f" WHEN ({O}) % 3 = 2 THEN {sql.lit(spec.NEAR_MISS_FOREIGN_NAME)} END)"
)
_NM_GROSS = (
    f"(CASE WHEN ({O}) % 3 = 0 THEN (floor(o_totalprice * 100) + 1) / 100"
    f" ELSE {GROSS} END)"
)


def _matrix_nearmiss_select() -> str:
    return f"""SELECT
      {MATRIX_ACCOUNT} AS "Matrix Account",
      {PLAN_ID} AS "Client Account",
      {_NM_SSN} AS "Participant SSN",
      {_NM_NAME} AS "Participant Name",
      {STATE} AS "Participant State",
      {_NM_GROSS} AS "Gross Amount",
      CAST({TXN_DATE} AS VARCHAR) AS "Transaction Date",
      {TXN_METHOD} AS "Transaction Type",
      {sql.pick(O, spec.TAX_CODES_1)} AS "Tax Code",
      {sql.pick(O, spec.TAX_CODES_2)} AS "Tax Code 2",
      {sql.pick(O, spec.TAX_FORMS)} AS "Tax Form",
      {sql.pick(O, spec.FED_TAXING_METHODS)} AS "Federal Taxing Method",
      {sql.pick(O, ["Rollover", "Cash", "Roth"])} AS "Distribution Type",
      {TRANSACTION_ID} AS "Transaction Id",
      {FED_TAXABLE} AS "Fed Taxable Amount",
      {RIC_YEAR} AS "Roth Initial Contribution Year",
      CAST(2 AS BIGINT) AS src_order,
      CAST({O} AS BIGINT) AS src_seq
    FROM oc"""


def fixture_ctes(nearmiss: bool = False) -> str:
    """The raw-fixture CTE block; ``nearmiss=True`` appends the organic
    near-miss arms (one relius row + one one-field-off matrix twin per
    o % 35 == 34 order — orders absent from both base exports, so every
    base row is byte-identical to the default rendering)."""
    r_nm = (
        f"""
  UNION ALL
  {_relius_select(sql.pick(O, spec.DIST_CODES_1), sql.pick(O, spec.DIST_NAMES), 2)}
  WHERE {_NM_WHERE}"""
        if nearmiss
        else ""
    )
    m_nm = (
        f"""
  UNION ALL
  {_matrix_nearmiss_select()}
  WHERE {_NM_WHERE}"""
        if nearmiss
        else ""
    )
    return f"""oc AS (
  SELECT o_orderkey AS o, c_custkey AS k, o_totalprice, o_orderdate
  FROM orders JOIN customer ON o_custkey = c_custkey
),
relius_raw AS (
  {_relius_select(sql.pick(O, spec.DIST_CODES_1), sql.pick(O, spec.DIST_NAMES), 0)}
  WHERE ({O}) % 5 <> 4
  UNION ALL
  {_relius_select("'1'", "'Rollover'", 1)}
  WHERE ({O}) % 5 <> 4 AND ({O}) % 50 = 0{r_nm}
),
matrix_raw AS (
  {_matrix_select(sql.pick(O, spec.TAX_CODES_1), TRANSACTION_ID, 0)}
  WHERE ({O}) % 7 <> 6
  UNION ALL
  {_matrix_select("'1'", TXN_ID_BASE + " || '9'", 1)}
  WHERE ({O}) % 7 <> 6 AND ({O}) % 60 = 0{m_nm}
),
cust AS (SELECT c_custkey AS k FROM customer),
demo_raw AS (
  SELECT {PLAN_ID} AS "PLANID", {SSN_RAW} AS "SSNUM", {FIRST_NAME} AS "FIRSTNAM",
         {LAST_NAME} AS "LASTNAM", {DOB_RAW} AS "BIRTHDATE", {TERM_RAW} AS "TERM_DATE",
         CAST(0 AS BIGINT) AS src_order, CAST({K} AS BIGINT) AS src_seq
  FROM cust
  UNION ALL
  SELECT {PLAN_ID}, {SSN_RAW}, 'DupFirst', {LAST_NAME}, NULL, NULL, CAST(1 AS BIGINT),
         CAST({K} AS BIGINT)
  FROM cust WHERE ({K}) % 10 = 0
),
basis_raw AS (
  SELECT {PLAN_ID} AS "PLANID", {SSN_RAW} AS "SSNUM", {FIRST_NAME} AS "FIRSTNAM",
         {LAST_NAME} AS "LASTNAM", {BASIS_FIRST_YEAR} AS "FIRSTTAXYEARROTH",
         {BASIS_AMT} AS "Total", CAST(0 AS BIGINT) AS src_order, CAST({K} AS BIGINT) AS src_seq
  FROM cust WHERE ({K}) % 10 IN (3, 4, 5) AND ({K}) % 3 <> 2
  UNION ALL
  SELECT {PLAN_ID}, {SSN_RAW}, {FIRST_NAME}, {LAST_NAME}, NULL, CAST(NULL AS DOUBLE),
         CAST(1 AS BIGINT), CAST({K} AS BIGINT)
  FROM cust WHERE ({K}) % 10 IN (3, 4, 5) AND ({K}) % 3 <> 2 AND ({K}) % 12 = 0
)"""


#: default rendering (no near-miss arms) — byte-identical to the
#: pre-r14 constant; every graded oracle composes this one
FIXTURE_CTES = fixture_ctes()
