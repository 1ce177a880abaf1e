"""DuckDB renderings of the four rule engines (E-A..E-D), mirroring
``recon_spark.engines.*`` mask-for-mask so the driver's oracle compare can
hash-match full engine outputs.

Each builder returns a complete SQL statement (WITH fixtures + cleaners +
engine CTEs + final projection). Reference semantics:
/root/reference/src/engines/{match_planid,age_taxcode_analysis,
roth_taxable_analysis,ira_rollover_analysis}.py.
"""

from __future__ import annotations

from .cleaning_sql import PRELUDE

NL = "chr(10)"

_INHERITED = "('300004PLAT','300004MBD','300004MBDII')"


def _attained(dob: str, year: str, years: int, months: int = 0) -> str:
    total = years * 12 + months
    return (
        f"coalesce(CAST(CAST({dob} AS DATE) + INTERVAL {total} MONTH AS DATE)"
        f" <= make_date(CAST({year} AS INT), 12, 31), false)"
    )


def _combined(s1: str, s2: str) -> str:
    a = f"nullif(upper(trim({s1})), '')"
    b = f"nullif(upper(trim({s2})), '')"
    return (
        f"(CASE WHEN {a} IS NOT NULL AND {b} IS NULL THEN {a} "
        f"WHEN {a} IS NOT NULL AND {b} IS NOT NULL THEN {a} || {b} END)"
    )


# --- Engine A: inherited-plan reconciliation (match_planid.py) ---------------

#: engine-specific CTE chain WITHOUT the shared fixture/cleaner prelude —
#: uniquely ``ea_``-prefixed so several engines can share one WITH clause
#: (merged multi-engine oracles in plans_sql build PRELUDE + N tails).
ENGINE_A_TAIL = f"""ea_r AS (SELECT * FROM relius_clean WHERE plan_id IN {_INHERITED}),
ea_m AS (SELECT * FROM matrix_clean WHERE plan_id IN {_INHERITED}),
ea_joined AS (
  SELECT
    coalesce(r.plan_id, m.plan_id) AS plan_id,
    coalesce(r.ssn, m.ssn) AS ssn,
    coalesce(r.gross_amt, m.gross_amt) AS gross_amt,
    r.exported_date AS exported_date,
    m.txn_date AS txn_date,
    r.dist_category_relius AS dist_category_relius,
    r.dist_code_1 AS dist_code_1,
    m.tax_code_1 AS tax_code_1,
    m.tax_code_2 AS tax_code_2,
    m.transaction_id AS transaction_id,
    m.matrix_account AS matrix_account,
    m.participant_name AS participant_name,
    CASE WHEN r.src_order IS NULL THEN 'right_only'
         WHEN m.src_order IS NULL THEN 'left_only'
         ELSE 'both' END AS merge_side,
    CAST(date_diff('day', r.exported_date, m.txn_date) AS BIGINT) AS date_lag_days
  FROM ea_r r
  FULL OUTER JOIN ea_m m
    ON r.plan_id = m.plan_id AND r.ssn = m.ssn AND r.gross_amt = m.gross_amt
),
ea_masks AS (
  SELECT *,
    coalesce(date_lag_days BETWEEN 0 AND 10, false) AS date_within_tolerance,
    (merge_side = 'both') AS is_both,
    (plan_id IN {_INHERITED}) AS is_inherited,
    coalesce(dist_category_relius IN ('rollover','partial_rollover'), false) AS is_rollover
  FROM ea_joined
),
ea_exp AS (
  SELECT *,
    CASE WHEN is_both AND is_inherited THEN '4' END AS expected_tax_code_1,
    CASE WHEN is_both AND is_inherited AND is_rollover THEN 'G' END AS expected_tax_code_2
  FROM ea_masks
),
ea_cls AS (
  SELECT *,
    (coalesce(tax_code_1, '') = coalesce(expected_tax_code_1, '')
     AND coalesce(tax_code_2, '') = coalesce(expected_tax_code_2, '')) AS code_matches_expected
  FROM ea_exp
),
ea_corr AS (
  SELECT *,
    coalesce(is_both AND expected_tax_code_1 IS NOT NULL AND NOT code_matches_expected,
             false) AS needs_correction
  FROM ea_cls
),
ea_out AS (
  SELECT *,
    CASE WHEN needs_correction THEN expected_tax_code_1 END AS suggested_tax_code_1,
    CASE WHEN needs_correction THEN expected_tax_code_2 END AS suggested_tax_code_2,
    CASE WHEN needs_correction AND is_both AND is_inherited AND is_rollover
           THEN 'inherited_rollover_expected_G_and_4'
         WHEN needs_correction AND is_both AND is_inherited AND NOT is_rollover
           THEN 'inherited_cash_expected_4' END AS correction_reason,
    CASE WHEN needs_correction THEN 'UPDATE_1099' END AS action,
    CASE WHEN merge_side = 'left_only' THEN 'unmatched_relius'
         WHEN merge_side = 'right_only' THEN 'unmatched_matrix'
         WHEN is_both AND NOT date_within_tolerance THEN 'date_out_of_range'
         WHEN is_both AND date_within_tolerance AND needs_correction THEN 'match_needs_correction'
         WHEN is_both AND date_within_tolerance THEN 'match_no_action' END AS match_status
  FROM ea_corr
)"""

ENGINE_A_CTES = f"{PRELUDE},\n{ENGINE_A_TAIL}"

ENGINE_A_SELECT = f"""SELECT
  plan_id, ssn, gross_amt, exported_date, txn_date, date_lag_days,
  date_within_tolerance, merge_side, match_status, dist_category_relius,
  dist_code_1, tax_code_1, tax_code_2, expected_tax_code_1, expected_tax_code_2,
  suggested_tax_code_1, suggested_tax_code_2,
  {_combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS new_tax_code,
  correction_reason, action, transaction_id, matrix_account
FROM ea_out"""

ENGINE_A_SQL = f"{ENGINE_A_CTES}\n{ENGINE_A_SELECT}"


# --- Engine B: age-based tax-code audit (age_taxcode.py) ---------------------

_EB_EXCLUDED_CODES = "('G','H','11','13','15','16','17','18','19','33','4')"
_EB_ROTH = (
    "(starts_with(upper(trim(coalesce(plan_id, ''))), '300005')"
    " OR ends_with(upper(trim(coalesce(plan_id, ''))), 'R'))"
)

ENGINE_B_TAIL = f"""eb_join AS (
  SELECT m.*,
    d.dob, d.term_date, d.first_name, d.last_name,
    coalesce(m.participant_name,
      nullif(trim(coalesce(trim(d.first_name), '') || ' ' || coalesce(trim(d.last_name), '')), '')
    ) AS full_name
  FROM matrix_clean m
  LEFT JOIN demo_clean d ON m.plan_id = d.plan_id AND m.ssn = d.ssn
),
eb_scope AS (
  SELECT * FROM eb_join WHERE NOT {_EB_ROTH}
),
eb_calc AS (
  SELECT *,
    (coalesce(tax_code_1 IN {_EB_EXCLUDED_CODES}, false)
     OR plan_id IN {_INHERITED}) AS age_engine_excluded,
    CAST(year(dob) AS BIGINT) AS dob_year,
    CAST(year(txn_date) AS BIGINT) AS txn_year,
    CAST(year(term_date) AS BIGINT) AS term_year,
    CAST(year(txn_date) - year(dob) AS DOUBLE) AS age_at_distribution_year,
    CAST(year(term_date) - year(dob) AS DOUBLE) AS age_at_termination_year,
    {_attained('dob', 'year(txn_date)', 59, 6)} AS attained_59_5_in_txn_year,
    {_attained('dob', 'year(txn_date)', 55)} AS attained_55_in_txn_year,
    {_attained('dob', 'year(term_date)', 55)} AS attained_55_in_term_year
  FROM eb_scope
),
eb_exp AS (
  SELECT *,
    (NOT age_engine_excluded AND dob IS NOT NULL AND txn_year IS NOT NULL) AS eligible
  FROM eb_calc
),
eb_exp2 AS (
  SELECT *,
    CASE WHEN eligible AND attained_59_5_in_txn_year THEN '7'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NOT NULL
              AND attained_55_in_term_year THEN '2'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NOT NULL
              AND NOT attained_55_in_term_year THEN '1'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NULL
              AND NOT attained_55_in_txn_year THEN '1'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NULL
              AND attained_55_in_txn_year THEN '2' END AS expected_tax_code_1,
    CASE WHEN eligible AND attained_59_5_in_txn_year
           THEN 'age_59_5_or_over_normal_distribution'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NOT NULL
              AND attained_55_in_term_year THEN 'terminated_at_or_after_55'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NOT NULL
              AND NOT attained_55_in_term_year THEN 'terminated_before_55'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NULL
              AND NOT attained_55_in_txn_year THEN 'no_term_date_under_55_in_txn_year'
         WHEN eligible AND NOT attained_59_5_in_txn_year AND term_year IS NULL
              AND attained_55_in_txn_year THEN 'no_term_date_55_plus_in_txn_year' END AS eb_reason
  FROM eb_exp
),
eb_cls AS (
  SELECT *,
    coalesce(expected_tax_code_1 IS NOT NULL
             AND coalesce(tax_code_1, '') = expected_tax_code_1, false) AS code_matches_expected
  FROM eb_exp2
),
eb_out AS (
  SELECT *,
    (expected_tax_code_1 IS NOT NULL AND NOT code_matches_expected
     AND NOT age_engine_excluded) AS eb_needs_corr
  FROM eb_cls
),
eb_final AS (
  SELECT *,
    CASE WHEN code_matches_expected THEN 'match_no_action'
         WHEN eb_needs_corr THEN 'match_needs_correction'
         WHEN age_engine_excluded THEN 'excluded_from_age_engine_rollover_or_inherited'
         ELSE 'age_rule_insufficient_data' END AS match_status,
    CASE WHEN eb_needs_corr THEN 'UPDATE_1099' END AS action
  FROM eb_out
)"""

ENGINE_B_CTES = f"{PRELUDE},\n{ENGINE_B_TAIL}"

ENGINE_B_SELECT = f"""SELECT
  plan_id, ssn, gross_amt, txn_date, transaction_id, matrix_account, full_name,
  tax_code_1, tax_code_2, dob, term_date, dob_year, txn_year, term_year,
  age_at_distribution_year, age_at_termination_year,
  attained_59_5_in_txn_year, attained_55_in_txn_year, attained_55_in_term_year,
  age_engine_excluded, expected_tax_code_1, code_matches_expected, match_status, action,
  CASE WHEN match_status <> 'match_no_action' THEN eb_reason END AS correction_reason,
  CASE WHEN match_status <> 'match_no_action' THEN expected_tax_code_1 END AS suggested_tax_code_1,
  CAST(NULL AS VARCHAR) AS suggested_tax_code_2,
  {_combined("CASE WHEN match_status <> 'match_no_action' THEN expected_tax_code_1 END", "CAST(NULL AS VARCHAR)")} AS new_tax_code
FROM eb_final"""

ENGINE_B_SQL = f"{ENGINE_B_CTES}\n{ENGINE_B_SELECT}"


# --- Engine D: IRA rollover audit (ira_rollover.py) --------------------------

_IRA_PLAN = (
    "(starts_with(upper(trim(coalesce(plan_id, ''))), '300001')"
    " OR starts_with(upper(trim(coalesce(plan_id, ''))), '300005')"
    " OR contains(upper(trim(coalesce(plan_id, ''))), 'IRA'))"
)
# single-source whitespace class (== Java \s; RE2 \s excludes U+000B):
# from functions/normalizers.WS so the two engines cannot drift (r13)
from ..functions.normalizers import WS as _WS  # noqa: E402

_COMPACT = "replace(regexp_replace(upper(trim({0})), '" + _WS + "+', '', 'g'), '-', '')"
_SPACE_LOWER = "lower(regexp_replace(trim({0}), '" + _WS + "+', ' ', 'g'))"

ENGINE_D_TAIL = f"""ed_scope AS (
  SELECT * FROM matrix_clean
  WHERE {_IRA_PLAN}
    AND {_SPACE_LOWER.format('txn_method')} = 'check distribution'
    AND (coalesce(tax_code_1, '') IN ('G','H') OR coalesce(tax_code_2, '') IN ('G','H'))
),
ed_norm AS (
  SELECT *,
    {_COMPACT.format('federal_taxing_method')} AS ed_ftm,
    {_COMPACT.format('tax_form')} AS ed_form
  FROM ed_scope
),
ed_masks AS (
  SELECT *,
    (ed_ftm IS NULL OR ed_ftm = '') AS missing_ftm,
    (ed_form IS NULL OR ed_form = '') AS missing_form,
    coalesce(ed_ftm = 'ROLLOVER', false) AS ftm_rollover,
    coalesce(ed_form = 'NOTAX', false) AS form_no_tax,
    coalesce(ed_form = '1099R', false) AS form_1099r
  FROM ed_norm
),
ed_masks2 AS (
  SELECT *,
    (NOT missing_ftm AND NOT ftm_rollover) AS ftm_non_rollover,
    (NOT missing_form AND NOT form_no_tax AND NOT form_1099r) AS form_unknown,
    (ftm_rollover AND form_no_tax) AS ed_no_action,
    (ftm_rollover AND form_1099r) AS ed_correction
  FROM ed_masks
),
ed_final AS (
  SELECT *,
    CASE WHEN ed_no_action THEN 'match_no_action'
         WHEN ed_correction THEN 'match_needs_correction'
         ELSE 'match_needs_review' END AS match_status,
    nullif(array_to_string(list_filter([
      CASE WHEN missing_ftm THEN 'missing_federal_taxing_method' END,
      CASE WHEN missing_form THEN 'missing_tax_form' END,
      CASE WHEN ftm_non_rollover THEN 'federal_taxing_method_not_rollover' END,
      CASE WHEN form_unknown THEN 'unrecognized_tax_form' END
    ], x -> x IS NOT NULL), '; '), '') AS review_reason
  FROM ed_masks2
)"""

ENGINE_D_CTES = f"{PRELUDE},\n{ENGINE_D_TAIL}"

ENGINE_D_SELECT = f"""SELECT
  plan_id, ssn, gross_amt, txn_date, transaction_id, matrix_account,
  participant_name, txn_method, federal_taxing_method, tax_form,
  tax_code_1, tax_code_2, match_status,
  CASE WHEN ed_correction THEN 'UPDATE_1099'
       WHEN match_status = 'match_needs_review' THEN 'INVESTIGATE' END AS action,
  CASE WHEN ed_correction THEN '0' END AS suggested_tax_code_1,
  CAST(NULL AS VARCHAR) AS suggested_tax_code_2,
  CASE WHEN ed_correction THEN '0' END AS new_tax_code,
  CASE WHEN ed_correction THEN 'ira_rollover_tax_form_1099r_expected_no_tax'
       WHEN match_status = 'match_needs_review' THEN review_reason END AS correction_reason
FROM ed_final"""

ENGINE_D_SQL = f"{ENGINE_D_CTES}\n{ENGINE_D_SELECT}"


# --- Engine C: Roth taxable analysis (roth_taxable.py) -----------------------

_EC_ROTH = (
    "(starts_with(trim(coalesce(plan_id, '')), '300005')"
    " OR ends_with(trim(coalesce(plan_id, '')), 'R'))"
)

_EC_REASON_PAIRS = [
    ("fix_b_g", "roth_rollover_code_fix_B_G_to_H"),
    ("fix_g_4", "roth_rollover_code_fix_G_4_to_H_4"),
    ("fix_4_blank", "roth_death_code_fix_4_to_B_4"),
    ("fix_blank_4", "roth_death_code_fix_blank_4_to_B_4"),
    ("fix_g_blank", "roth_rollover_code_fix_G_blank_to_H"),
    ("fix_blank_g", "roth_rollover_code_fix_blank_G_to_H"),
    ("year_change_required", "roth_initial_year_mismatch"),
    ("missing_first_year", "missing_first_roth_tax_year"),
    ("basis_mask", "roth_basis_covers_2025_total"),
    ("raw_qualified", "qualified_roth_distribution"),
    ("taxable_missing_current", "missing_fed_taxable_amt"),
    ("proximity", "taxable_within_15pct_of_gross"),
    ("age_mismatch", "roth_age_tax_code_mismatch"),
    (
        "age_mismatch AND expected_code2 IS NOT NULL AND att_59_5",
        "roth_age_rule_attained_59_5_in_txn_year_expect_B7",
    ),
    (
        "age_mismatch AND expected_code2 IS NOT NULL AND NOT att_59_5 AND has_term AND att_55_term",
        "roth_age_rule_attained_55_in_term_year_expect_B2",
    ),
    (
        "age_mismatch AND expected_code2 IS NOT NULL AND NOT att_59_5 AND has_term AND NOT att_55_term",
        "roth_age_rule_under_55_in_term_year_expect_B1",
    ),
    (
        "age_mismatch AND expected_code2 IS NOT NULL AND NOT att_59_5 AND NOT has_term AND att_55_txn",
        "roth_age_rule_attained_55_in_txn_year_no_term_expect_B2",
    ),
    (
        "age_mismatch AND expected_code2 IS NOT NULL AND NOT att_59_5 AND NOT has_term AND NOT att_55_txn",
        "roth_age_rule_under_55_in_txn_year_no_term_expect_B1",
    ),
]

_EC_REASONS_LIST = ",\n      ".join(
    f"CASE WHEN {mask} THEN '{tok}' END" for mask, tok in _EC_REASON_PAIRS
)

ENGINE_C_TAIL = f"""ec_scope AS (
  SELECT * FROM matrix_clean
  WHERE {_EC_ROTH} AND plan_id NOT IN {_INHERITED}
),
ec_join AS (
  SELECT s.*, d.dob, d.term_date, b.first_roth_tax_year, b.roth_basis_amt
  FROM ec_scope s
  LEFT JOIN demo_clean d ON s.plan_id = d.plan_id AND s.ssn = d.ssn
  LEFT JOIN basis_clean b ON s.plan_id = b.plan_id AND s.ssn = b.ssn
),
ec_base AS (
  SELECT
    transaction_id, txn_date, ssn, participant_name, matrix_account, plan_id,
    tax_code_1, tax_code_2, fed_taxable_amt, gross_amt, dob, term_date,
    CAST(year(txn_date) AS BIGINT) AS txn_year,
    CAST(year(term_date) AS BIGINT) AS term_year,
    CAST(year(txn_date) - year(dob) AS DOUBLE) AS age_at_txn,
    TRY_CAST(first_roth_tax_year AS DOUBLE) AS f_year,
    TRY_CAST(roth_initial_contribution_year AS DOUBLE) AS ric_year,
    roth_basis_amt,
    sum(CASE WHEN year(txn_date) = 2025 THEN gross_amt END)
      OVER (PARTITION BY plan_id, ssn) AS gross_2025_total,
    coalesce(tax_code_1, '') AS code1,
    coalesce(tax_code_2, '') AS code2
  FROM ec_join
),
ec_year AS (
  SELECT *,
    (f_year IS NOT NULL AND f_year > 0 AND f_year BETWEEN 1900 AND 2100) AS first_year_valid,
    CAST(coalesce(CASE WHEN f_year = round(f_year, 0) THEN f_year END,
                  CASE WHEN ric_year = round(ric_year, 0) THEN ric_year END) AS BIGINT) AS start_year
  FROM ec_base
),
ec_masks AS (
  SELECT *,
    (start_year IS NOT NULL AND start_year > 0 AND start_year BETWEEN 1900 AND 2100) AS start_year_valid,
    (code1 IN ('11','13','15','16','17','18','19','33')) AS engine_excluded,
    (code1 = 'H' OR (code1 = 'B' AND code2 = '4')) AS locked,
    (term_year IS NOT NULL) AS has_term,
    {_attained('dob', 'txn_year', 59, 6)} AS att_59_5,
    {_attained('dob', 'txn_year', 55)} AS att_55_txn,
    {_attained('dob', 'term_year', 55)} AS att_55_term
  FROM ec_year
),
ec_fix AS (
  SELECT *,
    NOT engine_excluded AS active,
    (code1 = 'B' AND code2 = 'G' AND NOT engine_excluded) AS fix_b_g,
    (code1 = 'G' AND code2 = '4' AND NOT engine_excluded) AS fix_g_4,
    (code1 = '4' AND code2 = '' AND NOT engine_excluded) AS fix_4_blank,
    (code2 = '4' AND code1 = '' AND NOT engine_excluded) AS fix_blank_4,
    (code1 = 'G' AND code2 = '' AND NOT engine_excluded) AS fix_g_blank,
    (code1 = '' AND code2 = 'G' AND NOT engine_excluded) AS fix_blank_g
  FROM ec_masks
),
ec_rules AS (
  SELECT *,
    (fix_b_g OR fix_g_4 OR fix_4_blank OR fix_blank_4 OR fix_g_blank OR fix_blank_g)
      AS taxcode_override,
    (active AND roth_basis_amt IS NOT NULL AND gross_2025_total IS NOT NULL
     AND roth_basis_amt >= gross_2025_total) AS basis_mask,
    (active AND {_attained('dob', 'txn_year', 59, 6)} AND start_year_valid
     AND coalesce((txn_year - start_year) >= 5, false)) AS raw_qualified,
    (active AND first_year_valid
     AND (ric_year IS NULL OR ric_year <> f_year)) AS year_change_required,
    (active AND NOT first_year_valid) AS missing_first_year,
    (active AND coalesce(fed_taxable_amt > 0, false)
     AND coalesce(gross_amt <= fed_taxable_amt * 1.15, false)) AS proximity
  FROM ec_fix
),
ec_tax AS (
  SELECT *,
    CASE WHEN basis_mask OR raw_qualified THEN CAST(0.0 AS DOUBLE) END AS suggested_taxable_base
  FROM ec_rules
),
ec_tax2 AS (
  SELECT *,
    (active AND suggested_taxable_base IS NOT NULL AND fed_taxable_amt IS NULL)
      AS taxable_missing_current,
    (active AND suggested_taxable_base IS NOT NULL AND fed_taxable_amt IS NOT NULL
     AND abs(fed_taxable_amt - suggested_taxable_base) > 0.01) AS taxable_change_required
  FROM ec_tax
),
ec_age AS (
  SELECT *,
    (active AND NOT taxcode_override AND NOT locked AND dob IS NOT NULL
     AND txn_year IS NOT NULL) AS age_applicable
  FROM ec_tax2
),
ec_age2 AS (
  SELECT *,
    CASE WHEN age_applicable AND att_59_5 THEN '7'
         WHEN age_applicable AND NOT att_59_5 AND has_term AND att_55_term THEN '2'
         WHEN age_applicable AND NOT att_59_5 AND has_term AND NOT att_55_term THEN '1'
         WHEN age_applicable AND NOT att_59_5 AND NOT has_term AND NOT att_55_txn THEN '1'
         WHEN age_applicable AND NOT att_59_5 AND NOT has_term AND att_55_txn THEN '2'
    END AS expected_code2
  FROM ec_age
),
ec_age3 AS (
  SELECT *,
    (age_applicable AND (code1 <> 'B'
      OR (expected_code2 IS NOT NULL AND code2 <> coalesce(expected_code2, ''))))
      AS age_mismatch
  FROM ec_age2
),
ec_sugg AS (
  SELECT *,
    CASE WHEN taxcode_override THEN
           CASE WHEN fix_b_g OR fix_g_blank OR fix_blank_g OR fix_g_4 THEN 'H'
                WHEN fix_4_blank OR fix_blank_4 THEN 'B' END
         WHEN age_mismatch THEN 'B' END AS sugg1_raw,
    CASE WHEN taxcode_override THEN
           CASE WHEN fix_g_4 OR fix_4_blank OR fix_blank_4 THEN '4' END
         ELSE CASE WHEN age_mismatch AND expected_code2 IS NOT NULL
                   THEN expected_code2 END END AS sugg2_raw
  FROM ec_age3
),
ec_act AS (
  SELECT *,
    (taxcode_override OR year_change_required OR taxable_change_required OR age_mismatch)
      AS has_update,
    (taxable_missing_current OR missing_first_year OR proximity) AS has_investigate,
    (taxcode_override OR year_change_required
     OR (NOT (taxable_missing_current OR missing_first_year) AND taxable_change_required)
     OR (NOT (taxable_missing_current OR missing_first_year OR proximity) AND age_mismatch))
      AS update_first
  FROM ec_sugg
),
ec_status AS (
  SELECT *,
    CASE WHEN engine_excluded THEN 'excluded_from_age_engine_rollover_or_inherited'
         WHEN has_update THEN 'match_needs_correction'
         WHEN has_investigate THEN 'match_needs_review'
         ELSE 'match_no_action' END AS match_status,
    CASE WHEN has_update AND has_investigate AND update_first
           THEN 'UPDATE_1099' || {NL} || 'INVESTIGATE'
         WHEN has_update AND has_investigate
           THEN 'INVESTIGATE' || {NL} || 'UPDATE_1099'
         WHEN has_update THEN 'UPDATE_1099'
         WHEN has_investigate THEN 'INVESTIGATE' END AS action,
    nullif(array_to_string(list_transform(list_filter([
      {_EC_REASONS_LIST}
    ], x -> x IS NOT NULL), x -> '- ' || x), {NL}), '') AS reasons_rendered
  FROM ec_act
),
ec_final AS (
  SELECT *,
    CASE WHEN match_status <> 'match_no_action' THEN sugg1_raw END AS suggested_tax_code_1,
    CASE WHEN match_status <> 'match_no_action' THEN sugg2_raw END AS suggested_tax_code_2,
    CASE WHEN match_status <> 'match_no_action' THEN reasons_rendered END AS correction_reason,
    CASE WHEN match_status = 'match_no_action' AND fed_taxable_amt = 0 THEN NULL
         ELSE suggested_taxable_base END AS suggested_taxable_amt,
    CASE WHEN year_change_required THEN CAST(f_year AS BIGINT) END AS suggested_first_roth_tax_year
  FROM ec_status
)"""

ENGINE_C_CTES = f"{PRELUDE},\n{ENGINE_C_TAIL}"

#: all four engines in ONE WITH clause (prefixes ea_/eb_/ec_/ed_ are
#: disjoint) — the base for merged multi-engine analytics oracles.
ALL_ENGINES_CTES = (
    f"{PRELUDE},\n{ENGINE_A_TAIL},\n{ENGINE_B_TAIL},\n"
    f"{ENGINE_C_TAIL},\n{ENGINE_D_TAIL}"
)

ENGINE_C_SELECT = f"""SELECT
  transaction_id, txn_date, ssn, participant_name, matrix_account, plan_id,
  tax_code_1, tax_code_2, suggested_tax_code_1, suggested_tax_code_2,
  {_combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS new_tax_code,
  fed_taxable_amt, gross_amt,
  CAST(ric_year AS BIGINT) AS roth_initial_contribution_year,
  CAST(f_year AS BIGINT) AS first_roth_tax_year,
  CASE WHEN start_year_valid THEN start_year END AS start_roth_year,
  roth_basis_amt, age_at_txn, suggested_taxable_amt,
  suggested_first_roth_tax_year, correction_reason, action, match_status
FROM ec_final"""

ENGINE_C_SQL = f"{ENGINE_C_CTES}\n{ENGINE_C_SELECT}"
