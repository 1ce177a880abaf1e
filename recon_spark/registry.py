"""Query registry: every graded operator as a (Spark callable, oracle SQL)
pair for ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL's aliases exactly (the driver sorts
columns by name before value-hashing). Array columns are serialized with
``array_join`` on the Spark side and mirrored in the SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engines import age_taxcode, ira_rollover, match_planid, roth_taxable
from .functions import normalizers as N
from .operators import cleaning
from .oracles import engines_sql, sql
from .oracles.cleaning_sql import PRELUDE
from .oracles.fixtures_sql import FIXTURE_CTES
from .sources import fixtures

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _issues_joined(df: DataFrame) -> DataFrame:
    return df.withColumn("validation_issues", F.array_join("validation_issues", ";"))


#: analyzed-PLAN memo for clean_tables. DataFrames are immutable lazy
#: plans, so handing the same objects to every query is semantics-free —
#: what it saves is the driver-side plan construction + analysis of the
#: four (large) cleaner expression trees, re-paid identically by every
#: engine query otherwise (measured ~3.5s of engine_c's 7.3s wall at
#: sf0.1 was plan build, not execution). NO data is persisted/cached.
#: Keyed on the session, the sf dir, and the fixture-materialization
#: token so a bench-time materialize_raw invalidates earlier plans.
_CLEAN_PLAN_MEMO: dict[tuple[int, str, int], dict[str, DataFrame]] = {}


def clean_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The four cleaned canonical tables from the fixture derivation."""
    key = (id(spark), sf_dir, len(fixtures._RAW_OVERRIDE))
    memo = _CLEAN_PLAN_MEMO.get(key)
    if memo is None:
        memo = _CLEAN_PLAN_MEMO[key] = {
            "relius": cleaning.clean_relius(fixtures.relius_raw(spark, sf_dir)),
            "matrix": cleaning.clean_matrix(fixtures.matrix_raw(spark, sf_dir)),
            "demo": cleaning.clean_relius_demo(fixtures.relius_demo_raw(spark, sf_dir)),
            "basis": cleaning.clean_roth_basis(fixtures.roth_basis_raw(spark, sf_dir)),
        }
    return memo


# --- cleaners (P1/P2, F1/F8, D1-D3, C*, V*) ---------------------------------

_RELIUS_COLS = [
    "plan_id", "ssn", "first_name", "last_name", "state", "gross_amt",
    "exported_date", "tax_year", "dist_code_1", "dist_name",
    "dist_category_relius", "full_name", "ssn_valid", "amount_valid",
    "date_valid", "code_1099r_valid", "validation_issues", "src_order", "src_seq",
]

_MATRIX_COLS = [
    "matrix_account", "plan_id", "ssn", "participant_name", "state",
    "gross_amt", "txn_date", "txn_method", "tax_code_1", "tax_code_2",
    "tax_form", "federal_taxing_method", "dist_type", "transaction_id",
    "fed_taxable_amt", "roth_initial_contribution_year", "ssn_valid",
    "amount_valid", "date_valid", "code_1099r_valid", "validation_issues",
    "src_order", "src_seq",
]

_DEMO_COLS = [
    "plan_id", "ssn", "first_name", "last_name", "dob", "term_date",
    "ssn_valid", "amount_valid", "date_valid", "code_1099r_valid",
    "validation_issues", "src_order", "src_seq",
]

_BASIS_COLS = [
    "plan_id", "ssn", "first_name", "last_name", "first_roth_tax_year",
    "roth_basis_amt", "ssn_valid", "amount_valid", "date_valid",
    "code_1099r_valid", "validation_issues", "src_order", "src_seq",
]


@register(
    "clean_relius",
    f"{PRELUDE}\nSELECT {', '.join(_RELIUS_COLS)} FROM relius_clean",
)
def q_clean_relius(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cleaning.clean_relius(fixtures.relius_raw(spark, sf_dir))
    return _issues_joined(df).select(*_RELIUS_COLS)


@register(
    "clean_matrix",
    f"{PRELUDE}\nSELECT {', '.join(_MATRIX_COLS)} FROM matrix_clean",
)
def q_clean_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cleaning.clean_matrix(fixtures.matrix_raw(spark, sf_dir))
    return _issues_joined(df).select(*_MATRIX_COLS)


@register(
    "clean_relius_demo",
    f"{PRELUDE}\nSELECT {', '.join(_DEMO_COLS)} FROM demo_clean",
)
def q_clean_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cleaning.clean_relius_demo(fixtures.relius_demo_raw(spark, sf_dir))
    return _issues_joined(df).select(*_DEMO_COLS)


@register(
    "clean_roth_basis",
    f"{PRELUDE}\nSELECT {', '.join(_BASIS_COLS)} FROM basis_clean",
)
def q_clean_basis(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cleaning.clean_roth_basis(fixtures.roth_basis_raw(spark, sf_dir))
    return _issues_joined(df).select(*_BASIS_COLS)


# --- normalizer batteries (C1-C21 as projection queries) ---------------------

_BATTERY_RELIUS_SQL = f"""WITH {FIXTURE_CTES}
SELECT
  {sql.norm_ssn('"SSNUM_1"')} AS ssn_norm,
  {sql.norm_plan_id('"PLANID_1"')} AS plan_id_norm,
  {sql.to_date_safe('"EXPORTEDDATE"')} AS exported_date_parsed,
  CAST(year({sql.to_date_safe('"EXPORTEDDATE"')}) AS BIGINT) AS exported_year,
  {sql.to_long_safe('"TAXYR"')} AS tax_year_long,
  {sql.to_double_safe('"GROSSDISTRAMT"')} AS gross_double,
  {sql.norm_text('"DISTR1CD"', upper=True)} AS dist_code_upper,
  {sql.classify_dist_name('"DISTRNAM"')} AS dist_category,
  {sql.full_name('"FIRSTNAM"', '"LASTNAM"')} AS full_name_synth,
  CAST(date_trunc('month', {sql.to_date_safe('"EXPORTEDDATE"')}) AS DATE) AS export_month,
  src_order, src_seq
FROM relius_raw"""


@register("normalizers_relius", _BATTERY_RELIUS_SQL)
def q_battery_relius(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = fixtures.relius_raw(spark, sf_dir)
    exported = N.to_date_safe("EXPORTEDDATE")
    return raw.select(
        N.norm_ssn("SSNUM_1").alias("ssn_norm"),
        N.norm_plan_id("PLANID_1").alias("plan_id_norm"),
        exported.alias("exported_date_parsed"),
        F.year(exported).cast("long").alias("exported_year"),
        N.to_long_safe("TAXYR").alias("tax_year_long"),
        N.to_double_safe("GROSSDISTRAMT").alias("gross_double"),
        N.norm_text("DISTR1CD", strip=True, upper=True).alias("dist_code_upper"),
        N.classify_dist_name("DISTRNAM").alias("dist_category"),
        N.full_name("FIRSTNAM", "LASTNAM").alias("full_name_synth"),
        N.month_bucket(exported).alias("export_month"),
        "src_order",
        "src_seq",
    )


_BATTERY_MATRIX_SQL = f"""WITH {FIXTURE_CTES}
SELECT
  {sql.norm_tax_code('"Tax Code"')} AS tax_code_norm,
  {sql.norm_tax_code('"Tax Code 2"')} AS tax_code_2_norm,
  {sql.combined_tax_code(sql.norm_tax_code('"Tax Code"'), sql.norm_tax_code('"Tax Code 2"'))} AS combined_code,
  {sql.norm_compact_upper('"Tax Form"')} AS tax_form_compact,
  {sql.norm_space_lower('"Transaction Type"')} AS txn_method_spaced,
  {sql.norm_transaction_id('"Transaction Id"')} AS txn_id_norm,
  {sql.norm_text('"Participant State"', upper=True)} AS state_norm,
  CAST(date_diff('day', {sql.to_date_safe('"Transaction Date"')},
       CAST({sql.to_date_safe('"Transaction Date"')} + INTERVAL 3 DAY AS DATE)) AS BIGINT) AS lag_3,
  {sql.ssn_valid(sql.norm_ssn('"Participant SSN"'))} AS ssn_ok,
  {sql.amounts_valid('"Gross Amount"', '"Fed Taxable Amount"')} AS amounts_ok,
  {sql.code_1099r_valid(sql.norm_tax_code('"Tax Code"'))} AS code_ok,
  src_order, src_seq
FROM matrix_raw"""


@register("normalizers_matrix", _BATTERY_MATRIX_SQL)
def q_battery_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import validators as V

    raw = fixtures.matrix_raw(spark, sf_dir)
    code1 = N.norm_tax_code("Tax Code")
    code2 = N.norm_tax_code("Tax Code 2")
    txn = N.to_date_safe("Transaction Date")
    return raw.select(
        code1.alias("tax_code_norm"),
        code2.alias("tax_code_2_norm"),
        N.combined_tax_code(code1, code2).alias("combined_code"),
        N.norm_compact_upper("Tax Form").alias("tax_form_compact"),
        N.norm_space_lower("Transaction Type").alias("txn_method_spaced"),
        N.norm_transaction_id("Transaction Id").alias("txn_id_norm"),
        N.norm_text("Participant State", strip=True, upper=True).alias("state_norm"),
        N.date_lag_days(F.date_add(txn, 3), txn).alias("lag_3"),
        V.ssn_valid(N.norm_ssn("Participant SSN")).alias("ssn_ok"),
        V.amounts_valid("Gross Amount", "Fed Taxable Amount").alias("amounts_ok"),
        V.code_1099r_valid(code1).alias("code_ok"),
        "src_order",
        "src_seq",
    )


_BATTERY_DEMO_SQL = f"""WITH {FIXTURE_CTES}
SELECT
  {sql.norm_ssn('"SSNUM"')} AS ssn_norm,
  {sql.to_date_safe('"BIRTHDATE"')} AS dob_parsed,
  {sql.to_date_safe('"TERM_DATE"')} AS term_parsed,
  {sql.attained_age_by_year_end(sql.to_date_safe('"BIRTHDATE"'), '2025', 59, 6)} AS att_59_5_2025,
  {sql.attained_age_by_year_end(sql.to_date_safe('"BIRTHDATE"'), '2025', 55, 0)} AS att_55_2025,
  CAST(2025 - year({sql.to_date_safe('"BIRTHDATE"')}) AS DOUBLE) AS age_2025,
  src_order, src_seq
FROM demo_raw"""


@register("normalizers_demo", _BATTERY_DEMO_SQL)
def q_battery_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = fixtures.relius_demo_raw(spark, sf_dir)
    dob = N.to_date_safe("BIRTHDATE")
    return raw.select(
        N.norm_ssn("SSNUM").alias("ssn_norm"),
        dob.alias("dob_parsed"),
        N.to_date_safe("TERM_DATE").alias("term_parsed"),
        N.attained_age_by_year_end(dob, F.lit(2025), years=59, months=6).alias("att_59_5_2025"),
        N.attained_age_by_year_end(dob, F.lit(2025), years=55).alias("att_55_2025"),
        (F.lit(2025) - F.year(dob)).cast("double").alias("age_2025"),
        "src_order",
        "src_seq",
    )


# --- engines A-D -------------------------------------------------------------


@register("engine_a_match_planid", engines_sql.ENGINE_A_SQL)
def q_engine_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return out.select(*match_planid.OUTPUT_COLUMNS)


@register("engine_b_age_taxcode", engines_sql.ENGINE_B_SQL)
def q_engine_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = age_taxcode.run_age_taxcode_analysis(t["matrix"], t["demo"])
    return out.select(*age_taxcode.OUTPUT_COLUMNS)


@register("engine_c_roth_taxable", engines_sql.ENGINE_C_SQL)
def q_engine_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    return roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])


@register("engine_d_ira_rollover", engines_sql.ENGINE_D_SQL)
def q_engine_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = ira_rollover.run_ira_rollover_analysis(t["matrix"])
    return out.select(*ira_rollover.OUTPUT_COLUMNS)


# --- corrections (F11/P3/F10) ------------------------------------------------

from .oracles import plans_sql  # noqa: E402
from .plans import analytics, corrections  # noqa: E402
from .sources.tpch import load as _load_table  # noqa: E402


@register("corrections_engine_a", plans_sql.CORRECTIONS_A_SQL)
def q_corrections_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    matches = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return corrections.build_correction_df(matches)


@register("corrections_engine_c", plans_sql.CORRECTIONS_C_SQL)
def q_corrections_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return corrections.build_correction_df(out)


# --- analytics (A2-A7) -------------------------------------------------------


@register("analytics_kpi_engine_a", plans_sql.KPI_A_SQL)
def q_kpi_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return analytics.build_kpi_summary(out)


@register("analytics_monthly_engine_b", plans_sql.MONTHLY_B_SQL)
def q_monthly_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = age_taxcode.run_age_taxcode_analysis(t["matrix"], t["demo"])
    return analytics.build_monthly_metrics(out)


@register("analytics_lag_histogram_engine_a", plans_sql.LAG_HIST_A_SQL)
def q_lag_hist_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return analytics.build_value_counts(out, "date_lag_days")


@register("analytics_trends_engine_a", plans_sql.TRENDS_A_SQL)
def q_trends_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return analytics.build_two_key_trends(out)


@register("analytics_crosstab_engine_b", plans_sql.CROSSTAB_B_SQL)
def q_crosstab_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = age_taxcode.run_age_taxcode_analysis(t["matrix"], t["demo"])
    return analytics.build_crosstab(
        out, "tax_code_1", "correction_reason", plans_sql.EB_REASONS
    )


@register("analytics_action_mix_engine_c", plans_sql.ACTION_MIX_C_SQL)
def q_action_mix_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return analytics.build_action_mix(out)


@register("analytics_reason_trends_engine_c", plans_sql.REASON_TRENDS_C_SQL)
def q_reason_trends_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return analytics.build_reason_trends_exploded(out)


@register("analytics_unmatched_engine_a", plans_sql.UNMATCHED_A_SQL)
def q_unmatched_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    # Serialized as integer micros (BIGINT): DECIMAL output cells hash
    # unstably in the driver's comparator even when values are equal
    # (hash-red in r2+r3 with exact-value local parity), while integer
    # serialization is type-trivial — same pattern as
    # streaming_running_totals below. The decimal math stays exact:
    # decimal(18,6) * 10^6 is integral, so the long cast loses nothing.
    return analytics.build_unmatched_summary(out).select(
        "match_status",
        "n",
        (F.col("gross_total").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("gross_total_micros"),
    )


@register("analytics_kpi_engine_b", plans_sql.KPI_B_SQL)
def q_kpi_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = age_taxcode.run_age_taxcode_analysis(t["matrix"], t["demo"])
    return analytics.build_kpi_summary(out)


@register("analytics_kpi_engine_c", plans_sql.KPI_C_SQL)
def q_kpi_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return analytics.build_kpi_summary(out)


@register("analytics_kpi_engine_d", plans_sql.KPI_D_SQL)
def q_kpi_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = ira_rollover.run_ira_rollover_analysis(t["matrix"])
    return analytics.build_kpi_summary(out)


@register("analytics_taxable_delta_engine_c", plans_sql.TAXABLE_DELTA_C_SQL)
def q_taxable_delta_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return analytics.build_taxable_delta_distribution(out)


@register("analytics_reason_histogram_engine_a", plans_sql.REASON_HIST_A_SQL)
def q_reason_hist_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    out = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
    return analytics.build_value_counts(out, "correction_reason")


@register("analytics_crosstab_engine_c", plans_sql.CROSSTAB_C_SQL)
def q_crosstab_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 Engine C variant: current tax_code_1 x suggested new_tax_code
    (reference build_roth_tax_code_crosstab,
    roth_taxable_visualization.py:471-533)."""
    t = clean_tables(spark, sf_dir)
    out = roth_taxable.run_roth_taxable_analysis(t["matrix"], t["demo"], t["basis"])
    return analytics.build_crosstab(
        out, "tax_code_1", "new_tax_code", plans_sql.EC_NEW_CODES
    )


@register("analytics_monthly_engine_d", plans_sql.MONTHLY_D_SQL)
def q_monthly_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 Engine D variant (reference build_ira_rollover_metrics,
    ira_rollover_visualization.py:103-144)."""
    t = clean_tables(spark, sf_dir)
    out = ira_rollover.run_ira_rollover_analysis(t["matrix"])
    return analytics.build_monthly_metrics(out)


@register("analytics_events_monthly", plans_sql.EVENTS_MONTHLY_SQL)
def q_events_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("month", "ts").cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # integer-micros serialization (see q_unmatched_a): sum the
            # exact decimal, then shift scale 6 -> 0; every step is exact
            # decimal arithmetic (no double round-trip)
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("value_total_micros"),
        )
    )


@register("analytics_user_reach", plans_sql.USER_REACH_SQL)
def q_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count aggregate (the reference has no distinct-agg shape):
    per-type user reach + events-per-user. Exact count_distinct grades;
    the 100 TB swap-in is approx_count_distinct (HLL, no second shuffle),
    asserted within 5% in test_llm_ops."""
    ev = _load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            (F.count(F.lit(1)).cast("double") / F.count_distinct("user_id")).alias(
                "events_per_user"
            ),
        )
    )


@register("streaming_click_purchase_join", plans_sql.STREAM_JOIN_SQL)
def q_streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py) run availableNow
    into a memory sink; inner joins emit all matches over complete data,
    so the oracle is the batch inequality join."""
    from .streaming import joins

    return joins.run_to_memory(spark, sf_dir, name="click_purchase_join_check")


@register("analytics_value_percentiles", plans_sql.VALUE_PERCENTILES_SQL)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value distribution (min/p50/p90/max). Spark's
    `percentile` is the exact interpolated quantile — one sort-based
    aggregate per group, not the approx sketch — mirrored by DuckDB's
    quantile_cont. At true 100 TB scale the swap-in is
    `percentile_approx` (t-digest); this query grades the exact path."""
    ev = _load_table(spark, sf_dir, "events")
    micros = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    return (
        ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            micros(F.min("value")).alias("min_micros"),
            micros(F.percentile("value", F.lit(0.5))).alias("p50_micros"),
            micros(F.percentile("value", F.lit(0.9))).alias("p90_micros"),
            micros(F.max("value")).alias("max_micros"),
        )
    )


@register("analytics_events_rollup", plans_sql.EVENTS_ROLLUP_SQL)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over events: (month, type) + monthly subtotals
    + grand total in ONE pass — Spark plans a single Expand + aggregate,
    not three scans (beyond-reference: SURVEY §2.5 notes the reference
    has no grouping sets)."""
    ev = _load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull())
        .rollup(
            F.date_trunc("month", "ts").cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
            ).alias("value_total_micros"),
        )
    )


# --- QA layer (J5 join coverage, V7 warning metrics) -------------------------

from .plans import quality  # noqa: E402


@register("qa_join_coverage_engine_a", plans_sql.COVERAGE_A_SQL)
def q_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    return quality.join_coverage(t["relius"], t["matrix"], ["plan_id", "ssn", "gross_amt"])


@register("qa_warning_metrics", plans_sql.WARNING_METRICS_SQL)
def q_warning_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = clean_tables(spark, sf_dir)
    return quality.build_warning_metrics(t["relius"], t["matrix"], t["demo"])


# --- LLM-data-pipeline operators (text / dedup / similarity / multimodal) ----

from .operators import dedup as DD  # noqa: E402
from .operators import multimodal, similarity  # noqa: E402
from .operators import text as T  # noqa: E402
from .oracles import llm_sql  # noqa: E402


def docs_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents corpus with planted exact/near duplicates (mirrors
    llm_sql.DOCS_AUG_CTE so dedup queries are self-validating)."""
    docs = _load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % llm_sql.EXACT_COPY_MOD == 0).select(
        (F.col("doc_id") + llm_sql.COPY_ID_OFFSET).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % llm_sql.NEAR_COPY_MOD == 0).select(
        (F.col("doc_id") + llm_sql.NEAR_ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(llm_sql.NEAR_SUFFIX)).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


def emb_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % llm_sql.EMB_COPY_MOD == 0).select(
        (F.col("vec_id") + llm_sql.COPY_ID_OFFSET).alias("vec_id"), "embedding"
    )
    return emb.unionByName(copies)


@register("text_stats", llm_sql.TEXT_STATS_SQL)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_table(spark, sf_dir, "documents")
    return T.with_text_stats(docs).select(
        "doc_id",
        "n_tokens",
        "n_tokens_bpe",
        "n_chars",
        "punct_ratio",
        "mean_word_len",
        "stopword_ratio",
        "lang_guess",
        F.array_join("quality_flags", ";").alias("quality_flags"),
        "quality_score",
        "fingerprint",
        "min_shingle_hash",
    )


@register("text_repetition", llm_sql.REPETITION_SQL)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (type-token ratio, mode-token share) —
    the Gopher-style repeated-content filter inputs."""
    docs = _load_table(spark, sf_dir, "documents").withColumn(
        "__toks", T.tokens("text")
    )
    ttr, top_share = T.repetition_stats(F.col("__toks"))
    micros = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    return docs.select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        micros(ttr).alias("ttr_micros"),
        micros(top_share).alias("top_share_micros"),
    )


@register("data_mixing_weights", llm_sql.MIXING_WEIGHTS_SQL)
def q_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing table: per (lang, source) doc/token tallies and each
    cell's token share — the input to a data-mixture sampling config.
    One groupBy + a 1-row broadcast total."""
    docs = _load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("t") * 1_000_000)
        .cast("long")
        .alias("token_share_micros"),
    )


@register("data_quality_bins", llm_sql.QUALITY_BINS_SQL)
def q_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quality binning over a deterministic total order,
    aggregated per bin. The global ntile is a single-partition sort —
    fine for config-sized outputs; the 100 TB swap-in is approx-quantile
    cutpoints (percentile_approx) joined back as range predicates."""
    from pyspark.sql import Window

    docs = _load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", T.quality_score("text").alias("q"))
    w = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("bin", F.ntile(4).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("q") * 1_000_000).cast("long").alias("avg_quality_micros"),
        )
    )


@register("data_split_documents", llm_sql.SPLIT_SQL)
def q_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test hash split
    (operators/sampling.py): md5-keyed, shuffle-free, growth-stable —
    never rand()."""
    from .operators import sampling

    docs = _load_table(spark, sf_dir, "documents")
    return sampling.with_split(docs).select("doc_id", "split")


@register("data_sample_stratified", llm_sql.STRATIFIED_SAMPLE_SQL)
def q_data_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified 10% sample per lang: hash-ordered rank vs an
    integer-ceil quota — per-stratum sizes are deterministic, unlike
    Bernoulli sampleBy."""
    from .operators import sampling

    docs = _load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample(docs, "lang", 1, 10).select("doc_id", "lang")


@register("data_contamination_check", llm_sql.CONTAMINATION_SQL)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination scan composing the hash split with the shingle
    index: test docs sharing any 5-token shingle with a train doc."""
    from .operators import sampling

    docs = _load_table(spark, sf_dir, "documents")
    return sampling.contamination_check(docs).select(
        "id", "n_shared"
    )


@register("text_tfidf_top_terms", llm_sql.TFIDF_SQL)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF top-3 terms per document (operators/text.py):
    corpus tokenized once into a persisted tf aggregate; df and N derive
    from it (vocab-sized broadcast + 1-row broadcast)."""
    return T.tfidf_top_terms(_load_table(spark, sf_dir, "documents"))


@register("dedup_exact_documents", llm_sql.DEDUP_EXACT_SQL)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = docs_aug(spark, sf_dir).withColumn("fingerprint", T.fingerprint("text"))
    out = DD.exact_dedup(aug, F.col("fingerprint"), ["doc_id"])
    return out.select("doc_id", "fingerprint")


@register("dedup_minhash_lsh", llm_sql.MINHASH_LSH_SQL)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_near_dup(docs_aug(spark, sf_dir), threshold=0.4)


@register("dedup_ngram_jaccard", llm_sql.NGRAM_JACCARD_SQL)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup via prefix-filtered set-similarity
    join — the hash-free exact counterpart to dedup_minhash_lsh (same
    planted duplicates, same 0.4 threshold, no signature approximation)."""
    return DD.ngram_jaccard_pairs(docs_aug(spark, sf_dir))


@register("dedup_simhash_values", llm_sql.SIMHASH_SQL)
def q_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.with_simhash(docs_aug(spark, sf_dir)).select("doc_id", "simhash")


@register("dedup_simhash_pairs", llm_sql.SIMHASH_PAIRS_SQL)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sims = (
        DD.with_simhash(docs_aug(spark, sf_dir), out="sh")
        .select(F.col("doc_id").alias("id"), "sh")
        .filter(F.col("sh").isNotNull())
        .persist()  # read by both sides of the band self-join
    )
    banded = sims.select(
        "id", "sh", F.explode(DD.simhash_bands(F.col("sh"))).alias("b")
    ).select("id", "sh", "b.band_idx", "b.band_val")
    left = banded.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band_idx", "band_val"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band_idx", "band_val"
    )
    pairs = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= 6
    )


@register("similarity_topk_bruteforce", llm_sql.TOPK_BRUTE_SQL)
def q_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register("similarity_ann_lsh", llm_sql.ANN_LSH_SQL)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-bucket sign-LSH (radius=0) — grades the CANDIDATE GENERATOR,
    not the default ANN surface: ann_topk_lsh's default is multi-probe
    (the next query), because exact-bucket standalone recall@10 is ~0."""
    emb = _load_table(spark, sf_dir, "embeddings")
    return similarity.ann_topk_lsh(
        emb, emb.filter(F.col("vec_id") < 5), k=10, radius=0
    )


@register("similarity_ann_ivf", llm_sql.IVF_ANN_SQL)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (FAISS-style cells, nprobe=2) with
    deterministic centroids so the DuckDB oracle replays the index."""
    emb = _load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register("similarity_ann_lsh_multiprobe", llm_sql.ANN_LSH_MP_SQL)
def q_ann_lsh_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH (radius 2: 37 of 256 buckets per query) —
    the recall/cost knob that rescues exact-bucket LSH on
    weakly-clustered data."""
    emb = _load_table(spark, sf_dir, "embeddings")
    return similarity.ann_topk_lsh_multiprobe(
        emb, emb.filter(F.col("vec_id") < 5), k=10
    )


@register("similarity_recall", llm_sql.ANN_RECALL_SQL)
def q_similarity_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH and IVF indexes vs the brute-force baseline —
    the approximate operators' quality as a graded number."""
    emb = _load_table(spark, sf_dir, "embeddings")
    return similarity.ann_recall(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register("embedding_near_dup", llm_sql.EMB_NEAR_DUP_SQL)
def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_near_dup_pairs(emb_aug(spark, sf_dir), threshold=0.95)


@register("multimodal_features", llm_sql.MULTIMODAL_FEATURES_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction, value-checked against a SQL replay
    of the deterministic stripe-mean extractor (features serialized in
    rounded milli-units so the float32 array hash-compares)."""
    docs = _load_table(spark, sf_dir, "documents")
    wrapped = multimodal.attach_binary(docs)
    feats = multimodal.extract_features(wrapped)
    milli = F.transform(
        "feature",
        lambda x: F.round(x.cast("double") * 1000).cast("long").cast("string"),
    )
    return feats.select(
        "id", "mime", "n_bytes", F.array_join(milli, ";").alias("feature_milli")
    )


@register("asof_click_purchase", plans_sql.ASOF_CLICK_PURCHASE_SQL)
def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): every click gets the
    user's most recent purchase at-or-before it, within 30 days. Oracle
    is DuckDB's native ASOF JOIN — primitive-level parity."""
    from .operators import asof

    ev = _load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof.asof_join_backward(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        tolerance_us=30 * 86_400 * 1_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("matched_ts").alias("purchase_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("matched_ts")).alias("purchase_lag_us"),
        (F.col("matched_value").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("purchase_value_micros"),
    )


@register("range_join_lookback", plans_sql.RANGE_LOOKBACK_SQL)
def q_range_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/ranges.py): per click, count and
    value-sum of the user's events in the prior 24h. The oracle states
    the plain inequality join; Spark executes the bucket-equi-join
    rewrite (a bare BETWEEN join would plan as BroadcastNestedLoop)."""
    from .operators import ranges

    ev = _load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    points = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("value_micros"),
    )
    anchors = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return ranges.lookback_agg(
        anchors, points, on=["user_id"], value_micros_col="value_micros"
    )


@register("sessionization_events", plans_sql.SESSIONIZE_SQL)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap sessions via F.session_window (batch form of the
    streaming/sessions.py operator; oracle is a gaps-and-islands replay).
    """
    from .streaming import sessions

    return sessions.sessionize(_load_table(spark, sf_dir, "events"))


@register("multimodal_frame_sample", llm_sql.MULTIMODAL_FRAMES_SQL)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-ingestion shape): constant fan-out
    mapInPandas stage; graded on frame geometry + content checksum so the
    sampled bytes themselves are value-checked."""
    docs = _load_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(multimodal.attach_binary(docs))
    return frames.select(
        "id",
        "frame_idx",
        "total_frames",
        F.length("frame").cast("long").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


@register("multimodal_features_resized", llm_sql.MULTIMODAL_RESIZED_SQL)
def q_multimodal_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature resize (average-pool 8 -> 4) kept entirely JVM-side after
    the one Arrow extraction stage; serialized in rounded milli-units."""
    docs = _load_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.attach_binary(docs))
    milli = F.transform(
        multimodal.resize_feature(F.col("feature")),
        lambda x: F.round(x * 1000).cast("long").cast("string"),
    )
    return feats.select("id", F.array_join(milli, ";").alias("feature_milli"))


@register("streaming_dedup_events", plans_sql.STREAM_DEDUP_SQL)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark) under availableNow;
    survivors projected to their keys = distinct (user_id, event_type)."""
    from .streaming import stateful

    out = stateful.run_dedup_to_memory(spark, sf_dir, name="event_dedup_check")
    return out.select("user_id", "event_type")


@register("streaming_running_totals", plans_sql.STREAM_RUNNING_TOTALS_SQL)
def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals; final per-key row == batch
    rollup (value compared at fixed 1e-6 precision: double sums are
    order-dependent at the 1e-12 level)."""
    from .streaming import stateful

    out = stateful.run_running_totals_to_memory(
        spark, sf_dir, name="event_running_totals_check"
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("value_total") * 1_000_000).cast("long").alias("value_total_micros"),
    )


@register("streaming_event_trend", plans_sql.STREAM_WINDOW_SQL)
def q_streaming_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming 30-day tumbling-window trend, executed with an
    availableNow trigger into a memory sink; oracle is the equivalent batch
    window rollup (Spark tumbling windows are epoch-aligned in UTC)."""
    from .streaming import trends

    out = trends.run_to_memory(spark, sf_dir, name="event_trends_check")
    return out.select(
        F.col("window_start").cast("date").alias("window_start"),
        F.col("window_end").cast("date").alias("window_end"),
        "event_type",
        "n",
        # integer-micros serialization (see q_unmatched_a)
        (F.col("value_total").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("value_total_micros"),
    )
