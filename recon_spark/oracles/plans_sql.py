"""DuckDB renderings of the reporting layer: correction builder (F11/P3)
and analytics aggregations (A2-A7), built on the engine CTE prefixes from
:mod:`recon_spark.oracles.engines_sql`.
"""

from __future__ import annotations

from . import engines_sql as E
from ..functions.normalizers import WS as _WS
from .llm_sql import hash32 as _hash32

NL = "chr(10)"

_KPI_STATUSES = (
    "('match_no_action','match_needs_correction','match_needs_review',"
    "'date_out_of_range','unmatched_relius','unmatched_matrix',"
    "'excluded_from_age_engine_rollover_or_inherited','age_rule_insufficient_data')"
)

# --- corrections (F11 + P3) ---------------------------------------------------

CORRECTIONS_A_SQL = f"""{E.ENGINE_A_CTES}
SELECT
  transaction_id AS "Transaction Id",
  txn_date AS "Transaction Date",
  ssn AS "Participant SSN",
  participant_name AS "Participant Name",
  matrix_account AS "Matrix Account",
  tax_code_1 AS "Current Tax Code 1",
  tax_code_2 AS "Current Tax Code 2",
  {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS "New Tax Code",
  CAST(NULL AS DOUBLE) AS "New Taxable Amount",
  CAST(NULL AS BIGINT) AS "New First Year contrib",
  correction_reason AS "Reason",
  action AS "Action"
FROM ea_out
WHERE match_status IN ('match_needs_correction', 'match_needs_review')
  AND (suggested_tax_code_1 IS NOT NULL OR suggested_tax_code_2 IS NOT NULL)
  AND merge_side = 'both' AND date_within_tolerance
  AND coalesce(action, '') = 'UPDATE_1099'"""

# ``MATERIALIZED`` barrier: without it DuckDB inlines the 12-level engine-C
# CTE chain into every OR branch of the selection predicate and its
# expression tree explodes (observed OOM at sf0.001).
CORRECTIONS_C_SQL = f"""{E.ENGINE_C_CTES},
ec_mat AS MATERIALIZED (SELECT * FROM ec_final)
SELECT
  transaction_id AS "Transaction Id",
  txn_date AS "Transaction Date",
  ssn AS "Participant SSN",
  participant_name AS "Participant Name",
  matrix_account AS "Matrix Account",
  tax_code_1 AS "Current Tax Code 1",
  tax_code_2 AS "Current Tax Code 2",
  {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS "New Tax Code",
  CAST(suggested_taxable_amt AS DOUBLE) AS "New Taxable Amount",
  CAST(suggested_first_roth_tax_year AS BIGINT) AS "New First Year contrib",
  correction_reason AS "Reason",
  action AS "Action"
FROM ec_mat
WHERE match_status IN ('match_needs_correction', 'match_needs_review')
  AND (suggested_tax_code_1 IS NOT NULL OR suggested_tax_code_2 IS NOT NULL
       OR suggested_taxable_amt IS NOT NULL
       OR suggested_first_roth_tax_year IS NOT NULL
       OR coalesce(contains(action, 'INVESTIGATE'), false))
  AND (coalesce(contains(action, 'UPDATE_1099'), false)
       OR coalesce(contains(action, 'INVESTIGATE'), false))"""

# --- analytics (A2-A7) --------------------------------------------------------

KPI_A_SQL = f"""{E.ENGINE_A_CTES},
kpi AS (
  SELECT match_status, CAST(count(*) AS BIGINT) AS n
  FROM ea_out
  WHERE match_status IN {_KPI_STATUSES}
  GROUP BY match_status
)
SELECT match_status, n, n * 100.0 / sum(n) OVER () AS pct FROM kpi"""

MONTHLY_B_SQL = f"""{E.ENGINE_B_CTES},
mm AS (
  SELECT
    CAST(date_trunc('month', txn_date) AS DATE) AS month,
    CAST(count(*) AS BIGINT) AS total_txns,
    CAST(sum(CASE WHEN match_status = 'match_needs_correction' THEN 1 ELSE 0 END)
         AS BIGINT) AS correction_count
  FROM eb_final
  WHERE txn_date IS NOT NULL
  GROUP BY 1
)
SELECT month, total_txns, correction_count,
       correction_count / total_txns AS correction_rate
FROM mm"""

LAG_HIST_A_SQL = f"""{E.ENGINE_A_CTES}
SELECT date_lag_days, CAST(count(*) AS BIGINT) AS n
FROM ea_out GROUP BY date_lag_days"""

TRENDS_A_SQL = f"""{E.ENGINE_A_CTES}
SELECT CAST(date_trunc('month', txn_date) AS DATE) AS month,
       correction_reason, CAST(count(*) AS BIGINT) AS n
FROM ea_out
WHERE txn_date IS NOT NULL AND correction_reason IS NOT NULL
GROUP BY 1, 2"""

#: Engine B reason vocabulary — explicit pivot domain (A6)
EB_REASONS = [
    "age_59_5_or_over_normal_distribution",
    "terminated_at_or_after_55",
    "terminated_before_55",
    "no_term_date_under_55_in_txn_year",
    "no_term_date_55_plus_in_txn_year",
]

_CROSSTAB_COLS = ",\n  ".join(
    f"CAST(sum(CASE WHEN (CASE WHEN match_status <> 'match_no_action' THEN eb_reason END)"
    f" = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS \"{v}\""
    for v in EB_REASONS
)

CROSSTAB_B_SQL = f"""{E.ENGINE_B_CTES}
SELECT coalesce(tax_code_1, '(none)') AS tax_code_1,
  {_CROSSTAB_COLS}
FROM eb_final
GROUP BY 1"""

ACTION_MIX_C_SQL = f"""{E.ENGINE_C_CTES}
SELECT
  CAST(sum(CASE WHEN coalesce(contains(action, 'UPDATE_1099'), false) THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
  CAST(sum(CASE WHEN coalesce(contains(action, 'INVESTIGATE'), false) THEN 1 ELSE 0 END) AS BIGINT) AS n_investigate,
  CAST(sum(CASE WHEN coalesce(contains(action, 'UPDATE_1099'), false)
                 AND coalesce(contains(action, 'INVESTIGATE'), false) THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
  CAST(sum(CASE WHEN NOT coalesce(contains(action, 'UPDATE_1099'), false)
                 AND NOT coalesce(contains(action, 'INVESTIGATE'), false) THEN 1 ELSE 0 END) AS BIGINT) AS n_none,
  CAST(count(*) AS BIGINT) AS n_total
FROM ec_final"""

REASON_TRENDS_C_SQL = f"""{E.ENGINE_C_CTES},
ec_mat AS MATERIALIZED (SELECT txn_date, correction_reason FROM ec_final),
exploded AS (
  SELECT
    CAST(date_trunc('month', txn_date) AS DATE) AS month,
    unnest(list_filter(
      list_transform(string_split(correction_reason, {NL}),
                     x -> regexp_replace(trim(x), '^-{_WS}*', '')),
      x -> x <> '')) AS reason
  FROM ec_mat
  WHERE txn_date IS NOT NULL AND correction_reason IS NOT NULL
)
SELECT month, reason, CAST(count(*) AS BIGINT) AS n
FROM exploded GROUP BY month, reason"""

#: gross_total serialized as integer micros — exact decimal scale shift
#: per row (decimal(18,6) * 10^6 is integral, width 28 stays in DuckDB's
#: exact-decimal range) then a BIGINT sum; DECIMAL output cells themselves
#: hash-drift in the driver's comparator, integer cells don't.
UNMATCHED_A_SQL = f"""{E.ENGINE_A_CTES}
SELECT match_status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(CAST(gross_amt AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS gross_total_micros
FROM ea_out
WHERE match_status IN ('unmatched_relius', 'unmatched_matrix')
GROUP BY match_status"""

#: A2 generalized over the driver's events table (batch twin of the
#: streaming monthly trend).
EVENTS_MONTHLY_SQL = """SELECT
  CAST(date_trunc('month', ts) AS DATE) AS month,
  event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_total_micros
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2"""

#: A2 generalized further: ROLLUP grouping sets (month x type, month,
#: grand total) — an aggregate shape the reference has nowhere (SURVEY
#: §2.5 "no grouping sets/cube/rollup"); subtotal rows carry SQL-standard
#: NULL group markers in both engines.
#: r11 fold: the salted skew join's certificate — the oracle computes
#: the PLAIN equi-join of every event to its per-type tally; the Spark
#: side runs the REAL salted path (operators/partitioning.salted_join),
#: so checksum equality certifies salting neither drops nor duplicates
#: a row (the salt values themselves are irrelevant to the row set).
_SALTED_PARITY_CTES = f"""sj_dim AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
  FROM events GROUP BY 1
),
sj_join AS (
  SELECT e.event_id, d.type_n
  FROM events e JOIN sj_dim d ON e.event_type = d.event_type
),
sj_parity AS (
  SELECT CAST(count(*) AS BIGINT) AS n_salted_rows,
         CAST(COALESCE(SUM({_hash32("CAST(event_id AS VARCHAR) || '|' || CAST(type_n AS VARCHAR)")}), 0) AS BIGINT) AS salted_ck
  FROM sj_join
)"""

EVENTS_ROLLUP_SQL = f"""WITH {_SALTED_PARITY_CTES},
er AS (
  SELECT
    CAST(date_trunc('month', ts) AS DATE) AS month,
    event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_total_micros
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY ROLLUP(1, 2)
)
SELECT er.*, sp.n_salted_rows, sp.salted_ck
FROM er CROSS JOIN sj_parity sp"""

#: per-type value distribution: exact interpolated percentiles (Spark
#: `percentile` == DuckDB `quantile_cont`), serialized at micro
#: precision so sub-1e-6 interpolation-arithmetic differences between
#: the engines cannot surface.
VALUE_PERCENTILES_SQL = """SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(round(min(value) * 1000000) AS BIGINT) AS min_micros,
  CAST(round(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_micros,
  CAST(round(quantile_cont(value, 0.9) * 1000000) AS BIGINT) AS p90_micros,
  CAST(round(max(value) * 1000000) AS BIGINT) AS max_micros
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL
GROUP BY event_type"""

#: distinct-count aggregate (reference has no distinct-agg, SURVEY §2.5):
#: per-type user reach + events-per-user ratio.
def _zorder_cell(col: str, mn: str, mx: str, levels: int = 255) -> str:
    """Mirror of operators/zorder.py's minmax quantizer: linear scale,
    floor, clamp to [0, levels], NULL -> 0; degenerate (empty / constant)
    dimensions collapse to cell 0. Both engines evaluate the identical
    IEEE-double expression tree, so floor cannot straddle an ulp."""
    scaled = f"((CAST({col} AS DOUBLE) - {mn}) / ({mx} - {mn}))"
    q = f"CAST(floor({scaled} * {levels}) AS BIGINT)"
    return (
        f"CASE WHEN {mn} IS NULL OR {mx} IS NULL OR {mx} = {mn} THEN 0 "
        f"ELSE COALESCE(GREATEST(LEAST({q}, {levels}), 0), 0) END"
    )


def zorder_parity_ctes(bits: int = 8) -> str:
    """r11 fold: replay of zorder_value over orders on
    (o_totalprice, o_custkey) — quantize + Morton bit-interleave
    (bit i of dim d at position i*n_dims + d, LSB first)."""
    interleave = " | ".join(
        f"(((q{d} >> {i}) & 1) << {i * 2 + d})"
        for d in range(2)
        for i in range(bits)
    )
    return f"""z_stats AS (
  SELECT CAST(min(o_totalprice) AS DOUBLE) AS mn0, CAST(max(o_totalprice) AS DOUBLE) AS mx0,
         CAST(min(o_custkey) AS DOUBLE) AS mn1, CAST(max(o_custkey) AS DOUBLE) AS mx1
  FROM orders
),
z_q AS (
  SELECT o_orderkey,
         {_zorder_cell('o_totalprice', 'mn0', 'mx0')} AS q0,
         {_zorder_cell('o_custkey', 'mn1', 'mx1')} AS q1
  FROM orders CROSS JOIN z_stats
),
z_vals AS (
  SELECT o_orderkey, CAST({interleave} AS BIGINT) AS zvalue FROM z_q
),
z_parity AS (
  SELECT CAST(count(*) AS BIGINT) AS n_zorder_rows,
         CAST(COALESCE(SUM({_hash32("CAST(o_orderkey AS VARCHAR) || '|' || CAST(zvalue AS VARCHAR)")}), 0) AS BIGINT) AS zorder_ck
  FROM z_vals
)"""


from ..streaming.heavy_hitters import MGG_K as _MGG_K  # noqa: E402


def mgg_parity_ctes(n_batches: int = 3, k: int = _MGG_K) -> str:
    """Streaming Misra-Gries heavy-hitter rollup twin
    (streaming/heavy_hitters.replay_heavy_hitters over the
    ``event_id % n`` micro-batch split): per batch, exact user counts
    reduced by the (k+1)-th-largest decrement to a <= k-row fragment +
    total sentinel; fragments merged with the same Agarwal combine.
    The decrement is the (k+1)-th largest COUNT VALUE — independent of
    any tie order, so the whole verdict is deterministic and
    engine-replayable (unlike the batch sketch, whose partition
    boundaries are physical; micro-batch boundaries are data)."""
    return f"""mgg_counts AS (
  SELECT CAST(event_id % {n_batches} AS INT) AS b,
         CAST(user_id AS VARCHAR) AS item, count(*) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
mgg_d AS (
  SELECT b, coalesce(max(CASE WHEN rn = {k + 1} THEN c END), 0) AS d
  FROM (SELECT b, c, row_number() OVER (PARTITION BY b ORDER BY c DESC) AS rn
        FROM mgg_counts)
  GROUP BY b
),
mgg_frag AS (
  SELECT item, CAST(mc.c - d AS BIGINT) AS c
  FROM mgg_counts mc JOIN mgg_d USING (b) WHERE mc.c > d
  UNION ALL
  SELECT NULL, CAST(sum(c) AS BIGINT) FROM mgg_counts GROUP BY b
),
mgg_cand AS (
  SELECT item, sum(c) AS s FROM mgg_frag WHERE item IS NOT NULL GROUP BY 1
),
mgg_dd AS (
  SELECT coalesce(max(CASE WHEN rn = {k + 1} THEN s END), 0) AS d
  FROM (SELECT s, row_number() OVER (ORDER BY s DESC) AS rn FROM mgg_cand)
),
mgg_tot AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_total
  FROM mgg_frag WHERE item IS NULL
),
mgg_rows AS (
  SELECT item, CAST(s - d AS BIGINT) AS est, n_total,
         n_total // {k + 1} AS err_bound
  FROM mgg_cand CROSS JOIN mgg_dd CROSS JOIN mgg_tot WHERE s > d
),
mgg_parity AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mgg_rows,
         CAST(COALESCE(SUM({_hash32(
             "item || '|' || CAST(est AS VARCHAR)"
             " || '|' || CAST(n_total AS VARCHAR)"
             " || '|' || CAST(err_bound AS VARCHAR)"
         )}), 0) AS BIGINT) AS mgg_ck
  FROM mgg_rows
)"""


def cm_parity_ctes(
    depth: int | None = None,
    width: int | None = None,
    query_mod: int | None = None,
) -> str:
    """Count-Min sketch replay (operators/sketches.cm_cells /
    cm_point_estimates, r14): the full depth x width cell grid rebuilt
    from scratch (same md5 'cm<r>#' seeds, same modulo), plus the
    point-estimate verdicts — true counts, min-over-rows estimates and
    the overcount — for the deterministic md5 %% query_mod domain
    sample. Every quantity is an exact BIGINT (cell sums are
    partition-invariant, which is why this sketch alone in the family
    can be oracle-graded end-to-end). Factored so the differential fuzz
    (tests/test_cm.py) runs the identical replay over random corpora."""
    from ..operators import sketches as _SK

    depth = _SK.CM_DEPTH if depth is None else depth
    width = _SK.CM_WIDTH if width is None else width
    query_mod = _SK.CM_QUERY_MOD if query_mod is None else query_mod
    probe = _hash32("'cm' || CAST(r AS VARCHAR) || '#' || item")
    return f"""cm_src AS (
  SELECT CAST(user_id AS VARCHAR) AS item
  FROM events WHERE user_id IS NOT NULL
),
cm_probe AS (
  SELECT item, CAST(r AS INT) AS row,
         CAST({probe} % {width} AS INT) AS bucket
  FROM cm_src CROSS JOIN (SELECT unnest(range({depth})) AS r)
),
cm_cells AS MATERIALIZED (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cm_probe GROUP BY 1, 2
),
cm_truth AS (
  SELECT item, CAST(count(*) AS BIGINT) AS true_cnt
  FROM cm_src
  WHERE {_hash32("'cmq#' || item")} % {query_mod} = 0
  GROUP BY 1
),
cm_qprobe AS (
  SELECT item, true_cnt, CAST(r AS INT) AS row,
         CAST({probe} % {width} AS INT) AS bucket
  FROM cm_truth CROSS JOIN (SELECT unnest(range({depth})) AS r)
),
cm_verdicts AS (
  SELECT item, true_cnt,
         CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est,
         CAST(min(coalesce(cnt, 0)) - true_cnt AS BIGINT) AS overcount
  FROM cm_qprobe LEFT JOIN cm_cells USING (row, bucket)
  GROUP BY 1, 2
),
cm_parity AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM cm_cells) AS n_cm_cells,
    (SELECT CAST(COALESCE(SUM({_hash32(
        "CAST(row AS VARCHAR) || '|' || CAST(bucket AS VARCHAR)"
        " || '|' || CAST(cnt AS VARCHAR)"
    )}), 0) AS BIGINT) FROM cm_cells) AS cm_ck,
    (SELECT CAST(count(*) AS BIGINT) FROM cm_verdicts) AS n_cmq_rows,
    (SELECT CAST(COALESCE(SUM({_hash32(
        "item || '|' || CAST(true_cnt AS VARCHAR)"
        " || '|' || CAST(est AS VARCHAR)"
        " || '|' || CAST(overcount AS VARCHAR)"
    )}), 0) AS BIGINT) FROM cm_verdicts) AS cmq_ck
)"""


#: histogram fold columns (single-sourced with the registry wiring)
HIST_COLS = ("o_totalprice", "o_custkey")


def histogram_parity_ctes(
    cols: tuple[str, ...] = HIST_COLS, k: int | None = None
) -> str:
    """Equi-depth histogram replay (operators/profile.profile_histogram,
    r14): edges via quantile_cont at the exact dyadic j/k percentiles
    (bit-identical to the distributed two-phase rank — certified by the
    analytics_value_percentiles row), membership = count of edges
    strictly below the value, counts exact. Factored so the
    differential fuzz (tests/test_profile.py) replays random frames."""
    from ..operators import profile as _PR

    k = _PR.HIST_K if k is None else k
    ps = "[" + ", ".join(repr(j / k) for j in range(1, k)) + "]"
    melt = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS DOUBLE) AS value"
        f" FROM orders WHERE {c} IS NOT NULL"
        for c in cols
    )
    return f"""hist_melt AS MATERIALIZED ({melt}),
hist_edges AS (
  SELECT col_name, quantile_cont(value, {ps}) AS es
  FROM hist_melt GROUP BY col_name
),
hist_binned AS (
  SELECT m.col_name,
         len(list_filter(e.es, x -> m.value > x)) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM hist_melt m JOIN hist_edges e USING (col_name)
  GROUP BY 1, 2
),
hist_rows AS (
  SELECT b.col_name, CAST(b.bucket AS INT) AS bucket,
         (CASE WHEN b.bucket < {k - 1}
               THEN CAST(round(e.es[b.bucket + 1] * 1000000) AS BIGINT)
          END) AS hi_micros,
         b.n
  FROM hist_binned b JOIN hist_edges e USING (col_name)
),
hist_parity AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hist_rows,
         CAST(COALESCE(SUM({_hash32(
             "col_name || '|' || CAST(bucket AS VARCHAR)"
             " || '|' || CAST(coalesce(hi_micros, -1) AS VARCHAR)"
             " || '|' || CAST(n AS VARCHAR)"
         )}), 0) AS BIGINT) AS hist_ck
  FROM hist_rows
)"""


USER_REACH_SQL = f"""WITH {zorder_parity_ctes()},
{mgg_parity_ctes()},
{cm_parity_ctes()},
{histogram_parity_ctes()},
ur AS (
  SELECT
    event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
    CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS events_per_user
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY event_type
)
SELECT ur.*, zp.n_zorder_rows, zp.zorder_ck, mp.n_mgg_rows, mp.mgg_ck,
       cp.n_cm_cells, cp.cm_ck, cp.n_cmq_rows, cp.cmq_ck,
       hp.n_hist_rows, hp.hist_ck
FROM ur CROSS JOIN z_parity zp CROSS JOIN mgg_parity mp
CROSS JOIN cm_parity cp CROSS JOIN hist_parity hp"""

#: stream-stream interval join replay: with availableNow over complete
#: data, an INNER stream-stream join emits exactly the batch inequality
#: join (watermarks bound state retention, not which matches emit).
_SS_JOIN_US = 24 * 3600 * 1_000_000

STREAM_JOIN_SQL = f"""WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us, value
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT c.click_id, p.purchase_id, c.user_id,
  CAST(c.click_us AS BIGINT) AS click_us,
  CAST(p.purchase_us AS BIGINT) AS purchase_us,
  CAST(CAST(CAST(p.value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS BIGINT) AS purchase_value_micros
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.purchase_us >= c.click_us - {_SS_JOIN_US}
 AND p.purchase_us < c.click_us"""

#: 30-day tumbling window in microseconds
_WIN_US = 30 * 86_400 * 1_000_000

#: Batch rendering of ``recon_spark.streaming.trends.windowed_event_trend``:
#: Spark tumbling windows align to the epoch in the session timezone (UTC
#: here), so window_start = us - us % 30d lands on midnight UTC and casts
#: to DATE losslessly. ns -> us narrowing is floor (``// 1000``), exactly
#: matching the Spark reader's ``ts DIV 1000``.
STREAM_WINDOW_SQL = f"""WITH ev AS (
  SELECT (epoch_ns(ts) // 1000) AS us, event_type, value
  FROM events WHERE ts IS NOT NULL
)
SELECT
  CAST(make_timestamp(us - (us % {_WIN_US})) AS DATE) AS window_start,
  CAST(make_timestamp(us - (us % {_WIN_US}) + {_WIN_US}) AS DATE) AS window_end,
  event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_total_micros
FROM ev
GROUP BY 1, 2, 3"""


# --- QA layer (J5 join coverage, V7 warning metrics) --------------------------

from .cleaning_sql import PRELUDE as _CLEAN_PRELUDE  # noqa: E402

#: columns the graded profiler fold profiles (documents table; text is
#: deliberately excluded — exact-profiling an open-text column is the
#: sketch twins' job, see operators/profile.py docstring). Single-sourced:
#: the registry's Spark side reads this same tuple.
PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


def profile_parity_ctes(table: str = "documents", cols=PROFILE_COLS) -> str:
    """Table-profiler twin (operators/profile.py, r13): recompute the
    FULL per-column profile — row/null counts, typed min/max (cast to
    VARCHAR after, matching the Spark side), exact distinct counts and
    the deterministic (cnt DESC, value ASC) top value — then checksum
    every stat row."""
    meta = "\n  UNION ALL\n".join(
        f"""  SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({c}) AS BIGINT) AS n_null,
         CAST(min({c}) AS VARCHAR) AS mn, CAST(max({c}) AS VARCHAR) AS mx
  FROM {table}"""
        for c in cols
    )
    vals = "\n    UNION ALL\n".join(
        f"    SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS v FROM {table}"
        for c in cols
    )
    return f"""prof_meta AS (
{meta}
),
prof_vc AS (
  SELECT col, v, count(*) AS cnt FROM (
{vals}
  ) WHERE v IS NOT NULL GROUP BY 1, 2
),
prof_stats AS (
  SELECT r.col, d.n_distinct, r.v AS top_value, CAST(r.cnt AS BIGINT) AS top_n
  FROM (
    SELECT col, v, cnt,
           row_number() OVER (PARTITION BY col ORDER BY cnt DESC, v ASC) AS rn
    FROM prof_vc
  ) r
  JOIN (SELECT col, CAST(count(*) AS BIGINT) AS n_distinct
        FROM prof_vc GROUP BY col) d USING (col)
  WHERE rn = 1
),
prof_rows AS (
  SELECT m.col, m.n_rows, m.n_null,
         coalesce(s.n_distinct, 0) AS n_distinct, m.mn, m.mx,
         s.top_value, coalesce(s.top_n, 0) AS top_n
  FROM prof_meta m LEFT JOIN prof_stats s USING (col)
),
prof_parity AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_prof_rows,
         CAST(COALESCE(SUM({_hash32(
             "col || '|' || CAST(n_rows AS VARCHAR)"
             " || '|' || CAST(n_null AS VARCHAR)"
             " || '|' || CAST(n_distinct AS VARCHAR)"
             " || '|' || coalesce(mn, chr(0))"
             " || '|' || coalesce(mx, chr(0))"
             " || '|' || coalesce(top_value, chr(0))"
             " || '|' || CAST(top_n AS VARCHAR)"
         )}), 0) AS BIGINT) AS prof_ck
  FROM prof_rows
)"""


from ..plans.quality import NEAR_MISS_LEV as _NM_LEV  # noqa: E402

def near_miss_ctes(plant: bool = True) -> str:
    """Near-miss audit replay, parameterized over the planting shim:
    ``plant=True`` renders the graded NEAR_MISS_CTES verbatim (the
    docs_aug planting convention — the DEFAULT fixture has no organic
    near-misses); ``plant=False`` audits the matrix side as-is, for the
    r14 organic near-miss fixture variant
    (fixtures_sql.fixture_ctes(nearmiss=True), tests/test_near_miss.py).
    """
    plants = f"""nm_plants AS (
  -- one deterministic matrix-side twin per unmatched relius row
  -- (md5(ssn) % 3 selects the shape) so all three verdict branches are
  -- exercised at every SF — the docs_aug planting convention; mirrors
  -- plans/quality.near_miss_audit(plant_demos=True)
  SELECT plan_id,
         CASE WHEN md % 3 = 0 THEN ssn_r
              ELSE (CASE WHEN substr(ssn_r, 1, 1) = '9' THEN '8' ELSE '9' END)
                   || substr(ssn_r, 2, 8) END AS ssn_m,
         CASE WHEN md % 3 = 0 THEN CAST(NULL AS VARCHAR)
              WHEN md % 3 = 1 THEN name_r
              ELSE 'planted near miss' END AS name_m,
         CAST(cents_r + (CASE WHEN md % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS cents_m
  FROM (SELECT *, {_hash32('ssn_r')} AS md FROM nm_run)
),
nm_mside AS (
  SELECT plan_id, ssn_m, name_m, cents_m FROM nm_mun
  UNION ALL SELECT plan_id, ssn_m, name_m, cents_m FROM nm_plants
),"""
    no_plants = """nm_mside AS (
  SELECT plan_id, ssn_m, name_m, cents_m FROM nm_mun
),"""
    return f"""nm_rk AS (SELECT DISTINCT plan_id, ssn, gross_amt FROM relius_clean),
nm_mk AS (SELECT DISTINCT plan_id, ssn, gross_amt FROM matrix_clean),
nm_run AS (
  SELECT r.plan_id, r.ssn AS ssn_r, r.full_name AS name_r,
         CAST(round(r.gross_amt * 100) AS BIGINT) AS cents_r
  FROM relius_clean r ANTI JOIN nm_mk k USING (plan_id, ssn, gross_amt)
),
nm_mun AS (
  SELECT m.plan_id, m.ssn AS ssn_m, m.participant_name AS name_m,
         CAST(round(m.gross_amt * 100) AS BIGINT) AS cents_m
  FROM matrix_clean m ANTI JOIN nm_rk k USING (plan_id, ssn, gross_amt)
),
{plants if plant else no_plants}
nm_rows AS (
  SELECT r.plan_id, ssn_r, ssn_m,
         CAST(levenshtein(ssn_r, ssn_m) AS INT) AS lev,
         CAST(cents_m - cents_r AS BIGINT) AS diff,
         coalesce(name_r IS NOT NULL AND name_r = name_m, FALSE) AS name_match,
         CASE WHEN levenshtein(ssn_r, ssn_m) = 0 THEN 'amount_mismatch'
              WHEN coalesce(name_r IS NOT NULL AND name_r = name_m, FALSE)
                THEN 'ssn_typo_name_match'
              ELSE 'ssn_near_amount_match' END AS reason
  FROM (SELECT *, unnest([cents_r - 1, cents_r, cents_r + 1]) AS cand
        FROM nm_run) r
  JOIN nm_mside m ON r.plan_id = m.plan_id AND r.cand = m.cents_m
  WHERE levenshtein(ssn_r, ssn_m) <= {_NM_LEV}
),
nm_parity AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nearmiss,
         CAST(COALESCE(SUM({_hash32(
             "plan_id || '|' || ssn_r || '|' || ssn_m"
             " || '|' || CAST(lev AS VARCHAR)"
             " || '|' || CAST(diff AS VARCHAR)"
             " || '|' || CAST(name_match AS VARCHAR)"
             " || '|' || reason"
         )}), 0) AS BIGINT) AS nearmiss_ck
  FROM nm_rows
)"""


#: r13 fold: near-miss reconciliation audit replay (plans/quality.
#: near_miss_audit): exact-key anti-joins on both sides, ±1-cent band
#: as an exploded equi-join, unit-cost Levenshtein on the SSNs, and the
#: three-way reason verdict — the full pair table checksummed.
NEAR_MISS_CTES = near_miss_ctes(plant=True)


#: V7 — post-normalization warning counters as a (source, metric, n)
#: frame. Since round 5 the J5 join-coverage numbers ride along as three
#: more metric rows (engine_a relius_rows_total / matched /
#: coverage_ratio_micros), folding the standalone COVERAGE_A query.
#: Since round 13 the table-profiler parity columns (n_prof_rows,
#: prof_ck — operators/profile.py over the documents table) and the
#: near-miss audit columns (n_nearmiss, nearmiss_ck — plans/quality.
#: near_miss_audit) ride on every row, the zero-slot fold convention.
def blocklist_parity_ctes(phrases: tuple[str, ...] | None = None) -> str:
    """Phrase-blocklist replay (operators/blocklist.py, r14): the same
    sorted phrase list tokenized by the same rule, occurrence counts as
    slice-equality over every start position, and the verdict columns
    incl. the comma-joined sorted hit-term string — all rebuilt from
    raw text. Factored so the differential fuzz (tests/test_blocklist)
    runs the identical replay over random corpora."""
    from ..operators import blocklist as BL
    from .llm_sql import tokens as _tokens

    plist = BL.phrase_tokens(phrases or BL.DEFAULT_BLOCKLIST)
    toks = _tokens("coalesce(CAST(text AS VARCHAR), '')")

    def cnt(pt: tuple[str, ...]) -> str:
        k = len(pt)
        lit = "[" + ", ".join(f"'{t}'" for t in pt) + "]"
        return (
            f"CAST(len(list_filter(range(1, len(toks) - {k} + 2),"
            f" i -> toks[i:i + {k - 1}] = {lit})) AS BIGINT)"
        )

    c_cols = ", ".join(
        f"{cnt(pt)} AS c{i}" for i, (_, pt) in enumerate(plist)
    )
    n_hits = " + ".join(f"c{i}" for i in range(len(plist)))
    n_hit_terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(plist))
    )
    terms_list = ", ".join(
        f"(CASE WHEN c{i} > 0 THEN '{p}' END)" for i, (p, _) in enumerate(plist)
    )
    return f"""bl_counts AS (
  SELECT doc_id, {c_cols}
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
),
bl_rows AS (
  SELECT doc_id,
    CAST({n_hits} AS BIGINT) AS n_hits,
    CAST({n_hit_terms} AS BIGINT) AS n_hit_terms,
    (({n_hit_terms}) > 0) AS hit,
    (CASE WHEN ({n_hit_terms}) > 0 THEN
       array_to_string(list_filter([{terms_list}], x -> x IS NOT NULL), ',')
     END) AS hit_terms
  FROM bl_counts
),
bl_parity AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_bl_rows,
         CAST(COALESCE(SUM({_hash32(
             "CAST(doc_id AS VARCHAR)"
             " || '|' || CAST(n_hits AS VARCHAR)"
             " || '|' || CAST(n_hit_terms AS VARCHAR)"
             " || '|' || CAST(hit AS VARCHAR)"
             " || '|' || coalesce(hit_terms, '~')"
         )}), 0) AS BIGINT) AS bl_ck
  FROM bl_rows
)"""


WARNING_METRICS_SQL = f"""{_CLEAN_PRELUDE},
{profile_parity_ctes()},
{NEAR_MISS_CTES},
{blocklist_parity_ctes()},
cov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_left,
         CAST(count(rk.hit) AS BIGINT) AS n_matched
  FROM relius_clean l
  LEFT JOIN (SELECT DISTINCT plan_id, ssn, gross_amt, 1 AS hit FROM matrix_clean) rk
    USING (plan_id, ssn, gross_amt)
),
m AS (
  SELECT 'relius' AS source, 'invalid_ssn' AS metric,
         CAST(sum(CASE WHEN ssn IS NULL OR length(ssn) <> 9 THEN 1 ELSE 0 END) AS BIGINT) AS n
  FROM relius_clean
  UNION ALL
  SELECT 'relius', 'code_over_2_chars',
         CAST(sum(CASE WHEN dist_code_1 IS NOT NULL AND length(dist_code_1) > 2 THEN 1 ELSE 0 END) AS BIGINT)
  FROM relius_clean
  UNION ALL
  SELECT 'matrix', 'invalid_ssn',
         CAST(sum(CASE WHEN ssn IS NULL OR length(ssn) <> 9 THEN 1 ELSE 0 END) AS BIGINT)
  FROM matrix_clean
  UNION ALL
  SELECT 'matrix', 'code_over_2_chars',
         CAST(sum(CASE WHEN (tax_code_1 IS NOT NULL AND length(tax_code_1) > 2)
                         OR (tax_code_2 IS NOT NULL AND length(tax_code_2) > 2) THEN 1 ELSE 0 END) AS BIGINT)
  FROM matrix_clean
  UNION ALL
  SELECT 'engine_b', 'matrix_rows_missing_demo',
         CAST(sum(CASE WHEN dk.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM matrix_clean
  LEFT JOIN (SELECT DISTINCT plan_id, ssn, 1 AS hit FROM demo_clean) dk
    USING (plan_id, ssn)
  UNION ALL
  SELECT 'engine_a', 'relius_rows_total', n_left FROM cov
  UNION ALL
  SELECT 'engine_a', 'relius_rows_matched_in_matrix', n_matched FROM cov
  UNION ALL
  SELECT 'engine_a', 'coverage_ratio_micros',
         CAST(round(CAST(n_matched AS DOUBLE) / n_left * 1000000) AS BIGINT) FROM cov
  UNION ALL
  -- Benford first-digit screen over matrix gross amounts (round 6):
  -- INTEGER digit counts only — the chi-square arithmetic stays
  -- pytest-graded (libm log10 may differ across engines in the last
  -- ulp; counts cannot)
  SELECT 'benford_matrix_gross', 'digit_' || CAST(d.digit AS VARCHAR),
         CAST(coalesce(cnt.n, 0) AS BIGINT)
  FROM range(1, 10) AS d(digit)
  LEFT JOIN (
    SELECT CAST(substr(CAST(CAST(floor(abs(gross_amt)) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
           count(*) AS n
    FROM matrix_clean
    WHERE gross_amt IS NOT NULL AND abs(gross_amt) >= 1
    GROUP BY 1
  ) cnt USING (digit)
)
SELECT source, metric, n, pf.n_prof_rows, pf.prof_ck,
       nmp.n_nearmiss, nmp.nearmiss_ck, blp.n_bl_rows, blp.bl_ck
FROM m CROSS JOIN prof_parity pf CROSS JOIN nm_parity nmp
CROSS JOIN bl_parity blp"""


# --- stateful streaming oracles ----------------------------------------------

#: streaming dedup keeps one row per (user_id, event_type) within the
#: watermark; with a single availableNow micro-batch the surviving key set
#: is exactly the distinct keys. Since round 9 two parity columns ride on
#: every row (the zero-slot fold pattern of dedup_exact/dedup_ngram): the
#: ingestion GATE's full three-batch verdict table — fingerprints,
#: MinHash/LSH candidates, four-rule priority resolution, and the
#: batch-over-batch signature-store evolution — is replayed entirely in
#: SQL (llm_sql.gate_replay_ctes) and folded to (count, checksum), which
#: the Spark side must reproduce by running the REAL foreachBatch gate.
from . import llm_sql as _Q  # noqa: E402

STREAM_DEDUP_SQL = f"""WITH {_Q.gate_replay_ctes()}
SELECT s.user_id, s.event_type, g.n_gate_verdicts, g.gate_ck
FROM (SELECT DISTINCT user_id, event_type
      FROM events WHERE ts IS NOT NULL) s
CROSS JOIN gate_parity g"""

#: gap-based sessionization replay: classic gaps-and-islands. Boundary
#: semantics verified against Spark (test_session_boundary_is_strict): an
#: event landing EXACTLY on the previous session's end (diff == gap)
#: MERGES — Spark's merge condition is diff <= gap, inclusive.
_SESSION_GAP_US = 8 * 3600 * 1_000_000

SESSIONIZE_SQL = f"""WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events WHERE ts IS NOT NULL
),
marked AS (
  SELECT user_id, us, value,
    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) <= {_SESSION_GAP_US}
         THEN 0 ELSE 1 END AS new_sess
  FROM ev
),
sess AS (
  SELECT user_id, us, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
  CAST(min(us) AS BIGINT) AS session_start_us,
  CAST(max(us) + {_SESSION_GAP_US} AS BIGINT) AS session_end_us,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_total_micros
FROM sess GROUP BY user_id, sid"""

#: backward as-of join replay using DuckDB's NATIVE ASOF JOIN — the
#: clearest possible parity statement: our union+forward-fill window must
#: reproduce the engine primitive exactly (including the equal-timestamp
#: rule: l.ts >= r.ts matches). Tolerance nulls matches out after the
#: join, same as the Spark side.
_ASOF_TOL_US = 30 * 86_400 * 1_000_000

ASOF_CLICK_PURCHASE_SQL = f"""WITH c AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  -- pre-dedup per (user_id, ts): ASOF's choice among equal-timestamp
  -- right rows is unspecified in both engines; max(value) pins it
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
  GROUP BY user_id, ts
),
j AS (
  SELECT c.event_id, c.user_id,
         epoch_us(c.ts) AS ts_us,
         epoch_us(p.ts) AS m_ts_us,
         p.value AS m_value
  FROM c ASOF LEFT JOIN p
    ON c.user_id = p.user_id AND c.ts >= p.ts
),
ok AS (
  SELECT *, (m_ts_us IS NOT NULL AND ts_us - m_ts_us <= {_ASOF_TOL_US}) AS within
  FROM j
)
SELECT event_id, user_id,
  CAST(ts_us AS BIGINT) AS ts_us,
  CAST(CASE WHEN within THEN m_ts_us END AS BIGINT) AS purchase_ts_us,
  CAST(CASE WHEN within THEN ts_us - m_ts_us END AS BIGINT) AS purchase_lag_us,
  CAST(CASE WHEN within THEN CAST(CAST(m_value AS DECIMAL(18,6)) * 1000000 AS BIGINT) END AS BIGINT) AS purchase_value_micros
FROM ok"""

#: bucketized range-join replay: the oracle states the semantics as the
#: plain inequality join (DuckDB IEJoin handles oracle scale); the Spark
#: side must reproduce it through the bucket-equi-join + residual-filter
#: rewrite. 24h lookback, micros arithmetic throughout.
_LOOKBACK_US = 24 * 3600 * 1_000_000

RANGE_LOOKBACK_SQL = f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vus
  FROM events WHERE ts IS NOT NULL
),
c AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
agg AS (
  SELECT c.event_id, count(*) AS n, sum(e.vus) AS v
  FROM c JOIN e
    ON c.user_id = e.user_id
   AND e.us >= c.us - {_LOOKBACK_US}
   AND e.us < c.us
  GROUP BY c.event_id
)
SELECT c.event_id, c.user_id, CAST(c.us AS BIGINT) AS ts_us,
  CAST(coalesce(agg.n, 0) AS BIGINT) AS n_prior,
  CAST(agg.v AS BIGINT) AS prior_value_micros
FROM c LEFT JOIN agg USING (event_id)"""

#: applyInPandasWithState running totals: each key's final emitted row
#: equals the batch rollup. value_total is compared at fixed microsecond
#: precision (micros = round(total * 1e6)) because a distributed double
#: sum is order-dependent at the 1e-12 level.
STREAM_RUNNING_TOTALS_SQL = """SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(round(sum(coalesce(value, 0)) * 1000000) AS BIGINT) AS value_total_micros
FROM events WHERE ts IS NOT NULL
GROUP BY event_type"""


# --- additional analytics variants (A4 Engine A, A6 Engine C, A2 Engine D) ----

REASON_HIST_A_SQL = f"""{E.ENGINE_A_CTES}
SELECT correction_reason, CAST(count(*) AS BIGINT) AS n
FROM ea_out GROUP BY correction_reason"""

#: Engine C new_tax_code domain (code-fix rules H/H4/B4 + age rules B1/B2/B7)
EC_NEW_CODES = ["H", "H4", "B4", "B7", "B2", "B1"]

_EC_CROSSTAB_COLS = ",\n  ".join(
    f"CAST(sum(CASE WHEN new_tax_code = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS \"{v}\""
    for v in EC_NEW_CODES
)

#: new_tax_code is derived in ENGINE_C_SELECT, not ec_final — recompute it
CROSSTAB_C_SQL = f"""{E.ENGINE_C_CTES},
ec_codes AS (
  SELECT tax_code_1,
         {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS new_tax_code
  FROM ec_final
)
SELECT coalesce(tax_code_1, '(none)') AS tax_code_1,
  {_EC_CROSSTAB_COLS}
FROM ec_codes
GROUP BY 1"""

MONTHLY_D_SQL = f"""{E.ENGINE_D_CTES},
md AS (
  SELECT
    CAST(date_trunc('month', txn_date) AS DATE) AS month,
    CAST(count(*) AS BIGINT) AS total_txns,
    CAST(sum(CASE WHEN match_status = 'match_needs_correction' THEN 1 ELSE 0 END)
         AS BIGINT) AS correction_count
  FROM ed_final
  WHERE txn_date IS NOT NULL
  GROUP BY 1
)
SELECT month, total_txns, correction_count,
       correction_count / total_txns AS correction_rate
FROM md"""


# --- per-engine KPI clones (A3) + Engine C taxable delta histogram (A4) ------

KPI_B_SQL = f"""{E.ENGINE_B_CTES},
kpi AS (
  SELECT match_status, CAST(count(*) AS BIGINT) AS n
  FROM eb_final
  WHERE match_status IN {_KPI_STATUSES}
  GROUP BY match_status
)
SELECT match_status, n, n * 100.0 / sum(n) OVER () AS pct FROM kpi"""

KPI_C_SQL = f"""{E.ENGINE_C_CTES},
kpi AS (
  SELECT match_status, CAST(count(*) AS BIGINT) AS n
  FROM ec_final
  WHERE match_status IN {_KPI_STATUSES}
  GROUP BY match_status
)
SELECT match_status, n, n * 100.0 / sum(n) OVER () AS pct FROM kpi"""

KPI_D_SQL = f"""{E.ENGINE_D_CTES},
kpi AS (
  SELECT match_status, CAST(count(*) AS BIGINT) AS n
  FROM ed_final
  WHERE match_status IN {_KPI_STATUSES}
  GROUP BY match_status
)
SELECT match_status, n, n * 100.0 / sum(n) OVER () AS pct FROM kpi"""

#: delta is compared in integer cents: the inputs are 2-decimal money, so
#: round(x*100) sits within 1e-9 of an integer in both engines.
TAXABLE_DELTA_C_SQL = f"""{E.ENGINE_C_CTES}
SELECT CAST(round((suggested_taxable_amt - fed_taxable_amt) * 100) AS BIGINT) AS delta_cents,
       CAST(count(*) AS BIGINT) AS n
FROM ec_final
WHERE suggested_taxable_amt IS NOT NULL AND fed_taxable_amt IS NOT NULL
GROUP BY 1"""


# --- merged multi-engine oracles ---------------------------------------------
#
# Round-5 registry curation: the driver grades ~50 queries in registration
# order, so same-shaped per-engine variants are folded into single UNION
# ALL queries with an ``engine`` discriminator. Every branch is the exact
# SQL its standalone predecessor used (KPI_A_SQL etc., kept above for
# tests/debugging); only the engine literal is new. Unreferenced engine
# tails inside ALL_ENGINES_CTES are never executed (CTEs inline on use).

_KPI_BRANCH = """kpi_{tag} AS (
  SELECT match_status, CAST(count(*) AS BIGINT) AS n
  FROM {src}
  WHERE match_status IN {statuses}
  GROUP BY match_status
)"""

_KPI_SRC = [("a", "ea_out"), ("b", "eb_final"), ("c", "ec_final"), ("d", "ed_final")]

KPI_ALL_SQL = (
    f"{E.ALL_ENGINES_CTES},\n"
    + ",\n".join(
        _KPI_BRANCH.format(tag=t, src=s, statuses=_KPI_STATUSES) for t, s in _KPI_SRC
    )
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT 'engine_{t}' AS engine, match_status, n,"
        f" n * 100.0 / sum(n) OVER () AS pct FROM kpi_{t}"
        for t, _ in _KPI_SRC
    )
)

_MONTHLY_BRANCH = """SELECT 'engine_{tag}' AS engine, month, total_txns, correction_count,
       correction_count / total_txns AS correction_rate
FROM (
  SELECT
    CAST(date_trunc('month', txn_date) AS DATE) AS month,
    CAST(count(*) AS BIGINT) AS total_txns,
    CAST(sum(CASE WHEN match_status = 'match_needs_correction' THEN 1 ELSE 0 END)
         AS BIGINT) AS correction_count
  FROM {src}
  WHERE txn_date IS NOT NULL
  GROUP BY 1
)"""

MONTHLY_ALL_SQL = (
    f"{E.ALL_ENGINES_CTES}\n"
    + _MONTHLY_BRANCH.format(tag="b", src="eb_final")
    + "\nUNION ALL\n"
    + _MONTHLY_BRANCH.format(tag="d", src="ed_final")
)

#: A4 merged: the three frequency histograms in long form — the group key
#: serialized as VARCHAR so BIGINT (lag days / delta cents) and VARCHAR
#: (reason) histograms share one schema.
HISTOGRAMS_ALL_SQL = f"""{E.ALL_ENGINES_CTES}
SELECT 'engine_a_date_lag' AS metric, CAST(date_lag_days AS VARCHAR) AS key,
       CAST(count(*) AS BIGINT) AS n
FROM ea_out GROUP BY 2
UNION ALL
SELECT 'engine_a_reason', correction_reason, CAST(count(*) AS BIGINT)
FROM ea_out GROUP BY 2
UNION ALL
SELECT 'engine_c_taxable_delta_cents',
       CAST(CAST(round((suggested_taxable_amt - fed_taxable_amt) * 100) AS BIGINT) AS VARCHAR),
       CAST(count(*) AS BIGINT)
FROM ec_final
WHERE suggested_taxable_amt IS NOT NULL AND fed_taxable_amt IS NOT NULL
GROUP BY 2"""

_CORR_COLS_A = f"""transaction_id AS "Transaction Id",
  txn_date AS "Transaction Date",
  ssn AS "Participant SSN",
  participant_name AS "Participant Name",
  matrix_account AS "Matrix Account",
  tax_code_1 AS "Current Tax Code 1",
  tax_code_2 AS "Current Tax Code 2",
  {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS "New Tax Code",
  CAST(NULL AS DOUBLE) AS "New Taxable Amount",
  CAST(NULL AS BIGINT) AS "New First Year contrib",
  correction_reason AS "Reason",
  action AS "Action\""""

_CORR_COLS_C = f"""transaction_id AS "Transaction Id",
  txn_date AS "Transaction Date",
  ssn AS "Participant SSN",
  participant_name AS "Participant Name",
  matrix_account AS "Matrix Account",
  tax_code_1 AS "Current Tax Code 1",
  tax_code_2 AS "Current Tax Code 2",
  {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS "New Tax Code",
  CAST(suggested_taxable_amt AS DOUBLE) AS "New Taxable Amount",
  CAST(suggested_first_roth_tax_year AS BIGINT) AS "New First Year contrib",
  correction_reason AS "Reason",
  action AS "Action\""""

_CORR_ALL_SELECT = f"""SELECT 'engine_a' AS engine,
  {_CORR_COLS_A}
FROM ea_out
WHERE match_status IN ('match_needs_correction', 'match_needs_review')
  AND (suggested_tax_code_1 IS NOT NULL OR suggested_tax_code_2 IS NOT NULL)
  AND merge_side = 'both' AND date_within_tolerance
  AND coalesce(action, '') = 'UPDATE_1099'
UNION ALL
SELECT 'engine_c',
  {_CORR_COLS_C}
FROM corr_ec_mat
WHERE match_status IN ('match_needs_correction', 'match_needs_review')
  AND (suggested_tax_code_1 IS NOT NULL OR suggested_tax_code_2 IS NOT NULL
       OR suggested_taxable_amt IS NOT NULL
       OR suggested_first_roth_tax_year IS NOT NULL
       OR coalesce(contains(action, 'INVESTIGATE'), false))
  AND (coalesce(contains(action, 'UPDATE_1099'), false)
       OR coalesce(contains(action, 'INVESTIGATE'), false))"""

CORRECTIONS_ALL_SQL = f"""{E.ALL_ENGINES_CTES},
corr_ec_mat AS MATERIALIZED (SELECT * FROM ec_final)
{_CORR_ALL_SELECT}"""

#: SCD2 replay of applying the corrections deliverable onto a
#: transaction ledger (operators/merge.py scd2_apply). Because every
#: ledger row starts as the key's single OPEN version and every
#: correction is stamped strictly after it (valid_from + 30 days), the
#: generic close-out window collapses to: touched ledger rows close at
#: the correction's effective date, each correction opens a new current
#: version, untouched rows pass through — which is exactly what
#: scd2_apply computes via its (key, valid_from, __src) lead() window.
CORRECTIONS_MERGE_SQL = f"""{E.ALL_ENGINES_CTES},
corr_ec_mat AS MATERIALIZED (SELECT * FROM ec_final),
corr_all AS MATERIALIZED (
{_CORR_ALL_SELECT}
),
upd AS (
  SELECT "Transaction Id" AS transaction_id,
         "New Tax Code" AS tax_code,
         "New Taxable Amount" AS taxable_amt,
         CAST("Transaction Date" + INTERVAL 30 DAY AS DATE) AS effective
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY "Transaction Id"
      ORDER BY engine, "New Tax Code" NULLS FIRST, "Reason" NULLS FIRST,
               "New Taxable Amount" NULLS FIRST,
               "New First Year contrib" NULLS FIRST, "Action" NULLS FIRST,
               "Transaction Date" NULLS FIRST
    ) AS rn
    FROM corr_all WHERE "Transaction Id" IS NOT NULL
  ) WHERE rn = 1
),
ledger AS (
  SELECT transaction_id,
         {E._combined('tax_code_1', 'tax_code_2')} AS tax_code,
         fed_taxable_amt AS taxable_amt,
         txn_date AS valid_from
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY transaction_id ORDER BY src_order, src_seq
    ) AS rn
    FROM matrix_clean WHERE transaction_id IS NOT NULL
  ) WHERE rn = 1
)
SELECT l.transaction_id, l.tax_code, l.taxable_amt, l.valid_from,
       u.effective AS valid_to,
       (u.effective IS NULL) AS is_current
FROM ledger l LEFT JOIN upd u USING (transaction_id)
UNION ALL
SELECT u.transaction_id, u.tax_code, u.taxable_amt, u.effective,
       CAST(NULL AS DATE), true
FROM upd u"""

#: A5 merged: both trend queries as (engine, month, key, n).
TRENDS_ALL_SQL = f"""{E.ALL_ENGINES_CTES},
tr_ec_mat AS MATERIALIZED (SELECT txn_date, correction_reason FROM ec_final),
tr_ec_exploded AS (
  SELECT
    CAST(date_trunc('month', txn_date) AS DATE) AS month,
    unnest(list_filter(
      list_transform(string_split(correction_reason, {NL}),
                     x -> regexp_replace(trim(x), '^-{_WS}*', '')),
      x -> x <> '')) AS reason
  FROM tr_ec_mat
  WHERE txn_date IS NOT NULL AND correction_reason IS NOT NULL
)
SELECT 'engine_a' AS engine, CAST(date_trunc('month', txn_date) AS DATE) AS month,
       correction_reason AS key, CAST(count(*) AS BIGINT) AS n
FROM ea_out
WHERE txn_date IS NOT NULL AND correction_reason IS NOT NULL
GROUP BY 2, 3
UNION ALL
SELECT 'engine_c', month, reason, CAST(count(*) AS BIGINT)
FROM tr_ec_exploded GROUP BY 2, 3"""

#: A6 merged: both crosstabs unpivoted to (engine, row_key, col_key, n) —
#: the explicit pivot domain becomes one UNION branch per domain value,
#: preserving the closed-domain zero-fill semantics of the wide form.
_XTAB_B_BRANCHES = "\nUNION ALL\n".join(
    f"SELECT 'engine_b' AS engine, coalesce(tax_code_1, '(none)') AS row_key,"
    f" '{v}' AS col_key,\n"
    f"  CAST(sum(CASE WHEN (CASE WHEN match_status <> 'match_no_action' THEN eb_reason END)"
    f" = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS n\n"
    f"FROM eb_final GROUP BY 2"
    for v in EB_REASONS
)

_XTAB_C_BRANCHES = "\nUNION ALL\n".join(
    f"SELECT 'engine_c', coalesce(tax_code_1, '(none)'), '{v}',\n"
    f"  CAST(sum(CASE WHEN new_tax_code = '{v}' THEN 1 ELSE 0 END) AS BIGINT)\n"
    f"FROM xt_ec_codes GROUP BY 2"
    for v in EC_NEW_CODES
)

CROSSTAB_ALL_SQL = f"""{E.ALL_ENGINES_CTES},
xt_ec_mat AS MATERIALIZED (SELECT tax_code_1, suggested_tax_code_1, suggested_tax_code_2 FROM ec_final),
xt_ec_codes AS (
  SELECT tax_code_1,
         {E._combined('suggested_tax_code_1', 'suggested_tax_code_2')} AS new_tax_code
  FROM xt_ec_mat
)
{_XTAB_B_BRANCHES}
UNION ALL
{_XTAB_C_BRANCHES}"""


# --- PII-masked export (operators/privacy.py mirror) -------------------------

from ..operators.privacy import DEFAULT_SALT as _PII_SALT  # noqa: E402

#: masked export of the cleaned matrix: SSN partial-display mask, salted
#: md5 pseudonymous token (same version-tagged salt constant as the Spark
#: side, imported so the two renderings cannot drift), initials-only name.
PRIVACY_EXPORT_SQL = f"""{_CLEAN_PRELUDE}
SELECT transaction_id, plan_id,
  CASE WHEN ssn IS NOT NULL THEN 'XXX-XX-' || substr(ssn, 6, 4) END AS ssn_masked,
  CASE WHEN ssn IS NOT NULL THEN md5('{_PII_SALT}' || ':' || ssn) END AS ssn_token,
  CASE WHEN participant_name IS NOT NULL AND length(trim(participant_name)) > 0
       THEN substr(trim(participant_name), 1, 1) || '***' END AS name_masked,
  gross_amt
FROM matrix_clean"""


# --- ordered event funnel (operators/funnel.py mirror) -----------------------

from ..operators.funnel import DEFAULT_FUNNEL_STEPS as _FUNNEL_STEPS  # noqa: E402


def _funnel_sql(steps: tuple[str, ...]) -> str:
    ctes = [
        "ev AS (SELECT user_id, ts, event_type FROM events"
        " WHERE ts IS NOT NULL AND event_type IS NOT NULL)",
        f"s0 AS (SELECT user_id, min(ts) AS t0 FROM ev"
        f" WHERE event_type = '{steps[0]}' GROUP BY 1)",
    ]
    for i, step in enumerate(steps[1:], 1):
        ctes.append(
            f"s{i} AS (SELECT s{i-1}.user_id,"
            f" min(CASE WHEN e.ts >= s{i-1}.t{i-1} THEN e.ts END) AS t{i}"
            f" FROM s{i-1} LEFT JOIN ev e ON e.user_id = s{i-1}.user_id"
            f" AND e.event_type = '{step}' GROUP BY 1)"
        )
    ctes.append(
        "c AS (SELECT "
        + ", ".join(f"(SELECT count(t{i}) FROM s{i}) AS n{i}" for i in range(len(steps)))
        + ")"
    )
    rows = [
        f"SELECT 0 AS step_idx, '{steps[0]}' AS step, n0 AS n_users,"
        " CAST(1000000 AS BIGINT) AS conversion_micros FROM c"
    ]
    for i, step in enumerate(steps[1:], 1):
        rows.append(
            f"SELECT {i}, '{step}', n{i}, CASE WHEN n{i-1} > 0 THEN"
            f" CAST(round(CAST(n{i} AS DOUBLE) / n{i-1} * 1000000) AS BIGINT) END FROM c"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(rows)


#: ordered funnel over events (unbounded window, min-reach-time
#: semantics): same step list as the Spark side, imported so the two
#: renderings cannot drift.
FUNNEL_SQL = _funnel_sql(_FUNNEL_STEPS)


#: cohort retention triangle (operators/funnel.py cohort_retention):
#: users bucketed by first-activity day, counted per later active day
#: (daily cohorts — the test events span one month).
COHORT_RETENTION_SQL = """WITH ev AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL
),
fs AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1)
SELECT fs.cohort_day,
       CAST(datediff('day', fs.cohort_day, ev.d) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ev JOIN fs USING (user_id)
GROUP BY 1, 2"""
