"""Scalar-expression SQL builders (DuckDB dialect) mirroring
recon_spark.functions.normalizers / validators.

Dialect notes vs Spark SQL:
- ``regexp_replace`` needs the ``'g'`` flag for replace-all
- ``date_diff('day', start, end)`` vs Spark ``datediff(end, start)``
- ``date + INTERVAL n MONTH`` returns TIMESTAMP -> cast back to DATE
- integer ``/`` is float division (unused; we only use ``%``)
"""

from __future__ import annotations

from typing import Sequence

from ..functions import normalizers as _N


def lit(v: str | None) -> str:
    if v is None:
        return "NULL"
    return "'" + v.replace("'", "''") + "'"


def pick(key: str, values: Sequence[str | None]) -> str:
    """values[key % n] as a CASE expression (mirror of fixtures.pick)."""
    whens = " ".join(f"WHEN {i} THEN {lit(v)}" for i, v in enumerate(values))
    return f"(CASE ({key}) % {len(values)} {whens} END)"


def s(col: str) -> str:
    return f"CAST({col} AS VARCHAR)"


# --- normalizers ------------------------------------------------------------

def norm_ssn(col: str) -> str:
    num = f"TRY_CAST({col} AS DOUBLE)"
    num_digits = (
        f"(CASE WHEN {num} IS NOT NULL AND {num} = floor({num}) AND {num} >= 0 "
        f"AND {num} < 1e15 THEN CAST(CAST({num} AS BIGINT) AS VARCHAR) END)"
    )
    str_digits = rf"regexp_replace(regexp_replace(trim({s(col)}), '\.0$', ''), '[^0-9]', '', 'g')"
    digits = f"coalesce({num_digits}, {str_digits})"
    return (
        f"(CASE WHEN length({digits}) BETWEEN 1 AND 9 THEN lpad({digits}, 9, '0') END)"
    )


def norm_plan_id(col: str) -> str:
    return f"trim({s(col)})"


def to_date_safe(col: str) -> str:
    # ISO gate shared with normalizers.to_date_safe (see DATE_GATE_RE
    # there): outside it both engines NULL by construction
    t = f"trim({s(col)})"
    return (
        f"CAST(CASE WHEN regexp_matches({t}, '{_N.DATE_GATE_RE}')"
        f" THEN TRY_CAST({t} AS TIMESTAMP) END AS DATE)"
    )


def to_double_safe(col: str) -> str:
    return f"TRY_CAST({s(col)} AS DOUBLE)"


def to_long_safe(col: str) -> str:
    # trunc-toward-zero + TRY on the narrowing step == Spark's
    # try_cast(double) -> try_cast(long) (inf / out-of-range -> NULL,
    # fractions truncate; DuckDB's bare CAST would round half-even and
    # ERROR on inf)
    return f"TRY_CAST(trunc(TRY_CAST({s(col)} AS DOUBLE)) AS BIGINT)"


def norm_text(col: str, *, upper: bool = False) -> str:
    out = f"trim({s(col)})"
    return f"upper({out})" if upper else out


def norm_tax_code(col: str) -> str:
    # single-source whitespace class (== Java \s; RE2 \s excludes U+000B):
    # interpolated from functions/normalizers.WS so the two engines'
    # renderings cannot drift (r13 review — real control chars inside an
    # RE2 class literal are verified equivalent to the \t-escape form)
    return rf"nullif(upper(regexp_extract({s(col)}, '^{_N.WS}*([A-Za-z0-9]{{1,2}})', 1)), '')"


def norm_compact_upper(col: str) -> str:
    return rf"replace(regexp_replace(upper(trim({s(col)})), '{_N.WS}+', '', 'g'), '-', '')"


def norm_space_lower(col: str) -> str:
    return rf"lower(regexp_replace(trim({s(col)}), '{_N.WS}+', ' ', 'g'))"


def norm_transaction_id(col: str) -> str:
    t = f"trim({s(col)})"
    digits = f"regexp_replace({t}, '[^0-9]', '', 'g')"
    return rf"""(CASE
        WHEN {t} IS NULL OR {t} = '' THEN NULL
        WHEN regexp_matches({t}, '^\d+\.0+$') THEN regexp_extract({t}, '^(\d+)\.0+$', 1)
        WHEN regexp_matches({t}, '^\d+$') THEN {t}
        WHEN regexp_matches({t}, '[A-Za-z]') THEN NULL
        WHEN {digits} = '' THEN NULL
        ELSE {digits} END)"""


def full_name(first: str, last: str) -> str:
    return (
        f"nullif(trim(coalesce(trim({s(first)}), '') || ' ' || coalesce(trim({s(last)}), '')), '')"
    )


def classify_dist_name(col: str) -> str:
    d = f"lower(trim({s(col)}))"
    return f"""(CASE
        WHEN {d} IS NULL THEN 'other'
        WHEN {d} LIKE '%rollover%' AND {d} LIKE '%partial%' THEN 'partial_rollover'
        WHEN {d} LIKE '%rollover%' THEN 'rollover'
        WHEN {d} LIKE '%rmd%' THEN 'rmd'
        WHEN ({d} LIKE '%partial%' AND {d} LIKE '%liquidation%') OR {d} LIKE '%recurring%' THEN 'partial_cash'
        WHEN {d} LIKE '%liquidation%' AND {d} LIKE '%full%' THEN 'final_cash'
        ELSE 'other' END)"""


def combined_tax_code(s1: str, s2: str) -> str:
    a = f"nullif(upper(trim({s(s1)})), '')"
    b = f"nullif(upper(trim({s(s2)})), '')"
    return (
        f"(CASE WHEN {a} IS NOT NULL AND {b} IS NULL THEN {a} "
        f"WHEN {a} IS NOT NULL AND {b} IS NOT NULL THEN {a} || {b} END)"
    )


def attained_age_by_year_end(dob: str, year: str, years: int, months: int = 0) -> str:
    total = years * 12 + months
    return (
        f"coalesce(CAST(CAST({dob} AS DATE) + INTERVAL {total} MONTH AS DATE)"
        f" <= make_date(CAST({year} AS INT), 12, 31), false)"
    )


# --- validators -------------------------------------------------------------

def ssn_valid(col: str) -> str:
    t = f"trim({s(col)})"
    return (
        f"coalesce(regexp_matches({t}, '^[0-9]{{9}}$')"
        f" AND {t} NOT IN ('000000000','999999999','012345678','123456789')"
        f" AND substr({t}, 1, 3) NOT IN ('000','666')"
        f" AND substr({t}, 1, 1) <> '9', false)"
    )


def amounts_valid(gross: str, taxable: str | None = None) -> str:
    g = to_double_safe(gross)
    cond = f"{g} IS NOT NULL AND NOT ({g} < 0) AND abs({g}) <= 10000000.0"
    if taxable is not None:
        t = to_double_safe(taxable)
        cond += f" AND {t} IS NOT NULL AND {t} >= 0 AND {t} <= {g}"
    return f"coalesce({cond}, false)"


def dates_valid(col: str, today: str) -> str:
    d = f"CAST({col} AS DATE)"
    return (
        f"coalesce({d} IS NOT NULL AND year({d}) BETWEEN 1990 AND 2050"
        f" AND {d} <= DATE '{today}', false)"
    )


def code_1099r_valid(col: str) -> str:
    c = f"upper(trim({s(col)}))"
    return (
        f"coalesce({c} IN ('1','2','4','7','8','B','G','H','L','P','Q'), false)"
    )


def validation_issues_joined(
    ssn_ok: str,
    amount_ok: str,
    date_ok: str,
    code_ok: str,
    cross_tokens: Sequence[tuple[str, str]] = (),
) -> str:
    """';'-joined issue list (order: ssn, amount, date, code, cross...)."""
    elems = [
        f"CASE WHEN ({ssn_ok}) = false THEN 'ssn_invalid' END",
        f"CASE WHEN ({amount_ok}) = false THEN 'amount_invalid' END",
        f"CASE WHEN ({date_ok}) = false THEN 'date_invalid' END",
        f"CASE WHEN ({code_ok}) = false THEN 'code_1099r_invalid' END",
    ]
    elems += [f"CASE WHEN ({mask}) THEN {lit(tok)} END" for mask, tok in cross_tokens]
    arr = "[" + ", ".join(elems) + "]"
    # DuckDB's array_to_string yields NULL for an empty list; Spark's
    # array_join yields '' — coalesce so the serializations agree.
    return f"coalesce(array_to_string(list_filter({arr}, x -> x IS NOT NULL), ';'), '')"


def cross_tokens_matrix(gross: str, taxable: str, code: str) -> list[tuple[str, str]]:
    g, t = to_double_safe(gross), to_double_safe(taxable)
    c = f"upper(trim({s(code)}))"
    has = f"{g} IS NOT NULL AND {t} IS NOT NULL"
    return [
        (
            f"coalesce({has} AND {c} = 'G' AND {t} > {g} * 0.1, false)",
            "cross_code_g_taxable_over_10pct",
        ),
        (
            f"coalesce({has} AND {t} > {g} * 1.5, false)",
            "cross_taxable_exceeds_gross_150pct",
        ),
    ]
