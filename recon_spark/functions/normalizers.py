"""Scalar normalizers (SURVEY.md §2.7, C1-C21) as pure Column expressions.

Every function takes/returns ``pyspark.sql.Column`` so the whole library
stays inside Catalyst/Tungsten codegen — no Python UDFs anywhere (the
reference's four ``Series.map`` call sites are all regex/conditional logic,
fully expressible as column expressions).

Reference parity targets are cited per function as
``/root/reference/<file>:<line>`` (behavior only; this is a new
implementation on the Spark Column algebra).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: explicit ASCII whitespace class — exactly what Java regex ``\s``
#: matches. NEVER write ``\s`` in a regex that has a DuckDB oracle
#: twin: RE2's ``\s`` excludes vertical tab U+000B, so the two engines
#: would disagree on text containing one (ADVICE r12 / r13 review; the
#: oracle renderings embed this same literal class).
WS = "[ \t\n\x0B\f\r]"


# --- C1: SSN normalization (src/core/normalizers.py:59-101) -----------------

def norm_ssn(col: Column | str) -> Column:
    """Normalize SSN-ish input to a 9-digit string, else NULL.

    Semantics (src/core/normalizers.py:59-95): integral numerics (incl. a
    DOUBLE-typed column, which would otherwise stringify in scientific
    notation) format as plain digits; strings are trimmed, a trailing
    ``.0`` float artifact stripped, non-digits dropped; the digits are
    left-padded to 9; anything not landing on 1..9 digits becomes NULL.
    """
    c = _c(col)
    num = c.try_cast("double")
    num_digits = F.when(
        num.isNotNull() & (num == F.floor(num)) & (num >= 0) & (num < 1e15),
        num.cast("bigint").cast("string"),
    )
    s = F.regexp_replace(F.trim(c.cast("string")), r"\.0$", "")
    str_digits = F.regexp_replace(s, r"[^0-9]", "")
    digits = F.coalesce(num_digits, str_digits)
    return F.when(F.length(digits).between(1, 9), F.lpad(digits, 9, "0"))


# --- C2: plan-id normalize (src/core/normalizers.py:103-111) ----------------

def norm_plan_id(col: Column | str) -> Column:
    return F.trim(_c(col).cast("string"))


# --- C3: date parse with NULL on failure (src/core/normalizers.py:114-124) --

#: ISO-shaped gate shared verbatim with the DuckDB mirror (Java + RE2
#: common syntax). Outside the gate both engines return NULL by
#: construction; inside it, both ISO parsers agree (and both try-NULL
#: invalid calendar dates). Without the gate the engines' lenient
#: parsers diverge on junk — Spark's try_to_timestamp reads a bare
#: '12345' as year 12345 while DuckDB rejects it (found by
#: tests/test_differential_fuzz.py).
DATE_GATE_RE = r"^[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}([ T].*)?$"


def to_date_safe(col: Column | str) -> Column:
    """``pd.to_datetime(errors='coerce').dt.date`` equivalent for
    ISO-shaped input (the canonical rendering of every date column in
    this engine); anything else -> NULL, identically in both engines.
    """
    s = F.trim(_c(col).cast("string"))
    return F.when(s.rlike(DATE_GATE_RE), F.try_to_timestamp(s)).cast("date")


# --- C4: year extract (src/core/normalizers.py:152-156) ---------------------

def year_of(col: Column | str) -> Column:
    return F.year(_c(col)).cast("long")


# --- C5: year-end age attainment (src/core/normalizers.py:159-181) ----------

def attained_age_by_year_end(
    dob: Column | str, year: Column | str, *, years: int, months: int = 0
) -> Column:
    """True iff ``dob + years + months <= Dec-31(year)``; False when either
    side is missing (src/core/normalizers.py:178-181 defaults to False).
    """
    dob_c = _c(dob).cast("date")
    year_c = _c(year).cast("int")
    threshold = F.add_months(dob_c, years * 12 + months)
    year_end = F.make_date(year_c, F.lit(12), F.lit(31))
    return F.coalesce(threshold <= year_end, F.lit(False))


# --- C6/C7: numeric coercion (src/core/normalizers.py:183-194) --------------

def to_double_safe(col: Column | str) -> Column:
    return _c(col).cast("string").try_cast("double")


def to_long_safe(col: Column | str) -> Column:
    """Numeric coerce then truncate-toward-zero to integer, NULL-
    preserving (Int64). try_cast (not cast) on the narrowing step so
    infinities and out-of-long-range doubles become NULL — the plain
    cast SATURATES to Long.MaxValue under non-ANSI mode, which the
    DuckDB mirror (TRY_CAST(trunc(..))) cannot reproduce (found by
    tests/test_differential_fuzz.py)."""
    return _c(col).cast("string").try_cast("double").try_cast("long")


# --- C8: text normalize (src/core/normalizers.py:197-214) -------------------

def norm_text(col: Column | str, *, strip: bool = True, upper: bool = False) -> Column:
    c = _c(col).cast("string")
    if strip:
        c = F.trim(c)
    if upper:
        c = F.upper(c)
    return c


def norm_state(col: Column | str) -> Column:
    return norm_text(col, strip=True, upper=True)


# --- C9: tax-code extraction (src/core/normalizers.py:217-239) --------------

def norm_tax_code(col: Column | str) -> Column:
    """Leading 1-2 alphanumerics, uppercased ('7 - Normal' -> '7')."""
    extracted = F.regexp_extract(_c(col).cast("string"), rf"^{WS}*([A-Za-z0-9]{{1,2}})", 1)
    return F.nullif(F.upper(extracted), F.lit(""))


# --- C10: compact-upper / space-lower (src/core/normalizers.py:242-260) -----

def norm_compact_upper(col: Column | str) -> Column:
    """strip + upper + remove whitespace and hyphens ('No Tax' -> 'NOTAX')."""
    c = F.upper(F.trim(_c(col).cast("string")))
    return F.regexp_replace(F.regexp_replace(c, WS + "+", ""), "-", "")


def norm_space_lower(col: Column | str) -> Column:
    """strip + collapse whitespace + lower ('Check  Dist ' -> 'check dist')."""
    return F.lower(F.regexp_replace(F.trim(_c(col).cast("string")), WS + "+", " "))


# --- C11: transaction-id normalize (src/cleaning/clean_matrix.py:166-215) ---

def norm_transaction_id(col: Column | str) -> Column:
    """'44324568.0' -> '44324568'; any letters -> NULL; else keep digits."""
    text = F.trim(_c(col).cast("string"))
    float_artifact = F.regexp_extract(text, r"^(\d+)\.0+$", 1)
    all_digits = F.regexp_replace(text, r"[^0-9]", "")
    return (
        F.when(text.isNull() | (text == ""), F.lit(None).cast("string"))
        .when(float_artifact != "", float_artifact)
        .when(text.rlike(r"^\d+$"), text)
        .when(text.rlike("[A-Za-z]"), F.lit(None).cast("string"))
        .when(all_digits == "", F.lit(None).cast("string"))
        .otherwise(all_digits)
    )


# --- C12: full-name synthesis (src/cleaning/clean_relius.py:297-302) --------

def full_name(first: Column | str, last: Column | str) -> Column:
    joined = F.trim(
        F.concat_ws(
            " ",
            F.coalesce(F.trim(_c(first).cast("string")), F.lit("")),
            F.coalesce(F.trim(_c(last).cast("string")), F.lit("")),
        )
    )
    return F.nullif(joined, F.lit(""))


# --- C13: distribution-name classifier (src/cleaning/clean_relius.py:155-195)

def classify_dist_name(col: Column | str) -> Column:
    """Keyword classifier for dist_name -> category.

    Implements the *documented intent* of the reference
    (src/cleaning/clean_relius.py:162-167). The reference source has a
    truthy-literal bug at :189 (``("partial" in text and "liquidation")``)
    that makes any 'partial' string classify as partial_cash; we implement
    ``"partial" and "liquidation" both present, or "recurring" present``.
    Divergence is only observable for text containing 'partial' without
    'liquidation'/'rollover' — documented in tests/test_normalizers.py.
    """
    t = F.lower(F.trim(_c(col).cast("string")))
    has = lambda kw: t.contains(kw)  # noqa: E731
    return (
        F.when(t.isNull(), F.lit("other"))
        .when(has("rollover") & has("partial"), "partial_rollover")
        .when(has("rollover"), "rollover")
        .when(has("rmd"), "rmd")
        .when((has("partial") & has("liquidation")) | has("recurring"), "partial_cash")
        .when(has("liquidation") & has("full"), "final_cash")
        .otherwise("other")
    )


# --- C14: combined tax-code synthesis (src/engines/match_planid.py:415-420) -

def combined_tax_code(s1: Column | str, s2: Column | str) -> Column:
    """new_tax_code = s1 if only s1, s1||s2 if both (after strip/upper/''->NULL)."""
    a = F.nullif(F.upper(F.trim(_c(s1).cast("string"))), F.lit(""))
    b = F.nullif(F.upper(F.trim(_c(s2).cast("string"))), F.lit(""))
    return F.when(a.isNotNull() & b.isNull(), a).when(
        a.isNotNull() & b.isNotNull(), F.concat(a, b)
    )


# --- C15: date lag (src/engines/match_planid.py:354-357) --------------------

def date_lag_days(txn_date: Column | str, exported_date: Column | str) -> Column:
    return F.datediff(_c(txn_date).cast("date"), _c(exported_date).cast("date")).cast("long")


# --- C16: year-difference age (src/core/normalizers.py:327-334) -------------

def age_years(dob: Column | str, asof: Column | str) -> Column:
    return (F.year(_c(asof)) - F.year(_c(dob))).cast("double")


# --- C17: start-year coalesce (src/core/normalizers.py:337-344) -------------

def start_year(first_year: Column | str, initial_year: Column | str) -> Column:
    """First integer-valued of (first_roth_tax_year, roth_initial_contribution_year).

    Non-integer floats are masked before coalescing
    (src/core/normalizers.py:341-342).
    """
    f = to_double_safe(first_year)
    i = to_double_safe(initial_year)
    f_int = F.when(f == F.round(f, 0), f)
    i_int = F.when(i == F.round(i, 0), i)
    return F.coalesce(f_int, i_int).cast("long")


# --- C18: month bucketing (src/visualization/*.py to_period('M')) -----------

def month_bucket(col: Column | str) -> Column:
    return F.date_trunc("month", _c(col)).cast("date")


# --- C19/C20: reason/action list accumulation + rendering -------------------

def conditional_tokens(*pairs: tuple[Column, str]) -> Column:
    """Ordered, de-duplicated token list from (mask, token) pairs.

    Spark-native replacement for the reference's per-row append loop
    (src/core/normalizers.py:347-366): tokens appear in first-trigger
    order, duplicates skipped — array semantics identical to repeated
    ``_append_reason`` calls, but fully vectorized.
    """
    arr = F.array_compact(
        F.array(*[F.when(mask, F.lit(tok)) for mask, tok in pairs])
    )
    # array_distinct preserves first-occurrence order
    return F.array_distinct(arr)

def render_reasons(tokens: Column, *, joiner: str = "\n", bullet: str = "- ") -> Column:
    """Join reason tokens as bulleted lines; NULL when empty
    (src/engines/roth_taxable_analysis.py:412-414)."""
    rendered = F.array_join(F.transform(tokens, lambda t: F.concat(F.lit(bullet), t)), joiner)
    return F.when(F.size(tokens) > 0, rendered)


def render_actions(tokens: Column, *, joiner: str = "\n") -> Column:
    return F.when(F.size(tokens) > 0, F.array_join(tokens, joiner))


# --- C21: reason string split/explode helper --------------------------------

def split_reason_lines(col: Column | str, *, bullet: str = "- ") -> Column:
    """Multi-line reason string -> array of de-bulleted tokens
    (src/visualization/roth_taxable_visualization.py:215-229)."""
    lines = F.split(_c(col).cast("string"), "\n")
    cleaned = F.transform(lines, lambda s: F.regexp_replace(F.trim(s), "^-" + WS + "*", ""))
    return F.filter(cleaned, lambda s: s != "")


# --- plan predicates (src/core/normalizers.py:263-276, 369-396) -------------

def is_roth_plan(
    col: Column | str,
    prefixes: Sequence[str] = ("300005",),
    suffixes: Sequence[str] = ("R",),
    *,
    case_insensitive: bool = False,
    strip: bool = True,
) -> Column:
    c = _c(col).cast("string")
    if strip:
        c = F.trim(c)
    if case_insensitive:
        c = F.upper(c)
        prefixes = [p.upper() for p in prefixes]
        suffixes = [s.upper() for s in suffixes]
    filled = F.coalesce(c, F.lit(""))
    out = F.lit(False)
    for p in prefixes:
        out = out | filled.startswith(p)
    for s in suffixes:
        out = out | filled.endswith(s)
    return out


def is_ira_plan(
    col: Column | str,
    prefixes: Sequence[str] = ("300001", "300005"),
    substrings: Sequence[str] = ("IRA",),
) -> Column:
    filled = F.coalesce(F.upper(F.trim(_c(col).cast("string"))), F.lit(""))
    out = F.lit(False)
    for p in prefixes:
        out = out | filled.startswith(p.upper())
    for s in substrings:
        if s:
            out = out | filled.contains(s.upper())
    return out


# --- action-token helpers (src/core/normalizers.py:279-316) -----------------

def action_tokens(col: Column | str) -> Column:
    """Split a multi-line action string into stripped, uppercased tokens."""
    lines = F.split(_c(col).cast("string"), r"\r?\n")
    cleaned = F.transform(lines, lambda s: F.upper(F.trim(s)))
    return F.filter(cleaned, lambda s: s != "")


def has_action(col: Column | str, token: str) -> Column:
    return F.coalesce(F.array_contains(action_tokens(col), token.upper()), F.lit(False))


# --- F2: date-range + month-set filter (src/core/normalizers.py:127-149) ----

def date_filter_mask(
    col: Column | str,
    *,
    date_start: str | None = None,
    date_end: str | None = None,
    months: Iterable[int] | None = None,
) -> Column:
    """Inclusive [start, end] ∩ month-set mask; NULL dates excluded when any
    filter is active (src/core/normalizers.py:141-149). Returns a literal
    True when no filter is configured (no-op)."""
    if date_start is None and date_end is None and not months:
        return F.lit(True)
    d = _c(col).cast("date")
    mask = d.isNotNull()
    if date_start is not None:
        mask = mask & (d >= F.lit(date_start).cast("date"))
    if date_end is not None:
        mask = mask & (d <= F.lit(date_end).cast("date"))
    if months:
        mask = mask & F.month(d).isin(*[int(m) for m in months])
    return mask
