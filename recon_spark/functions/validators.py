"""Data-quality validation predicates (SURVEY.md §2.8, V1-V6) as Column
expressions. Reference: /root/reference/src/core/validators.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .normalizers import _c, to_double_safe

#: Valid 1099-R box-7 codes (src/core/validators.py:41-53)
VALID_1099R_CODES = ["1", "2", "4", "7", "8", "B", "G", "H", "L", "P", "Q"]

SSN_BLOCKLIST = ["000000000", "999999999", "012345678", "123456789"]


# --- V1: SSN validity (src/core/validators.py:188-205) ----------------------

def ssn_valid(col: Column | str) -> Column:
    """9 digits, not a blocklisted value, area not 000/666/9xx.

    Boolean, never NULL (missing -> False), matching the reference's
    ``validate_ssn`` which returns False for NA.
    """
    s = F.trim(_c(col).cast("string"))
    area = F.substring(s, 1, 3)
    ok = (
        s.rlike(r"^[0-9]{9}$")
        & ~s.isin(SSN_BLOCKLIST)
        & ~area.isin("000", "666")
        & ~area.startswith("9")
    )
    return F.coalesce(ok, F.lit(False))


# --- V2: amount validity (src/core/validators.py:244-274) -------------------

def amounts_valid(
    gross: Column | str,
    taxable: Column | str | None = None,
    fed_withhold: Column | str | None = None,
    *,
    is_correction: Column | None = None,
) -> Column:
    """Vectorized amount rules. NOTE reference parity: the series form
    (src/core/validators.py:244-274) requires taxable/withhold to be
    non-null when those series are supplied (NULL -> invalid), and boolean
    NULL propagation mirrors pandas' masked-and semantics."""
    g = to_double_safe(gross)
    correction = is_correction if is_correction is not None else F.lit(False)
    valid = g.isNotNull()
    valid = valid & (~(g < 0) | F.coalesce(correction, F.lit(False)))
    valid = valid & (F.abs(g) <= F.lit(10_000_000.0))
    if taxable is not None:
        t = to_double_safe(taxable)
        valid = valid & t.isNotNull() & (t >= 0) & (t <= g)
    if fed_withhold is not None:
        w = to_double_safe(fed_withhold)
        valid = valid & w.isNotNull() & (w <= g)
    return F.coalesce(valid, F.lit(False))


# --- V3: date validity (src/core/validators.py:305-329) ---------------------

def dates_valid(
    dist_date: Column | str,
    pay_date: Column | str | None = None,
    *,
    today: str,
) -> Column:
    """Date sanity rules. ``today`` is injected (ISO string) for determinism
    (the reference takes a ``today`` parameter at
    src/core/validators.py:309)."""
    d = _c(dist_date).cast("date")
    p = _c(pay_date).cast("date") if pay_date is not None else d
    today_d = F.lit(today).cast("date")
    valid = (
        d.isNotNull()
        & F.year(d).between(1990, 2050)
        & (d <= today_d)
        & p.isNotNull()
        & (p <= F.date_add(today_d, 30))
        & (p >= F.date_sub(d, 30))
    )
    return F.coalesce(valid, F.lit(False))


# --- V4: 1099-R code validity (src/core/validators.py:332-345) --------------

def code_1099r_valid(col: Column | str) -> Column:
    code = F.upper(F.trim(_c(col).cast("string")))
    return F.coalesce(code.isin(VALID_1099R_CODES), F.lit(False))


# --- V5: cross-field rules (src/core/validators.py:371-400) -----------------

def cross_field_issues(
    gross: Column | str,
    taxable: Column | str,
    code: Column | str,
    *,
    age: Column | str | None = None,
) -> Column:
    """Ordered issue-token array (may be empty, never NULL)."""
    g = to_double_safe(gross)
    t = to_double_safe(taxable)
    c = F.upper(F.trim(_c(code).cast("string")))
    has_amounts = g.isNotNull() & t.isNotNull()
    pairs = [
        (
            F.coalesce(has_amounts & (c == "G") & (t > g * 0.1), F.lit(False)),
            "cross_code_g_taxable_over_10pct",
        ),
        (
            F.coalesce(has_amounts & (t > g * 1.5), F.lit(False)),
            "cross_taxable_exceeds_gross_150pct",
        ),
    ]
    if age is not None:
        a = to_double_safe(age)
        pairs.append(
            (
                F.coalesce((c == "1") & a.isNotNull() & (a >= 59.5), F.lit(False)),
                "cross_code1_age_over_59_5",
            )
        )
    return F.array_compact(F.array(*[F.when(m, F.lit(tok)) for m, tok in pairs]))


# --- V6: issue-list assembly (src/core/validators.py:403-433) ---------------

def validation_issues(
    ssn_ok: Column,
    amount_ok: Column,
    date_ok: Column,
    code_ok: Column,
    *,
    cross_issues: Column | None = None,
) -> Column:
    """Per-row token array from the four flags plus cross-field issues."""
    flags = F.array_compact(
        F.array(
            F.when(ssn_ok == F.lit(False), F.lit("ssn_invalid")),
            F.when(amount_ok == F.lit(False), F.lit("amount_invalid")),
            F.when(date_ok == F.lit(False), F.lit("date_invalid")),
            F.when(code_ok == F.lit(False), F.lit("code_1099r_invalid")),
        )
    )
    if cross_issues is not None:
        flags = F.concat(flags, F.coalesce(cross_issues, F.array()))
    return flags
