"""PII masking / pseudonymization — the export-hygiene operators a 1099
pipeline (and any training-data pipeline) needs before data leaves the
trust boundary.

The reference repo ships correction files carrying raw SSNs; a
deployment exporting those files to analysts or into an LLM training
corpus must mask them first. All operators are pure Column expressions
(JVM-side, codegen'd — a 100 TB masked export is a narrow scan->project,
no shuffle):

* ``mask_ssn``       — 9-digit normalized SSN -> ``XXX-XX-1234`` (last 4
  kept, the standard partial-display form).
* ``pseudonymize``   — salted-hash token: deterministic (joins and
  group-bys still work across masked exports sharing the salt) but not
  reversible without the salt.
* ``mask_name``      — first letter + ``***`` (initials-only display).
* ``redact_pii_text``— free-text redaction of SSN / email / US-phone
  shaped substrings with typed placeholders; the regexes are restricted
  to syntax with identical semantics in Java regex (Spark) and RE2
  (DuckDB), so SQL mirrors cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.normalizers import _c

#: version-tagged default salt for pseudonymous tokens. A deployment
#: supplies its own secret salt; determinism across exports requires
#: reusing one salt, rotation severs linkability on purpose.
DEFAULT_SALT = "pseud:v1"

#: free-text PII patterns (Java + RE2 compatible: no backrefs, no
#: lookaround). Order matters: SSN before phone, since a 3-2-4 digit
#: group would otherwise partially match the phone pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"),
]


def mask_ssn(col: Column | str) -> Column:
    """``XXX-XX-1234`` from a cleaned 9-digit SSN (null stays null)."""
    c = _c(col)
    return F.when(c.isNotNull(), F.concat(F.lit("XXX-XX-"), F.substring(c, 6, 4)))


def ssn_last4(col: Column | str) -> Column:
    c = _c(col)
    return F.when(c.isNotNull(), F.substring(c, 6, 4))


def pseudonymize(col: Column | str, salt: str = DEFAULT_SALT) -> Column:
    """Deterministic salted-md5 token (hex string); null stays null."""
    c = _c(col)
    return F.when(c.isNotNull(), F.md5(F.concat(F.lit(salt), F.lit(":"), c)))


def mask_name(col: Column | str) -> Column:
    """First character + ``***`` (e.g. ``J***``); blank/null -> null."""
    c = F.trim(_c(col).cast("string"))
    return F.when(c.isNotNull() & (F.length(c) > 0), F.concat(F.substring(c, 1, 1), F.lit("***")))


def redact_pii_text(col: Column | str) -> Column:
    """Replace SSN / email / phone shaped substrings with ``[SSN]`` /
    ``[EMAIL]`` / ``[PHONE]`` placeholders."""
    out = _c(col).cast("string")
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"[{kind.upper()}]")
    return out


def masked_export(df, *, ssn_col: str = "ssn", name_col: str | None = None, salt: str = DEFAULT_SALT):
    """Append the masked/pseudonymous columns to an export frame:
    ``ssn_masked``, ``ssn_token`` (+ ``name_masked`` when ``name_col``).
    The raw columns are NOT dropped here — the caller selects the final
    export projection (and must leave ``ssn_col`` out of it)."""
    out = df.withColumns(
        {
            "ssn_masked": mask_ssn(ssn_col),
            "ssn_token": pseudonymize(ssn_col, salt),
        }
    )
    if name_col is not None:
        out = out.withColumn("name_masked", mask_name(name_col))
    return out
