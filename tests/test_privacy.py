"""PII masking / pseudonymization (operators/privacy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recon_spark.operators import privacy


def _one(spark, col, **kw):
    (k, v), = kw.items()
    df = spark.createDataFrame([(v,)], f"{k} string")
    return df.select(col.alias("out")).first()["out"]


def test_mask_ssn_partial_display(spark):
    assert _one(spark, privacy.mask_ssn("x"), x="123456789") == "XXX-XX-6789"
    assert _one(spark, privacy.mask_ssn("x"), x=None) is None


def test_pseudonymize_deterministic_and_salted(spark):
    a = _one(spark, privacy.pseudonymize("x"), x="123456789")
    b = _one(spark, privacy.pseudonymize("x"), x="123456789")
    c = _one(spark, privacy.pseudonymize("x", salt="other"), x="123456789")
    assert a == b and len(a) == 32
    assert a != c  # rotation severs linkability
    assert _one(spark, privacy.pseudonymize("x"), x=None) is None


def test_mask_name(spark):
    assert _one(spark, privacy.mask_name("x"), x="  Jane Doe ") == "J***"
    assert _one(spark, privacy.mask_name("x"), x="") is None
    assert _one(spark, privacy.mask_name("x"), x=None) is None


def test_redact_pii_text(spark):
    txt = (
        "call 555-867-5309 or (212) 555-1234, mail bob.smith+tax@example.co.uk, "
        "ssn 123-45-6789 stays out"
    )
    out = _one(spark, privacy.redact_pii_text("x"), x=txt)
    assert "[SSN]" in out and "[EMAIL]" in out and "[PHONE]" in out
    assert "123-45-6789" not in out
    assert "example.co.uk" not in out
    assert "867-5309" not in out
    # non-PII digits survive
    assert _one(spark, privacy.redact_pii_text("x"), x="room 123, year 2025") == (
        "room 123, year 2025"
    )


def test_redact_patterns_match_duckdb_dialect(spark):
    """The free-text patterns are restricted to Java+RE2-common syntax;
    assert DuckDB's regexp_replace produces the identical redaction."""
    import duckdb

    samples = [
        "ssn 123-45-6789 email a_b%x@y-z.io phone (415) 555-0000 end",
        "no pii here, just 1234567890 digits",
        "edge 999-99-9999999 not-an-ssn",  # \b stops the 3-2-4 match early? both engines must agree
    ]
    con = duckdb.connect()
    for s in samples:
        spark_out = _one(spark, privacy.redact_pii_text("x"), x=s)
        duck = s
        for kind, pat in privacy.PII_PATTERNS:
            duck = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [duck, pat, f"[{kind.upper()}]"]
            ).fetchone()[0]
        assert spark_out == duck, (s, spark_out, duck)


def test_masked_export_is_narrow_and_drops_nothing(spark):
    df = spark.createDataFrame(
        [("t1", "p1", "123456789", "Jane Doe", 10.0)],
        "transaction_id string, plan_id string, ssn string, participant_name string, gross_amt double",
    )
    out = privacy.masked_export(df, name_col="participant_name")
    row = out.first()
    assert row["ssn_masked"] == "XXX-XX-6789"
    assert row["name_masked"] == "J***"
    assert len(row["ssn_token"]) == 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan->project, no shuffle
