"""V1-V6 validator tests (reference: tests/validators/test_validators.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recon_spark.functions import validators as V
from tests.test_normalizers import one


def test_ssn_valid(spark):
    assert one(spark, V.ssn_valid("x"), x="123456780") is True
    for bad in ["000000000", "999999999", "012345678", "123456789",
                "000345678", "666345678", "923456780", "12345678", None]:
        assert one(spark, V.ssn_valid("x"), x=bad) is False, bad


def test_amounts_valid_gross_only(spark):
    assert one(spark, V.amounts_valid("g"), g="100.0") is True
    assert one(spark, V.amounts_valid("g"), g="-5") is False
    assert one(spark, V.amounts_valid("g"), g="10000001") is False
    assert one(spark, V.amounts_valid("g"), g=None) is False


def test_amounts_valid_negative_ok_when_correction(spark):
    expr = V.amounts_valid("g", is_correction=F.lit(True))
    assert one(spark, expr, g="-5") is True


def test_amounts_valid_taxable_bounds(spark):
    expr = V.amounts_valid("g", "t")
    assert one(spark, expr, g="100", t="50") is True
    assert one(spark, expr, g="100", t="150") is False
    assert one(spark, expr, g="100", t="-1") is False
    assert one(spark, expr, g="100", t=None) is False


def test_dates_valid(spark):
    expr = V.dates_valid("d", today="2026-01-15")
    assert one(spark, expr, d="2025-06-30") is True
    assert one(spark, expr, d="2026-02-01") is False  # future
    assert one(spark, expr, d="1989-12-31") is False  # before 1990
    assert one(spark, expr, d="2051-01-01") is False
    assert one(spark, expr, d=None) is False


def test_dates_valid_pay_date_window(spark):
    expr = V.dates_valid("d", "p", today="2026-01-15")
    assert one(spark, expr, d="2025-06-01", p="2025-06-10") is True
    assert one(spark, expr, d="2025-06-01", p="2025-04-01") is False  # p < d-30
    assert one(spark, expr, d="2025-06-01", p="2026-03-01") is False  # p > today+30


def test_code_1099r_valid(spark):
    for good in ["1", "2", "4", "7", "8", "B", "G", "H", "L", "P", "Q", "b "]:
        assert one(spark, V.code_1099r_valid("x"), x=good) is True, good
    for bad in ["0", "ZZ", "11", "", None]:
        assert one(spark, V.code_1099r_valid("x"), x=bad) is False, bad


def test_cross_field_issues(spark):
    expr = V.cross_field_issues("g", "t", "c")
    assert one(spark, expr, g="100", t="20", c="G") == ["cross_code_g_taxable_over_10pct"]
    assert one(spark, expr, g="100", t="200", c="7") == ["cross_taxable_exceeds_gross_150pct"]
    assert one(spark, expr, g="100", t="200", c="G") == [
        "cross_code_g_taxable_over_10pct",
        "cross_taxable_exceeds_gross_150pct",
    ]
    assert one(spark, expr, g="100", t="50", c="7") == []


def test_cross_field_age_rule(spark):
    expr = V.cross_field_issues("g", "t", "c", age="a")
    assert one(spark, expr, g="100", t="0", c="1", a="60") == ["cross_code1_age_over_59_5"]
    assert one(spark, expr, g="100", t="0", c="1", a="50") == []


def test_validation_issues_assembly(spark):
    expr = V.validation_issues(
        F.col("s"), F.col("a"), F.col("d"), F.col("c"),
        cross_issues=V.cross_field_issues("g", "t", "code"),
    )
    got = one(
        spark, expr,
        _schema="s boolean, a boolean, d boolean, c boolean, g string, t string, code string",
        s=False, a=True, d=False, c=None, g="100", t="200", code="7",
    )
    assert got == ["ssn_invalid", "date_invalid", "cross_taxable_exceeds_gross_150pct"]


def test_validation_issues_null_flags_not_flagged(spark):
    expr = V.validation_issues(F.col("s"), F.col("a"), F.col("d"), F.col("c"))
    got = one(
        spark, expr,
        _schema="s boolean, a boolean, d boolean, c boolean",
        s=True, a=None, d=True, c=True,
    )
    assert got == []
