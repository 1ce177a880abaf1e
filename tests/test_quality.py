"""Tests for plans.quality: S2 schema guard, J5/D5 coverage, V7 metrics."""

import pytest

from recon_spark.plans import quality as Q


def test_validate_columns_passes(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    Q.validate_columns(df, ["id", "name"], "T")  # no raise


def test_validate_columns_missing_raises(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match=r"T: missing required columns: \['name'\]"):
        Q.validate_columns(df, ["id", "name"], "T")


def test_distinct_keys(spark):
    df = spark.createDataFrame([(1, "a", 9), (1, "a", 8), (2, "b", 7)], ["k1", "k2", "v"])
    out = Q.distinct_keys(df, ["k1", "k2"])
    assert out.columns == ["k1", "k2"]
    assert out.count() == 2


def test_join_coverage(spark):
    left = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["k"])
    right = spark.createDataFrame([(1,), (1,), (3,)], ["k"])
    row = Q.join_coverage(left, right, ["k"]).collect()[0]
    assert row.n_left == 4
    assert row.n_matched == 2
    assert row.coverage_ratio == pytest.approx(0.5)


def test_warning_metrics(spark):
    relius = spark.createDataFrame(
        [("123456789", "7"), ("12345", "ABC"), (None, None)],
        ["ssn", "dist_code_1"],
    )
    matrix = spark.createDataFrame(
        [("987654321", "G", "XYZ9")],
        ["ssn", "tax_code_1", "tax_code_2"],
    )
    rows = {
        (r.source, r.metric): r.n
        for r in Q.build_warning_metrics(relius, matrix).collect()
    }
    assert rows[("relius", "invalid_ssn")] == 2  # short + null
    assert rows[("relius", "code_over_2_chars")] == 1  # 'ABC'
    assert rows[("matrix", "invalid_ssn")] == 0
    assert rows[("matrix", "code_over_2_chars")] == 1  # 'XYZ9' in code 2


def test_demo_coverage_warning(spark):
    matrix = spark.createDataFrame(
        [("P1", "111111111", "G", None), ("P1", "222222222", "G", None),
         ("P2", "111111111", "G", None)],
        "plan_id string, ssn string, tax_code_1 string, tax_code_2 string",
    )
    demo = spark.createDataFrame(
        [("P1", "111111111"), ("P1", "111111111")],  # dup demo rows collapse
        ["plan_id", "ssn"],
    )
    row = Q.build_demo_coverage_warning(matrix, demo).collect()[0]
    assert (row.source, row.metric, row.n) == ("engine_b", "matrix_rows_missing_demo", 2)
    # and via the combined frame
    relius = spark.createDataFrame([("123456789", "7")], ["ssn", "dist_code_1"])
    rows = {
        (r.source, r.metric): r.n
        for r in Q.build_warning_metrics(relius, matrix, demo).collect()
    }
    assert rows[("engine_b", "matrix_rows_missing_demo")] == 2


def test_observe_warnings(spark):
    df = spark.createDataFrame(
        [("123456789", "7"), ("12", "LONGCODE")], ["ssn", "dist_code_1"]
    )
    observed, obs = Q.observe_warnings(df, "dist_code_1")
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["invalid_ssn"] == 1
    assert obs.get["code_over_2_chars"] == 1
