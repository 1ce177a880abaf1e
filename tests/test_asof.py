"""Backward as-of join: match rule, equal-ts semantics, tolerance."""

from pyspark.sql import functions as F

from recon_spark.operators import asof

US = 1_000_000


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 100 * US),
            (2, "u1", 205 * US),
            (3, "u2", 100 * US),   # no right rows for u2
            (4, "u1", 50 * US),    # before any right row
        ],
        "event_id long, user_id string, us long",
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [
            ("u1", 90 * US, 9.5),
            ("u1", 100 * US, 1.25),  # equal-ts with left event 1
            ("u1", 200 * US, 7.0),
        ],
        "user_id string, us long, value double",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "value")
    return left, right


def test_asof_backward_match_rule(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r
        for r in asof.asof_join_backward(
            left, right, on=["user_id"], value_cols=["value"]
        ).collect()
    }
    # equal timestamp matches (DuckDB ASOF l.ts >= r.ts rule)
    assert out[1].matched_value == 1.25
    # latest at-or-before 205 is 200
    assert out[2].matched_value == 7.0
    # no right rows for the key -> nulls
    assert out[3].matched_ts is None and out[3].matched_value is None
    # left row before every right row -> nulls
    assert out[4].matched_ts is None and out[4].matched_value is None
    # left row count preserved
    assert len(out) == 4


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r
        for r in asof.asof_join_backward(
            left, right, on=["user_id"], value_cols=["value"],
            tolerance_us=5 * US,
        ).collect()
    }
    assert out[1].matched_value == 1.25      # lag 0 <= 5s
    assert out[2].matched_value == 7.0       # lag 5s, inclusive boundary
    assert out[4].matched_value is None
    # tolerance nulls ts and value together
    assert out[3].matched_ts is None
