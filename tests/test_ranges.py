"""Bucketized range join: boundary semantics and bucket-spanning."""

from pyspark.sql import functions as F

from recon_spark.operators import ranges

W = 1_000  # bucket width for tests


def test_range_join_boundaries(spark):
    """Points at lo (inclusive), hi-1 (inclusive), hi (exclusive), and in
    a different bucket than the anchor all behave per [lo, hi)."""
    left = spark.createDataFrame(
        [("k", 10, 2_500, 4_500)], "k string, row_id long, lo long, hi long"
    )
    right = spark.createDataFrame(
        [("k", 2_500), ("k", 4_499), ("k", 4_500), ("k", 2_499), ("k", 3_100)],
        "k string, ts long",
    )
    got = sorted(
        r.ts
        for r in ranges.range_join_bucketed(
            left, right, ["k"], "lo", "hi", "ts", W
        ).collect()
    )
    assert got == [2_500, 3_100, 4_499]


def test_range_join_interval_spans_buckets(spark):
    """An interval wider than the bucket explodes to every overlapped
    bucket and still matches points in each."""
    left = spark.createDataFrame([("k", 0, 5_000)], "k string, lo long, hi long")
    right = spark.createDataFrame(
        [("k", ts) for ts in (0, 999, 1_000, 2_500, 4_999, 5_000)],
        "k string, ts long",
    )
    got = sorted(
        r.ts
        for r in ranges.range_join_bucketed(
            left, right, ["k"], "lo", "hi", "ts", W
        ).collect()
    )
    assert got == [0, 999, 1_000, 2_500, 4_999]


def test_lookback_agg_zero_and_self_exclusion(spark):
    anchors = spark.createDataFrame(
        [(1, "u", 10_000), (2, "u", 25_000), (3, "v", 10_000)],
        "event_id long, user_id string, ts_us long",
    )
    points = spark.createDataFrame(
        [("u", 10_000, 100), ("u", 9_000, 10), ("u", 24_999, 1)],
        "user_id string, ts_us long, value_micros long",
    )
    out = {
        r.event_id: r
        for r in ranges.lookback_agg(
            anchors, points, ["user_id"], window_us=20_000,
            value_micros_col="value_micros",
        ).collect()
    }
    # anchor 1: point at its own ts excluded (strict <); 9_000 included
    assert (out[1].n_prior, out[1].prior_value_micros) == (1, 10)
    # anchor 2: [5_000, 25_000) -> 10_000, 9_000, 24_999
    assert (out[2].n_prior, out[2].prior_value_micros) == (3, 111)
    # anchor 3: no points for key v -> n 0, sum null (SQL SUM semantics)
    assert (out[3].n_prior, out[3].prior_value_micros) == (0, None)
