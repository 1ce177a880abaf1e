"""Stream-stream interval join: streaming emission equals the batch plan."""

from pyspark.sql import functions as F

from recon_spark.sources.tpch import load_events
from recon_spark.streaming import joins

SF_DIR = "/root/testdata/sf0.001"


def test_stream_stream_join_matches_batch(spark):
    ev = load_events(spark, SF_DIR).filter(F.col("ts").isNotNull())
    batch = {
        (r.click_id, r.purchase_id): r
        for r in joins.click_purchase_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    streamed = {
        (r.click_id, r.purchase_id): r
        for r in joins.run_to_memory(spark, SF_DIR, name="t_ssjoin").collect()
    }
    assert len(streamed) == len(batch) > 0
    for key, srow in streamed.items():
        brow = batch[key]
        assert (srow.click_us, srow.purchase_us, srow.purchase_value_micros) == (
            brow.click_us,
            brow.purchase_us,
            brow.purchase_value_micros,
        )


def test_interval_bound_is_half_open(spark):
    US = 1_000_000
    clicks = spark.createDataFrame(
        [(1, "u", 100 * US)], "event_id long, user_id string, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    purchases = spark.createDataFrame(
        [
            (10, "u", 100 * US, 1.0),   # equal ts -> excluded (strict <)
            (11, "u", 99 * US, 2.0),    # inside
            (12, "u", 40 * US, 3.0),    # window edge: 100s - 60s = 40s, inclusive
            (13, "u", 39 * US, 4.0),    # before window
        ],
        "event_id long, user_id string, us long, value double",
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"), "value")
    got = sorted(
        r.purchase_id
        for r in joins.click_purchase_join(
            clicks, purchases, window="60 seconds"
        ).collect()
    )
    assert got == [11, 12]


def test_approx_distinct_within_tolerance(spark):
    """The 100 TB swap-in for analytics_user_reach: HLL sketch within 5%
    of the exact distinct count per event_type."""
    ev = load_events(spark, SF_DIR).filter(F.col("ts").isNotNull())
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact)
