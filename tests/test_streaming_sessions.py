"""Streaming sessionization: append-mode emission vs the batch rollup."""

from pyspark.sql import functions as F

from recon_spark.sources.tpch import load_events
from recon_spark.streaming import sessions

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_are_prefix_of_batch(spark):
    """availableNow + append emits exactly the sessions the final
    watermark closed; every emitted row must match the batch rollup
    cell-for-cell, and the withheld rows must all end within the
    un-flushed tail (after the max event time watermark)."""
    batch = {
        (r.user_id, r.session_start_us): r
        for r in sessions.sessionize(load_events(spark, SF_DIR)).collect()
    }
    streamed = {
        (r.user_id, r.session_start_us): r
        for r in sessions.run_to_memory(
            spark, SF_DIR, name="t_sessions_stream"
        ).collect()
    }
    assert 0 < len(streamed) <= len(batch)
    for key, srow in streamed.items():
        brow = batch[key]
        assert (srow.session_end_us, srow.n, srow.value_total_micros) == (
            brow.session_end_us,
            brow.n,
            brow.value_total_micros,
        )
    max_us = load_events(spark, SF_DIR).agg(
        F.max(F.unix_micros("ts"))
    ).collect()[0][0]
    withheld = set(batch) - set(streamed)
    for key in withheld:
        # only sessions the watermark (== max event time) hasn't closed
        assert batch[key].session_end_us > max_us


def test_session_boundary_is_strict(spark):
    """Pins Spark's boundary rule the oracle must mirror: an event exactly
    `gap` after the previous one MERGES (<= is inclusive); one microsecond
    beyond starts a new session."""
    gap_us = 3_600 * 1_000_000
    rows = [
        (1, 0, 10.0),
        (1, gap_us, 1.0),          # exactly on the boundary -> merges
        (2, 0, 5.0),
        (2, gap_us + 1, 2.0),      # 1us beyond -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, us long, value double").select(
        "user_id", F.timestamp_micros("us").alias("ts"), "value"
    )
    out = {
        (r.user_id, r.session_start_us): r
        for r in sessions.sessionize(df, gap="1 hour").collect()
    }
    assert len(out) == 3
    assert out[(1, 0)].n == 2
    assert out[(1, 0)].session_end_us == gap_us + gap_us
    assert out[(2, 0)].n == 1
    assert out[(2, gap_us + 1)].n == 1


def test_bucketed_sessionize_matches_plain(spark):
    """The two-phase skew-resistant twin must be VALUE-IDENTICAL to the
    plain session_window rollup — including with a bucket width small
    enough that many sessions split across bucket edges (the worst case
    for the phase-2 interval merge), and with an exact-boundary event
    (inclusive-merge semantics) landing right at a bucket edge."""

    def rows_of(df):
        return sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n,
             r.value_total_micros)
            for r in df.collect()
        )

    ev = load_events(spark, SF_DIR)
    plain = rows_of(sessions.sessionize(ev))
    assert plain == rows_of(sessions.sessionize_bucketed(ev))
    # stress: 12h buckets vs the 8h gap — nearly every session risks a
    # boundary split, phase 2 must stitch them all back
    assert plain == rows_of(sessions.sessionize_bucketed(ev, bucket="12 hours"))

    # synthetic exact-boundary chain: events 8h apart merge (inclusive),
    # and one lands exactly on a 1-day bucket edge
    synth = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", 1.0),
            (1, "2024-01-01 16:00:00", 1.0),
            (1, "2024-01-02 00:00:00", 1.0),  # bucket edge, still merges
            (1, "2024-01-03 00:00:00", 1.0),  # > gap later: new session
            (2, "2024-01-01 23:59:59", 2.0),
            (2, "2024-01-02 00:00:01", 2.0),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    assert rows_of(sessions.sessionize(synth)) == rows_of(
        sessions.sessionize_bucketed(synth, bucket="1 day")
    )


def test_bucketed_sessionize_rejects_bucket_not_above_gap(spark):
    import pytest

    ev = load_events(spark, SF_DIR)
    with pytest.raises(ValueError):
        sessions.sessionize_bucketed(ev, gap="8 hours", bucket="8 hours")


def test_bucketed_sessionize_randomized_parity(spark):
    """Seeded randomized differential check (the same discipline as
    tests/test_differential_fuzz.py): random event sets with many users,
    timestamps clustered AND dispersed around bucket edges, several
    gap/bucket combinations — plain and two-phase sessionization must
    agree exactly on every (user, session) row."""
    import random

    rng = random.Random(0xC0FFEE)
    rows = []
    for user in range(40):
        t = rng.randint(0, 3_600)
        for _ in range(rng.randint(1, 60)):
            # mix of intra-session steps, exact-gap steps, and new-session
            # jumps; occasionally land exactly on a day boundary
            step = rng.choice([60, 1800, 3600, 28800, 28800, 90000])
            t += step if rng.random() > 0.1 else (86400 - t % 86400)
            rows.append((user, t))
    df = spark.createDataFrame(rows, "user_id long, secs long").select(
        "user_id",
        F.timestamp_seconds(F.col("secs") + 1_700_000_000).alias("ts"),
        (F.col("secs") % 7 / 10.0).alias("value"),
    )

    def rows_of(d):
        return sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n,
             r.value_total_micros)
            for r in d.collect()
        )

    for gap, bucket in (("8 hours", "1 day"), ("30 minutes", "2 hours"),
                        ("1 hour", "4 days")):
        plain = rows_of(sessions.sessionize(df, gap=gap))
        two_phase = rows_of(sessions.sessionize_bucketed(df, gap=gap, bucket=bucket))
        assert plain == two_phase, (gap, bucket)
