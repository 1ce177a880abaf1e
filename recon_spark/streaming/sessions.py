"""Sessionization over ``events``: gap-based session windows per user —
the canonical stateful-streaming operator the reference (batch pandas,
SURVEY.md §2.10 "Streaming: none") has no counterpart for.

Spark-first shape: ``F.session_window(ts, gap)`` in a groupBy — the
built-in session operator — rather than any hand-rolled sort/scan. The
same plan runs batch (graded against a DuckDB gaps-and-islands replay)
and streaming (watermark + append mode; session state is merged by the
streaming aggregation operator and bounded by the watermark horizon).

Semantics pinned by the oracle (and by test_session_boundary_is_strict):
an event extends the current session iff ``ts - prev_ts <= gap``
INCLUSIVE — an event landing exactly on the session's end timestamp
merges; ``session_end = last_ts + gap``.

100 TB notes: one shuffle on ``user_id`` (the session key); state in
streaming is per-active-session per key and watermark-bounded. Output
serializes timestamps as epoch micros and the value sum as integer micros
(BIGINT) — the hash-stable serialization this repo uses for all
decimal-ish aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .trends import events_stream

DEFAULT_GAP = "8 hours"  # ~median inter-event gap at sf0.01 is 7.3h


def sessionize(events: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """Per-user session rollup: (user_id, session bounds, event count,
    value total). Works on a batch OR streaming (watermarked) frame."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
            ).alias("value_total_micros"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n",
            "value_total_micros",
        )
    )


def _interval_us(interval: str) -> int:
    """'N seconds|minutes|hours|days' -> microseconds (the subset of
    Spark's interval syntax this module uses)."""
    n_str, unit = interval.strip().split()
    per_us = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[unit.rstrip("s").lower()]
    return int(n_str) * per_us


def sessionize_bucketed(
    events: DataFrame, gap: str = DEFAULT_GAP, bucket: str = "4 days"
) -> DataFrame:
    """Skew-resistant two-phase twin of :func:`sessionize` — identical
    output (asserted in tests/test_streaming_sessions.py), different
    physical shape for a PATHOLOGICALLY HOT session key (a bot user
    holding a large share of all events).

    Why it exists: ``session_window`` partitions on the session key
    alone, so ALL of a hot user's events land in one task to be sorted
    and merged — and unlike a skewed join, an aggregation's hot hash
    partition is something AQE's skew handling never splits (measured in
    tools/skew_graded.py: the hot task serializes the whole stage).
    Salting a session aggregation naively would break session semantics
    — a session must see every event of its user — so the salt here is
    TIME, which sessions can be split on and exactly re-merged across:

    1. **Phase 1** groups by ``(user, time-bucket, session_window)`` —
       the hot user's events spread over ``time-range / bucket`` tasks;
       sessions spanning a bucket boundary are split (at most one split
       per bucket edge).
    2. **Phase 2** re-merges the per-user SESSION list (gaps-and-islands
       over intervals: a session whose first event lands within ``gap``
       of the previous session's end — i.e. ``start <= prev end``,
       matching the INCLUSIVE boundary the oracle pins — joins its
       island; per-user row count is bounded by sessions + bucket
       edges, never by event count).

    ``bucket`` must be comfortably larger than ``gap`` (several sessions
    per bucket) or phase 2's merge list approaches the event count; the
    default 4 days vs the 8-hour gap keeps the split-session fraction
    small. Use the plain :func:`sessionize` unless a profiled hot key
    actually exists — two shuffles cost more than one on uniform data
    (measured, tools/skew_graded.py)."""
    bucket_us = _interval_us(bucket)
    if bucket_us <= _interval_us(gap):
        raise ValueError(f"bucket ({bucket}) must exceed gap ({gap})")
    p1 = (
        events.filter(F.col("ts").isNotNull())
        .withColumn("__bk", F.floor(F.unix_micros(F.col("ts")) / F.lit(bucket_us)))
        .groupBy("user_id", "__bk", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
            ).alias("value_total_micros"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n",
            "value_total_micros",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start_us")
    prev_end = F.max("session_end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_end.isNull() | (F.col("session_start_us") > prev_end), 1
    ).otherwise(0)
    islands = p1.withColumn(
        "__island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("user_id", "__island")
        .agg(
            F.min("session_start_us").alias("session_start_us"),
            F.max("session_end_us").alias("session_end_us"),
            F.sum("n").alias("n"),
            F.sum("value_total_micros").alias("value_total_micros"),
        )
        .drop("__island")
    )


def run_to_memory(
    spark: SparkSession,
    sf_dir: str,
    *,
    name: str = "event_sessions",
    gap: str = DEFAULT_GAP,
    watermark: str = "0 seconds",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute streaming sessionization (availableNow, append mode into a
    memory sink) and return the emitted sessions as a batch frame.

    Append-mode caveat a caller must know: only sessions CLOSED by the
    final watermark are emitted — sessions still open within ``gap`` of
    the max event time stay in state and are withheld. With a bounded
    replay this means the output is a prefix-closed SUBSET of the batch
    rollup (tested in test_streaming_sessions); a live deployment keeps
    emitting them as the watermark advances past each session's end.
    """
    from .replay import REPLAY_SHUFFLE_PARTITIONS, replay_conf

    if shuffle_partitions is None:
        shuffle_partitions = REPLAY_SHUFFLE_PARTITIONS
    with replay_conf(spark, shuffle_partitions):
        q = (
            sessionize(
                events_stream(spark, sf_dir).withWatermark("ts", watermark), gap
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def sessionize_auto(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    bucket: str = "4 days",
    profile: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Probe-and-switch sessionization (VERDICT r8 #7): measure the
    session key's hot-key profile (``plans.manifest.key_profile`` —
    AQE's 5x-the-ideal-partition convention applied to keys), then run
    :func:`sessionize_bucketed` iff the corpus actually has a bot-grade
    key, else the plain single-phase form. Returns ``(sessions,
    profile)`` so the decision lands in the caller's run manifest.

    Pass ``profile`` to reuse a measurement (yesterday's partition, a
    sample, or a manifest's recorded ``key_profiles`` entry) instead of
    paying the probe job per run.
    """
    from ..plans.manifest import key_profile

    prof = profile if profile is not None else key_profile(events, "user_id")
    out = (
        sessionize_bucketed(events, gap=gap, bucket=bucket)
        if prof.get("skewed")
        else sessionize(events, gap=gap)
    )
    return out, prof
