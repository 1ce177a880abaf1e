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
