"""Streaming monthly/windowed trend aggregation over ``events`` — the
Structured Streaming twin of ``analytics.build_monthly_metrics`` /
the registered ``analytics_events_monthly`` batch query.

Shape: ``readStream`` (parquet source) -> event-time watermark ->
tumbling-window groupBy -> sink. Late rows beyond the watermark are
dropped from their window; state is bounded by (watermark horizon /
window size) x key cardinality, so the query runs indefinitely at any
scale. Calendar months are not a valid streaming window unit, so the
streaming form uses fixed tumbling windows (30d default); the exact
calendar-month rollup stays a batch query over the same source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_events


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open events.parquet as a stream (schema from a batch probe, with the
    same dtype branch as ``sources.tpch.load_events``: timestamp-stored
    files pass through with an NTZ->session-TZ cast; legacy nanos files are
    read as long and truncated to microseconds)."""
    path = f"{sf_dir}/events.parquet"
    try:
        batch_schema = spark.read.parquet(path).schema
    except Exception:
        batch_schema = None  # schema inference rejected TIMESTAMP(NANOS)
    ts_type = None
    if batch_schema is not None:
        ts_type = {f.name: f.dataType.typeName() for f in batch_schema.fields}.get("ts")
    if batch_schema is None or ts_type in ("long", "bigint"):
        # legacy nanos layout: nanosAsLong must stay set through stream
        # EXECUTION (the scan reads the conf at micro-batch planning time,
        # not here) — run_to_memory owns restoring it after
        # awaitTermination.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        batch_schema = spark.read.parquet(path).schema
        conv = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        conv = F.col("ts").cast("timestamp")
    # the file-stream source requires a directory or glob (it lists for
    # new files); a glob matching the single events file satisfies it
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .load(f"{sf_dir}/events.parque[t]")
    )
    return stream.withColumn("ts", conv)


def windowed_event_trend(
    events: DataFrame,
    window: str = "30 days",
    watermark: str = "30 days",
) -> DataFrame:
    """Tumbling-window count + value sum per event_type with late-data
    watermark. Works on a streaming OR batch events frame (same plan)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # per-row exact micros summed as BIGINT: decimal(18,6) * 10^6
            # is integral, and an integer sum shares the oracle's overflow
            # horizon (~9.2e12 units) instead of the silent-NULL behavior
            # of summing decimals then down-casting the aggregate
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
            ).alias("value_total_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "value_total_micros",
        )
    )


def run_to_memory(
    spark: SparkSession, sf_dir: str, *, name: str = "event_trends",
    window: str = "30 days",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute the streaming trend with an availableNow trigger into a
    memory sink (bounded run over current files; used by tests and local
    validation). Returns the result as a batch DataFrame.
    ``shuffle_partitions`` scopes the replay's state-partition count
    (streaming/replay.py); None keeps the session setting."""
    from .replay import REPLAY_SHUFFLE_PARTITIONS, replay_conf

    if shuffle_partitions is None:
        shuffle_partitions = REPLAY_SHUFFLE_PARTITIONS
    with replay_conf(spark, shuffle_partitions):
        q = (
            windowed_event_trend(events_stream(spark, sf_dir), window=window)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
