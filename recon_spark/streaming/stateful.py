"""Stateful Structured Streaming operators over the ``events`` stream.

The reference has no streaming surface (SURVEY.md §2.10: "Streaming:
none"); these are the beyond-reference operators a continuously-ingesting
pipeline needs, in the two canonical Spark forms:

- **Streaming dedup** via ``withWatermark`` +
  ``dropDuplicatesWithinWatermark`` — the built-in, scale-sane form: state
  holds one entry per key only within the watermark horizon, so it runs
  indefinitely. Used as "keep the first event per (user_id, event_type)".
- **Custom stateful aggregation** via ``applyInPandasWithState`` — running
  per-key totals that survive across micro-batches (the escape hatch for
  semantics windowed aggs can't express). Arrow-batched, one state object
  per key; state size is key-cardinality-bounded.

100 TB notes: both operators shuffle once on the state key and keep state
partitioned with the data (HDFS/RocksDB state store on a cluster). The
pandas-with-state path is the ONLY Python-side operator in this repo's
streaming surface, and it is Arrow-batched per group — never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .trends import events_stream

DEDUP_KEYS = ["user_id", "event_type"]


def dedup_events(events: DataFrame, watermark: str = "30 days") -> DataFrame:
    """Keep the first event per (user_id, event_type) seen within the
    watermark horizon. Works on a streaming frame; on a batch frame Spark
    rejects dropDuplicatesWithinWatermark, so batch callers use the plain
    dropDuplicates equivalent."""
    ev = events.filter(F.col("ts").isNotNull()).withWatermark("ts", watermark)
    if events.isStreaming:
        return ev.dropDuplicatesWithinWatermark(DEDUP_KEYS)
    return ev.dropDuplicates(DEDUP_KEYS)


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("value_total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key state update: fold this micro-batch into (n, total) and emit
    the updated running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += int(len(pdf))
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n": [n], "value_total": [total]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Running (count, value sum) per event_type across micro-batches via
    ``applyInPandasWithState``. Emits the post-batch totals for every key
    seen in the batch (update semantics; no timeout — totals are global)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _run_query(spark: SparkSession, sf_dir: str, build, name: str) -> DataFrame:
    from .replay import REPLAY_SHUFFLE_PARTITIONS, replay_conf

    with replay_conf(spark, REPLAY_SHUFFLE_PARTITIONS):
        q = (
            build(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_dedup_to_memory(
    spark: SparkSession, sf_dir: str, *, name: str = "event_dedup"
) -> DataFrame:
    """Execute streaming dedup with an availableNow trigger into a memory
    sink; returns the surviving events as a batch frame."""
    return _run_query(spark, sf_dir, dedup_events, name)


def run_running_totals_to_memory(
    spark: SparkSession, sf_dir: str, *, name: str = "event_running_totals"
) -> DataFrame:
    """Execute the stateful running-totals query (availableNow, memory
    sink). Each key's LAST emitted row is its final total; with a single
    micro-batch that equals the batch groupBy."""
    return _run_query(spark, sf_dir, running_totals, name)
