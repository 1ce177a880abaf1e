"""Shared conf scoping for bounded availableNow replays into memory sinks.

Stateful streaming operators create one state store per shuffle
partition, and for a bounded local replay that setup cost dominates:
the stream-stream join at sf0.1 runs 7.5s with the session's 32 shuffle
partitions vs 2.6s with 8 (measured, local[32]) — the data per state
partition is tiny either way.  So the replay helpers scope
``spark.sql.shuffle.partitions`` down for the duration of the run.

This is a REPLAY default, not a deployment default: a live streaming job
sizes state partitions to key cardinality x throughput (and cannot
change them after the checkpoint is created).  Callers running at real
scale pass ``shuffle_partitions=None`` to keep the session setting.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

#: state-partition count for bounded local replays (see module docstring).
#: Round-7 audit of the stream-stream join at sf0.1, local[32], steady
#: state (first streaming query in a session pays ~7s of one-time
#: machinery warmup regardless of this setting): 4 partitions → 2.4s,
#: 8 → 2.2s, 16 → 3.0s, 32 → 4.8s. AQE cannot help (disabled in
#: stateful streaming), so this fixed count is the knob; 8 is the
#: measured knee for the replay-scale state volume.
REPLAY_SHUFFLE_PARTITIONS = 8


@contextmanager
def replay_conf(spark: SparkSession, shuffle_partitions: int | None):
    """Scope nanosAsLong (set by ``events_stream`` for legacy layouts and
    read at micro-batch planning time) and the replay shuffle-partition
    override; both restored on exit."""
    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
