"""Measured skew-join evidence for SCALING.md.

Builds a deliberately skewed copy of the events table (one hot user_id
holding ~40% of all rows, amplified so the hot partition's single-task
sort dominates overhead on local[32]), then times a forced-SMJ
fact-to-dim join under a matrix of workload shapes x skew strategies:

Workloads
- ``join_global``: join consumed by a global aggregate — no downstream
  partitioning requirement, the shape where AQE's OptimizeSkewedJoin is
  free to split the hot partition;
- ``join_keyed``: join consumed by a same-key groupBy — the downstream
  aggregate REQUIRES the join's hash partitioning, and AQE (correctly)
  declines to split rather than introduce an extra shuffle. This is the
  common analytics shape, and it is exactly where explicit strategies
  still matter.

Strategies
- ``aqe_off``: baseline, hot partition serializes the sort;
- ``aqe_on``: default OptimizeSkewedJoin (splits in join_global,
  refuses in join_keyed);
- ``aqe_forced``: ``forceOptimizeSkewedJoin`` — split anyway, pay the
  downstream re-shuffle (partial aggregation makes it cheap);
- ``salted``: operators.partitioning.salted_join — plan-time split;
  works in every shape incl. streaming / non-AQE-eligible plans.

Broadcast is disabled throughout: at 100 TB the dimension side of a
skewed join is often NOT broadcastable, which is precisely when skew
bites. AQE thresholds are scaled to probe size the way the defaults
relate to real partition sizes (over-aggressive thresholds were measured
to over-split into hundreds of tiny tasks and LOSE 2x — kept as a
calibration warning in SCALING.md).

Run: python tools/skew_probe.py [sf_dir] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recon_spark.operators.partitioning import salted_join  # noqa: E402
from recon_spark.session import get_spark  # noqa: E402
from recon_spark.sources.tpch import load  # noqa: E402

AMPLIFY = 300         # rows multiplier so per-task time dominates overhead
HOT_FRACTION = 0.4    # share of rows remapped to the single hot key


def build_skewed(spark, sf_dir: str, out_dir: str) -> str:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    amplified = ev.crossJoin(
        F.broadcast(spark.range(AMPLIFY).select(F.col("id").alias("rep")))
    ).select(
        (F.col("event_id") * AMPLIFY + F.col("rep")).alias("event_id"),
        # deterministic 40% of rows land on user 0; the rest keep their key
        F.when(F.abs(F.hash("event_id", F.col("rep"))) % 100 < HOT_FRACTION * 100, 0)
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "value",
        # high-entropy payload so shuffle BYTES track row counts: with a
        # compressible payload (constant key + low-cardinality values)
        # the 12M-row hot partition lz4-compresses to ~2-4 MB and AQE's
        # skew detection — which reads COMPRESSED map-output sizes —
        # never fires while the sort still pays per-row CPU (measured;
        # see SCALING.md)
        F.xxhash64("event_id", F.col("rep")).alias("pad"),
    )
    path = os.path.join(out_dir, "events_skewed.parquet")
    amplified.write.mode("overwrite").parquet(path)
    return path


def workload(events, users, shape: str, strategy: str):
    if strategy == "salted":
        joined = salted_join(events, users, ["user_id"], salt=32)
    else:
        joined = events.join(users, "user_id")
    v_micros = F.sum(
        (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
    ).alias("v")
    if shape == "join_global":
        # global agg: no distribution requirement above the join
        return joined.agg(
            F.count(F.lit(1)).alias("n"), v_micros, F.max("pad").alias("p")
        )
    # keyed agg: requires hash(user_id) distribution above the join
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        v_micros,
        F.max("segment").alias("seg"),
        F.max("pad").alias("p"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "skew_probe",
        extra_conf={
            # the dim side must NOT broadcast, or there is no shuffle to skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # thresholds scaled to probe partition sizes (see module doc)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    tmp = tempfile.mkdtemp(prefix="skew_probe_")
    path = build_skewed(spark, sf_dir, tmp)
    events = spark.read.parquet(path)
    users = (
        events.select("user_id")
        .distinct()
        .withColumn("segment", F.abs(F.hash("user_id")) % 5)
    )
    users.write.mode("overwrite").parquet(os.path.join(tmp, "users.parquet"))
    users = spark.read.parquet(os.path.join(tmp, "users.parquet"))

    n = events.count()
    hot = events.filter(F.col("user_id") == 0).count()
    strategies = [
        ("aqe_off", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
        ("aqe_on", {"spark.sql.adaptive.skewJoin.enabled": "true"}),
        (
            "aqe_forced",
            {
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
            },
        ),
        ("salted", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
    ]
    results: dict[str, dict[str, float]] = {}
    for shape in ("join_global", "join_keyed"):
        results[shape] = {}
        for label, confs in strategies:
            for k, v in confs.items():
                spark.conf.set(k, v)
            strategy = "salted" if label == "salted" else "plain"
            # warm lap compiles this variant's codegen; timed laps measure
            # execution (shuffles never carry across laps)
            workload(events, users, shape, strategy).write.format("noop").mode(
                "overwrite"
            ).save()
            laps = []
            for _ in range(2):
                t0 = time.time()
                workload(events, users, shape, strategy).write.format("noop").mode(
                    "overwrite"
                ).save()
                laps.append(time.time() - t0)
            results[shape][label] = round(min(laps), 2)
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    print(
        json.dumps(
            {
                "rows": n,
                "hot_key_rows": hot,
                "hot_fraction": round(hot / n, 3),
                "timings_sec": results,
            }
        )
    )


if __name__ == "__main__":
    main()
