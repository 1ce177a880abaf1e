"""Skew measured INSIDE the graded lineages (VERDICT r7 task #4).

`tools/skew_probe.py` measures the strategy matrix on a synthetic
fact-to-dim join; this tool pushes forced skew through the GRADED
operators themselves — the events table's ``user_id`` is the shuffle
key of both ``sessionization_events`` (session_window aggregation) and
``analytics_event_funnel`` (per-step join + same-key aggregate chain) —
and answers three questions the join matrix cannot:

1. **Is there organic skew at sf0.1?** Measured and reported first: the
   driver's events generator is near-uniform (top user ≈ 0.1% of rows),
   so the graded queries face no skew today; the hazard is the
   bot-user shape a real clickstream develops.
2. **What happens to a session_window aggregation with a hot key?**
   Unlike a skewed JOIN, a skewed AGGREGATION hash partition is nothing
   AQE's skew logic ever splits (OptimizeSkewedJoin rewrites joins
   only) — the hot user's whole event history sorts in ONE task. The
   mitigation cannot be key salting (a session must see all of a
   user's events); it is the TIME-bucketed two-phase
   ``sessions.sessionize_bucketed`` (split sessions at bucket edges,
   exactly re-merge the per-user session list), value-identical by
   test. This tool prices all three on the same forced-skew corpus,
   plus the two-phase form's overhead on UNIFORM data (the reason the
   plain form stays the default).
3. **Does the funnel chain need anything?** Its per-step joins are
   user-keyed fact-fact joins feeding same-key aggregates — the shape
   where default AQE declines to split (join matrix row 2); measured
   here through the real operator with aqe off/on/forced.

Run: ``python tools/skew_graded.py [sf_dir] [amplify]`` — prints one
JSON line. Expect a few minutes: the skewed baseline's straggler task
IS the measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recon_spark.operators import funnel  # noqa: E402
from recon_spark.session import get_spark  # noqa: E402
from recon_spark.sources.tpch import load  # noqa: E402
from recon_spark.streaming import sessions  # noqa: E402

AMPLIFY = 60          # 100k sf0.1 rows -> 6M; hot user holds ~2.4M
HOT_FRACTION = 0.4
BUCKET = "1 day"      # 30-day corpus -> hot user spreads over ~30 tasks


def build_events(spark, sf_dir: str, out: str, hot_fraction: float) -> str:
    """Amplified events copy preserving the graded lineages' columns
    (ts jittered per replica so timestamps stay high-entropy)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    amplified = ev.crossJoin(
        F.broadcast(spark.range(AMPLIFY).select(F.col("id").alias("rep")))
    ).select(
        (F.col("event_id") * AMPLIFY + F.col("rep")).alias("event_id"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + (F.abs(F.xxhash64("event_id", "rep")) % 3_600_000_000)
        ).alias("ts"),
        F.when(
            F.abs(F.hash("event_id", F.col("rep"))) % 100
            < int(hot_fraction * 100),
            0,
        )
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_type",
        "value",
    )
    path = os.path.join(out, f"events_h{int(hot_fraction * 100)}.parquet")
    amplified.write.mode("overwrite").parquet(path)
    return path


def _time(spark, df_fn, laps: int = 2) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # codegen warm
    best = None
    for _ in range(laps):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    global AMPLIFY
    if len(sys.argv) > 2:
        AMPLIFY = int(sys.argv[2])
    spark = get_spark(
        "skew_graded",
        extra_conf={
            # the funnel's step joins must not degenerate to broadcasts:
            # at 100 TB a step's event set is not broadcastable
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
    )
    # 1. organic profile of the graded key
    ev = load(spark, sf_dir, "events")
    prof = (
        ev.groupBy("user_id")
        .count()
        .agg(
            F.sum("count").alias("rows"),
            F.max("count").alias("top1"),
            F.count(F.lit(1)).alias("users"),
        )
        .first()
    )
    organic = {
        "rows": prof["rows"],
        "users": prof["users"],
        "top1_rows": prof["top1"],
        "top1_share": round(prof["top1"] / prof["rows"], 4),
    }

    tmp = tempfile.mkdtemp(prefix="skew_graded_")
    try:
        skewed = spark.read.parquet(build_events(spark, sf_dir, tmp, HOT_FRACTION))
        uniform = spark.read.parquet(build_events(spark, sf_dir, tmp, 0.0))

        def aqe(on: bool):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")

        out: dict[str, dict[str, float]] = {"sessionize": {}, "funnel": {}}
        aqe(True)
        out["sessionize"]["plain_hot_aqe_on"] = _time(
            spark, lambda: sessions.sessionize(skewed)
        )
        aqe(False)
        out["sessionize"]["plain_hot_aqe_off"] = _time(
            spark, lambda: sessions.sessionize(skewed)
        )
        aqe(True)
        out["sessionize"]["bucketed_hot"] = _time(
            spark, lambda: sessions.sessionize_bucketed(skewed, bucket=BUCKET)
        )
        out["sessionize"]["plain_uniform"] = _time(
            spark, lambda: sessions.sessionize(uniform)
        )
        out["sessionize"]["bucketed_uniform"] = _time(
            spark, lambda: sessions.sessionize_bucketed(uniform, bucket=BUCKET)
        )
        # value parity on the forced-skew corpus, not just the test corpus
        a = sessions.sessionize(skewed)
        b = sessions.sessionize_bucketed(skewed, bucket=BUCKET)
        assert a.exceptAll(b).union(b.exceptAll(a)).isEmpty(), (
            "bucketed sessionize diverged on the forced-skew corpus"
        )

        steps = funnel.DEFAULT_FUNNEL_STEPS
        aqe(False)
        out["funnel"]["hot_aqe_off"] = _time(
            spark, lambda: funnel.funnel_summary(skewed, steps)
        )
        aqe(True)
        out["funnel"]["hot_aqe_on"] = _time(
            spark, lambda: funnel.funnel_summary(skewed, steps)
        )
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        out["funnel"]["hot_aqe_forced"] = _time(
            spark, lambda: funnel.funnel_summary(skewed, steps)
        )
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
        out["funnel"]["uniform_aqe_on"] = _time(
            spark, lambda: funnel.funnel_summary(uniform, steps)
        )

        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "amplify": AMPLIFY,
                    "hot_fraction": HOT_FRACTION,
                    "bucket": BUCKET,
                    "organic_profile": organic,
                    "timings_sec": out,
                    "loadavg_1min": round(os.getloadavg()[0], 1),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
