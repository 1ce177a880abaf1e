"""SparkSession factory tuned for this engine.

Local test/bench runs use ``local[N]`` (single JVM); the configs below are
chosen so the same logical plans scale to a multi-executor cluster:

- AQE on (runtime join selection, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally (a cluster deployment would
  raise this to ~2-3x total cores; AQE coalesces the excess)
- UTC session timezone so timestamps hash-match the DuckDB oracle
- Arrow enabled for the few Pandas-UDF paths (similarity / multimodal)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "recon_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The rule engines compile to wide Project stages (hundreds of
        # expressions). Two measured optimizer/codegen knobs (3-4x wall
        # clock at sf0.1, neutral at scale):
        # - constraint propagation is O(#predicates^2) per optimizer pass
        #   and infers nothing useful here: the cleaners drop null keys
        #   explicitly, so the IsNotNull constraints it would derive
        #   already exist as real filters.
        # - whole-stage-codegen methods larger than HotSpot's 8 KB JIT
        #   threshold never get JIT-compiled; paying janino compilation
        #   for bytecode that then runs interpreted is pure loss. Falling
        #   back to Volcano for those stages keeps codegen exactly where
        #   it pays (small hot stages) — at 100 TB the wide stages would
        #   have interpreted either way.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # Allow co-partitioned joins when both sides are hash-partitioned
        # on a SUBSET of the join keys (e.g. clean tables bucketed by
        # (plan_id, ssn) joined on (plan_id, ssn, gross_amt)): same subset
        # on both sides still co-locates every join key group, and it is
        # what makes the bucketed clean-once/reconcile-many layout
        # exchange-free (see tests/test_bucketed_engine.py). Spark's
        # default (true) rejects subset co-partitioning purely as a skew
        # heuristic.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # CORRECTNESS: Spark 4.1's partitioning-aware UnionExec
        # (spark.sql.unionOutputPartitioning, default true) returned
        # WRONG results for a key-window placed directly over a union of
        # two co-partitioned children (scd2_apply's open∪new frame: the
        # planner deemed the window's clustering requirement satisfied,
        # executed only a partition-local sort, and lead() returned NULL
        # for every row — no version ever closed). Minimized + verified
        # 2026-08-14 on 4.1.2: flipping only this conf flips the result.
        # Standalone reproducer: tools/union_partitioning_repro.py (the
        # minimal trigger needs a BUCKETED source table + two join
        # branches reusing one window exchange); upstream-ready report:
        # docs/spark-union-partitioning-bug-report.md; regression guard:
        # tests/test_merge.py, and operators/merge.py pins this conf
        # defensively for sessions not built here.
        # Disabled session-wide: the optimization saves one small
        # exchange; silent corruption is not a trade.
        .config("spark.sql.unionOutputPartitioning", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
