"""Standalone minimal reproducer: Spark 4.1 partitioning-aware UnionExec
returns wrong window results (observed on 4.1.2).

Shape (distilled from this repo's SCD2 correction-apply pipeline, where
it surfaced as "no ledger version ever closes"):

1. ``hist`` comes from a BUCKETED catalog table — bucketed on a column
   (``g``) UNRELATED to any downstream key — then keep-first deduped by
   a row_number window over ``k`` (one hash exchange on k).
2. The SAME ``hist`` feeds two join branches against the update keys
   (an anti "untouched" branch and a matched "open rows" branch), so
   the plan reuses the dedup-window exchange (ReusedExchange).
3. The matched rows union the update rows and a ``lead()`` window over
   ``k`` computes each row's successor. The final output unions the
   untouched branch back in.

With ``spark.sql.unionOutputPartitioning=true`` (the 4.1 default) the
planner satisfies the lead-window's clustering requirement from the
union's claimed partitioning and executes only a partition-local sort;
at runtime a key's matched row and update row never meet in one window
partition, so EVERY lead() is NULL (1500 NULL successors instead of
1000 below). Each of these flips independently restores correctness:

- ``spark.sql.unionOutputPartitioning=false``   (the mitigation this
  repo pins in ``recon_spark.session.get_spark`` and defensively in
  ``recon_spark.operators.merge.scd2_apply``);
- reading ``hist`` from plain parquet instead of the bucketed table;
- removing the anti branch (single use of the window exchange).

An explicit ``repartition("k")`` between the union and the window does
NOT protect: it is optimizer-eliminated as redundant against the
union's claimed partitioning.

A fourth trigger condition (found while minimizing the standalone
report): ``spark.sql.constraintPropagation.enabled=false`` — this
session factory's setting. With constraint propagation at its default
the inferred IsNotNull filters perturb the plan and this shape happens
not to reproduce; the bug is latent, not absent (confs may change the
plan, never the result).

Run: ``python tools/union_partitioning_repro.py [true|false]``
(default ``true`` → demonstrates the wrong results).

Upstream-ready self-contained report (no repo imports, conf matrix,
suspected mechanism): ``docs/spark-union-partitioning-bug-report.md``.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    conf = sys.argv[1] if len(sys.argv) > 1 else "true"

    from recon_spark.session import get_spark

    spark = get_spark(
        "union-repro",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.unionOutputPartitioning": conf},
    )
    n = 500
    base = tempfile.mkdtemp(prefix="union_repro_")
    hist_raw = spark.range(0, n * 4).select(
        (F.col("id") % (n * 2)).cast("string").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("seq"),
    )
    (
        hist_raw.write.mode("overwrite")
        .bucketBy(8, "g")
        .sortBy("g")
        .option("path", f"{base}/hist")
        .saveAsTable("union_repro_hist")
    )
    try:
        w = Window.partitionBy("k").orderBy("seq")
        hist = (
            spark.table("union_repro_hist")
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn", "seq", "g")
        )
        upd = (
            spark.range(0, n)
            .select(
                (F.col("id") % n).cast("string").alias("k"),
                (F.col("id") + 10_000).cast("double").alias("v"),
                F.col("id").alias("seq"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn", "seq")
        )
        aff = upd.select("k").distinct()
        untouched = hist.join(aff, ["k"], "left_anti").select(
            "k", "v", F.lit(None).cast("double").alias("nxt")
        )
        open_rows = hist.join(aff, ["k"], "left_semi").select(
            "k", "v", F.lit(0).alias("src")
        )
        new_rows = upd.select("k", "v", F.lit(1).alias("src"))
        wl = Window.partitionBy("k").orderBy("v", "src")
        versioned = (
            open_rows.unionByName(new_rows)
            .withColumn("nxt", F.lead("v").over(wl))
            .drop("src")
        )
        out = untouched.unionByName(versioned)
        rows = out.collect()
        n_null = sum(1 for r in rows if r.nxt is None)
        expected = 2 * n  # n untouched rows + n last-version rows
        verdict = "WRONG RESULTS (bug reproduced)" if n_null != expected else "correct"
        print(
            f"unionOutputPartitioning={conf}: {n_null} NULL successors, "
            f"expected {expected} -> {verdict}"
        )
        sys.exit(2 if n_null != expected else 0)
    finally:
        spark.sql("DROP TABLE IF EXISTS union_repro_hist")


if __name__ == "__main__":
    main()
