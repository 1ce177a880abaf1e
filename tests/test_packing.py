"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from recon_spark.operators import packing, sampling
from recon_spark.operators.text import token_count


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma "),
            F.repeat(F.lit("tok "), (F.col("id") % 37).cast("int")),
        ).alias("text"),
    )


def test_matches_single_window_spelling(spark):
    """The two-phase bucket prefix sum must equal the obvious (but
    single-task) global-window cumsum, row for row."""
    docs = sampling.with_split(_docs(spark))
    got = {
        (r["split"], r["doc_id"]): (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in packing.pack_sequences(docs, budget=64, group_cols=("split",)).collect()
    }
    hb = sampling.hash_bucket("doc_id", packing.PACK_SALT)
    w = (
        Window.partitionBy("split")
        .orderBy(hb.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        docs.withColumn("n_tokens", token_count("text"))
        .withColumn("__prev", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "split",
            "doc_id",
            "n_tokens",
            F.expr("__prev DIV 64").alias("bin_id"),
            (F.col("__prev") % 64).alias("bin_offset"),
        )
    )
    want = {
        (r["split"], r["doc_id"]): (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in naive.collect()
    }
    assert got == want


def test_stream_is_gapless_per_group(spark):
    """Reconstructed prefix positions must tile the token stream exactly:
    sorted by (bin_id, bin_offset), each doc starts where the previous
    one ended."""
    out = packing.pack_sequences(_docs(spark), budget=128).collect()
    rows = sorted(out, key=lambda r: (r["bin_id"], r["bin_offset"]))
    pos = 0
    for r in rows:
        assert r["bin_id"] * 128 + r["bin_offset"] == pos
        assert 0 <= r["bin_offset"] < 128
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in out)


def test_no_single_partition_exchange(spark):
    plan = (
        packing.pack_sequences(_docs(spark), group_cols=())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the row-level window is partitioned by coarse bucket; the only
    # SinglePartition step may be the metadata-sized bucket-totals cumsum
    assert "CartesianProduct" not in plan
    row_windows = [
        l for l in plan.splitlines() if "Window" in l and "__hb" in l
    ]
    assert row_windows, "row-level window missing"
    for l in row_windows:
        assert "SinglePartition" not in l
