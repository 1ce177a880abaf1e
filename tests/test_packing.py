"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from recon_spark.operators import packing, sampling
from recon_spark.operators import text as T
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


def test_length_bucketed_batches_match_naive_and_cut_padding(spark):
    """Distributed length bucketing: batch assignment must equal the
    single-window ORDER BY (n_tokens, id) spelling exactly, and padded
    cost must beat hash-ordered batching by a wide margin on a corpus
    with varied lengths."""
    from pyspark.sql import Window
    from recon_spark.operators.packing import length_bucketed_batches
    from recon_spark.operators import text as T

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    B = 16
    got = length_bucketed_batches(docs, B)

    # exact parity with the naive global-window spelling
    naive = (
        docs.select(
            "doc_id", F.size(T.tokens("text")).cast("long").alias("n_tokens")
        )
        .withColumn(
            "batch_id",
            ((F.row_number().over(Window.orderBy("n_tokens", "doc_id")) - 1) / B)
            .cast("long"),
        )
    )
    a = sorted(map(tuple, got.select("doc_id", "n_tokens", "batch_id").collect()))
    b = sorted(map(tuple, naive.select("doc_id", "n_tokens", "batch_id").collect()))
    assert a == b and len(a) > 0

    def padded_cost(df):
        per = df.groupBy("batch_id").agg(
            (F.max("n_tokens") * F.count(F.lit(1))).alias("padded"),
            F.sum("n_tokens").alias("used"),
        )
        r = per.agg(F.sum("padded").alias("p"), F.sum("used").alias("u")).first()
        return r.p, r.u

    # baseline: corpus-order-agnostic batching (hash order)
    base = (
        docs.select(
            "doc_id", F.size(T.tokens("text")).cast("long").alias("n_tokens")
        )
        .withColumn(
            "batch_id",
            (
                (F.row_number().over(
                    Window.orderBy(F.md5(F.col("doc_id").cast("string")))
                ) - 1) / B
            ).cast("long"),
        )
    )
    p_sorted, used = padded_cost(got)
    p_hash, _ = padded_cost(base)
    waste_sorted = (p_sorted - used) / used
    waste_hash = (p_hash - used) / used
    assert waste_sorted < waste_hash / 3, (waste_sorted, waste_hash)

    # every batch except the last holds exactly B docs
    sizes = sorted(
        (r.batch_id, r.n) for r in got.groupBy("batch_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(n == B for _, n in sizes[:-1])


def test_length_bucketed_batches_single_length_corpus(spark):
    """Degenerate length distribution (everything exactly the same
    n_tokens — the pre-truncated-to-2048 case, r13 review): the id-block
    sub-bucket must (a) keep exact parity with the naive global-window
    spelling, and (b) actually split the one length group across blocks
    so no single task ranks the whole corpus."""
    from recon_spark.operators.packing import length_bucketed_batches

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta").alias("text"),  # all length 4
    )
    B = 16
    got = length_bucketed_batches(docs, B, id_block=64)

    plan = got._jdf.queryExecution().executedPlan().toString()
    row_windows = [
        l for l in plan.splitlines()
        if "Window" in l and "row_number" in l.lower()
    ]
    assert row_windows, "row-level window missing from plan"
    for l in row_windows:
        assert "SinglePartition" not in l
        assert "__blk" in l  # partitioned by (n_tokens, block)

    naive = docs.select(
        "doc_id", F.size(T.tokens("text")).cast("long").alias("n_tokens")
    ).withColumn(
        "batch_id",
        ((F.row_number().over(Window.orderBy("n_tokens", "doc_id")) - 1) / B)
        .cast("long"),
    )
    a = sorted(map(tuple, got.select("doc_id", "n_tokens", "batch_id").collect()))
    b = sorted(map(tuple, naive.select("doc_id", "n_tokens", "batch_id").collect()))
    assert a == b and len(a) == 400
    # with id_block=64 the 400 same-length rows really span many blocks
    assert 400 // 64 + 1 >= 6


def test_length_bucketed_batches_string_ids_exact(spark):
    """Non-numeric ids: the block collapses to a constant (no silent
    cast — the dsir r13 repro), so the result still matches the naive
    lexicographic spelling exactly."""
    from recon_spark.operators.packing import length_bucketed_batches

    ids = [str(i) for i in list(range(5, 13)) + list(range(95, 103))]
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in ids], "doc_id string, text string"
    )
    got = length_bucketed_batches(docs, 4, id_block=8)
    naive = docs.select(
        "doc_id", F.size(T.tokens("text")).cast("long").alias("n_tokens")
    ).withColumn(
        "batch_id",
        ((F.row_number().over(Window.orderBy("n_tokens", "doc_id")) - 1) / 4)
        .cast("long"),
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, naive.select("doc_id", "n_tokens", "batch_id").collect()))
    assert a == b
