"""Streaming near-duplicate ingestion gate: the training-corpus front
door.

Batch dedup (operators/dedup.py) answers "which documents in THIS corpus
duplicate each other". A continuously-ingesting pipeline needs the
incremental question: "is this NEW document a duplicate of anything the
corpus has already accepted?" — asked per micro-batch, exactly-once,
without rescanning the corpus text. This module composes the existing
building blocks into that gate:

- A compact **signature store** (``(id, fingerprint, minhash sig)``,
  ~100 bytes/doc — the thing you can afford to keep hot at 100 TB of
  text) persisted as parquet partitioned by ``__batch_id``.
- Per micro-batch, each document is checked **against the prior store**
  (exact: fingerprint equi-join; near: LSH band equi-join + signature
  agreement >= threshold — never all-pairs) and **within the batch**
  (keep-first per fingerprint; greedy LSH pairs). Verdicts are
  ``unique | exact_dup | near_dup`` with a deterministic ``dup_of``
  (the smallest qualifying prior id; prior-corpus matches outrank
  in-batch matches).
- **Replay safety** uses the batch-id idempotence recipe
  (:mod:`recon_spark.streaming.exactly_once`): verdicts and new store
  rows land in ``__batch_id=N`` partitions via dynamic partition
  overwrite, and the prior-store read EXCLUDES partition N itself — a
  replayed batch cannot see its own previous output and mark everything
  duplicate. Re-running batch N converges to identical verdicts and an
  identical store.

Greedy in-batch semantics (documented, deliberate): near-dup pairs are
resolved pairwise (``id_b`` defers to ``id_a``), not by connected
components — an ingestion gate decides per document as it arrives; run
:func:`recon_spark.operators.components.resolve_clusters` over the
accepted corpus for the offline transitive cleanup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.dedup import (
    BAND_ROWS,
    N_BANDS,
    N_MINHASH,
    band_hashes,
    with_minhash,
)

STORE_SCHEMA = "id long, fp string, sig array<string>, __batch_id long"


def _prior_store(spark: SparkSession, store_dir: str, batch_id: int) -> DataFrame:
    """Store rows committed by batches BEFORE ``batch_id`` (excluding the
    current batch's own partition so replays converge); empty frame with
    the store schema when no prior batch exists."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return spark.createDataFrame([], STORE_SCHEMA)
    return spark.read.schema(STORE_SCHEMA).parquet(store_dir).filter(
        F.col("__batch_id") < batch_id
    )


def _banded(df: DataFrame, id_col: str, prefix: str) -> DataFrame:
    return df.filter(F.col("sig").isNotNull()).select(
        F.col(id_col).alias(f"{prefix}id"),
        F.col("sig").alias(f"{prefix}sig"),
        F.explode(band_hashes(F.col("sig"), N_BANDS, BAND_ROWS)).alias("b"),
    ).select(f"{prefix}id", f"{prefix}sig", "b.band_idx", "b.band_hash")


def _agreement(a: Column, b: Column) -> Column:
    return (
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda x: x)).cast(
            "double"
        )
        / N_MINHASH
    )


def dedup_gate_writer(
    store_dir: str,
    verdicts_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function implementing the gate. Verdict rows:
    ``(id, status, dup_of, __batch_id)``."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = (
            with_minhash(batch_df, text_col, sig_out="sig")
            .withColumn("fp", T.fingerprint(text_col))
            .select(F.col(id_col).alias("id"), "fp", "sig")
        )
        # the batch frame is read by four joins below; signatures are the
        # compact form, so persist once (caller-owned lifecycle pattern)
        sigs = sigs.persist()
        prior = _prior_store(spark, store_dir, batch_id)

        # 1. exact vs prior corpus
        exact_prior = (
            sigs.join(
                prior.select("fp", F.col("id").alias("dup_of")), "fp"
            )
            .groupBy("id")
            .agg(F.min("dup_of").alias("dup_of"))
            .select("id", F.lit(0).alias("prio"), F.lit("exact_dup").alias("status"), "dup_of")
        )
        # 2. near vs prior corpus: band join, then signature agreement
        nb = _banded(sigs, "id", "n_")
        pb = _banded(prior, "id", "p_")
        near_prior = (
            nb.join(pb, ["band_idx", "band_hash"])
            .filter(_agreement(F.col("n_sig"), F.col("p_sig")) >= threshold)
            .groupBy(F.col("n_id").alias("id"))
            .agg(F.min("p_id").alias("dup_of"))
            .select("id", F.lit(1).alias("prio"), F.lit("near_dup").alias("status"), "dup_of")
        )
        # 3. exact within the batch: every fp's non-minimum ids defer
        firsts = sigs.groupBy("fp").agg(F.min("id").alias("dup_of"))
        exact_batch = (
            sigs.join(firsts, "fp")
            .filter(F.col("id") > F.col("dup_of"))
            .select("id", F.lit(2).alias("prio"), F.lit("exact_dup").alias("status"), "dup_of")
        )
        # 4. near within the batch (greedy: id_b defers to smallest id_a)
        lb = _banded(sigs, "id", "a_")
        rb = _banded(sigs, "id", "c_")
        near_batch = (
            lb.join(rb, ["band_idx", "band_hash"])
            .filter(F.col("a_id") < F.col("c_id"))
            .filter(_agreement(F.col("a_sig"), F.col("c_sig")) >= threshold)
            .groupBy(F.col("c_id").alias("id"))
            .agg(F.min("a_id").alias("dup_of"))
            .select("id", F.lit(3).alias("prio"), F.lit("near_dup").alias("status"), "dup_of")
        )

        hits = exact_prior.unionByName(near_prior).unionByName(exact_batch).unionByName(near_batch)
        best = (
            hits.groupBy("id")
            .agg(F.min(F.struct("prio", "dup_of", "status")).alias("h"))
            .select("id", F.col("h.status").alias("status"), F.col("h.dup_of").alias("dup_of"))
        )
        verdicts = (
            sigs.select("id")
            .join(best, "id", "left")
            .select(
                "id",
                F.coalesce("status", F.lit("unique")).alias("status"),
                "dup_of",
                F.lit(batch_id).alias("__batch_id"),
            )
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(verdicts_dir)
        )
        survivors = (
            sigs.join(verdicts.filter("status = 'unique'").select("id"), "id")
            .select("id", "fp", "sig", F.lit(batch_id).alias("__batch_id"))
        )
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(store_dir)
        )
        sigs.unpersist()

    return apply_batch


def run_dedup_ingest(
    docs_stream: DataFrame,
    store_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> None:
    """Drain a document stream (availableNow) through the dedup gate."""
    q = (
        docs_stream.writeStream.foreachBatch(
            dedup_gate_writer(
                store_dir,
                verdicts_dir,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- deterministic gate replay (graded parity fold, VERDICT r8 #6) -----------

#: replay-corpus constants — shared with the DuckDB rendering
#: (oracles/llm_sql.gate_replay_ctes) so the two sides cannot drift
GATE_REPLAY_BATCHES = 3
GATE_REPLAY_THRESHOLD = 0.5  # signature-agreement fraction (6 of 12 hashes)
GATE_EXACT_MOD = 17   # every 17th doc replants as a cross/in-batch exact copy
GATE_NEAR_MOD = 23    # every 23rd doc replants as a near copy
GATE_EXACT_OFFSET = 100_000
GATE_NEAR_OFFSET = 200_000
GATE_NEAR_TAIL = " planted near duplicate tail"


def gate_replay_corpus(docs: DataFrame, n_batches: int = GATE_REPLAY_BATCHES) -> DataFrame:
    """The deterministic ``(batch_id, id, text)`` replay corpus: every
    document lands in batch ``doc_id % n``; every ``GATE_EXACT_MOD``-th
    doc is replanted verbatim one batch later (cross-batch exact dup —
    and for ``doc_id % n == n-1`` the plant wraps to batch 0, arriving
    BEFORE its organic source, so the organic doc is the one that
    defers: both directions of the store lookup are exercised); every
    ``GATE_NEAR_MOD``-th doc is replanted two batches later with a
    token tail (near dup)."""
    did = F.col("doc_id")
    organic = docs.select(
        (did % n_batches).alias("batch_id"), did.alias("id"), "text"
    )
    exact = docs.filter(did % GATE_EXACT_MOD == 0).select(
        ((did + 1) % n_batches).alias("batch_id"),
        (did + GATE_EXACT_OFFSET).alias("id"),
        "text",
    )
    near = docs.filter(did % GATE_NEAR_MOD == 0).select(
        ((did + 2) % n_batches).alias("batch_id"),
        (did + GATE_NEAR_OFFSET).alias("id"),
        F.concat("text", F.lit(GATE_NEAR_TAIL)).alias("text"),
    )
    return organic.unionByName(exact).unionByName(near)


def run_gate_replay(
    spark: SparkSession,
    docs: DataFrame,
    *,
    n_batches: int = GATE_REPLAY_BATCHES,
    threshold: float = GATE_REPLAY_THRESHOLD,
) -> DataFrame:
    """Run the REAL ``foreachBatch`` gate over the replay corpus — one
    sequential availableNow drain per batch, so the signature store
    evolves batch-over-batch exactly as in production ingestion — and
    return the full verdict table ``(id, status, dup_of, batch_id)``.

    The verdicts are collected to a local frame (bounded: one row per
    corpus document) so the temporary store/checkpoint dirs can be
    removed before returning; the caller folds them to a checksum."""
    import os
    import shutil
    import tempfile

    corpus = gate_replay_corpus(docs, n_batches).persist()
    base = tempfile.mkdtemp(prefix="gate_replay_")
    src, store, verdicts, ckpt = (
        os.path.join(base, d) for d in ("src", "store", "verdicts", "ckpt")
    )
    try:
        for b in range(n_batches):
            (
                corpus.filter(F.col("batch_id") == b)
                .select("id", "text")
                .coalesce(1)
                .write.mode("overwrite" if b == 0 else "append")
                .parquet(src)
            )
            stream = spark.readStream.schema("id long, text string").parquet(src)
            run_dedup_ingest(
                stream, store, verdicts, ckpt, id_col="id", threshold=threshold
            )
        rows = (
            spark.read.parquet(verdicts)
            .select("id", "status", "dup_of", F.col("__batch_id").alias("batch_id"))
            .collect()
        )
    finally:
        corpus.unpersist()
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "id long, status string, dup_of long, batch_id long"
    )
