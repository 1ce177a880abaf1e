"""Continuous correction application: a streaming Type-1 ledger.

Composes the batch merge operator (:func:`recon_spark.operators.merge.
merge_upsert`) with Structured Streaming ``foreachBatch`` so correction
batches arriving as files continuously upsert a key-unique ledger —
the streaming form of the ``corrections_merge_apply`` graded query's
"close the loop" story (reference analogue: the operations team
uploading correction files as they are produced,
/root/reference/src/outputs/build_correction_file.py — behavior only;
the streaming ledger is new engineering on Spark).

Design, and why it is replay-safe WITHOUT batch-id bookkeeping:

- The ledger lives as **versioned parquet snapshots**
  ``{ledger_dir}/v=N`` (N = the micro-batch id that produced it);
  readers take the highest complete version. Each micro-batch reads the
  latest snapshot, merges the batch, and overwrites ``v=N``.
- Type-1 MERGE is **idempotent**: applying the same update batch twice
  yields the same ledger (matched rows overwrite to the same values,
  inserts collide into the same key, deletes of absent keys no-op). So
  a replayed micro-batch — even one whose previous attempt already
  produced ``v=N`` or whose snapshot base already contains the batch —
  converges to the identical snapshot. This is the complementary
  recipe to :mod:`recon_spark.streaming.exactly_once` (which keys
  APPEND-shaped output by batch id; upserts get exactly-once from
  idempotence instead).
- ``merge_upsert(validate_unique=True)`` guards the within-batch
  key-dedup contract at execution time.

At 100 TB the snapshot rewrite becomes the motivation for a real table
format (Delta/Iceberg MERGE INTO, copy-on-write); the shape here — one
key shuffle per batch, corrections-sized update side broadcast — is the
same one those formats execute, expressed on plain parquet. Old
versions are pruned to ``keep_versions`` snapshots per batch, which is
also what keeps the directory listing bounded.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_upsert


def _list_versions(spark: SparkSession, ledger_dir: str) -> list[int]:
    """Committed snapshot versions under ``ledger_dir``, via the Hadoop
    FileSystem API (any scheme Spark reads); a version counts only once
    its ``_SUCCESS`` marker exists, so a crashed half-written snapshot
    is never picked up as a read base."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(ledger_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
                out.append(int(name[2:]))
    return sorted(out)


def read_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame | None:
    """The newest committed ledger snapshot, or None before the first."""
    versions = _list_versions(spark, ledger_dir)
    if not versions:
        return None
    return spark.read.parquet(f"{ledger_dir}/v={versions[-1]}")


def ledger_upsert_writer(
    ledger_dir: str,
    keys: Sequence[str],
    *,
    delete_col: str | None = None,
    keep_versions: int = 3,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function: merge each correction micro-batch into
    the latest ledger snapshot and commit it as ``v={batch_id}``."""
    if keep_versions < 1:
        # keep_versions=0 would slice `[:-0]` == everything-kept below —
        # silently the opposite of what the caller asked (ADVICE r6); at
        # least the newest snapshot must survive for read_ledger anyway
        raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
    keys = list(keys)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = read_ledger(spark, ledger_dir)
        if base is None:
            base = batch_df.drop(delete_col) if delete_col else batch_df
            base = base.filter("1=0")  # empty frame with the ledger schema
        merged = merge_upsert(
            base,
            batch_df,
            keys,
            delete_col=delete_col,
            validate_unique=True,
        )
        merged.write.mode("overwrite").parquet(f"{ledger_dir}/v={batch_id}")
        # prune old snapshots (keep the newest `keep_versions`)
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for v in _list_versions(spark, ledger_dir)[:-keep_versions]:
            p = jvm.org.apache.hadoop.fs.Path(f"{ledger_dir}/v={v}")
            p.getFileSystem(hconf).delete(p, True)

    return apply_batch


def run_apply_stream(
    corrections_stream: DataFrame,
    ledger_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    *,
    delete_col: str | None = None,
) -> None:
    """Drain a corrections stream (availableNow) into the versioned
    ledger. Restartable at any point: a replayed batch re-merges
    idempotently and overwrites its own snapshot."""
    q = (
        corrections_stream.writeStream.foreachBatch(
            ledger_upsert_writer(ledger_dir, keys, delete_col=delete_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
