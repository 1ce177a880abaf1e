"""Exactly-once delivery to a non-transactional sink via ``foreachBatch``
batch-id idempotence.

Structured Streaming guarantees exactly-once STATE with checkpointing,
but a plain file/JDBC sink is only at-least-once: if the process dies
after the sink write but before the checkpoint's commit marker, the
restarted query REPLAYS that micro-batch (same ``batch_id``, same
offsets) and a naive append writes every row twice. The standard recipe
(Structured Streaming programming guide, "foreachBatch" section) is to
make the write idempotent ON ``batch_id``: key the output by batch so a
replay overwrites its own previous — possibly partial — output instead
of appending beside it.

Here: each micro-batch lands in a ``__batch_id=N`` partition directory
with dynamic partition overwrite, so rewriting batch N touches ONLY
partition N (earlier batches' directories are untouched), and the sink
converges to exactly-once output under any crash/replay interleaving.
At 100 TB this composes with :func:`recon_spark.sources.sinks.compact`:
the per-batch directories are the small-files source that compaction
periodically rewrites.

Forced-replay coverage: tests/test_streaming_exactly_once.py deletes the
checkpoint's commit marker to make the restarted query re-execute a
batch and asserts zero duplicates (and demonstrates that a naive append
sink DOES duplicate under the identical replay).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``{out_dir}/__batch_id={batch_id}/`` with dynamic partition
    overwrite — replay-safe (idempotent per batch id)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_dir)
        )

    return write


def run_ingest_exactly_once(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain ``stream_df`` (availableNow) into ``out_dir`` through the
    idempotent writer, checkpointed at ``checkpoint_dir``. Restartable:
    a crash between sink write and checkpoint commit replays the batch
    into the same partition instead of duplicating it."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_writer(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
