"""Streaming ingestion: run the batch cleaners continuously over a landing
directory via ``foreachBatch``.

The cleaners are window-bearing batch transformations (dedup D1-D3), which
Structured Streaming cannot express directly; ``foreachBatch`` is the
idiomatic bridge — each micro-batch is cleaned with the EXACT batch
cleaner (same code path the oracle verifies) and appended to the curated
table.

Semantics note (documented, not hidden): the keep-first dedup then applies
*within* each micro-batch. Cross-batch duplicate keys are handled upstream
by :func:`recon_spark.streaming.stateful.dedup_events`-style
``dropDuplicatesWithinWatermark`` on the match key, or downstream by a
MERGE-capable sink keyed on the match key (Delta/Iceberg on a cluster).
With an ``availableNow`` single batch, output is bit-identical to the
batch cleaner.

100 TB notes: each micro-batch is bounded by source options
(``maxFilesPerTrigger``); the cleaner plan is narrow except the dedup
window shuffle, whose key prefix matches the downstream join key, so the
curated table can be written bucketed (operators/partitioning.py) and
every consumer joins exchange-free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import cleaning


def stream_clean(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    cleaner: Callable[[DataFrame], DataFrame] = cleaning.clean_matrix,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Continuously clean raw parquet landing in ``src_path`` into
    ``dst_path``. Returns the started StreamingQuery (caller awaits)."""
    batch_schema = spark.read.parquet(src_path).schema
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(src_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cleaner(batch_df).write.mode("append").parquet(dst_path)

    writer = raw.writeStream.foreachBatch(_process).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
