"""Streaming near-dup ingestion gate (streaming/dedup_ingest.py):
cross-batch exact + near detection against the signature store, in-batch
dedup, deterministic dup_of attribution, replay convergence (the store
read excludes the replaying batch's own partition), and store growth
limited to accepted documents."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from recon_spark.streaming.dedup_ingest import run_dedup_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog again and again while "
    "seventeen startled geese watch from the fence line near the orchard"
)
OTHER = (
    "completely different subject matter entirely about distributed "
    "query engines shuffling partitioned columnar data across executors"
)
THIRD = (
    "a third unrelated document describing citrus orchards irrigation "
    "schedules and the seasonal labor planning they require every spring"
)


def _write_batch(spark, src, rows, mode):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        mode
    ).parquet(src)


def _run(spark, src, store, verdicts, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    run_dedup_ingest(stream, store, verdicts, ckpt, threshold=0.5)


def _verdicts(spark, verdicts):
    return {
        r.id: (r.status, r.dup_of, r["__batch_id"])
        for r in spark.read.parquet(verdicts).collect()
    }


def test_gate_across_batches_and_replay(spark, tmp_path):
    src, store, verdicts, ckpt = (
        str(tmp_path / d) for d in ("src", "store", "verdicts", "ckpt")
    )

    # batch 0: two distinct docs + one in-batch exact copy + one in-batch
    # near copy (suffix appended)
    _write_batch(
        spark,
        src,
        [
            (1, BASE),
            (2, OTHER),
            (3, BASE),                      # in-batch exact dup of 1
            (4, BASE + " tail tokens"),     # in-batch near dup of 1
        ],
        "overwrite",
    )
    _run(spark, src, store, verdicts, ckpt)
    v = _verdicts(spark, verdicts)
    assert v[1] == ("unique", None, 0)
    assert v[2] == ("unique", None, 0)
    assert v[3] == ("exact_dup", 1, 0)
    assert v[4] == ("near_dup", 1, 0)
    # store holds only the accepted documents
    store_ids = {r.id for r in spark.read.parquet(store).collect()}
    assert store_ids == {1, 2}

    # batch 1: exact copy of a PRIOR doc, near copy of a PRIOR doc, and a
    # fresh doc
    _write_batch(
        spark,
        src,
        [
            (10, OTHER),                    # exact dup of prior 2
            (11, BASE + " extra ending"),   # near dup of prior 1
            (12, THIRD),                    # fresh
        ],
        "append",
    )
    _run(spark, src, store, verdicts, ckpt)
    v = _verdicts(spark, verdicts)
    assert v[10] == ("exact_dup", 2, 1)
    assert v[11] == ("near_dup", 1, 1)
    assert v[12] == ("unique", None, 1)
    store_ids = {r.id for r in spark.read.parquet(store).collect()}
    assert store_ids == {1, 2, 12}

    # forced replay of batch 1: delete the commit marker; the replayed
    # batch must not see its own store partition (else 12 would become a
    # dup of itself) and must converge to identical verdicts + store
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, src, store, verdicts, ckpt)
    assert _verdicts(spark, verdicts) == v
    assert {r.id for r in spark.read.parquet(store).collect()} == {1, 2, 12}


def test_gate_empty_and_whitespace_docs_pass_exact_only(spark, tmp_path):
    """Docs with no tokens have NULL signatures — they skip the near-dup
    joins but identical raw text still exact-dups via the fingerprint."""
    src, store, verdicts, ckpt = (
        str(tmp_path / d) for d in ("src", "store", "verdicts", "ckpt")
    )
    _write_batch(spark, src, [(1, "   "), (2, "   "), (3, BASE)], "overwrite")
    _run(spark, src, store, verdicts, ckpt)
    v = _verdicts(spark, verdicts)
    assert v[1] == ("unique", None, 0)
    assert v[2] == ("exact_dup", 1, 0)
    assert v[3] == ("unique", None, 0)
