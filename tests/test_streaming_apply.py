"""Streaming Type-1 ledger (streaming/apply.py): correction batches
continuously merge_upsert into versioned parquet snapshots — update /
insert / delete across micro-batches, replay convergence via merge
idempotence, crash-torn snapshots never read, old versions pruned."""

from __future__ import annotations

import os

from recon_spark.streaming.apply import (
    _list_versions,
    read_ledger,
    run_apply_stream,
)

SCHEMA = "transaction_id string, tax_code string, taxable_amt double, is_void boolean"


def _write_batch(spark, src, rows, mode):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(src)


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).parquet(src)


def _run(spark, src, ledger, ckpt):
    run_apply_stream(
        _stream(spark, src), ledger, ckpt, ["transaction_id"], delete_col="is_void"
    )


def _state(spark, ledger):
    df = read_ledger(spark, ledger)
    return sorted(
        (r.transaction_id, r.tax_code, r.taxable_amt) for r in df.collect()
    )


def test_keep_versions_zero_is_rejected(tmp_path):
    """keep_versions=0 used to slice `[:-0]` == keep-everything — the
    silent opposite of the request (ADVICE r6); now rejected up front."""
    import pytest

    from recon_spark.streaming.apply import ledger_upsert_writer

    with pytest.raises(ValueError, match="keep_versions"):
        ledger_upsert_writer(str(tmp_path / "ledger"), ["transaction_id"], keep_versions=0)


def test_ledger_applies_update_insert_delete_across_batches(spark, tmp_path):
    src, ledger, ckpt = (str(tmp_path / d) for d in ("src", "ledger", "ckpt"))

    _write_batch(
        spark,
        src,
        [("T1", "7", 100.0, False), ("T2", "B", 200.0, False)],
        "overwrite",
    )
    _run(spark, src, ledger, ckpt)
    assert _state(spark, ledger) == [("T1", "7", 100.0), ("T2", "B", 200.0)]

    # batch 2: update T1, insert T3, delete T2
    _write_batch(
        spark,
        src,
        [("T1", "G", 110.0, False), ("T3", "4", 300.0, False), ("T2", None, None, True)],
        "append",
    )
    _run(spark, src, ledger, ckpt)
    assert _state(spark, ledger) == [("T1", "G", 110.0), ("T3", "4", 300.0)]


def test_ledger_converges_under_forced_replay(spark, tmp_path):
    """Delete the checkpoint commit marker so the restarted query
    re-executes the last micro-batch: Type-1 merge idempotence must make
    the replayed snapshot byte-equal in content (exactly-once effect
    without batch-id bookkeeping)."""
    src, ledger, ckpt = (str(tmp_path / d) for d in ("src", "ledger", "ckpt"))
    _write_batch(
        spark,
        src,
        [("T1", "7", 100.0, False), ("T2", "B", 200.0, False)],
        "overwrite",
    )
    _run(spark, src, ledger, ckpt)
    before = _state(spark, ledger)

    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    _run(spark, src, ledger, ckpt)  # replays the batch
    assert _state(spark, ledger) == before


def test_torn_snapshot_is_never_read_and_versions_pruned(spark, tmp_path):
    src, ledger, ckpt = (str(tmp_path / d) for d in ("src", "ledger", "ckpt"))
    for i in range(5):  # five micro-batches -> five snapshot versions
        _write_batch(
            spark, src, [(f"T{i}", "7", float(i), False)], "overwrite" if i == 0 else "append"
        )
        _run(spark, src, ledger, ckpt)
    versions = _list_versions(spark, ledger)
    assert len(versions) <= 3  # pruned to keep_versions
    assert len(_state(spark, ledger)) == 5  # all five keys survive pruning

    # a torn write (no _SUCCESS) must be invisible to readers
    torn = os.path.join(ledger, "v=999")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"garbage")
    assert 999 not in _list_versions(spark, ledger)
    assert len(_state(spark, ledger)) == 5
