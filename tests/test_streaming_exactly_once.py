"""Sink idempotence under forced micro-batch replay (the last streaming
surface a real deployment needs beyond state recovery, which
test_streaming_recovery.py covers): deleting the checkpoint's commit
marker makes the restarted query RE-EXECUTE the batch — exactly the
crash-between-sink-write-and-commit window — and the batch-id-keyed
dynamic-overwrite sink must converge to zero duplicates, while a naive
append sink demonstrably duplicates under the identical replay."""

from __future__ import annotations

import datetime as dt
import os

from recon_spark.streaming.exactly_once import (
    idempotent_parquet_writer,
    run_ingest_exactly_once,
)

SCHEMA = "user_id long, event_type string, ts timestamp, value double"


def _write_src(spark, path, rows, mode):
    df = spark.createDataFrame(
        [
            (u, t, dt.datetime(2025, 3, 1) + dt.timedelta(hours=h), float(v))
            for u, t, h, v in rows
        ],
        SCHEMA,
    )
    df.coalesce(1).write.mode(mode).parquet(path)


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).parquet(src)


def _force_replay(ckpt: str) -> None:
    """Delete the newest commit marker: offsets/N exists, commits/N is
    gone — on restart Structured Streaming re-runs batch N with the same
    batch_id and the same source offsets (the documented recovery
    contract), which is indistinguishable from a crash after the sink
    write."""
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    # the local-FS checksum sidecar must go too, or the replayed batch's
    # commit rename fails with FileAlreadyExistsException
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_idempotent_sink_survives_forced_replay(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows1 = [(1, "click", 0, 1.0), (2, "view", 1, 2.0), (3, "click", 2, 3.0)]
    _write_src(spark, src, rows1, "overwrite")
    run_ingest_exactly_once(_stream(spark, src), out, ckpt)
    first = sorted(
        (r.user_id, r.event_type, r.value) for r in spark.read.parquet(out).collect()
    )
    assert len(first) == 3

    # crash window: commit marker gone -> restart replays the batch
    _force_replay(ckpt)
    run_ingest_exactly_once(_stream(spark, src), out, ckpt)
    replayed = sorted(
        (r.user_id, r.event_type, r.value) for r in spark.read.parquet(out).collect()
    )
    assert replayed == first  # no duplicates, no losses

    # new data after recovery appends a NEW batch partition only
    _write_src(spark, src, [(4, "signup", 3, 4.0)], "append")
    run_ingest_exactly_once(_stream(spark, src), out, ckpt)
    final = sorted(
        (r.user_id, r.event_type, r.value) for r in spark.read.parquet(out).collect()
    )
    assert final == sorted(first + [(4, "signup", 4.0)])
    # two batch partitions on disk: the replayed 0 and the new 1
    parts = sorted(
        d for d in os.listdir(out) if d.startswith("__batch_id=")
    )
    assert len(parts) == 2


def test_naive_append_sink_duplicates_under_same_replay(spark, tmp_path):
    """Counter-demonstration: the SAME forced replay against a plain
    append foreachBatch doubles every row — proving the test exercises
    the real at-least-once window rather than vacuously passing."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_src(spark, src, [(1, "click", 0, 1.0), (2, "view", 1, 2.0)], "overwrite")

    def naive(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    def run():
        q = (
            _stream(spark, src)
            .writeStream.foreachBatch(naive)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out).count() == 2
    _force_replay(ckpt)
    run()
    assert spark.read.parquet(out).count() == 4  # the failure mode, demonstrated


def test_idempotent_writer_direct_rewrite(spark, tmp_path):
    """Unit-level: re-invoking the writer with the same batch_id (what a
    replay does) rewrites that partition in place; other batches stay."""
    out = str(tmp_path / "out")
    w = idempotent_parquet_writer(out)
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df1 = spark.createDataFrame([(3, "c")], "k long, v string")
    w(df0, 0)
    w(df1, 1)
    w(df0, 0)  # replay of batch 0
    got = sorted((r.k, r.v, r["__batch_id"]) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]
