"""Checkpoint recovery: stateful streaming state must survive a query
restart — the property that makes a 100 TB continuously-ingesting
pipeline restartable without re-emitting or double-counting.

Both tests run a query availableNow against a source directory with an
EXPLICIT checkpoint + file sink, stop it, drop more files (including
duplicates of already-seen keys), and restart from the same checkpoint:
the dedup state and the watermark must come back from the state store,
so cross-restart duplicates are suppressed and only genuinely-new rows
are appended."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from recon_spark.streaming.stateful import dedup_events


def _write_batch(spark, path, rows, mode):
    df = spark.createDataFrame(
        [
            (u, t, dt.datetime(2025, 3, 1) + dt.timedelta(hours=h), float(v))
            for u, t, h, v in rows
        ],
        "user_id long, event_type string, ts timestamp, value double",
    )
    df.coalesce(1).write.mode(mode).parquet(path)


def _run_once(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .parquet(src)
    )
    q = (
        dedup_events(stream, watermark="10 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        # run 1: two keys, one in-batch duplicate
        _write_batch(
            spark,
            src,
            [(1, "click", 0, 1.0), (1, "click", 1, 2.0), (2, "view", 0, 3.0)],
            "overwrite",
        )
        _run_once(spark, src, out, ckpt)
        first = spark.read.parquet(out).collect()
        assert sorted((r["user_id"], r["event_type"]) for r in first) == [
            (1, "click"),
            (2, "view"),
        ]

        # run 2 (same checkpoint): a cross-restart duplicate of (1, click)
        # within the watermark horizon plus one genuinely-new key
        _write_batch(
            spark, src, [(1, "click", 5, 9.0), (3, "signup", 5, 4.0)], "append"
        )
        _run_once(spark, src, out, ckpt)
        second = spark.read.parquet(out).collect()
        keys = sorted((r["user_id"], r["event_type"]) for r in second)
        assert keys == [(1, "click"), (2, "view"), (3, "signup")], keys

        # the surviving (1, click) row is still the FIRST one ever seen
        v = [r["value"] for r in second if (r["user_id"], r["event_type"]) == (1, "click")]
        assert v == [1.0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_restart_without_new_files_emits_nothing(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        _write_batch(spark, src, [(1, "click", 0, 1.0)], "overwrite")
        _run_once(spark, src, out, ckpt)
        n1 = spark.read.parquet(out).count()
        # restart with no source change: the file-source offset log must
        # prevent reprocessing — no new rows, no duplicates
        _run_once(spark, src, out, ckpt)
        n2 = spark.read.parquet(out).count()
        assert (n1, n2) == (1, 1)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
