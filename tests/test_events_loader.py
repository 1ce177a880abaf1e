"""load_events dtype branch: both storage layouts the driver has shipped.

Round-3 lesson: events.parquet silently changed from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) and the loader's unconditional nanos workaround broke
every events query. The loader now branches on the loaded type; this
file keeps BOTH branches exercised regardless of which layout the
current testdata uses (the nanos file is synthesized here, since no
shipped testdata stores nanos anymore).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from recon_spark.sources.tpch import load_events

ROWS = [
    (1, 1_700_000_000_123_456_789, 10, "click", 1.5, "a"),
    (2, 1_700_000_001_987_654_321, 11, "view", 2.5, "b"),
]


def _write_events(tmpdir: str, unit: str) -> str:
    ts = pa.array([r[1] // (1_000 if unit == "us" else 1) for r in ROWS],
                  pa.timestamp(unit))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": [r[3] for r in ROWS],
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": [r[5] for r in ROWS],
        }
    )
    pq.write_table(t, os.path.join(tmpdir, "events.parquet"),
                   store_schema=False, coerce_timestamps=None)
    return tmpdir


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_events_both_storage_layouts(spark, tmp_path, unit):
    """Either layout loads to a session-zone TIMESTAMP with identical
    microsecond values (ns truncates by floor division)."""
    sf_dir = _write_events(str(tmp_path), unit)
    df = load_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as F

    got = {r.event_id: r.us for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()}
    assert got == {r[0]: r[1] // 1_000 for r in ROWS}


def test_load_events_conf_restored(spark, tmp_path):
    """The nanos fallback must not leak nanosAsLong into the session."""
    sf_dir = _write_events(str(tmp_path), "ns")
    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    load_events(spark, sf_dir).count()
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == before


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_streaming_trend_both_storage_layouts(spark, tmp_path, unit):
    """The STREAM-side schema probe (streaming.trends.events_stream) must
    branch on the stored ts dtype exactly like the batch loader — the
    round-3 driver failure was the streaming path assuming one layout."""
    from recon_spark.streaming import trends

    sf_dir = _write_events(str(tmp_path), unit)
    out = trends.run_to_memory(spark, sf_dir, name=f"trend_layout_{unit}")
    rows = {(r.event_type, r.n, r.value_total_micros) for r in out.collect()}
    assert rows == {("click", 1, 1_500_000), ("view", 1, 2_500_000)}
    # replay_conf must restore the nanos conf after the bounded run
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
