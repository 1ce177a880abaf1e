"""Stateful streaming operators vs their batch equivalents (sf0.001)."""

import pytest
from pyspark.sql import functions as F

from recon_spark.sources.tpch import load_events
from recon_spark.streaming import stateful

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_events(spark, SF).filter(F.col("ts").isNotNull())


def test_streaming_dedup_matches_batch_distinct(spark, batch_events):
    out = stateful.run_dedup_to_memory(spark, SF, name="t_dedup")
    got = {(r.user_id, r.event_type) for r in out.select("user_id", "event_type").collect()}
    want = {
        (r.user_id, r.event_type)
        for r in batch_events.select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    assert out.count() == len(got)  # one survivor per key


def test_running_totals_match_batch_rollup(spark, batch_events):
    out = stateful.run_running_totals_to_memory(spark, SF, name="t_totals")
    got = {r.event_type: (r.n, round(r.value_total, 4)) for r in out.collect()}
    want = {
        r.event_type: (r.n, round(r.value_total, 4))
        for r in batch_events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("value_total"),
        )
        .collect()
    }
    assert got == want


def test_batch_dedup_path(spark, batch_events):
    out = stateful.dedup_events(batch_events)
    assert out.count() == batch_events.select(*stateful.DEDUP_KEYS).distinct().count()
