"""Distributed exact rank statistics (operators/ranking.py): value parity
with the single-task builtins they replace, plan hygiene (no global
single-partition row sort), and ntile edge arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from recon_spark.operators import ranking


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- ntile_bins ---------------------------------------------------------------


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (100, 4), (101, 7), (97, 10)])
def test_ntile_bins_matches_builtin(spark, n, k):
    """Exact parity with F.ntile over (score desc, id asc) — including
    the first-N%k-bins-get-one-extra-row rule — across remainder shapes."""
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 5).cast("double").alias("q"),  # 5 tied score levels
    )
    w = Window.orderBy(F.col("q").desc(), F.col("id").asc())
    expected = {
        (r.id, r.q): r.bin
        for r in df.withColumn("bin", F.ntile(k).over(w)).collect()
    }
    got = {
        (r.id, r.q): r.bin
        for r in ranking.ntile_bins(df, "q", "id", k, id_block=16).collect()
    }
    assert got == expected


def test_ntile_bins_no_global_row_sort(spark):
    """The per-row path must not contain an ntile window (whose plan is a
    SinglePartition exchange of ALL rows); the only global exchange feeds
    the bucket-count frame."""
    df = spark.range(1000).select(
        "id", ((F.col("id") % 4) / 3.0).alias("q")
    )
    plan = _plan(ranking.ntile_bins(df, "q", "id", 4))
    assert "ntile(" not in plan
    # the within-bucket rank window must be partitioned (hashpartitioning
    # on the bucket key), not a bare SinglePartition over the input rows
    assert "hashpartitioning(q" in plan


# --- exact_group_percentiles --------------------------------------------------


def test_exact_percentiles_match_builtin(spark):
    """Value-identical (exact doubles, no tolerance) to F.percentile for
    several group shapes: ties, singletons, even/odd counts."""
    rows = []
    import random

    rnd = random.Random(7)
    for g, n in [("a", 101), ("b", 100), ("c", 1), ("d", 2), ("e", 37)]:
        for i in range(n):
            # mix of ties and spread, values in a few buckets
            rows.append((g, round(rnd.uniform(0, 5), 2) if i % 3 else float(i % 4)))
    df = spark.createDataFrame(rows, ["g", "v"])
    ps = [0.5, 0.9, 0.0, 1.0, 0.25]
    expected = {
        (r.g, p): r[f"p{i}"]
        for r in df.groupBy("g")
        .agg(
            *[
                F.percentile("v", F.lit(p)).alias(f"p{i}")
                for i, p in enumerate(ps)
            ]
        )
        .collect()
        for i, p in enumerate(ps)
    }
    got = {
        (r.g, r.p): r.value
        for r in ranking.exact_group_percentiles(df, ["g"], "v", ps).collect()
    }
    assert set(got) == set(expected)
    for key in expected:
        assert got[key] == expected[key], (key, got[key], expected[key])


def test_exact_percentiles_negative_values(spark):
    """floor-bucketing must stay monotonic for negative values."""
    df = spark.createDataFrame(
        [("x", float(v)) for v in [-10.5, -3.2, -0.1, 0.0, 2.7, 9.9]], ["g", "v"]
    )
    expected = df.groupBy("g").agg(F.percentile("v", F.lit(0.5)).alias("m")).collect()[0].m
    got = (
        ranking.exact_group_percentiles(df, ["g"], "v", [0.5]).collect()[0].value
    )
    assert got == expected


def test_exact_percentiles_no_giant_buffer(spark):
    """Plan must not contain the builtin exact `percentile(` aggregate
    (whose buffer holds the whole group); rank windows are partitioned by
    the bucket key."""
    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    plan = _plan(ranking.exact_group_percentiles(df, ["g"], "v", [0.5, 0.9]))
    assert "percentile(" not in plan
    assert "hashpartitioning(g" in plan


# --- graded-query integration -------------------------------------------------


def test_quality_bins_query_plan_is_distributed(spark):
    from recon_spark.registry import QUERIES

    df = QUERIES["data_quality_bins"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "ntile(" not in plan


def test_value_percentiles_query_plan_is_distributed(spark):
    from recon_spark.registry import QUERIES

    df = QUERIES["analytics_value_percentiles"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "percentile(" not in plan
