"""Bloom-filter membership (operators/bloom.py): the no-false-negative
guarantee, the FP band, literal-vs-join path parity, and null/missing
handling. The graded fold (dedup_exact_documents' bloom parity columns)
is differential-fuzzed in tests/test_dedup_fuzz.py alongside the
SimHash fold it rides with."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from recon_spark.operators import bloom as B


def _filter_and_probe(spark, n_members=300, n_probes=600):
    train = spark.createDataFrame(
        [(f"key{i}",) for i in range(n_members)], "k string"
    )
    probe = spark.createDataFrame(
        [(i, f"key{i}" if i < n_members else f"other{i}")
         for i in range(n_members + n_probes)] + [(999_999, None)],
        "id long, k string",
    )
    bitmap = B.bloom_build(train, "k")
    out = B.bloom_probe(probe, bitmap, "k")
    return train, probe, bitmap, {r.id: r.bloom_seen for r in out.collect()}


def test_members_always_hit_and_fp_rate_in_band(spark):
    n_members, n_probes = 300, 600
    _, _, _, seen = _filter_and_probe(spark, n_members, n_probes)
    assert all(seen[i] for i in range(n_members))  # zero false negatives
    fp = sum(seen[i] for i in range(n_members, n_members + n_probes))
    # closed form: (1 - e^(-kn/m))^k with k=3, n=300, m=2048 -> ~4.5%;
    # band generous (hash variance on one draw)
    expect = (1 - math.exp(-B.BLOOM_HASHES * n_members / B.BLOOM_BITS)) ** B.BLOOM_HASHES
    assert 0 < fp / n_probes < 3 * expect
    assert seen[999_999] is False  # null key


def test_literal_path_matches_join_path(spark):
    _, probe, bitmap, seen = _filter_and_probe(spark)
    words = B.bloom_bitmap_literal(bitmap)
    assert len(words) == B.BLOOM_BITS // 64
    lit_seen = {
        r.id: r.s
        for r in probe.withColumn(
            "s", B.bloom_contains_lit(F.col("k"), words)
        ).collect()
    }
    assert lit_seen == seen


def test_empty_filter_sees_nothing(spark):
    empty = spark.createDataFrame([], "k string")
    probe = spark.createDataFrame([(1, "anything")], "id long, k string")
    out = B.bloom_probe(probe, B.bloom_build(empty, "k"), "k").collect()
    assert out[0].bloom_seen is False
