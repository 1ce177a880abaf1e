"""Perceptual-hash dedup (operators/multimodal.phash_*, r14): hand
signature bits, the monotone-invariance property through the REAL
attach/extract lineage, hot-safe plan hygiene, and DuckDB differential
fuzz through the graded CTEs (ASCII corpora — the oracle's byte==
codepoint replay contract)."""

from __future__ import annotations

import random
import string

import duckdb

from pyspark.sql import functions as F

from recon_spark.operators import multimodal as MM


def test_signature_hand_bits(spark):
    """dim=3 -> bits (0:f0>f1, 1:f0>f2, 2:f1>f2)."""
    df = spark.createDataFrame(
        [(1, [3.0, 2.0, 1.0]), (2, [1.0, 2.0, 3.0]), (3, [2.0, 2.0, 2.0])],
        "id long, feature array<float>",
    )
    got = {
        r.id: r.ph
        for r in df.select(
            "id", MM.phash_signature(F.col("feature"), dim=3).alias("ph")
        ).collect()
    }
    assert got == {1: 0b111, 2: 0b000, 3: 0b000}


def test_monotone_invariance_through_real_lineage(spark):
    """A uniformly brightness-shifted copy (every byte +1) preserves the
    stripe-mean ORDER, so it perceptually collapses onto the original;
    a reordered text does not."""
    base = "aaaaaaaa" * 4 + "zzzzzzzz" * 4 + "mmmmmmmm" * 4
    shifted = "".join(chr(ord(c) + 1) for c in base)
    reordered = "zzzzzzzz" * 4 + "aaaaaaaa" * 4 + "mmmmmmmm" * 4
    docs = spark.createDataFrame(
        [(1, base), (2, shifted), (3, reordered)], "doc_id long, text string"
    )
    v = {
        r.id: (r.keeper_id, r.is_dup)
        for r in MM.phash_dedup(
            MM.extract_features(MM.attach_binary(docs))
        ).collect()
    }
    assert v[1] == (1, False)
    assert v[2] == (1, True)  # perceptual duplicate of 1
    assert v[3][1] is False or v[3][0] == 3  # distinct signature


def test_hot_safe_no_window(spark):
    """A clique of identical assets dedups through the min aggregate —
    no Window operator anywhere in the plan."""
    docs = spark.createDataFrame(
        [(i, "same payload text") for i in range(50)], "doc_id long, text string"
    )
    out = MM.phash_dedup(MM.extract_features(MM.attach_binary(docs)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    rows = out.collect()
    assert sum(not r.is_dup for r in rows) == 1
    assert all(r.keeper_id == 0 for r in rows)


def test_differential_fuzz_vs_duckdb(spark):
    """Random ASCII corpora through phash_parity vs the verbatim
    ph_parity replay."""
    from recon_spark.oracles import llm_sql

    rnd = random.Random(0x9A5)
    alphabet = string.ascii_letters + string.digits + " .,!?"
    for trial in range(3):
        rows = []
        for i in range(50):
            n = rnd.randrange(0, 200)
            rows.append((i, "".join(rnd.choice(alphabet) for _ in range(n))))
        # planted brightness-shift duplicate
        rows.append((900, "".join(chr(ord(c) + 1) for c in rows[5][1])))
        docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
        got = MM.phash_parity(docs).collect()[0]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = con.sql(
            f"WITH {llm_sql._PHASH_CTES} SELECT * FROM ph_parity"
        ).fetchone()
        con.close()
        assert (got.n_ph_rows, got.ph_ck) == want, f"trial {trial}"
