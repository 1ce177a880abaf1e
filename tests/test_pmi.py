"""PMI collocation mining (operators/text.pmi_collocations, r14): hand
case with hand-computed PMI, DuckDB differential fuzz through the graded
CTEs, plan hygiene (zero windows), and threshold/edge behavior."""

from __future__ import annotations

import math
import random

import duckdb

from pyspark.sql import functions as F  # noqa: F401

from recon_spark.operators import text as T


def _oracle(rows, min_count):
    from recon_spark.oracles import llm_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.sql(
        f"WITH {llm_sql.pmi_ctes(min_count)} SELECT * FROM pmi_rows"
    ).fetchall()
    con.close()
    return out


def test_hand_case(spark):
    """'strong tea' appears 4x among 8 bigrams / 12 unigrams; PMI must
    equal the hand formula and singleton pairs drop at min_count=2."""
    docs = spark.createDataFrame(
        [
            (1, "strong tea strong tea"),
            (2, "strong tea strong tea"),
            (3, "powerful computer"),
            (4, "strong computer"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.term_a, r.term_b): r
        for r in T.pmi_collocations(docs, min_count=2).collect()
    }
    assert set(out) == {("strong", "tea"), ("tea", "strong")}
    r = out[("strong", "tea")]
    assert (r.c_ab, r.c_a, r.c_b) == (4, 5, 4)
    assert (r.n_bigrams, r.n_unigrams) == (8, 12)
    want = round(math.log((4 / 8) / ((5 / 12) * (4 / 12))) * 1_000_000)
    assert r.pmi_micros == want


def test_empty_and_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "solo"), (4, "a b a b a b a b a b")],
        "doc_id long, text string",
    )
    out = T.pmi_collocations(docs, min_count=2).collect()
    # only the a/b alternation survives; null/empty/single-token docs
    # contribute nothing (and crash nothing)
    assert {(r.term_a, r.term_b) for r in out} == {("a", "b"), ("b", "a")}


def test_differential_fuzz_vs_duckdb(spark):
    """Random ugly corpora through pmi_collocations vs the verbatim
    pmi_rows replay — counts, totals AND the ln micros must match."""
    from tests.test_dedup_fuzz import _corpus

    rnd = random.Random(0xC011)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for trial in range(3):
        rows = []
        for i, t in _corpus(rnd, 50):
            # salt with a tight vocabulary so pairs clear min_count
            if i % 2 == 0:
                t = (t or "") + " " + " ".join(
                    rnd.choice(vocab) for _ in range(8)
                )
            rows.append((i, t))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(map(tuple, T.pmi_collocations(docs, min_count=2).collect()))
        want = sorted(map(tuple, _oracle(rows, 2)))
        assert got == want, f"trial {trial}"
        assert len(got) > 0


def test_plan_has_no_windows(spark):
    """The scale contract in the docstring: explode + groupBys + joins
    only — no window anywhere, so nothing can funnel."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        T.pmi_collocations(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
