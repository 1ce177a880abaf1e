"""Gopher A1.1 quality-rule battery (operators/gopher.py, r14): one hand
case per rule, null/empty anchoring, DuckDB differential fuzz through
the graded CTEs, reject-summary rollup, and plan hygiene (the battery is
a pure projection — zero exchanges)."""

from __future__ import annotations

import random

import duckdb

from pyspark.sql import functions as F  # noqa: F401

from recon_spark.operators import gopher as G


def _oracle(rows):
    from recon_spark.oracles import llm_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.sql(
        f"WITH {llm_sql.gopher_ctes()} SELECT * FROM gq_parity"
    ).fetchone()
    con.close()
    return out


_GOOD = (
    "The quick brown fox jumps over the lazy dog and runs to have fun "
    "with friends that live nearby. "
) * 5  # ~90 words, all rules pass


def test_good_document_keeps(spark):
    docs = spark.createDataFrame([(1, _GOOD)], "doc_id long, text string")
    r = G.gopher_quality(docs).collect()[0]
    assert r.gopher_keep, r
    assert r.n_words == 95
    assert r.n_stop_hits >= 2
    assert r.rule_word_count and r.rule_alpha_words and r.rule_stop_words


def test_each_rule_fires(spark):
    """One planted failure per rule; every other rule unaffected where
    the plant allows it."""
    rows = [
        # 1: word count below 50
        (1, "the dog and that to be of with have"),
        # 2: mean word length > 10 (long words, enough of them)
        (
            2,
            " ".join(["extraordinarily"] * 60)
            + " the be to of and that have with",
        ),
        # 3: hash-symbol ratio > 0.1
        (3, _GOOD + " " + " ".join(["#tag"] * 30)),
        # 4: >90% of lines start with a bullet
        (4, "\n".join(["- item %d" % i for i in range(20)])),
        # 5: >30% of lines end with an ellipsis
        (5, "\n".join([_GOOD, "to be continued...", "and then...", "more…"])),
        # 6: <80% of words contain an alphabetic char
        (6, _GOOD + " " + " ".join(["12345"] * 40)),
        # 7: fewer than 2 distinct stop words
        (7, " ".join(["lorem ipsum dolor sit amet"] * 20)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in G.gopher_quality(docs).collect()}
    assert not out[1].rule_word_count and out[1].rule_stop_words
    assert not out[2].rule_mean_word_len and out[2].rule_word_count
    assert not out[3].rule_symbol_ratio and out[3].rule_alpha_words
    assert not out[4].rule_bullet_lines
    assert out[4].n_bullet_lines == out[4].n_lines == 20
    assert not out[5].rule_ellipsis_lines and out[5].n_ellipsis_lines == 3
    assert not out[6].rule_alpha_words and out[6].rule_word_count
    assert not out[7].rule_stop_words and out[7].n_stop_hits == 0
    assert not any(r.gopher_keep for r in out.values())


def test_symbol_counters_exact(spark):
    """Occurrence counting via length-difference: overlapping dots,
    unicode ellipsis, hashes."""
    docs = spark.createDataFrame(
        [(1, "a.... b# c…… ##")], "doc_id long, text string"
    )
    r = G.gopher_quality(docs).collect()[0]
    # '....' contains one non-overlapping '...'; two '…'
    assert r.n_ellipsis == 3
    assert r.n_hash == 3
    assert r.n_words == 4


def test_null_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n  \n")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in G.gopher_quality(docs).collect()}
    for r in out.values():
        assert r.n_words == 0 and r.n_lines == 0
        assert r.mwl_micros is None and r.bullet_ratio_micros is None
        assert not r.gopher_keep
        # denominator-guarded rules are FALSE (not NULL) on empty docs
        assert r.rule_mean_word_len is False
        assert r.rule_alpha_words is False


def test_reject_summary(spark):
    docs = spark.createDataFrame(
        [(1, _GOOD), (2, "too short"), (3, None)],
        "doc_id long, text string",
    )
    r = G.gopher_reject_summary(docs).collect()[0]
    assert r.n_docs == 3 and r.n_keep == 1
    assert r.n_fail_word_count == 2


def test_differential_fuzz_vs_duckdb(spark):
    """Random ugly corpora (incl. VT/FF whitespace, unicode, nulls)
    through gopher_parity vs the verbatim gq_parity replay."""
    from tests.test_dedup_fuzz import _corpus

    rnd = random.Random(0x60F4E2)
    extras = [
        _GOOD,
        "- a\n- b\n- c…\nplain line...",
        "# # # ... … " * 20,
        "\x0b\x0c the be to of \t# …",
    ]
    for trial in range(3):
        rows = []
        for i, t in _corpus(rnd, 40):
            rows.append((i, t))
        for j, t in enumerate(extras):
            rows.append((1000 + j, t + (" x" * trial)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = G.gopher_parity(docs).collect()[0]
        want = _oracle(rows)
        assert (got.n_gq_rows, got.gq_ck) == want, f"trial {trial}"


def test_plan_is_exchange_free(spark):
    """The battery is a pure per-row projection: no shuffle anywhere in
    the per-document plan."""
    docs = spark.createDataFrame([(1, _GOOD)], "doc_id long, text string")
    plan = G.gopher_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
