"""Cross-document duplicate-span removal (operators/spans.py): verdict
semantics, hot-safe/window-form parity, rebuild edge cases, and a seeded
differential fuzz of the round-9 grading fold (text_chunk_documents'
span parity columns) against the VERBATIM DuckDB oracle SQL."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from recon_spark import registry
from recon_spark.operators import spans as SP
from recon_spark.oracles import llm_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_kept_rest_removed(spark):
    docs = _df(
        spark,
        [
            (1, "a b c d e f g h tail one"),
            (2, "a b c d e f g h tail two"),
            (3, "pre amble pad pad pad pad pad pad a b c d e f g h"),
        ],
    )
    v = {
        (r.doc_id, r.pos): r.keep
        for r in SP.span_dedup_verdicts(docs).collect()
    }
    # the shared window is first in doc 1 pos 0; doc 3 has it at pos 1
    assert v[(1, 0)] is True
    assert v[(2, 0)] is False
    assert v[(3, 0)] is True  # its own unique first window
    assert v[(3, 1)] is False


def test_within_doc_repeat_also_removed(spark):
    """The C4 rule is corpus-wide, which includes a doc repeating its own
    span: second occurrence inside the SAME doc is removed too."""
    body = "w x y z w2 x2 y2 z2"
    docs = _df(spark, [(1, f"{body} {body} end")])
    out = SP.span_dedup(docs).collect()[0]
    assert out.n_spans == 2
    assert out.n_removed == 1
    assert out.clean_text == f"{body} end"


def test_rebuild_preserves_order_and_remainder(spark):
    docs = _df(
        spark,
        [
            (1, "a b c d e f g h m n o p q r s t tail"),
            (2, "m n o p q r s t a b c d e f g h tail"),
        ],
    )
    got = {r.doc_id: r for r in SP.span_dedup(docs).collect()}
    assert got[1].clean_text == "a b c d e f g h m n o p q r s t tail"
    assert got[1].n_removed == 0
    # doc 2's both windows are dups of doc 1's (in swapped order)
    assert got[2].n_removed == 2
    assert got[2].clean_text == "tail"


def test_short_null_empty_docs(spark):
    docs = _df(spark, [(1, "too short"), (2, None), (3, ""), (4, "   ")])
    got = {r.doc_id: r for r in SP.span_dedup(docs).collect()}
    assert set(got) == {1, 3, 4}  # null text -> no row (null token array)
    assert got[1].clean_text == "too short" and got[1].n_spans == 0
    assert got[3].clean_text == "" and got[4].clean_text == ""


def test_hot_safe_matches_window_form(spark):
    rnd = random.Random(7)
    vocab = ["a", "b", "c"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(0, 30))))
        for i in range(80)
    ]
    docs = _df(spark, rows)
    a = sorted(map(tuple, SP.span_dedup_verdicts(docs, hot_safe=True).collect()))
    b = sorted(
        map(
            tuple,
            SP.span_dedup_verdicts(docs, hot_safe=False)
            .select("doc_id", "pos", "span", "keep")
            .collect(),
        )
    )
    assert a == b
    assert any(not t[3] for t in a)  # tiny vocab guarantees removals


def _oracle(rows, sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.sql(sql).fetchall()
    con.close()
    return out


def test_span_parity_fold_differential_fuzz(spark):
    """Random ugly corpora through the EXACT graded composition
    (registry.chunk_docs_with_span_parity) and the VERBATIM grading SQL
    (llm_sql.CHUNK_DOCS_SQL, docs_aug planting included), compared
    row-for-row — tokenization, span partition, first-occurrence order,
    and the rebuilt cleaned text must all agree."""
    from tests.test_dedup_fuzz import _corpus

    rnd = random.Random(0x5EEDB)
    for _trial in range(3):
        rows = _corpus(rnd, 80)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        aug = registry.plant_duplicates(docs)
        got = sorted(
            (
                r.doc_id, r.chunk_id, r.tok_start, r.tok_end, r.n_tokens,
                r.chunk_text, r.n_span_removed, r.span_verdict_ck,
                r.span_clean_ck,
            )
            for r in registry.chunk_docs_with_span_parity(docs, aug).collect()
        )
        spark.catalog.clearCache()
        want = sorted(_oracle(rows, llm_sql.CHUNK_DOCS_SQL))
        assert got == want
