"""Within-document cleaning (operators/lines.py): C4 line-filter rules
and keep-first paragraph dedup — hand cases, idempotence, and
differential fuzz over newline-rich corpora vs the verbatim DuckDB
replay (oracles/llm_sql.lines_parity_ctes)."""

from __future__ import annotations

import random

import duckdb

from recon_spark.operators import lines
from recon_spark.oracles import llm_sql

#: the fold's CTE chunk as a standalone two-row query for direct compare
_PARITY_SQL = (
    f"WITH {llm_sql.lines_parity_ctes()} "
    "SELECT * FROM c4_parity CROSS JOIN para_parity"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _oracle(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.sql(sql).fetchall()
    con.close()
    return out


def _parity_row(spark, docs):
    from pyspark.sql import functions as F

    return tuple(
        lines.c4_parity(docs)
        .crossJoin(F.broadcast(lines.para_parity(docs)))
        .first()
    )


def test_c4_rules_hand_cases(spark):
    good = "this line has enough words here."
    docs = _df(
        spark,
        [
            # kept page: three qualifying lines
            (1, f"{good}\n{good[:-1]}!\nand a third full line right here?"),
            # dropped: only two qualifying lines
            (2, f"{good}\n{good}"),
            # line rules: no terminal punct / too few words / javascript
            (3, f"{good}\nno punctuation line here at all\nshort one.\n"
                f"enable javascript to view this page.\n{good}\n{good}"),
            # page rules: curly brace and lorem ipsum
            (4, f"{good}\n{good}\n{good}\nfunction() {{ }}"),
            (5, f"{good}\n{good}\n{good}\nLorem Ipsum dolor sit amet."),
            (6, None),
        ],
    )
    got = {r.doc_id: r.asDict() for r in lines.c4_line_filter(docs).collect()}
    assert not got[1]["dropped"] and got[1]["n_kept"] == 3
    assert got[2]["dropped"] and got[2]["n_kept"] == 2
    v3 = got[3]
    assert v3["n_lines"] == 6 and v3["n_kept"] == 3 and not v3["dropped"]
    assert "javascript" not in v3["clean_text"]
    assert got[4]["dropped"] and got[5]["dropped"]
    assert got[6]["dropped"] and got[6]["n_lines"] is None


def test_vertical_tab_word_count_parity(spark):
    """U+000B between words: Java regex \\s splits there, RE2 \\s does
    not — the explicit WS_CLASS makes both sides split, so a page whose
    keep/drop verdict hinges on a vertical-tab word boundary must agree
    with the oracle (ADVICE r12)."""
    rows = [
        # exactly 5 words only if \x0B is a word boundary -> kept line
        (1, "one\x0Btwo three four five.\nfiller words to keep page alive.\n"
            "third qualifying line with enough words."),
        # 4 words either way -> dropped line
        (2, "one\x0Btwo three four.\nfiller words to keep page alive.\n"
            "third qualifying line with enough words."),
    ]
    docs = _df(spark, rows)
    got = {r.doc_id: r.asDict() for r in lines.c4_line_filter(docs).collect()}
    assert got[1]["n_kept"] == 3 and not got[1]["dropped"]
    assert got[2]["n_kept"] == 2 and got[2]["dropped"]
    assert _parity_row(spark, docs) == tuple(_oracle(rows, _PARITY_SQL)[0])


def test_paragraph_dedup_keep_first_and_idempotent(spark):
    docs = _df(
        spark,
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta\nalpha"),
            (2, "same\nsame\nsame"),
            (3, "unique only"),
            (4, ""),
            (5, None),
        ],
    )
    got = {r.doc_id: r.asDict() for r in lines.dedup_paragraphs(docs).collect()}
    assert got[1]["clean_text"] == "alpha\nbeta\ngamma" and got[1]["n_dupes"] == 3
    assert got[2]["clean_text"] == "same" and got[2]["n_dupes"] == 2
    assert got[3] == {"doc_id": 3, "clean_text": "unique only", "n_paras": 1, "n_dupes": 0}
    assert got[4]["clean_text"] == "" and got[4]["n_paras"] == 1
    assert got[5]["clean_text"] is None

    # idempotence: rerunning on clean_text changes nothing
    clean = lines.dedup_paragraphs(docs).filter("clean_text IS NOT NULL").select(
        "doc_id", "clean_text"
    )
    again = {
        r.doc_id: r.asDict()
        for r in lines.dedup_paragraphs(clean, text_col="clean_text").collect()
    }
    for k, v in again.items():
        assert v["n_dupes"] == 0 and v["clean_text"] == got[k]["clean_text"]


def _newline_corpus(rnd: random.Random, n: int):
    frags = [
        "this is a perfectly fine sentence with words.",
        "short.",
        "no terminal punctuation on this one",
        "Lorem ipsum hiding here with more than five words!",
        'a quoted ending with enough words inside it"',
        "enable JavaScript now please with enough words.",
        "brace { in the middle of a long enough line.",
        "",
        "   ",
        "\tindented line that is long enough to count?",
        # exotic ASCII whitespace between words — Java \s and RE2 \s
        # disagree on U+000B, which is why the split uses the explicit
        # WS_CLASS on both sides (ADVICE r12)
        "vertical\x0Btab splits words on both sides now.",
        "form\x0Cfeed and\x0Bmore vertical tabs here fine.",
        "only\x0Bfour\x0Bwords\x0Bhere.",
    ]
    rows = []
    for i in range(n):
        if rnd.random() < 0.1:
            rows.append((i, None))
            continue
        k = rnd.randrange(0, 8)
        body = "\n".join(rnd.choice(frags) for _ in range(k))
        rows.append((i, body))
    return rows


def test_differential_fuzz_vs_duckdb(spark):
    rnd = random.Random(0x11E5)
    for _trial in range(4):
        rows = _newline_corpus(rnd, 50)
        docs = _df(spark, rows)
        got = _parity_row(spark, docs)
        want = _oracle(rows, _PARITY_SQL)[0]
        assert got == tuple(want)


def test_graded_row_matches_oracle_sf0001(spark):
    """The hosting data_sample_stratified row (with the round-12 lines
    folds) end-to-end at sf0.001 vs DuckDB over the same parquet."""
    from recon_spark import registry

    out = registry.QUERIES["data_sample_stratified"](spark, "/root/testdata/sf0.001")
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(con.sql(llm_sql.STRATIFIED_SAMPLE_SQL).fetchall())
    con.close()
    assert got == want


def test_paragraph_dedup_literal_separator(spark):
    """sep is a literal string, not a regex: '.' and '||' must split on
    the characters themselves and the output must round-trip/idempote."""
    docs = _df(spark, [(1, "aa.bb.aa.cc"), (2, "x||y||x||z")])
    dot = {r.doc_id: r.asDict() for r in lines.dedup_paragraphs(docs, sep=".").collect()}
    assert dot[1]["clean_text"] == "aa.bb.cc" and dot[1]["n_dupes"] == 1
    bar = lines.dedup_paragraphs(docs, sep="||").filter("doc_id = 2").first()
    assert bar.clean_text == "x||y||z" and bar.n_dupes == 1
    # idempotence on the custom separator
    again = lines.dedup_paragraphs(
        lines.dedup_paragraphs(docs, sep=".").select(
            "doc_id", lines.F.col("clean_text").alias("text")
        ),
        sep=".",
    ).filter("doc_id = 1").first()
    assert again.clean_text == "aa.bb.cc" and again.n_dupes == 0
