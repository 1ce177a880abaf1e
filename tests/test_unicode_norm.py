"""Unicode normalization (operators/unicode_norm.py): NFC differential
vs DuckDB's nfc_normalize (the graded fold's twin), all four UAX#15
forms vs unicodedata directly, dedup-impact property, and the graded
data_contamination_check row end-to-end."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

from recon_spark.operators import unicode_norm as UN

#: composed/decomposed accents, Hangul Jamo vs syllable, compatibility
#: chars (ligature, circled digit, half/full width), combining chains
CASES = [
    "café",                # composed é
    "café",               # e + combining acute -> composes under NFC
    "각",       # Hangul Jamo -> composes to 각
    "각",                   # precomposed 각
    "ﬁle",                 # ﬁ ligature (NFC keeps, NFKC expands)
    "① item",              # circled one
    "ｱｲ",             # halfwidth katakana
    "Å",                  # A + ring -> Å
    "x̣́",            # combining chain reordering
    "plain ascii only.",
    "",
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_nfc_matches_duckdb(spark):
    rows = [(i, t) for i, t in enumerate(CASES)] + [(900, None)]
    got = {
        r.doc_id: (r.norm_text, r.changed, r.n_chars_before, r.n_chars_after)
        for r in UN.normalize_text(_df(spark, rows)).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        if t is None:
            assert got[i] == (None, False, None, None)
            continue
        d = con.sql("SELECT nfc_normalize(?)", params=[t]).fetchone()[0]
        assert got[i][0] == d, (i, t)
        assert got[i][1] == (d != t)
        assert got[i][2] == len(t) and got[i][3] == len(d)
    con.close()


def test_all_forms_match_unicodedata(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    for form in UN.UNICODE_FORMS:
        got = {
            r.doc_id: r.norm_text
            for r in UN.normalize_text(_df(spark, rows), form).collect()
        }
        for i, t in rows:
            assert got[i] == unicodedata.normalize(form, t), (form, i)


def test_unknown_form_raises(spark):
    with pytest.raises(ValueError, match="form must be one of"):
        UN.normalize_text(_df(spark, [(1, "x")]), "NFX")


def test_normalization_unifies_fingerprints(spark):
    """The reason the pass exists: composed and decomposed spellings of
    the same visible text must fingerprint identically AFTER the pass
    (and not before)."""
    from pyspark.sql import functions as F

    from recon_spark.operators import text as T

    docs = _df(spark, [(1, "café menu"), (2, "café menu")])
    raw = [r[0] for r in docs.select(T.fingerprint("text")).collect()]
    assert raw[0] != raw[1]
    norm = UN.normalize_text(docs)
    after = [
        r[0]
        for r in norm.select(T.fingerprint(F.col("norm_text"))).collect()
    ]
    assert after[0] == after[1]


def test_graded_row_matches_oracle_sf0001(spark):
    """data_contamination_check (with the round-12 NFC fold) end-to-end
    at sf0.001 vs DuckDB over the same parquet."""
    from recon_spark import registry
    from recon_spark.oracles import llm_sql

    out = registry.QUERIES["data_contamination_check"](
        spark, "/root/testdata/sf0.001"
    )
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(con.sql(llm_sql.CONTAMINATION_SQL).fetchall())
    con.close()
    assert got == want and len(got) > 0
