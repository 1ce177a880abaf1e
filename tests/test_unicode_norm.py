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


def test_nfc_codepoint_sample_vs_duckdb():
    """Sampled version of the exhaustive codepoint sweep backing the
    module's Unicode-version note (ADVICE r12): Python unicodedata and
    DuckDB utf8proc must agree on NFC over a deterministic sample of
    the FULL codepoint space (assigned AND unassigned — an unassigned
    codepoint normalized by only one library is exactly the divergence
    the fold cannot survive) plus random combining sequences. Purely
    library-vs-library, no Spark needed — trips on a unicodedata or
    DuckDB upgrade that desynchronizes the Unicode versions."""
    import random

    rnd = random.Random(0x0C0DE)
    cps = [cp for cp in rnd.sample(range(0x20, 0x110000), 8000)
           if not (0xD800 <= cp <= 0xDFFF)]
    singles = [(cp, chr(cp)) for cp in cps]
    comb = [0x300, 0x301, 0x308, 0x30A, 0x327, 0x331]
    base = [ord("a"), ord("e"), ord("o"), ord("c"), 0xC5, 0x1100, 0x1161, 0x11A8]
    seqs = [
        (10**7 + i,
         "".join(chr(rnd.choice(base + comb)) for _ in range(rnd.randrange(1, 6))))
        for i in range(1500)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", singles + seqs)
    got = dict(con.sql("SELECT i, nfc_normalize(s) FROM t").fetchall())
    con.close()
    bad = [
        (i, hex(i) if i < 0x110000 else s)
        for i, s in singles + seqs
        if got[i] != unicodedata.normalize("NFC", s)
    ]
    assert not bad, f"NFC divergence (Unicode-version skew?): {bad[:10]}"


def test_zero_hit_corpus_keeps_nfc_certificate(spark, tmp_path):
    """A corpus with ZERO contamination hits must still grade the NFC
    fold: the sentinel row (id = -1) carries the parity columns on both
    sides, so an empty hits frame cannot silently vacate the
    certificate (ADVICE r12)."""
    import pandas as pd

    from recon_spark import registry
    from recon_spark.oracles import llm_sql

    # every doc < 5 tokens -> no 5-shingles -> hits is provably empty;
    # decomposed accents so the NFC pass has real work to certify.
    # lang column: the r14 langid fold rides this row (the r13
    # fertility-fold precedent on the tfidf fuzz frame)
    rows = [
        (i, ["en", "de", None][i % 3], f"doc {i} cafe\u0301") for i in range(20)
    ] + [(99, "en", None)]
    pd.DataFrame(rows, columns=["doc_id", "lang", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = registry.QUERIES["data_contamination_check"](spark, str(tmp_path))
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(con.sql(llm_sql.CONTAMINATION_SQL).fetchall())
    con.close()
    assert got == want
    assert len(got) == 1 and got[0][0] == -1  # sentinel only
    assert got[0][6] == 21  # n_nfc_rows covers the whole corpus
    spark.catalog.clearCache()


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


def test_planted_twins_show_exact_dedup_underdeletion(spark):
    """The operator's whole motivation, measured on the seeded fixture
    generator's planted composed/decomposed twins (VERDICT r12 #6,
    sources/fixtures.unicode_twin_documents): exact dedup WITHOUT the
    NFC pass keeps both spellings of every planted pair (silent
    under-deletion — byte-distinct, visually identical); running NFC
    first collapses each pair to one survivor, and only the planted
    twins are affected."""
    from pyspark.sql import functions as F

    from recon_spark.operators import dedup
    from recon_spark.operators import text as T
    from recon_spark.sources import fixtures

    aug = fixtures.unicode_twin_documents(spark, "/root/testdata/sf0.001")
    n_pairs = aug.filter(
        (F.col("doc_id") >= 2_000_000) & (F.col("doc_id") < 3_000_000)
    ).count()
    assert n_pairs > 0
    base_n = aug.count()

    def survivors(docs):
        withfp = docs.filter(F.col("text").isNotNull()).withColumn(
            "fp", T.fingerprint("text")
        )
        return dedup.exact_dedup(withfp, F.col("fp"), ["doc_id"]).count()

    # without NFC: every planted spelling survives (under-deletion)
    raw_survivors = survivors(aug)
    # with NFC first: one of each planted pair is deleted, nothing else
    norm = UN.normalize_text(aug).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    nfc_survivors = survivors(norm)
    assert raw_survivors - nfc_survivors == n_pairs
    # and the raw corpus itself had no incidental exact dupes hiding
    # the effect (the fixture corpus is dupe-free at sf0.001)
    assert raw_survivors == base_n - aug.filter(F.col("text").isNull()).count()
