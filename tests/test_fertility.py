"""Per-language tokenizer fertility diagnostics (operators/text.py
fertility_stats): hand cases, null lang/text groups, differential fuzz
vs the verbatim DuckDB replay (the round-13 fold on the
text_tfidf_top_terms row), and the trained-BPE composition."""

from __future__ import annotations

import random

import duckdb

from recon_spark.operators import text as T

_FERT_SQL = None


def _fert_sql():
    global _FERT_SQL
    if _FERT_SQL is None:
        from recon_spark.oracles import llm_sql

        _FERT_SQL = (
            f"WITH {llm_sql._FERT_CTES} SELECT * FROM fert_rows"
        )
    return _FERT_SQL


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _oracle(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    out = con.sql(_fert_sql()).fetchall()
    con.close()
    return out


def _got(spark, docs):
    return sorted(
        (tuple(r) for r in T.fertility_stats(docs).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )


def test_hand_case_counts_and_ratios(spark):
    rows = [
        (1, "en", "the cat sat."),          # 12 chars, 3 words
        (2, "en", "dogs run fast"),          # 13 chars, 3 words
        (3, "de", "héllo wörld"),            # 11 chars / 13 bytes, 2 words
        (4, None, "x"),                      # null lang group
        (5, "fr", None),                     # null text: counts stay 0
    ]
    got = {r.lang: r.asDict() for r in T.fertility_stats(_df(spark, rows)).collect()}
    en = got["en"]
    assert en["n_docs"] == 2 and en["n_chars"] == 25 and en["n_bytes"] == 25
    assert en["n_words"] == 6
    # regex-BPE tokens: 'the cat sat.' -> the,cat,sat,'.' = 4; 'dogs run fast' = 3
    assert en["n_tokens_bpe"] == 7
    assert en["chars_per_token_micros"] == round(25 / 7 * 1_000_000)
    assert en["tokens_per_word_micros"] == round(7 / 6 * 1_000_000)
    de = got["de"]
    assert de["n_chars"] == 11 and de["n_bytes"] == 13  # 2-byte é, ö
    assert got[None]["n_docs"] == 1
    fr = got["fr"]
    assert fr["n_docs"] == 1 and fr["n_chars"] == 0 and fr["n_tokens_bpe"] == 0
    assert fr["chars_per_token_micros"] is None  # zero denominator -> NULL


def test_differential_fuzz_vs_duckdb(spark):
    """Random ugly corpora (incl. VT/FF whitespace, accents, nulls)
    through fertility_stats vs the verbatim fert_rows replay."""
    from tests.test_dedup_fuzz import _corpus

    rnd = random.Random(0xFE47)
    langs = ["en", "de", "zh", None]
    for _trial in range(4):
        rows = [
            (i, rnd.choice(langs), t) for i, t in _corpus(rnd, 60)
        ]
        docs = _df(spark, rows)
        got = _got(spark, docs)
        want = sorted(_oracle(rows), key=lambda t: (t[0] is None, t[0]))
        assert got == [tuple(w) for w in want]


def test_trained_bpe_fertility_composition(spark):
    """The trained-BPE variant the docstring names: join bpe_encode
    counts and aggregate per lang — token totals must equal the sum of
    the per-doc driver re-encode."""
    from pyspark.sql import functions as F

    from recon_spark.operators import bpe

    rows = [
        (i, "en" if i % 2 else "de", f"alpha beta gamma doc{i} " * (1 + i % 3))
        for i in range(20)
    ]
    docs = _df(spark, rows)
    merges = bpe.bpe_train(docs, n_merges=30)
    enc = bpe.bpe_encode(docs, merges)
    per_lang = (
        docs.join(enc.select("doc_id", "n_bpe_tokens"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_bpe_tokens").cast("long").alias("n_trained_tokens"))
    )
    got = {r.lang: r.n_trained_tokens for r in per_lang.collect()}
    # independent rollup from the per-doc frame (bpe_encode itself is
    # graded against a driver re-encode in tests/test_bpe.py)
    per_doc = {r.doc_id: r.n_bpe_tokens for r in enc.collect()}
    want: dict[str, int] = {}
    for i, lang, _text in rows:
        want[lang] = want.get(lang, 0) + per_doc[i]
    assert got == want and set(got) == {"en", "de"}


# --- trained-BPE fertility fold (r14) ----------------------------------------


def _tfert_sql():
    from recon_spark.oracles import llm_sql

    return f"WITH {llm_sql.trained_fert_ctes()} SELECT * FROM tfert_rows"


def _tfert_oracle(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    out = con.sql(_tfert_sql()).fetchall()
    con.close()
    return out


def test_fertility_merges_sequentially_safe_and_nontrivial():
    from recon_spark.oracles import llm_sql

    merges = llm_sql.fertility_merges()
    assert len(merges) == llm_sql.FERTILITY_MERGES_N
    llm_sql._assert_sequentially_safe(merges)  # must not raise
    # the model genuinely compresses lexicon words (non-vacuity)
    from recon_spark.operators import bpe

    ranks = {p: i for i, p in enumerate(merges)}
    assert len(bpe.encode_word("scan", ranks)) < len("scan") + 1


def _sequential_encode(word, merges):
    """The oracle's unrolled-replace encode, simulated in Python on the
    bracketed representation — the exact SQL semantics."""
    s = "".join(f"[{c}]" for c in word) + "[</w>]"
    for a, b in merges:
        s = s.replace(f"[{a}][{b}]", f"[{a}{b}]")
    return s.count("[")


def test_sequential_replace_equals_priority_encode(spark):
    """The equivalence the fold rests on: one sequential pass over the
    rank-ordered merges (SQL replace semantics) must token-count-match
    the encoder's lowest-rank-first loop for every corpus word and for
    junk fuzz words."""
    from recon_spark.oracles import llm_sql
    from recon_spark.operators import bpe

    merges = llm_sql.fertility_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = {
        w
        for r in docs.select(T.tokens("text").alias("t")).collect()
        if r.t
        for w in r.t
    }
    rnd = random.Random(0xF14)
    vocab = "abcdefghijklmnopqrstuvwxyz0123456789"
    words |= {
        "".join(rnd.choice(vocab) for _ in range(rnd.randrange(1, 14)))
        for _ in range(300)
    }
    words |= {"scanscan", "aaaa", "sortsort", "thethe", "joinjoinjoin"}
    for w in sorted(words):
        assert _sequential_encode(w, merges) == len(bpe.encode_word(w, ranks)), w


def test_trained_fertility_matches_duckdb_replay(spark):
    """fertility_stats_trained vs the verbatim tfert_rows replay on
    random ugly corpora (lexicon words, junk, nulls, null langs)."""
    from recon_spark.oracles import llm_sql
    from tests.test_dedup_fuzz import _corpus

    merges = llm_sql.fertility_merges()
    rnd = random.Random(0x7FE7)
    langs = ["en", "de", "zh", None]
    lex = [w for w, _n in llm_sql.FERTILITY_LEXICON]
    for _trial in range(3):
        rows = []
        for i, t in _corpus(rnd, 40):
            # salt half the docs with lexicon words so merges fire
            if i % 2 == 0:
                t = (t or "") + " " + " ".join(rnd.choice(lex) for _ in range(5))
            rows.append((i, rnd.choice(langs), t))
        docs = _df(spark, rows)
        got = sorted(
            (tuple(r) for r in T.fertility_stats_trained(docs, merges).collect()),
            key=lambda t: (t[0] is None, t[0]),
        )
        want = sorted(_tfert_oracle(rows), key=lambda t: (t[0] is None, t[0]))
        assert got == [tuple(w) for w in want]


def test_trained_fertility_nonvacuous_on_fixture(spark):
    """On the graded corpus the certificate must certify something:
    >= 2 languages with live ratios, and the trained merges genuinely
    fire (token count strictly below the no-merge chars+words count)."""
    from recon_spark.oracles import llm_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {
        r.lang: r
        for r in T.fertility_stats_trained(docs, llm_sql.fertility_merges()).collect()
    }
    live = [r for r in out.values() if r.trained_tokens_per_word_micros is not None]
    assert len(live) >= 2
    for r in live:
        assert r.n_tokens_trained < r.n_word_chars + r.n_words
        assert r.trained_chars_per_token_micros > 1_000_000  # > 1 char/token
