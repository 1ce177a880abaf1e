"""Seeded differential fuzz of the two round-8 parity folds: random ugly
corpora (unicode, punctuation runs, empties, tiny-vocab repetition)
through the EXACT graded compositions —

- ``dedup_ngram_jaccard``: count-based pair rows + the PPJoin prefix
  twin's pair-count/checksum parity columns;
- ``dedup_exact_documents``: fingerprint dedup rows + the SimHash banded
  pair join's count/(id_a, id_b, hamming)-checksum parity columns —

and through the VERBATIM grading SQL (llm_sql.NGRAM_JACCARD_SQL /
DEDUP_EXACT_BODY_SQL (the graded SQL minus the streaming-gate
fold, which drains real streams and has its own oracle test), docs_aug
planting included — registry.plant_duplicates
applies the identical doc_id-mod rules Spark-side), compared
row-for-row. The graded gate covers fixture corpora, whose text is
well-formed by construction; this drives tokenizer/hash corners at both
engines simultaneously, the same discipline as tests/test_lm_fuzz.py."""

from __future__ import annotations

import random

import duckdb

from recon_spark import registry
from recon_spark.oracles import llm_sql

_ATOMS = [
    "the quick brown fox jumps over the lazy dog",
    "alpha beta gamma alpha beta gamma alpha",
    "x", "", " ", "\t\n", "a a a a a a a a a a",
    "Ünïcödé tökens ünïcödé wörds",
    "punctuation!!! runs??? here... and-more",
    "MixedCASE Mixedcase MIXEDCASE mixedcase",
    "1234 5678 1234 90 1234",
    "word-with-dash under_score dot.sep slash/sep",
    "单 词 单 词 单 词",
    "a b c d e f g h i j k l m n o p q r s",
    "same same same different same same",
    "zzz yyy zzz yyy xxx www zzz",
]


def _corpus(rnd: random.Random, n: int) -> list[tuple[int, str | None]]:
    rows: list[tuple[int, str | None]] = []
    for i in range(n):
        kind = rnd.randrange(5)
        if kind == 0:
            text: str | None = rnd.choice(_ATOMS)
        elif kind == 1:
            text = " ".join(rnd.choice(_ATOMS) for _ in range(rnd.randrange(1, 4)))
        elif kind == 2:
            # tiny vocabulary: dense shingle collisions + simhash ties
            text = " ".join(
                "tok%d" % rnd.randrange(5) for _ in range(rnd.randrange(0, 16))
            )
        elif kind == 3:
            text = None
        else:
            # includes vertical tab U+000B + form feed: Java \s and RE2
            # \s disagree on VT, which is why every graded regex uses an
            # explicit whitespace class (lines.WS_CLASS / BPE_TOKEN_PATTERN)
            text = "".join(
                rnd.choice(" aZ9!.€ö\t\x0b\x0c") for _ in range(rnd.randrange(0, 24))
            )
        rows.append((i, text))
    return rows


def _oracle(rows, sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.sql(sql).fetchall()
    con.close()
    return out


def test_ngram_parity_fold_differential_fuzz(spark):
    rnd = random.Random(0x5EED8)
    for _trial in range(3):
        rows = _corpus(rnd, 90)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        aug = registry.plant_duplicates(docs)
        got = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9), r.n_pairs_prefix,
             r.prefix_pairs_ck)
            for r in registry.ngram_jaccard_with_prefix_parity(aug).collect()
        )
        spark.catalog.clearCache()
        want = sorted(
            (a, b, round(j, 9), n, ck)
            for a, b, j, n, ck in _oracle(rows, llm_sql.NGRAM_JACCARD_PARITY_SQL)
        )
        assert got == want


def test_simhash_parity_fold_differential_fuzz(spark):
    rnd = random.Random(0x5EED9)
    for _trial in range(3):
        rows = _corpus(rnd, 90)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        aug = registry.plant_duplicates(docs)
        got = sorted(
            (r.doc_id, r.fingerprint, r.n_simhash_pairs, r.simhash_pairs_ck,
             r.n_pairs_prefix, r.prefix_pairs_ck, r.n_bloom_fp, r.bloom_ck)
            for r in registry.dedup_exact_with_simhash_parity(aug).collect()
        )
        spark.catalog.clearCache()
        want = sorted(_oracle(rows, llm_sql.DEDUP_EXACT_BODY_SQL))
        assert got == want
