"""Text-analysis operators over ``documents.text`` (training-data pipeline
surface): tokenization, token/char statistics, stopword & quality scoring,
language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd; zero Python UDFs), so a
100 TB corpus runs as one narrow scan -> project stage: no shuffle, no
Python workers, predicate/column pruning reach the parquet scan.

The DuckDB mirrors live in :mod:`recon_spark.oracles.llm_sql` and are
generated from the same constants, so the two renderings cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.normalizers import _c

#: word-splitting pattern: runs of non-alphanumerics (BPE-ish baseline)
TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"

#: tiny function-word tables for the language-ID heuristic. Scoring is
#: (stopword hits / tokens) per language, argmax wins; ties resolve in
#: this declaration order. Deliberately small: the point is the operator
#: shape (set-membership scoring entirely in column algebra), not NLP
#: quality.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "para"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "für"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "中"),
}

#: quality-scoring thresholds (Gopher/C4-style heuristics)
QUALITY_MIN_TOKENS = 5
QUALITY_MAX_MEAN_WORD_LEN = 12.0
QUALITY_MIN_STOPWORD_RATIO = 0.0
QUALITY_MAX_SYMBOL_RATIO = 0.3


def tokens(col: Column | str) -> Column:
    """Whitespace/punctuation tokenization -> array<string> (lowercased)."""
    arr = F.split(F.lower(F.trim(_c(col).cast("string"))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col).cast("string")).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    s = _c(col).cast("string")
    total = F.length(s)
    clean = F.length(F.regexp_replace(s, "[^a-zA-Z0-9 ]", ""))
    return F.when(total > 0, (total - clean).cast("double") / total)


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words))).cast("long")


def stopword_ratio(col: Column | str, words: tuple[str, ...] | None = None) -> Column:
    words = words or LANG_STOPWORDS["en"]
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, words).cast("double") / n)


def mean_word_len(col: Column | str) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(n > 0, total.cast("double") / n)


def language_guess(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    NULL when no language scores a single hit."""
    toks = tokens(col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit(None).cast("string")
    # declaration order = tie priority (first matching when wins)
    chain = F.when(F.lit(False), F.lit(None).cast("string"))
    for lang in LANG_STOPWORDS:
        chain = chain.when(scores[lang] == best, F.lit(lang))
    return F.when(best > 0, chain).otherwise(out)


def quality_flags(col: Column | str) -> Column:
    """Array of failed quality checks (empty = passes all)."""
    n = token_count(col)
    mwl = mean_word_len(col)
    sw = stopword_ratio(col)
    sym = punct_ratio(col)
    return F.array_compact(
        F.array(
            F.when(n < QUALITY_MIN_TOKENS, F.lit("too_few_tokens")),
            F.when(
                F.coalesce(mwl > QUALITY_MAX_MEAN_WORD_LEN, F.lit(False)),
                F.lit("mean_word_len_too_high"),
            ),
            F.when(
                F.coalesce(sym > QUALITY_MAX_SYMBOL_RATIO, F.lit(False)),
                F.lit("symbol_ratio_too_high"),
            ),
        )
    )


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: 1 - failed_checks / total_checks."""
    return (F.lit(3) - F.size(quality_flags(col))).cast("double") / 3.0


def normalize_for_hash(col: Column | str) -> Column:
    """Canonical text form for exact-dup hashing: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(_c(col).cast("string")), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_for_hash(col))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles as strings ("w1 w2 w3"). Documents shorter
    than k tokens produce their full token join as a single shingle."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    make = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, k), " ")
    )
    return F.when(n > 0, F.array_distinct(make)).otherwise(F.array().cast("array<string>"))


def min_shingle_hash(col: Column | str, k: int = 3) -> Column:
    """Rolling-hash-style content fingerprint: lexicographic min of the
    md5 hashes of the document's k-shingles (a 1-hash MinHash)."""
    return F.array_min(F.transform(shingles(col, k), F.md5))
