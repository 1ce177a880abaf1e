"""Count-based bigram language model + perplexity scoring — the
CCNet-style quality-filtering signal (Wenzek et al. 2020 filter web text
by LM perplexity; KenLM there, a Laplace-smoothed bigram model here —
same pipeline shape, swappable scorer).

Why it belongs in a training-data engine: length/punctuation heuristics
(operators/text.py quality_score) catch degenerate documents; perplexity
against an in-domain reference corpus catches FLUENT-looking junk
(keyword stuffing, token soup, wrong-domain text) that heuristics pass.
Scoring is relative to a reference corpus the caller chooses (e.g. the
'train' split of a curated seed).

Model: ``p(w2 | w1) = (c(w1 w2) + a) / (c(w1) + a * V)`` with Laplace
``a`` and vocabulary size ``V`` (+1 for the unseen-token class). Every
quantity is a count, so training is two groupBys and scoring is two
LEFT equi-joins — fully distributed, no UDFs, deterministic, and
engine-portable (an independent implementation reproduces the exact
doubles).

Scale shape:

- **Train**: one tokenize pass; bigram and unigram count tables shuffle
  on their (hashable, high-cardinality) token keys — classic word-count.
  Model size is O(observed bigrams), NOT O(V^2): unseen bigrams are
  handled at scoring time by the smoothing arithmetic on the join miss.
- **Score**: explode each document's bigrams (2 tokens per row), LEFT
  JOIN the two count tables, per-document aggregate of log-probs. The
  count tables are corpus-vocabulary-sized; at web scale they may not
  broadcast — both joins are plain equi-joins, so Spark degrades to
  shuffle joins gracefully (AQE decides), and hot function-word keys
  are the standard skew-split case.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T

#: sentence-start pseudo-token (cannot collide: real tokens never hold a
#: non-alphanumeric character after tokenize)
BOS = "<s>"

DEFAULT_ALPHA = 0.5


def _bigrams(
    docs: DataFrame, id_col: str, text_col: str, tokens_col: str | None = None
) -> DataFrame:
    """(id, w1, w2) per document bigram, BOS-prefixed, empty docs drop.

    ``tokens_col``: reuse an already-staged token-array column instead of
    tokenizing here (round 8: one tokenize pass feeds the whole
    text_stats fold family)."""
    tok_name = tokens_col or "__toks"
    toks = F.col(tok_name)
    staged = docs if tokens_col else docs.withColumn("__toks", T.tokens(text_col))
    staged = staged.filter(F.size(tok_name) > 0).withColumn(
        "__with_bos", F.concat(F.array(F.lit(BOS)), toks)
    )
    pairs = F.expr(
        f"transform(sequence(1, size({tok_name})), "
        "i -> struct(element_at(__with_bos, i) as w1, element_at(__with_bos, i + 1) as w2))"
    )
    return staged.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, "p.w1", "p.w2")


def train_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> dict[str, DataFrame]:
    """Count tables for the reference corpus: ``bigrams (w1, w2, c2)``,
    ``unigrams (w1, c1)`` (context counts, BOS included), and ``vocab``
    (1 row: V = distinct next-tokens + 1 unseen class). Plain frames —
    persist/write them once per reference corpus and score many."""
    bg = _bigrams(ref_docs, id_col, text_col, tokens_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    unigrams = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bg.agg((F.count_distinct("w2") + 1).alias("v"))
    return {"bigrams": bigrams, "unigrams": unigrams, "vocab": vocab}


def _scored_join(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    id_col: str,
    text_col: str,
    tokens_col: str | None = None,
) -> DataFrame:
    """The scoring join shared by :func:`score_perplexity` and
    :func:`score_count_substrate`: per-document bigrams LEFT-joined to the
    reference count tables (``c2``/``c1`` NULL on a miss) with the 1-row
    vocab broadcast attached."""
    bg = _bigrams(docs, id_col, text_col, tokens_col)
    return (
        bg.join(F.broadcast(lm["vocab"]))
        .join(lm["bigrams"], ["w1", "w2"], "left")
        .join(lm["unigrams"], ["w1"], "left")
    )


def score_count_substrate(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """INTEGER-exact per-document substrate of the perplexity score —
    every quantity the scorer computes before the ``ln()``: scored-bigram
    count, summed reference bigram/context hit counts, unseen
    bigram/context counts, and the vocabulary size. Runs the exact same
    tokenize/explode/left-join pipeline as :func:`score_perplexity`, so
    a cross-engine match on these columns grades the whole LM data flow;
    only the float log arithmetic (one ``ln`` + division per row, checked
    in tests/test_lm.py) stays outside the oracle compare. Empty
    documents produce no row, same as the scorer."""
    joined = _scored_join(docs, lm, id_col, text_col, tokens_col)
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("lm_n_scored"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0))).cast("long").alias("lm_sum_c2"),
        F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("lm_unseen_bigrams"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).cast("long").alias("lm_sum_c1"),
        F.sum(F.when(F.col("c1").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("lm_unseen_contexts"),
        F.max("v").cast("long").alias("lm_vocab_v"),
    )


def score_perplexity(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = DEFAULT_ALPHA,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document bigram perplexity against the reference model:
    ``(id, n_scored, logprob, perplexity)`` where ``perplexity =
    exp(-logprob / n_scored)``. Lower = more in-domain. Unseen contexts
    (``w1`` absent from the reference) fall back to the maximally
    smoothed ``p = 1/V``; unseen continuations get the Laplace mass.
    Empty documents produce no row (no tokens to score)."""
    joined = _scored_join(docs, lm, id_col, text_col, tokens_col)
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        / (
            F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            + F.lit(float(alpha)) * F.col("v").cast("double")
        )
    )
    return (
        joined.select(F.col(id_col), logp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("__lp").alias("logprob"),
        )
        .withColumn(
            "perplexity", F.exp(-F.col("logprob") / F.col("n_scored"))
        )
    )


def perplexity_filter_threshold(
    scored: DataFrame, keep_fraction: float
) -> float:
    """The CCNet recipe's cut: keep the lowest-perplexity
    ``keep_fraction`` of documents. Returns the perplexity threshold via
    the distributed exact-percentile operator (never buffers the corpus
    in one task)."""
    from .ranking import exact_group_percentiles

    if not (0.0 < keep_fraction <= 1.0):
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    if keep_fraction == 1.0:
        return math.inf
    row = (
        exact_group_percentiles(
            scored.withColumn("__g", F.lit(1)),
            ["__g"],
            "perplexity",
            [keep_fraction],
        )
        .select("value")
        .first()
    )
    return float(row[0])
