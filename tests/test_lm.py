"""Bigram-LM perplexity scoring (operators/lm.py): hand-computable
probabilities, the discriminative property (in-domain text scores lower
than token soup), determinism, and the CCNet-style keep-fraction cut."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import lm


def test_bigram_probabilities_by_hand(spark):
    """Reference corpus 'a b' 'a b' 'a c' -> exact Laplace arithmetic.
    Bigrams with BOS: (<s>,a)x3, (a,b)x2, (a,c)x1. V = |{a,b,c}| + 1 =
    4; alpha = 0.5."""
    ref = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    model = lm.train_bigram_lm(ref)
    assert model["vocab"].first().v == 4
    scored = {
        r.doc_id: r
        for r in lm.score_perplexity(
            spark.createDataFrame([(10, "a b"), (11, "a z")], "doc_id long, text string"),
            model,
        ).collect()
    }
    # doc 10: p(a|<s>) = (3+.5)/(3+2) = .7 ; p(b|a) = (2+.5)/(3+2) = .5
    want_10 = math.log(0.7) + math.log(0.5)
    assert scored[10].n_scored == 2
    assert scored[10].logprob == pytest.approx(want_10, rel=1e-12)
    assert scored[10].perplexity == pytest.approx(math.exp(-want_10 / 2), rel=1e-12)
    # doc 11: unseen continuation z: p(z|a) = .5/(3+2) = .1
    want_11 = math.log(0.7) + math.log(0.1)
    assert scored[11].logprob == pytest.approx(want_11, rel=1e-12)


def test_count_substrate_by_hand(spark):
    """The integer substrate driver-graded through text_stats (round 7):
    same tiny corpus as the probability test, every column checked
    against hand-derived counts. Ref bigrams: (<s>,a)x3, (a,b)x2,
    (a,c)x1; contexts <s>:3, a:3; V=4."""
    ref = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    model = lm.train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "a z"), (12, "z q"), (13, "")],
        "doc_id long, text string",
    )
    sub = {r.doc_id: r for r in lm.score_count_substrate(docs, model).collect()}
    # doc 10 'a b': hits (<s>,a)=3 and (a,b)=2; contexts <s>=3, a=3
    assert (
        sub[10].lm_n_scored,
        sub[10].lm_sum_c2,
        sub[10].lm_unseen_bigrams,
        sub[10].lm_sum_c1,
        sub[10].lm_unseen_contexts,
        sub[10].lm_vocab_v,
    ) == (2, 5, 0, 6, 0, 4)
    # doc 11 'a z': (a,z) unseen bigram, but both contexts seen
    assert (
        sub[11].lm_sum_c2,
        sub[11].lm_unseen_bigrams,
        sub[11].lm_sum_c1,
        sub[11].lm_unseen_contexts,
    ) == (3, 1, 6, 0)
    # doc 12 'z q': both bigrams unseen; context z unseen, <s> seen
    assert (
        sub[12].lm_sum_c2,
        sub[12].lm_unseen_bigrams,
        sub[12].lm_sum_c1,
        sub[12].lm_unseen_contexts,
    ) == (0, 2, 3, 1)
    # empty doc: no row, same contract as score_perplexity
    assert 13 not in sub
    # coherence with the float scorer: identical per-doc n_scored
    n_scored = {
        r.doc_id: r.n_scored
        for r in lm.score_perplexity(docs, model).collect()
    }
    assert n_scored == {d: sub[d].lm_n_scored for d in sub}


def test_unseen_context_falls_back_to_uniform(spark):
    ref = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = lm.train_bigram_lm(ref)
    # context 'q' never seen: p = alpha / (0 + alpha * V) = 1/V, V = 3
    scored = lm.score_perplexity(
        spark.createDataFrame([(20, "q q")], "doc_id long, text string"), model
    ).first()
    v = model["vocab"].first().v
    want = math.log(1 / v)  # for the (q, q) bigram
    # first bigram is (<s>, q): <s> IS a seen context -> Laplace mass
    assert scored.n_scored == 2
    assert scored.logprob < want  # both terms are low-probability


def test_in_domain_beats_token_soup(spark):
    """The discriminative property: text following the reference's
    bigram structure must score materially lower perplexity than the
    SAME tokens in scrambled order (identical unigram profile, destroyed
    bigram structure). Uses a structured reference corpus — the sf
    testdata documents are themselves near-random token streams, so they
    cannot carry this signal (measured: shuffling them moves perplexity
    ~1%); the hand-checkable phrase corpus isolates the model property."""
    import random

    phrases = [
        "the engine reads the table and writes the result",
        "the worker sorts the batch and merges the result",
        "the engine scans the table and filters the rows",
        "the worker joins the batch and counts the rows",
    ]
    ref = spark.createDataFrame(
        [(i, phrases[i % 4]) for i in range(200)], "doc_id long, text string"
    )
    model = lm.train_bigram_lm(ref)

    held = "the engine sorts the table and counts the result"
    rng = random.Random(7)
    toks = held.split()
    soup_variants = []
    for j in range(5):
        t = toks[:]
        rng.shuffle(t)
        soup_variants.append((1_000 + j, " ".join(t)))
    probe = spark.createDataFrame(
        [(1, held)] + soup_variants, "doc_id long, text string"
    )
    scored = {r.doc_id: r.perplexity for r in lm.score_perplexity(probe, model).collect()}
    avg_soup = sum(scored[k] for k in scored if k >= 1_000) / 5
    assert scored[1] < avg_soup * 0.5, (scored[1], avg_soup)


def test_keep_fraction_threshold(spark):
    scored = spark.createDataFrame(
        [(i, 2, -1.0, float(i)) for i in range(1, 101)],
        "doc_id long, n_scored long, logprob double, perplexity double",
    )
    thr = lm.perplexity_filter_threshold(scored, 0.25)
    kept = scored.filter(F.col("perplexity") <= thr).count()
    assert 25 <= kept <= 26  # interpolated percentile may include the boundary
    assert lm.perplexity_filter_threshold(scored, 1.0) == math.inf
    with pytest.raises(ValueError):
        lm.perplexity_filter_threshold(scored, 0.0)
