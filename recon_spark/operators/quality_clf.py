"""fastText-style quality-classifier filter (Joulin et al. 2017, *Bag
of Tricks for Efficient Text Classification*) — the linear-classifier
stage CCNet/RedPajama/GPT-3-style pipelines pair with the perplexity
filter (r10 VERDICT task #5).

**Features** REUSE the DSIR hashed unigram+bigram bucket substrate
(:func:`~.dsir.dsir_features` — same md5 bucket hash, same
``DSIR_BUCKETS`` space), so one feature extraction serves both the
importance resampler and this classifier, and the graded integer fold
shares the oracle's replay machinery.

**Model**: binary logistic regression over L1-normalized bucket counts.
fastText's mean-of-embeddings with a 1-dimensional linear output IS
``sigmoid(w · x/|x| + b)`` — the hidden embedding layer is a linear
map composed with a linear output, so for binary classification the
composition collapses to one weight per hashed feature.

**Labels**: the graded substrate bootstraps labels from the repo's
rule-based quality battery (``text.quality_flags`` empty -> positive)
— the standard practice of training the cheap linear model on
heuristic/source labels (GPT-3 trained its filter on WebText-vs-crawl
labels; CCNet on Wikipedia-vs-crawl). The corpus stage instead takes a
caller-supplied positive TARGET corpus and uses the pool itself as
negatives (the CCNet shape); both run through the same substrate
builder.

**Training**: full-batch gradient descent, fixed iteration count, zero
initial weights — deterministic given the substrate. Each iteration is
two narrow shuffles over the (persisted) substrate: a bucket-keyed
broadcast join + per-doc sigmoid, then a residual-weighted bucket
aggregate; the weight vector is collected per iteration (bounded:
``n_buckets`` rows — the same bounded-model driver action as the IVF
centroids and the Bloom bitmap). At 100 TB the TRAINING pool stays
bounded by construction (fastText quality models train on 1e5-1e7
labeled docs, never the full crawl); SCORING is the scale path: one
broadcast of the final weight vector, one join + per-doc aggregate.

**Parity discipline** (the DSIR split, applied verbatim): the INTEGER
substrate — per-doc bucket counts joined with the battery label — is
drive-graded through a parity fold on ``data_mixing_weights``
(``n_qclf_rows``/``qclf_ck``, oracle ``llm_sql.qclf_substrate_sql``);
the float GD layer (weights, logits, keep verdicts) is pytest-graded
against an independent numpy twin (tests/test_quality_clf.py).

Reference parity: no reference counterpart — beyond-reference
LLM-pipeline surface (quality-filter family, next to lm.perplexity and
text.quality_flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import text as T
from .dsir import DSIR_BUCKETS, dsir_features

#: fixed GD schedule — part of the deterministic contract
QCLF_ITERS = 20
QCLF_LR = 2.0


def qclf_labels(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, label): 1 iff the rule-based quality battery passes
    (``text.quality_flags`` empty) — the bootstrap labeling rule of the
    graded substrate."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (F.size(T.quality_flags(text_col)) == 0).cast("int").alias("label"),
    )


def qclf_substrate(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, label, bucket, cnt) — the INTEGER training substrate
    (drive-graded): DSIR's hashed-feature counts joined with the
    battery label. Docs with no features (null/empty text) produce no
    rows, exactly as in :func:`~.dsir.dsir_features`."""
    feats = dsir_features(docs, n_buckets, id_col, text_col)
    return feats.join(qclf_labels(docs, id_col, text_col), "doc_id").select(
        "doc_id", "label", "bucket", "cnt"
    )


def labeled_substrate(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substrate from explicit positive/negative corpora (the CCNet
    shape: curated target vs the raw pool). ``doc_id`` is prefixed with
    the class (``p``/``n``) so overlapping ids cannot collide."""
    pf = dsir_features(pos_docs, n_buckets, id_col, text_col).select(
        F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.lit(1).alias("label"),
        "bucket",
        "cnt",
    )
    nf = dsir_features(neg_docs, n_buckets, id_col, text_col).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.lit(0).alias("label"),
        "bucket",
        "cnt",
    )
    return pf.unionByName(nf)


def train_quality_clf(
    spark: SparkSession,
    substrate: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    iters: int = QCLF_ITERS,
    lr: float = QCLF_LR,
) -> tuple[list[float], float]:
    """Full-batch logistic-regression GD over a (doc_id, label, bucket,
    cnt) substrate; returns ``(weights[n_buckets], bias)`` as local
    Python floats (bounded model state).

    Per iteration, ONE Spark action (VERDICT r11 #3): score every doc
    (bucket-keyed broadcast join against the current weights + per-doc
    sigmoid), re-join the residuals to the substrate and aggregate the
    residual-weighted gradient per bucket — a single job whose one
    forward pass feeds both gradients. The BIAS gradient needs no
    second action: features are L1-NORMALIZED per doc (Σ_b x_{d,b} = 1
    by construction of ``x``), so Σ_b g_b = Σ_d resid_d · Σ_b x_{d,b}
    = Σ_d resid_d — the bias gradient is exactly the sum of the
    collected bucket gradients (float rounding vs the direct sum is
    ~1e-16 relative; the numpy-twin parity test holds at rtol 1e-6).
    The substrate is persisted here and released before returning; the
    caller persists only if it reuses the frame."""
    sub = substrate.withColumn(
        "x",
        F.col("cnt").cast("double")
        / F.sum("cnt").over(_doc_window()).cast("double"),
    ).persist()
    try:
        n_docs = sub.select("doc_id").distinct().count()
        if n_docs == 0:
            return [0.0] * n_buckets, 0.0
        weights = [0.0] * n_buckets
        bias = 0.0
        for _ in range(iters):
            wdf = spark.createDataFrame(
                [(b, w) for b, w in enumerate(weights) if w != 0.0],
                "bucket int, w double",
            )
            scored = (
                sub.join(F.broadcast(wdf), "bucket", "left")
                .groupBy("doc_id", "label")
                .agg(
                    F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias(
                        "__dot"
                    )
                )
                .select(
                    "doc_id",
                    "label",
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-(F.col("__dot") + F.lit(bias))))
                        - F.col("label").cast("double")
                    ).alias("resid"),
                )
            )
            grad = (
                sub.join(scored.select("doc_id", "resid"), "doc_id")
                .groupBy("bucket")
                .agg(F.sum(F.col("resid") * F.col("x")).alias("g"))
            )
            g_rows = {r["bucket"]: r["g"] for r in grad.collect()}
            # Σ_b g_b == Σ_d resid_d because x is L1-normalized per doc
            # (docstring) — the bias gradient without a second job
            g_bias = sum(g_rows.values())
            for b, g in g_rows.items():
                weights[b] -= lr * g / n_docs
            bias -= lr * g_bias / n_docs
        return weights, bias
    finally:
        sub.unpersist()


def _doc_window():
    from pyspark.sql import Window

    return Window.partitionBy("doc_id")


def with_quality_prob(
    spark: SparkSession,
    docs: DataFrame,
    weights: list[float],
    bias: float,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_feats, logit, prob) — the SCALE path: one broadcast of
    the bounded weight frame, one feature join + per-doc aggregate.
    Docs with no features anchor at ``logit = bias`` (x = 0)."""
    wdf = spark.createDataFrame(
        [(b, w) for b, w in enumerate(weights) if w != 0.0],
        "bucket int, w double",
    )
    feats = dsir_features(docs, n_buckets, id_col, text_col)
    per = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            (
                F.sum(
                    F.col("cnt").cast("double")
                    * F.coalesce(F.col("w"), F.lit(0.0))
                )
                / F.sum("cnt").cast("double")
            ).alias("__dot"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    logit = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(bias)
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
    )


def quality_prob_threshold(scored: DataFrame, keep_fraction: float) -> float:
    """Probability cut keeping the HIGHEST-scoring ``keep_fraction`` of
    documents (the CCNet-style quantile cut, mirrored from
    lm.perplexity_filter_threshold — distributed exact percentile,
    never one task buffering the corpus)."""
    import math

    from .ranking import exact_group_percentiles

    if not (0.0 < keep_fraction <= 1.0):
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    if keep_fraction == 1.0:
        return -math.inf
    row = (
        exact_group_percentiles(
            scored.withColumn("__g", F.lit(1)),
            ["__g"],
            "prob",
            [1.0 - keep_fraction],
        )
        .select("value")
        .collect()
    )
    return row[0][0]
