"""Near-dup candidate-quality evaluation (dedup.near_dup_recall_from_
shingles): metric identities against the two standalone generators,
exact-copy recall, and empty-truth null handling. The e2e banding +
truth + micros replay is driver-graded as the parity fold on
dedup_exact_documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from recon_spark.operators import dedup as DD


def _sh(spark, docs):
    return DD.staged_shingles(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).persist()


def test_recall_consistent_with_standalone_generators(spark):
    """n_nd_cand/n_nd_truth/n_nd_hits must equal what the standalone
    minhash_lsh_candidates and ngram_jaccard_pairs generators produce —
    the recall row is a composition, not a reimplementation."""
    docs = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta iota doc{i % 7}")
        for i in range(40)
    ] + [(100 + i, f"totally different text number {i} with unique words w{i}") for i in range(10)]
    sh = _sh(spark, docs)
    got = DD.near_dup_recall_from_shingles(sh).collect()[0]

    frame = spark.createDataFrame(docs, "doc_id long, text string")
    cand = {
        (r.id_a, r.id_b)
        for r in DD.minhash_lsh_candidates(frame).select("id_a", "id_b").collect()
    }
    truth = {
        (r.id_a, r.id_b)
        for r in DD.ngram_jaccard_pairs(frame).select("id_a", "id_b").collect()
    }
    sh.unpersist()
    assert got.n_nd_cand == len(cand)
    assert got.n_nd_truth == len(truth)
    assert got.n_nd_hits == len(cand & truth)
    assert got.n_nd_hits <= min(got.n_nd_cand, got.n_nd_truth)


def test_recall_is_one_on_exact_copies(spark):
    """Exact copies have identical signatures, so every band collides:
    LSH candidate recall over a pure-copy corpus is exactly 1.0."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, text) for i in range(6)] + [
        (10 + i, f"completely unrelated filler row {i} about nothing xyz{i}")
        for i in range(6)
    ]
    sh = _sh(spark, docs)
    got = DD.near_dup_recall_from_shingles(sh).collect()[0]
    sh.unpersist()
    assert got.n_nd_truth == 15  # C(6,2) copy pairs
    assert got.nd_recall_micros == 1_000_000


def test_recall_null_when_no_truth(spark):
    """A corpus with no true near-dups reports NULL recall (0/0), not 0
    or a crash; precision is still defined if spurious candidates exist."""
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(20)
    ]
    sh = _sh(spark, docs)
    got = DD.near_dup_recall_from_shingles(sh).collect()[0]
    sh.unpersist()
    assert got.n_nd_truth == 0 and got.n_nd_hits == 0
    assert got.nd_recall_micros is None
