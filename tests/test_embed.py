"""Feature-hashing text embedder (operators/embed.py): bitwise parity
between the Arrow-batched production path and the column-algebra twin,
unit-norm/determinism invariants, and the end-to-end text -> embedding
-> ANN composition."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from recon_spark.operators import embed as E
from recon_spark.operators import similarity as SIM


def test_arrow_and_expr_paths_match_bitwise(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    a = {r.doc_id: r.embedding for r in E.embed_texts(docs, dim=32).collect()}
    b = {r.doc_id: r.embedding for r in E.embed_texts_exprs(docs, dim=32).collect()}
    assert a.keys() == b.keys() and len(a) == 120
    n_vecs = 0
    for k in a:
        if a[k] is None:
            assert b[k] is None
            continue
        n_vecs += 1
        assert a[k] == b[k], k  # exact double equality, element-wise
    assert n_vecs > 100  # the corpus is overwhelmingly non-empty


def test_unit_norm_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "   "), (3, None), (4, "alpha")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.embedding for r in E.embed_texts(docs, dim=16).collect()}
    assert rows[2] is None and rows[3] is None
    for k in (1, 4):
        assert abs(math.sqrt(sum(x * x for x in rows[k])) - 1.0) < 1e-12
    # determinism: same token -> same vector regardless of the document
    single = rows[4]
    assert any(abs(x) == 1.0 for x in single)  # one token -> one hot +-1


def test_text_to_ann_composition(spark):
    """End-to-end: raw text -> hashed embeddings -> exact top-k. A near
    duplicate pair (one differing token in twelve) must rank each other
    at #1; unrelated documents must not."""
    base = (
        "retirement distributions reconcile matrix relius engines "
        "taxable basis rollover audit codes"
    )
    near = base.replace("audit", "review")
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, near),
            (3, "completely different words about citrus orchards and irrigation"),
            (4, "spark shuffles partitioned columnar batches across executors"),
        ],
        "doc_id long, text string",
    )
    emb = E.embed_texts(docs, dim=64).filter(F.col("embedding").isNotNull())
    topk = SIM.brute_force_topk(emb, emb, k=1, id_col="doc_id", vec_col="embedding")
    best = {r.query_id: (r.neighbor_id, r.score) for r in topk.collect()}
    assert best[1][0] == 2 and best[2][0] == 1
    assert best[1][1] > 0.85  # 11/12 shared tokens -> high cosine
    assert best[3][1] < 0.5  # unrelated docs stay far
