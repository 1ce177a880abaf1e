"""Text -> embedding: the missing link between the ``documents`` and
``embeddings`` tables.

The embedder is the **hashing trick** (feature hashing, Weinberger et
al. 2009): each token hashes to a dimension index and a sign, the
document vector is the signed bucket-count histogram, L2-normalized.
That is a real (if simple) embedding — deterministic, vocabulary-free,
engine-portable — not a stub; swapping in a neural encoder changes ONE
function body, not the pipeline.

Two implementations with identical output (asserted in
tests/test_embed.py):

- :func:`embed_texts` — ``mapInPandas`` + numpy, Arrow-batched. This is
  the REAL-VOLUME shape: batched rows in, a matrix of vectors out —
  exactly the batch contract a GPU model server or sentence-transformer
  would occupy, so the surrounding plumbing (schema, batching,
  partition-parallelism) is production-shaped today.
- :func:`embed_texts_exprs` — pure column algebra (no Python workers),
  O(dim x tokens) per row. The oracle-able twin used for value parity
  and for clusters where Python workers are undesirable.

Composition: embed -> :func:`recon_spark.operators.similarity.ivf_topk`
(or the LSH/brute-force paths) gives document-level ANN end-to-end from
raw text (tests/test_embed.py runs the full chain and checks that a
near-duplicate text pair lands in each other's top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as T

DEFAULT_DIM = 64
EMBED_SALT = "embed:v1"


def _bucket_and_sign_sql_compatible(tok: Column, dim: int) -> tuple[Column, Column]:
    """(dimension index, sign) per token, both md5-derived so every
    engine reproduces them bit-identically (same recipe as the MinHash /
    split-coin hashing elsewhere in this package)."""
    h = F.md5(F.concat(F.lit(EMBED_SALT), tok))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    return bucket, sign


def pair_expr(tok: Column, dim: int) -> Column:
    """Per-token ``struct(b, s)`` (dimension, sign) — stage
    ``F.transform(toks, lambda t: pair_expr(t, dim))`` as a COLUMN so
    md5 runs once per token, then feed :func:`embedding_from_pairs`."""
    b, s = _bucket_and_sign_sql_compatible(tok, dim)
    return F.struct(b.alias("b"), s.alias("s"))


def embedding_from_pairs(pairs: Column, dim: int) -> Column:
    """L2-normalized hashed embedding from a STAGED (bucket, sign) pair
    array; NULL when the array is empty. ``pairs`` must be a plain
    column reference (same staging rule as every array op in
    operators/text.py)."""

    def dim_value(i: Column) -> Column:
        return F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, p: acc + F.when(p["b"] == i, p["s"]).otherwise(F.lit(0.0)),
        )

    raw = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), dim_value)
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(raw, lambda x: x / norm))


def embed_texts_exprs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out: str = "embedding",
) -> DataFrame:
    """Column-algebra hashing-trick embedder: ``(id, embedding)`` with an
    L2-normalized ``array<double>`` of length ``dim``; rows with no
    tokens get a NULL embedding. O(dim x tokens) expression work per row
    — fine for document-sized rows; the Arrow path is the hot-path twin.
    """
    staged = docs.withColumn("__toks", T.tokens(text_col)).withColumn(
        "__pairs", F.transform(F.col("__toks"), lambda t: pair_expr(t, dim))
    )
    return staged.select(
        F.col(id_col), embedding_from_pairs(F.col("__pairs"), dim).alias(out)
    )


def embed_texts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out: str = "embedding",
) -> DataFrame:
    """Arrow-batched hashing-trick embedder (the production-shaped path):
    one ``mapInPandas`` stage, each batch tokenized and scattered into a
    numpy ``(rows, dim)`` matrix, L2-normalized per row. Output matches
    :func:`embed_texts_exprs` bit-for-bit on the doubles (same md5
    bucket/sign derivation, and summation order per dimension is the
    token order in both paths — Python float addition and Spark double
    addition agree operation-for-operation)."""
    import hashlib
    import re

    token_re = re.compile(T.TOKEN_SPLIT_RE)
    salt = EMBED_SALT

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf[id_col].tolist()
            out_ids, out_vecs = [], []
            for rid, text in zip(ids, pdf[text_col].tolist()):
                toks = [
                    t
                    for t in token_re.split(str(text).lower().strip())
                    if t != ""
                ] if text is not None else []
                if not toks:
                    out_ids.append(rid)
                    out_vecs.append(None)
                    continue
                vec = np.zeros(dim, dtype=np.float64)
                for t in toks:
                    h = hashlib.md5((salt + t).encode()).hexdigest()
                    bucket = int(h[:8], 16) % dim
                    sign = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
                    vec[bucket] += sign
                n = float(np.sqrt((vec * vec).sum()))
                out_ids.append(rid)
                out_vecs.append((vec / n).tolist() if n > 0 else None)
            yield pd.DataFrame({id_col: out_ids, out: out_vecs})

    # preserve the caller's id type (string/int/long all appear in real
    # corpora); hardcoding `long` silently nulled non-long ids (ADVICE r6)
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        batches, f"`{id_col}` {id_type}, {out} array<double>"
    )
