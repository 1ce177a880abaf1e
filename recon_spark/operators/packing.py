"""Sequence packing — concat-and-chunk token binning for training batches.

LLM pretraining consumes fixed-length token sequences; the standard prep
step concatenates documents in a deterministic order and chunks the
stream at ``budget`` tokens (GPT-style "packing").  The operator assigns
every document its position in that stream: the bin (sequence index) its
first token lands in and the offset within that bin.  A document may
straddle bins — consumers chunk at the recorded boundaries — so the
assignment is pure arithmetic over the token-count PREFIX SUM in the
packing order.

Determinism + scale shape:

* Packing order is ``(md5 hash, doc_id)`` — reproducible across runs,
  engines, partitionings (never ``rand()``), same coin as
  :mod:`recon_spark.operators.sampling`, and an implicit shuffle of the
  corpus (adjacent docs are unrelated — what training wants).
* The prefix sum is the two-phase bucket-rank shape of
  :mod:`recon_spark.operators.ranking`: the hash's top bits coarsen the
  order into buckets; per-bucket token totals cumulative-sum on a
  metadata-sized frame (the ONLY global step); rows get
  ``bucket offset + within-bucket running sum`` from a window
  partitioned by bucket.  No single-task global sort anywhere
  (plan-asserted in tests/test_packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text as T
from .sampling import hash_bucket

PACK_SALT = "pack:v1"

#: hash_bucket is uint32; keep the top 8 bits -> 256 coarse buckets, a
#: monotonic coarsening of the (hash, doc_id) packing order
BUCKET_SHIFT = 24

#: default tokens per packed training sequence
DEFAULT_BUDGET = 2048


def pack_sequences(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
    salt: str = PACK_SALT,
    tokens_col: str | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Assign each document ``(bin_id, bin_offset)`` in the deterministic
    concat-and-chunk stream of its group (``group_cols`` — e.g. the
    train/val/test split — pack independently; empty tuple = one global
    stream).  Output columns: ``group_cols..., id_col, n_tokens, bin_id,
    bin_offset``.

    ``tokens_col``: count an ALREADY-STAGED token-array column instead of
    tokenizing ``text_col`` (round 8: the corpus builder's shared token
    pass). ``count_col`` (round 12): pack by a PRECOMPUTED per-document
    token count instead — e.g. the trained-BPE subword counts a real
    pretraining pipeline budgets by (operators/bpe.py); takes precedence
    over both."""
    g = list(group_cols)
    hb = hash_bucket(id_col, salt)
    if count_col:
        n_tokens = F.col(count_col).cast("long")
    elif tokens_col:
        n_tokens = F.size(F.col(tokens_col)).cast("long")
    else:
        n_tokens = T.token_count(text_col)
    base = docs.select(
        *g,
        id_col,
        n_tokens.alias("n_tokens"),
        hb.alias("__hb"),
    ).withColumn("__bk", F.shiftright("__hb", BUCKET_SHIFT))

    totals = base.groupBy(*g, "__bk").agg(F.sum("n_tokens").alias("__bn"))
    w_b = (
        Window.partitionBy(*g)
        .orderBy(F.col("__bk").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *g, "__bk", (F.sum("__bn").over(w_b) - F.col("__bn")).alias("__off")
    )

    w_in = (
        Window.partitionBy(*g, "__bk")
        .orderBy(F.col("__hb").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.col("__off") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    return (
        base.join(F.broadcast(offsets), [*g, "__bk"])
        .withColumn("__prev", prev)
        .select(
            *g,
            id_col,
            "n_tokens",
            F.expr(f"__prev DIV {budget}").alias("bin_id"),
            (F.col("__prev") % budget).alias("bin_offset"),
        )
    )


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_block: int = 1 << 20,
) -> DataFrame:
    """Padding-minimizing batch assignment for padded (non-packed)
    training/inference: rank every document in the global
    ``(n_tokens ASC, id ASC)`` order and cut the ranked stream into
    consecutive ``batch_size``-document batches, so each batch holds
    similar-length documents and its padded cost
    ``batch_size * max(len in batch)`` stays close to the token sum
    (the standard "length bucketing" / "sorted batching" trick; packing
    is for pretraining streams, THIS is for padded SFT/inference
    batches).

    Returns ``(id, n_tokens, batch_id)`` with ``batch_id`` dense from 0
    in length order.

    Scale shape — the same two-phase bucket rank as everything in
    :mod:`recon_spark.operators.ranking`: token counts have a bounded
    domain, so the coarse bucket is ``(n_tokens, floor(id / id_block))``
    — the id-block sub-split (the dsir.dsir_select phase-3 pattern)
    guards the DEGENERATE length distribution where one length dominates
    (e.g. everything pre-truncated to exactly 2048 tokens), which would
    otherwise funnel the whole corpus through the one task ranking that
    length (r13 review). Per-bucket counts cumulative-sum on a
    metadata-sized frame (|lengths| x N/id_block rows — the ONLY global
    step) and rows get ``bucket offset + within-bucket row_number`` from
    a window partitioned by ``(n_tokens, block)`` — each task bounded by
    ``id_block`` rows even when every document has the same length.

    The block split needs blocks that coarsen the id ORDER, so it only
    applies when ``id_col`` is numeric (same contract as
    ranking.ntile_bins / dsir.dsir_select); for other id types it
    collapses to a constant — exact for every orderable id, but a
    single-length corpus with non-numeric ids then serializes that one
    length group. Value-identical to the naive
    ``row_number() OVER (ORDER BY n_tokens, id)`` spelling (asserted in
    tests/test_packing.py, incl. an all-one-length corpus).
    """
    from pyspark.sql.types import NumericType

    blk = (
        F.floor(F.col(id_col) / F.lit(id_block))
        if isinstance(docs.schema[id_col].dataType, NumericType)
        else F.lit(0).cast("long")
    )
    rows = docs.select(
        F.col(id_col),
        F.size(T.tokens(text_col)).cast("long").alias("n_tokens"),
        blk.alias("__blk"),
    )
    counts = rows.groupBy("n_tokens", "__blk").agg(F.count(F.lit(1)).alias("__bn"))
    w_cum = Window.orderBy(F.col("n_tokens").asc(), F.col("__blk").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "n_tokens",
        "__blk",
        (F.sum("__bn").over(w_cum) - F.col("__bn")).alias("__off"),
    )
    w_in = Window.partitionBy("n_tokens", "__blk").orderBy(F.col(id_col).asc())
    return (
        rows.join(F.broadcast(offsets), ["n_tokens", "__blk"])
        .withColumn("__rank", F.col("__off") + F.row_number().over(w_in) - 1)
        .select(
            id_col,
            "n_tokens",
            F.expr(f"__rank DIV {batch_size}").cast("long").alias("batch_id"),
        )
    )
