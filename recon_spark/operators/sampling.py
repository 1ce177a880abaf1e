"""Deterministic dataset splitting and stratified sampling — the
reproducibility operators of a training-data pipeline (train/val/test
carving, per-class downsampling, mixture construction).

Everything keys off md5 of ``salt || id``, never ``rand()``:

- reproducible across runs, engines, partitionings, and cluster sizes
  (a seeded ``rand()`` is none of these — it is partition-dependent);
- adding documents never moves an existing document to a different
  split (the property that keeps eval sets uncontaminated as the corpus
  grows);
- the DuckDB oracle replays the exact same md5 arithmetic.

Scale shape: the split is a pure narrow projection (no shuffle at all).
The stratified sampler is two window passes over the stratum key — one
count, one rank — i.e. a single shuffle on the stratum; the per-stratum
quota is exact integer ceil arithmetic, not a probabilistic fraction, so
sample sizes are deterministic too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPLIT_SALT = "split:v1"

#: uint32 thresholds for the default 90/5/5 split (integer compares only)
TRAIN_NUM, VAL_NUM, DEN = 90, 5, 100
_SCALE = 1 << 32
TRAIN_EDGE = TRAIN_NUM * _SCALE // DEN
VAL_EDGE = (TRAIN_NUM + VAL_NUM) * _SCALE // DEN


def hash_bucket(id_col: Column | str, salt: str = SPLIT_SALT) -> Column:
    """First 8 md5 hex chars of ``salt || id`` as a uint32-ranged long —
    the uniform deterministic coin every operator here flips."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def with_split(
    docs: DataFrame, id_col: str = "doc_id", salt: str = SPLIT_SALT
) -> DataFrame:
    """Attach a ``split`` label (train/val/test, 90/5/5 by uint32 edge
    compare). Pure projection — no shuffle, no state, no rand()."""
    b = hash_bucket(id_col, salt)
    return docs.withColumn(
        "split",
        F.when(b < TRAIN_EDGE, F.lit("train"))
        .when(b < VAL_EDGE, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    frac_num: int,
    frac_den: int,
    id_col: str = "doc_id",
    salt: str = "sample:v1",
) -> DataFrame:
    """Keep exactly ``ceil(frac * n)`` rows per stratum, chosen by hash
    order (deterministic; ties impossible for unique ids). Quota is
    integer ceil — ``(num*n + den - 1) DIV den`` — so both engines agree
    without float arithmetic."""
    b = hash_bucket(id_col, salt)
    w_cnt = Window.partitionBy(stratum_col)
    w_rank = Window.partitionBy(stratum_col).orderBy(
        b.asc(), F.col(id_col).asc()
    )
    quota = F.expr(
        f"({frac_num} * __cnt + {frac_den} - 1) DIV {frac_den}"
    )
    return (
        docs.withColumn("__cnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= quota)
        .drop("__cnt", "__rn")
    )


def contamination_check(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Eval-contamination scan: which test-split documents share any
    k-token shingle with ANY train-split document — the check a training
    pipeline runs before trusting its held-out metrics.

    Returns (id, n_shared) for contaminated test docs (n_shared =
    distinct overlapping shingles). Shape: one persisted
    (id, split, shingles) frame; the train side collapses to a DISTINCT
    shingle projection (vocab-bounded) before the equi-join, so the join
    is index-sized, never |train| x |test|. Same bucketed-equi-join
    scale story as the dedup family; the split reuses the md5 coin so
    the whole check is deterministic end-to-end.
    """
    from . import text as T

    base = with_split(docs, id_col, salt).withColumn("__toks", T.tokens(text_col))
    sh = base.select(
        F.col(id_col).alias("id"),
        "split",
        T.shingles_from_tokens(F.col("__toks"), k).alias("sh"),
    ).persist()
    train_sh = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    test_idx = sh.filter(F.col("split") == "test").select(
        "id", F.explode("sh").alias("shingle")
    )
    return (
        test_idx.join(train_sh, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
