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
