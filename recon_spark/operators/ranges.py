"""Bucketized range join — interval x point matching as an EQUI-join.

Spark has no native range-join strategy: a bare
``l JOIN r ON r.ts BETWEEN l.lo AND l.hi`` plans as
BroadcastNestedLoopJoin (all-pairs per key group) — a scale killer. The
standard fix (used by the engines behind "range join optimization" hints
elsewhere) is time bucketing:

- choose a bucket width ``w``;
- each left interval ``[lo, hi)`` explodes to the buckets it overlaps —
  ``lo DIV w .. (hi-1) DIV w`` (constant fan-out when interval length is
  bounded by a few ``w``);
- each right point maps to its single bucket ``ts DIV w``;
- equi-join on ``(keys…, bucket)``, then apply the exact interval
  predicate as a cheap residual filter.

The join is now shuffle-hashable/AQE-optimizable on a uniform composite
key; fan-out is ``(interval_len / w) + 1`` per left row. Pick ``w`` near
the typical interval length so the explode factor stays ~2.

All bucket arithmetic is integer (``DIV``) on epoch-micros longs — the
DuckDB oracle replays the plain inequality join (its IEJoin handles that
fine at oracle scale) and must agree exactly.

Assumes non-negative timestamps/bounds (epoch micros): ``DIV`` truncates
toward zero, so a negative ``lo`` would land in a too-high bucket and
could miss matches. Fine for event time; lift with a floor-div if signed
offsets ever appear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    lo_col: str,
    hi_col: str,
    ts_col: str,
    bucket_us: int,
) -> DataFrame:
    """Join left interval rows ``[lo_col, hi_col)`` (epoch-micros longs,
    exclusive hi) to right point rows on ``on + time overlap``. Returns
    the matched pairs (inner); callers aggregate / re-join as needed."""
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} DIV {bucket_us}"),
                F.expr(f"({hi_col} - 1) DIV {bucket_us}"),
            )
        ),
    )
    rb = right.withColumn("__b", F.expr(f"{ts_col} DIV {bucket_us}"))
    return (
        lb.join(rb, [*on, "__b"])
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col)))
        .drop("__b")
    )


def lookback_agg(
    anchors: DataFrame,
    points: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts_us",
    window_us: int = 24 * 3600 * 1_000_000,
    value_micros_col: str | None = None,
    bucket_us: int | None = None,
) -> DataFrame:
    """Per anchor row: count (and optional micros sum) of points in the
    same key group within ``[ts - window_us, ts)`` — strictly before, so
    an anchor never counts itself. Anchors with no points keep n=0 via
    the final left join (sum stays null, matching SQL SUM semantics).
    """
    bucket_us = bucket_us or window_us
    anchor_cols = anchors.columns
    iv = anchors.withColumn("__lo", F.col(ts_col) - F.lit(window_us)).withColumn(
        "__hi", F.col(ts_col)
    )
    pts = points.select(*on, F.col(ts_col).alias("__pt"), *(
        [F.col(value_micros_col).alias("__pv")] if value_micros_col else []
    ))
    pairs = range_join_bucketed(
        iv, pts, on, "__lo", "__hi", "__pt", bucket_us
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    if value_micros_col:
        aggs.append(F.sum("__pv").alias("__v"))
    grouped = pairs.groupBy(*anchor_cols).agg(*aggs)
    out = anchors.join(grouped.select(*anchor_cols, "__n", *(
        ["__v"] if value_micros_col else []
    )), anchor_cols, "left")
    out = out.withColumn("n_prior", F.coalesce(F.col("__n"), F.lit(0)).cast("long")).drop("__n")
    if value_micros_col:
        out = out.withColumn("prior_value_micros", F.col("__v").cast("long")).drop("__v")
    return out
