"""Backward as-of join — the time-series operator Spark's join zoo lacks
(pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj``): attach to
every left row the LATEST right row with ``right.ts <= left.ts`` in the
same key group, optionally within a tolerance.

Spark-first shape — union + forward-fill window, NOT join + rank:

    tag rows with a side marker -> union -> one window per key ordered by
    (ts, side) -> ``last(right_value, ignorenulls=True)`` forward-fills
    the most recent right row onto every subsequent left row.

This is the distributed merge-scan: ONE shuffle on the key, a sort within
partitions, zero fan-out. The join+filter+row_number composition would
materialize |left| x |right-per-key-window| intermediate rows first —
unbounded on hot keys — and is exactly what this operator exists to
avoid. At equal timestamps the right row sorts BEFORE the left row
(side 0 < 1), so an equal-ts right row matches — the same rule as
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``, which the oracle uses
verbatim.

100 TB notes: state per window scan is a single carried row (the last
right values); skewed keys are a sort-skew, not a join-explosion, and
AQE's partition splitting applies. Tolerance is applied AFTER the fill
as a null-out, so it cannot change which row matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] = (),
    tolerance_us: int | None = None,
    out_prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row gains ``matched_<ts_col>`` and
    ``matched_<c>`` for each ``c`` in ``value_cols`` from the latest
    right row at-or-before its timestamp (same ``on`` key), or nulls if
    none exists (or none within ``tolerance_us``)."""
    fill_src = {ts_col: f"__r_{ts_col}"}
    fill_src.update({c: f"__r_{c}" for c in value_cols})

    r = right.select(
        *on,
        F.col(ts_col).alias(f"__r_{ts_col}"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn(ts_col, F.col(f"__r_{ts_col}")).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    tagged = l.unionByName(r, allowMissingColumns=True)

    # Tie-break: multiple right rows sharing (key, ts) are ordered by
    # their value columns ascending (nulls first), so the forward-fill's
    # "last" row — the match — is the greatest non-null value tuple,
    # deterministically, instead of partition-order luck. Callers needing
    # a specific tie rule (e.g. oracle parity with an engine whose ASOF
    # tie choice is unspecified) should still pre-dedup the right side
    # per (key, ts) — column-wise last() can mix rows if the winning
    # right row has NULLs in some value columns.
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("__side").asc(),
            *[F.col(f"__r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumns(
        {
            f"{out_prefix}{c}": F.last(F.col(src), ignorenulls=True).over(w)
            for c, src in fill_src.items()
        }
    )
    out = filled.filter(F.col("__side") == 1).drop(
        "__side", *[src for src in fill_src.values()]
    )
    if tolerance_us is not None:
        matched_ts = F.col(f"{out_prefix}{ts_col}")
        within = matched_ts.isNotNull() & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(matched_ts)
            <= F.lit(tolerance_us)
        )
        out = out.withColumns(
            {f"{out_prefix}{c}": F.when(within, F.col(f"{out_prefix}{c}")) for c in fill_src}
        )
    return out
