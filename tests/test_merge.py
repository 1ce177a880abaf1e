"""Correction-application merge (operators/merge.py): Type-1 upsert
semantics (update / insert / delete / patch-null) and Type-2 SCD history
(interval close-out, batch chaining, untouched-key passthrough)."""

from pyspark.sql import functions as F

from recon_spark.operators import merge


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def _base(spark):
    return spark.createDataFrame(
        [
            ("TXN1", "7", 100.0, "A"),
            ("TXN2", "7", 200.0, "B"),
            ("TXN3", "B", 300.0, "G"),
        ],
        "transaction_id string, tax_code string, taxable_amt double, status string",
    )


def test_merge_upsert_update_insert_delete(spark):
    updates = spark.createDataFrame(
        [
            ("TXN2", "G", 210.0, False),   # matched -> update
            ("TXN9", "7", 50.0, False),    # unmatched -> insert
            ("TXN3", None, None, True),    # matched -> delete
        ],
        "transaction_id string, tax_code string, taxable_amt double, is_void boolean",
    )
    out = merge.merge_upsert(
        _base(spark), updates, ["transaction_id"], delete_col="is_void"
    )
    assert _rows(out, "transaction_id") == [
        ("TXN1", "7", 100.0, "A"),          # untouched
        ("TXN2", "G", 210.0, "B"),          # updated; status not in updates -> kept
        ("TXN9", "7", 50.0, None),          # inserted; status unknown -> NULL
    ]


def test_merge_upsert_null_patch_semantics(spark):
    updates = spark.createDataFrame(
        [("TXN1", None, 150.0)],
        "transaction_id string, tax_code string, taxable_amt double",
    )
    overwrite = merge.merge_upsert(_base(spark), updates, ["transaction_id"])
    patch = merge.merge_upsert(
        _base(spark), updates, ["transaction_id"], keep_base_when_update_null=True
    )
    assert _rows(overwrite, "transaction_id")[0] == ("TXN1", None, 150.0, "A")
    assert _rows(patch, "transaction_id")[0] == ("TXN1", "7", 150.0, "A")


def test_merge_upsert_restricted_update_cols(spark):
    updates = spark.createDataFrame(
        [("TXN2", "4", 999.0)],
        "transaction_id string, tax_code string, taxable_amt double",
    )
    out = merge.merge_upsert(
        _base(spark), updates, ["transaction_id"], update_cols=["tax_code"]
    )
    # taxable_amt excluded from the update set -> base value survives
    assert _rows(out, "transaction_id")[1] == ("TXN2", "4", 200.0, "B")


def _history(spark):
    return spark.createDataFrame(
        [
            # TXN1: one closed + one open version
            ("TXN1", "7", 100.0, "2026-01-01", "2026-02-01", False),
            ("TXN1", "G", 100.0, "2026-02-01", None, True),
            # TXN2: single open version, never updated in the batch
            ("TXN2", "B", 200.0, "2026-01-15", None, True),
        ],
        "transaction_id string, tax_code string, taxable_amt double, "
        "valid_from string, valid_to string, is_current boolean",
    ).select(
        "transaction_id", "tax_code", "taxable_amt",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "is_current",
    )


def test_scd2_apply_closes_open_and_chains_batch(spark):
    updates = spark.createDataFrame(
        [
            ("TXN1", "4", 110.0, "2026-03-01"),
            ("TXN1", "4", 120.0, "2026-04-01"),  # second correction, same batch
        ],
        "transaction_id string, tax_code string, taxable_amt double, effective string",
    ).withColumn("effective", F.col("effective").cast("date"))

    out = merge.scd2_apply(
        _history(spark), updates, ["transaction_id"], "effective"
    )
    got = _rows(out, "transaction_id", "valid_from")
    import datetime as dt

    d = dt.date.fromisoformat
    assert got == [
        ("TXN1", "7", 100.0, d("2026-01-01"), d("2026-02-01"), False),
        ("TXN1", "G", 100.0, d("2026-02-01"), d("2026-03-01"), False),  # closed
        ("TXN1", "4", 110.0, d("2026-03-01"), d("2026-04-01"), False),  # chained
        ("TXN1", "4", 120.0, d("2026-04-01"), None, True),              # new open
        ("TXN2", "B", 200.0, d("2026-01-15"), None, True),              # untouched
    ]


def test_scd2_apply_equal_ts_update_wins(spark):
    updates = spark.createDataFrame(
        [("TXN2", "7", 250.0, "2026-01-15")],
        "transaction_id string, tax_code string, taxable_amt double, effective string",
    ).withColumn("effective", F.col("effective").cast("date"))
    out = merge.scd2_apply(
        _history(spark), updates, ["transaction_id"], "effective"
    ).filter(F.col("transaction_id") == "TXN2")
    got = _rows(out, "valid_from", "is_current")
    # displaced same-day version becomes a zero-length interval; the
    # update row is the open one — deterministic, not partition luck
    assert [(r[1], r[2], r[5]) for r in got] == [
        ("B", 200.0, False),
        ("7", 250.0, True),
    ]


def test_merge_upsert_oracle_parity(spark, tmp_path):
    """Differential check: merge_upsert == DuckDB's MERGE-shaped SQL
    (anti-join + updated-or-inserted union) over the same frames."""
    import duckdb

    base, upd = _base(spark), spark.createDataFrame(
        [("TXN2", "G", 210.0), ("TXN9", "7", 50.0)],
        "transaction_id string, tax_code string, taxable_amt double",
    )
    base.write.parquet(str(tmp_path / "base.pq"))
    upd.write.parquet(str(tmp_path / "upd.pq"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS FROM '{tmp_path}/base.pq/*.parquet';"
        f"CREATE VIEW upd AS FROM '{tmp_path}/upd.pq/*.parquet'"
    )
    expect = con.execute(
        """
        SELECT b.transaction_id, COALESCE(u.tax_code, b.tax_code) tax_code,
               COALESCE(u.taxable_amt, b.taxable_amt) taxable_amt, b.status
        FROM base b LEFT JOIN upd u USING (transaction_id)
        UNION ALL
        SELECT u.transaction_id, u.tax_code, u.taxable_amt, NULL
        FROM upd u ANTI JOIN base b USING (transaction_id)
        ORDER BY transaction_id
        """
    ).fetchall()
    got = _rows(
        merge.merge_upsert(base, upd, ["transaction_id"]), "transaction_id"
    )
    assert got == [tuple(r) for r in expect]
