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


def test_merge_upsert_randomized_vs_reference(spark):
    """300 random keys with nulls, deletes, inserts: merge_upsert equals
    a plain-Python dict-based MERGE reference exactly."""
    import random

    rng = random.Random(20250214)
    base_rows = [
        (f"K{i}", rng.choice(["7", "G", None]), round(rng.uniform(1, 999), 2), rng.choice(["A", "B"]))
        for i in range(300)
    ]
    upd_rows = []
    for i in range(150, 450):  # half overlap, half inserts
        if rng.random() < 0.3:
            upd_rows.append((f"K{i}", None, None, True))  # delete
        else:
            upd_rows.append(
                (f"K{i}", rng.choice(["4", None]), round(rng.uniform(1, 999), 2), False)
            )
    base = spark.createDataFrame(
        base_rows, "k string, code string, amt double, status string"
    )
    upd = spark.createDataFrame(
        upd_rows, "k string, code string, amt double, is_void boolean"
    )
    got = sorted(
        tuple(r)
        for r in merge.merge_upsert(base, upd, ["k"], delete_col="is_void").collect()
    )

    b = {r[0]: r for r in base_rows}
    u = {r[0]: r for r in upd_rows}
    expect = []
    for k in set(b) | set(u):
        if k in u and u[k][3]:          # delete wins (matched or not)
            continue
        if k in u and k in b:           # update: overwrite code/amt, keep status
            expect.append((k, u[k][1], u[k][2], b[k][3]))
        elif k in u:                    # insert: status unknown
            expect.append((k, u[k][1], u[k][2], None))
        else:
            expect.append(b[k])
    assert got == sorted(expect)


def test_scd2_apply_randomized_vs_reference(spark):
    """200 random keys x random version chains x 0-3 updates (including
    back-dated and same-day ones): scd2_apply equals a plain-Python
    reference that replays the interval algebra."""
    import datetime as dt
    import random

    rng = random.Random(20250214)
    d0 = dt.date(2026, 1, 1)
    hist_rows, upd_rows = [], []
    for i in range(200):
        k = f"K{i}"
        n_vers = rng.randint(1, 3)
        starts = sorted(rng.sample(range(0, 200), n_vers))
        for j, s in enumerate(starts):
            vf = d0 + dt.timedelta(days=s)
            vt = (
                d0 + dt.timedelta(days=starts[j + 1]) if j + 1 < n_vers else None
            )
            hist_rows.append((k, f"c{j}", float(100 + j), vf, vt, vt is None))
        for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
            upd_rows.append(
                (
                    k,
                    rng.choice(["x", "y"]),
                    round(rng.uniform(1, 9), 2),
                    d0 + dt.timedelta(days=rng.randint(0, 400)),
                )
            )
    hist = spark.createDataFrame(
        hist_rows,
        "k string, code string, amt double, valid_from date, valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        upd_rows, "k string, code string, amt double, eff date"
    )
    got = sorted(
        tuple(r) for r in merge.scd2_apply(hist, upd, ["k"], "eff").collect()
    )

    from collections import defaultdict

    by_key_hist = defaultdict(list)
    for r in hist_rows:
        by_key_hist[r[0]].append(r)
    by_key_upd = defaultdict(list)
    for r in upd_rows:
        by_key_upd[r[0]].append(r)
    expect = []
    for k, rows in by_key_hist.items():
        ups = by_key_upd.get(k)
        if not ups:
            expect.extend(rows)  # untouched: byte-identical passthrough
            continue
        closed = [r for r in rows if r[4] is not None]
        expect.extend((r[0], r[1], r[2], r[3], r[4], False) for r in closed)
        # recompute the open+new segment: union sorted by (valid_from,
        # src) where existing open row sorts before same-day updates
        seg = [(r[3], 0, r[1], r[2]) for r in rows if r[4] is None]
        seg += [(u[3], 1, u[1], u[2]) for u in ups]
        seg.sort(key=lambda t: (t[0], t[1]))
        for j, (vf, _, code, amt) in enumerate(seg):
            vt = seg[j + 1][0] if j + 1 < len(seg) else None
            expect.append((k, code, amt, vf, vt, vt is None))
    assert got == sorted(expect)


def test_scd2_closes_under_union_partitioning(spark):
    """Regression guard for the Spark 4.1 partitioning-aware-union wrong
    results (spark.sql.unionOutputPartitioning, default true in 4.1.2):
    when scd2_apply's open and new frames both arrived hash-partitioned
    on the merge key, the planner put the close-out window directly over
    the Union with only a local sort and lead() returned NULL for every
    open row — no version ever closed. scd2_apply now pins the conf off
    on the session it runs under; this test feeds it window-deduped
    (pre-partitioned) inputs, asserts intervals actually close, and
    asserts the conf ends up pinned."""
    from pyspark.sql import Window

    n = 200
    raw_hist = spark.range(0, n * 2).select(
        (F.col("id") % n).cast("string").alias("k"),
        F.lit("OLD").alias("code"),
        F.col("id").cast("double").alias("amt"),
        F.lit("2026-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.col("id").alias("seq"),
    )
    w = Window.partitionBy("k").orderBy("seq")
    hist = (
        raw_hist.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn", "seq")
    )
    raw_upd = spark.range(0, n * 2).select(
        (F.col("id") % n).cast("string").alias("k"),
        F.lit("NEW").alias("code"),
        (F.col("id") + 0.5).cast("double").alias("amt"),
        F.lit("2026-03-01").cast("date").alias("eff"),
        F.col("id").alias("seq"),
    )
    upd = (
        raw_upd.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn", "seq")
    )
    out = merge.scd2_apply(hist, upd, ["k"], "eff").collect()
    closed = [r for r in out if r["valid_to"] is not None]
    opened = [r for r in out if r["valid_to"] is None]
    assert len(closed) == n  # every OLD version must close at the update
    assert len(opened) == n and all(r["code"] == "NEW" for r in opened)
    assert spark.conf.get("spark.sql.unionOutputPartitioning") == "false"


def test_merge_upsert_validate_unique_raises_on_dup_keys(spark):
    """ADVICE round-5: duplicate update keys silently fan out the ledger
    (the condition MERGE INTO rejects). validate_unique=True enforces the
    contract at execution time."""
    import pytest as _pytest

    dup_updates = spark.createDataFrame(
        [("TXN2", "G", 210.0), ("TXN2", "4", 220.0)],
        "transaction_id string, tax_code string, taxable_amt double",
    )
    # contract enforced: job fails with the clear message
    out = merge.merge_upsert(
        _base(spark), dup_updates, ["transaction_id"], validate_unique=True
    )
    with _pytest.raises(Exception, match="multiple update rows"):
        out.collect()
    # unique updates still pass under validation
    ok = merge.merge_upsert(
        _base(spark),
        spark.createDataFrame(
            [("TXN2", "G", 210.0)],
            "transaction_id string, tax_code string, taxable_amt double",
        ),
        ["transaction_id"],
        validate_unique=True,
    )
    assert len(ok.collect()) == 3
