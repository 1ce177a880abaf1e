"""Table profiler (operators/profile.py): hand-checked stats incl. null
and tie edges, typed-vs-string min/max, and a DuckDB differential fuzz
through the same replay CTEs the graded fold uses."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from recon_spark.operators import profile as P
from recon_spark.oracles import plans_sql


def test_profile_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 9),
            (3, "b", None),
            (4, None, 10),
            (5, "a", 2),
        ],
        "id long, cat string, val int",
    )
    rows = {r.column: r for r in P.profile_table(df, ["id", "cat", "val"]).collect()}
    assert rows["id"].n_rows == 5 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 5 and rows["id"].min_value == "1"
    assert rows["cat"].n_null == 1 and rows["cat"].n_distinct == 2
    # tie between 'a' (2) and 'b' (2): smallest value wins, count reported
    assert rows["cat"].top_value == "a" and rows["cat"].top_value_n == 2
    # typed min/max: 2 < 9 < 10 numerically (a string compare would say "10" < "2" < "9")
    assert rows["val"].min_value == "2" and rows["val"].max_value == "10"
    assert rows["val"].n_null == 1 and rows["val"].top_value == "10"


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x string")
    r = {r.column: r for r in P.profile_table(df, ["x"]).collect()}["x"]
    assert r.n_rows == 2 and r.n_null == 2 and r.n_distinct == 0
    assert r.min_value is None and r.top_value is None and r.top_value_n == 0


def test_profile_duckdb_differential_fuzz(spark):
    """Random frames through the Spark profiler vs the verbatim DuckDB
    replay (the graded fold's CTEs over the same column set) — checksum
    AND row-count equality, several seeds."""
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        pdf = pd.DataFrame(
            {
                "doc_id": range(500),
                "lang": [
                    rng.choice(["en", "de", "fr", None]) for _ in range(500)
                ],
                "source": [rng.choice(["web", "book"]) for _ in range(500)],
                "n_chars": [
                    rng.randrange(0, 5000) if rng.random() > 0.1 else None
                    for _ in range(500)
                ],
            }
        )
        pdf["n_chars"] = pdf["n_chars"].astype("Int64")
        sdf = spark.createDataFrame(pdf)
        got = P.profile_parity(sdf, plans_sql.PROFILE_COLS).collect()[0]
        con = duckdb.connect()
        con.register("documents", pdf)
        exp = con.execute(
            f"WITH {plans_sql.profile_parity_ctes()} "
            "SELECT n_prof_rows, prof_ck FROM prof_parity"
        ).fetchone()
        con.close()
        assert (got.n_prof_rows, got.prof_ck) == exp, seed


# --- equi-depth histogram (r14) ----------------------------------------------


def test_histogram_hand_case(spark):
    """Values 1..8, k=4: edges are quantile_cont at 0.25/0.5/0.75
    (2.75, 4.5, 6.25), two rows per bucket, top bucket edge NULL."""
    from recon_spark.operators import profile as P

    df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "v double")
    rows = sorted(
        (r.col_name, r.bucket, r.hi_micros, r.n)
        for r in P.profile_histogram(df, ["v"], k=4).collect()
    )
    assert rows == [
        ("v", 0, 2_750_000, 2),
        ("v", 1, 4_500_000, 2),
        ("v", 2, 6_250_000, 2),
        ("v", 3, None, 2),
    ]


def test_histogram_tie_flood_and_nulls(spark):
    """A constant column collapses to one bucket-0 row; NULLs excluded."""
    from recon_spark.operators import profile as P

    df = spark.createDataFrame(
        [(7.0,)] * 10 + [(None,)] * 3, "v double"
    )
    rows = [
        (r.bucket, r.hi_micros, r.n)
        for r in P.profile_histogram(df, ["v"], k=4).collect()
    ]
    assert rows == [(0, 7_000_000, 10)]


def test_histogram_differential_fuzz(spark):
    """Random two-column frames through histogram_parity vs the verbatim
    hist_parity replay (edges, membership, counts, micros)."""
    import random

    import duckdb

    from recon_spark.operators import profile as P
    from recon_spark.oracles import plans_sql

    rnd = random.Random(0x415)
    for trial in range(3):
        rows = [
            (
                rnd.choice([None, rnd.uniform(-50, 50), float(rnd.randrange(5))]),
                rnd.choice([None, rnd.randrange(1000)]),
            )
            for _ in range(300)
        ]
        df = spark.createDataFrame(
            rows, "o_totalprice double, o_custkey long"
        ).repartition(5)
        got = P.histogram_parity(df, plans_sql.HIST_COLS).collect()[0]
        con = duckdb.connect()
        con.execute("CREATE TABLE orders (o_totalprice DOUBLE, o_custkey BIGINT)")
        con.executemany("INSERT INTO orders VALUES (?, ?)", rows)
        want = con.sql(
            f"WITH {plans_sql.histogram_parity_ctes()} SELECT * FROM hist_parity"
        ).fetchone()
        con.close()
        assert (got.n_hist_rows, got.hist_ck) == want, f"trial {trial}"
