"""Z-order clustering (operators/zorder.py): interleave correctness,
and the property that actually matters — per-file min/max spans shrink
on EVERY z-dimension, so filters on any of them skip files, where a
single-axis range layout only helps its own axis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import zorder as Z


def test_zvalue_interleaves_bits(spark):
    # 2 dims, 2 bits: z = y1 x1 y0 x0 (LSB first: bit i*2+d)
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x int, y int")
    # quantize=minmax over x,y in [0,3] with bits=2 maps values to themselves
    out = df.withColumn("z", Z.zorder_value(df, ["x", "y"], bits=2)).collect()
    got = {(r.x, r.y): r.z for r in out}
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101  # x bits at positions 0 and 2
    assert got[(0, 3)] == 0b1010  # y bits at positions 1 and 3
    assert got[(3, 3)] == 0b1111
    assert got[(1, 2)] == 0b1001  # x0=1 -> bit0; y1=1 -> bit3


def test_zvalue_rejects_long_overflow(spark):
    df = spark.createDataFrame([(1, 1)], "x int, y int")
    with pytest.raises(ValueError, match="signed long"):
        Z.zorder_value(df, ["x", "y"], bits=32)


def _spans(spark, path, dim):
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    rows = Z.file_span_stats(df, dim).collect()
    return [r.span for r in rows]


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """10k rows over two INDEPENDENT uniform dims, 16 files. A z-order
    on (x, y) should give per-file spans ~ global/sqrt(16) on BOTH dims;
    a single-axis range layout keeps y spans ~ the full global range."""
    n = 10_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1000).alias("x"),
        (F.hash(F.col("id") + 7_777_777) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    Z.write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    # baseline: range-cluster on x only (what compact(sort_cols=['x']) does)
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.parquet(rpath)

    global_span = 2000.0  # hash % 1000 -> values in (-1000, 1000)
    z_x = sum(_spans(spark, zpath, "x")) / 16
    z_y = sum(_spans(spark, zpath, "y")) / 16
    r_x = sum(_spans(spark, rpath, "x")) / 16
    r_y = sum(_spans(spark, rpath, "y")) / 16

    # z-order: BOTH dims materially bounded (sqrt(16)=4 ideal; allow 2x)
    assert z_x < global_span / 2, z_x
    assert z_y < global_span / 2, z_y
    # single-axis: its own axis is tight, the other is useless
    assert r_x < global_span / 8, r_x
    assert r_y > global_span * 0.8, r_y

    # content parity
    assert spark.read.parquet(zpath).count() == n
    a = spark.read.parquet(zpath).selectExpr("sum(payload)").first()[0]
    b = df.selectExpr("sum(payload)").first()[0]
    assert a == b


def test_zorder_quantile_mode_handles_skew(spark, tmp_path):
    """Heavy-tailed dimension: linear min/max quantization collapses the
    bulk into few cells (outliers stretch the range, so per-file bulk
    x-spans measure ~99 of a 100-wide bulk — i.e. no skipping at all);
    equi-depth quantile cells keep bulk spans materially narrower
    (measured ~68 with only ~100 distinct bulk values to spread over —
    the distinct-value count, not the algorithm, is the binding limit
    here). The assertion is the relative improvement."""
    n = 10_000
    df = spark.range(n).select(
        # 99% of mass in [0, 100), 1% outliers up to 1e6
        F.when(F.col("id") % 100 == 0, (F.col("id") % 997) * 1000)
        .otherwise(F.abs(F.hash(F.col("id"))) % 100)
        .cast("double")
        .alias("x"),
        (F.abs(F.hash(F.col("id") + 3)) % 1000).alias("y"),
    )

    def avg_bulk_span(path):
        read = spark.read.parquet(path).withColumn("__file", F.input_file_name())
        bulk = read.filter(F.col("x") < 100)
        spans = [r.span for r in Z.file_span_stats(bulk, "x").collect()]
        return sum(spans) / len(spans)

    qpath, mpath = str(tmp_path / "q"), str(tmp_path / "m")
    Z.write_zordered(df, qpath, ["x", "y"], bits=8, n_files=16, quantize="quantile")
    Z.write_zordered(df, mpath, ["x", "y"], bits=8, n_files=16, quantize="minmax")
    q_span, m_span = avg_bulk_span(qpath), avg_bulk_span(mpath)
    assert m_span > 90  # minmax: outliers make bulk cells useless
    assert q_span < m_span * 0.8, (q_span, m_span)
    assert spark.read.parquet(qpath).count() == n


def test_zvalue_matches_duckdb_replay_incl_degenerate_dims(spark):
    """Cross-engine parity of the r11 graded fold's quantize+interleave
    (plans_sql.zorder_parity_ctes) on a synthetic orders table that also
    exercises what the fixture data doesn't: NULL values (cell 0) and a
    near-boundary grid that would expose any ulp drift in the shared
    IEEE-double floor expression."""
    import duckdb

    from recon_spark.oracles import plans_sql

    rows = [
        (i, float(i % 17) * 7.3 + (0.001 * i), i % 23)
        for i in range(200)
    ]
    rows += [(200, None, 5), (201, 42.0, None)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_custkey int"
    )
    got = sorted(
        (r.o_orderkey, r.zvalue)
        for r in df.select(
            "o_orderkey",
            Z.zorder_value(df, ["o_totalprice", "o_custkey"], bits=8),
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_totalprice DOUBLE, o_custkey INT)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", rows)
    want = sorted(
        con.sql(
            f"WITH {plans_sql.zorder_parity_ctes()}\n"
            "SELECT o_orderkey, zvalue FROM z_vals"
        ).fetchall()
    )
    con.close()
    assert got == want

    # degenerate dimension (constant) collapses to cell 0 on both sides
    cdf = spark.createDataFrame(
        [(i, 5.0, i) for i in range(20)],
        "o_orderkey long, o_totalprice double, o_custkey int",
    )
    got_c = {
        r.o_orderkey: r.zvalue
        for r in cdf.select(
            "o_orderkey",
            Z.zorder_value(cdf, ["o_totalprice", "o_custkey"], bits=8),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_totalprice DOUBLE, o_custkey INT)"
    )
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, ?)", [(i, 5.0, i) for i in range(20)]
    )
    want_c = dict(
        con.sql(
            f"WITH {plans_sql.zorder_parity_ctes()}\n"
            "SELECT o_orderkey, zvalue FROM z_vals"
        ).fetchall()
    )
    con.close()
    assert got_c == want_c
    # constant dim contributes zero bits: z-values depend on custkey only
    assert len(set(got_c.values())) > 1
