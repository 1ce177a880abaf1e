"""Seeded differential fuzz of the scalar normalizers: the SAME random
input batch through the Spark Column builders (functions/normalizers.py)
and their DuckDB SQL mirrors (oracles/sql.py), compared value-for-value.

The graded queries already exercise both renderings over fixture data,
but fixture values are well-formed by construction; this test drives the
ugly corners (whitespace, float artifacts, scientific notation, mixed
junk) through both engines in ONE batch per engine so drift in any
mirror fails loudly here instead of as an opaque driver hash mismatch.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from recon_spark.functions import normalizers as N
from recon_spark.oracles import sql as Q

_ATOMS = [
    "123456789", "123-45-6789", " 987654321.0 ", "12345", "0", "000000000",
    "1234567890123456", "9.87654321e8", "2.5e3", "-45", "3.14", "nan",
    "2025-01-31", "01/31/2025", "2025-13-40", " 2024-02-29 ", "31-01-2025",
    "600001IRA", " 0300001 ", "plan-17", "B", "g", "7 ", " h4", "BG", "1099R",
    "partial liquidation", "RECURRING payment", "Partial Cash  out",
    "total liquidation", "", " ", "  \t ", "None", "null", "N/A", "-",
    "O'Brien", "  jane   DOE ", "Ann-Marie", "12.0", "00123.0", ".5", "5.",
    "1e-3", "inf", "-inf", "1,234.56", "$500", "abc123def", "€42", "ssn?",
]


def _cases(n=400, seed=20250814):
    rnd = random.Random(seed)
    out = list(_ATOMS) + [None]
    while len(out) < n:
        kind = rnd.randrange(4)
        if kind == 0:
            out.append("".join(rnd.choice("0123456789-. ") for _ in range(rnd.randrange(1, 14))))
        elif kind == 1:
            out.append(str(rnd.uniform(-1e12, 1e12)))
        elif kind == 2:
            # \x0b\x0c: Java \s vs RE2 \s disagree on vertical tab,
            # which is why the normalizers use the explicit WS class
            out.append("".join(rnd.choice(" aBcD19-_/.\t\x0b\x0c") for _ in range(rnd.randrange(0, 10))))
        else:
            out.append(rnd.choice(_ATOMS) + rnd.choice(["", " ", ".0", "x"]))
    return out


#: (name, Spark Column builder over column "x", DuckDB expression over x)
_PAIRS = [
    ("norm_ssn", lambda: N.norm_ssn("x"), Q.norm_ssn("x")),
    ("norm_plan_id", lambda: N.norm_plan_id("x"), Q.norm_plan_id("x")),
    ("to_date_safe", lambda: N.to_date_safe("x"), Q.to_date_safe("x")),
    ("to_double_safe", lambda: N.to_double_safe("x"), Q.to_double_safe("x")),
    ("to_long_safe", lambda: N.to_long_safe("x"), Q.to_long_safe("x")),
    ("norm_tax_code", lambda: N.norm_tax_code("x"), Q.norm_tax_code("x")),
    ("norm_text", lambda: N.norm_text("x"), Q.norm_text("x")),
    ("norm_text_upper", lambda: N.norm_text("x", strip=True, upper=True), Q.norm_text("x", upper=True)),
    ("classify_dist_name", lambda: N.classify_dist_name("x"), Q.classify_dist_name("x")),
    ("norm_transaction_id", lambda: N.norm_transaction_id("x"), Q.norm_transaction_id("x")),
    ("ssn_valid", lambda: N_ssn_valid(), Q.ssn_valid("x")),
]


def N_ssn_valid():
    from recon_spark.functions import validators as V

    return V.ssn_valid("x")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    return str(v)


@pytest.mark.parametrize("name,spark_col,duck_expr", _PAIRS, ids=[p[0] for p in _PAIRS])
def test_normalizer_matches_duckdb(spark, name, spark_col, duck_expr):
    cases = _cases()
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, x string")
    got = {r["i"]: _norm(r["out"]) for r in df.select("i", spark_col().alias("out")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, c) for i, c in enumerate(cases)])
    want = {i: _norm(v) for i, v in con.execute(f"SELECT i, {duck_expr} FROM t").fetchall()}

    diffs = {i: (got[i], want[i], cases[i]) for i in got if got[i] != want[i]}
    assert not diffs, f"{name}: {len(diffs)} mismatches, e.g. {list(diffs.items())[:5]}"


#: two-column builders: (name, Spark builder over (x, y), DuckDB expr)
_PAIRS_2 = [
    ("full_name", lambda: N.full_name("x", "y"), Q.full_name("x", "y")),
    (
        "combined_tax_code",
        lambda: N.combined_tax_code("x", "y"),
        Q.combined_tax_code("x", "y"),
    ),
]

_PAIRS_1_EXTRA = [
    ("norm_compact_upper", lambda: N.norm_compact_upper("x"), Q.norm_compact_upper("x")),
    ("norm_space_lower", lambda: N.norm_space_lower("x"), Q.norm_space_lower("x")),
    ("code_1099r_valid", lambda: V_code_valid(), Q.code_1099r_valid("x")),
]


def V_code_valid():
    from recon_spark.functions import validators as V

    return V.code_1099r_valid("x")


@pytest.mark.parametrize(
    "name,spark_col,duck_expr", _PAIRS_1_EXTRA, ids=[p[0] for p in _PAIRS_1_EXTRA]
)
def test_extra_normalizer_matches_duckdb(spark, name, spark_col, duck_expr):
    test_normalizer_matches_duckdb(spark, name, spark_col, duck_expr)


@pytest.mark.parametrize(
    "name,spark_col,duck_expr", _PAIRS_2, ids=[p[0] for p in _PAIRS_2]
)
def test_two_arg_normalizer_matches_duckdb(spark, name, spark_col, duck_expr):
    cases = _cases()
    rnd = random.Random(99)
    ys = list(cases)
    rnd.shuffle(ys)
    df = spark.createDataFrame(
        [(i, c, y) for i, (c, y) in enumerate(zip(cases, ys))],
        "i long, x string, y string",
    )
    got = {r["i"]: _norm(r["out"]) for r in df.select("i", spark_col().alias("out")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x VARCHAR, y VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, c, y) for i, (c, y) in enumerate(zip(cases, ys))],
    )
    want = {i: _norm(v) for i, v in con.execute(f"SELECT i, {duck_expr} FROM t").fetchall()}
    diffs = {i: (got[i], want[i], (cases[i], ys[i])) for i in got if got[i] != want[i]}
    assert not diffs, f"{name}: {len(diffs)} mismatches, e.g. {list(diffs.items())[:5]}"
