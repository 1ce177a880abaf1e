"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` mirror on DuckDB over the same sf dir, then compares
row count, column-name set, and the order-insensitive multiset of row
values (floats compared to 1e-9 relative tolerance).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def row_key(row, cols_order):
    return tuple(norm_cell(row[i]) for i in cols_order)


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH\n  spark: {s_cols}\n  duck : {d_cols}"
    s_rows = spark_df.collect()
    if len(s_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(duck_rows)}"
    s_order = [spark_df.columns.index(c) for c in s_cols]
    d_order = [duck_cols.index(c) for c in d_cols]
    s_set = sorted(row_key(r, s_order) for r in s_rows)
    d_set = sorted(row_key(r, d_order) for r in duck_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b]
        msg = f"VALUE MISMATCH ({len(diffs)} differing sorted rows of {len(s_set)})"
        for a, b in diffs[:3]:
            msg += f"\n  spark: {a}\n  duck : {b}"
        return msg
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from recon_spark.session import get_spark

    spark = get_spark("check", cpus=8)

    def fresh_con():
        con = duckdb.connect()
        # explicit limits: default memory autodetection misfires in this
        # sandbox ("bad allocation" at tiny block sizes)
        con.execute("SET threads=4; SET memory_limit='8GB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for nm, fn in qs.items():
        if only and nm not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if nm not in oracles:
                n = sdf.count()
                print(f"  {nm}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            con = fresh_con()
            rel = con.sql(oracles[nm])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
            err = compare(nm, sdf, duck_rows, duck_cols)
            con.close()
        except Exception as ex:  # noqa: BLE001
            err = f"EXCEPTION {type(ex).__name__}: {ex}"
        if err:
            failures += 1
            print(f"✗ {nm}: {err}")
        else:
            print(f"✓ {nm} ({len(duck_rows)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures / {len(qs)} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
