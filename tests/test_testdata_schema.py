"""Schema guard for the driver's testdata: every operator assumption about
the loaded tables, asserted loudly.

Round-3 lesson: the driver silently regenerated events.parquet with ``ts``
as timestamp[us] where it had been TIMESTAMP(NANOS); the loader's nanos
workaround then broke every events query — but only at the driver's grade,
because no local test pinned the loaded schema. This file makes the next
silent regeneration fail here first, with a readable diff.

Columns beyond the pinned prefix are allowed (the driver may add columns);
type changes and column removals are not.
"""

import os

import pytest

from recon_spark.sources import tpch

SF_DIRS = [
    d for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ) if os.path.isdir(d)
]

#: column -> loaded Spark dtype that operators rely on. ``ts`` is pinned to
#: 'timestamp' — that is load_events' POST-branch contract (either storage
#: layout must normalize to the session-zone timestamp the downstream
#: date_trunc/window/watermark plans assume).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_name": "string", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_name": "string"},
    "part": {"p_partkey": "bigint", "p_name": "string", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        # fixtures cast o_orderdate to date; any timestamp flavor casts fine
        "o_orderdate": {"timestamp_ntz", "timestamp", "date"},
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": {"timestamp_ntz", "timestamp", "date"},
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_loaded_schema_matches_operator_assumptions(spark, sf_dir, table):
    dtypes = dict(tpch.load(spark, sf_dir, table).dtypes)
    problems = []
    for col, want in EXPECTED[table].items():
        got = dtypes.get(col)
        allowed = want if isinstance(want, set) else {want}
        if got is None:
            problems.append(f"{col}: MISSING (operators expect {sorted(allowed)})")
        elif got not in allowed:
            problems.append(f"{col}: loaded as {got!r}, operators expect {sorted(allowed)}")
    assert not problems, (
        f"{sf_dir}/{table}.parquet drifted from operator assumptions:\n  "
        + "\n  ".join(problems)
        + f"\n  full loaded schema: {dtypes}"
    )
