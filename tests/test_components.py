"""Connected components / cluster resolution (operators/components.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import components


def _cc(spark, edges):
    df = spark.createDataFrame(edges or [(None, None)], "id_a long, id_b long")
    if not edges:
        df = df.filter(F.lit(False))
    lab = components.connected_components(df)
    return {r["id"]: r["comp"] for r in lab.collect()}


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labeling
    out = {}
    for x in parent:
        r = find(x)
        out[x] = r
    # find() with min-merge keeps the min id as root
    return out


def test_chain_collapses_to_min(spark):
    # a 12-node chain: propagation alone needs 11 rounds; pointer jumping
    # must converge well inside max_iter
    edges = [(i, i + 1) for i in range(1, 12)]
    lab = _cc(spark, edges)
    assert lab == {i: 1 for i in range(1, 13)}


def test_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (20, 21), (22, 20), (23, 20)]
    lab = _cc(spark, edges)
    assert lab == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_empty_edges(spark):
    assert _cc(spark, []) == {}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (a, b)
        for _ in range(150)
        for a, b in [sorted(rng.sample(nodes, 2))]
    ]
    expected = _union_find(edges)
    assert _cc(spark, edges) == expected


def test_resolve_clusters_shape(spark):
    edges = [(1, 2), (2, 3), (8, 9)]
    out = components.resolve_clusters(
        spark.createDataFrame(edges, "id_a long, id_b long")
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 8, 9}
    assert rows[3]["cluster_id"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[1]["keep"] and not rows[2]["keep"]
    assert rows[8]["keep"] and rows[9]["cluster_size"] == 2


def test_no_cartesian_or_single_partition_sort(spark):
    """Plan hygiene: the label iteration is joins + partial aggs — no
    cartesian product, no global single-partition sort."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    plan = components.resolve_clusters(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_adaptive_paths_agree(spark):
    """The driver-side union-find fast path and the distributed
    label-propagation loop must label identically; force each via the
    threshold."""
    import random

    from recon_spark.operators.components import connected_components

    rng = random.Random(11)
    # random graph: chains, a star, singles-in-pairs, two large blobs
    edges = [(i, i + 1) for i in range(0, 40, 2)]
    edges += [(100, 100 + i) for i in range(1, 9)]
    edges += [(rng.randint(200, 230), rng.randint(200, 230)) for _ in range(40)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    fast = sorted(
        map(tuple, connected_components(pairs, small_edge_threshold=10**9).collect())
    )
    dist = sorted(
        map(tuple, connected_components(pairs, small_edge_threshold=0).collect())
    )
    assert fast == dist and len(fast) > 0


def test_resolve_clusters_paths_agree_and_distributed_plan(spark):
    """resolve_clusters' two adaptive paths (driver-side union-find +
    local relation vs distributed loop + sizes join) must emit identical
    verdict tables; the distributed branch's plan stays join/agg-shaped
    (the r12 review found the branch untested — force it here)."""
    import random

    rng = random.Random(23)
    edges = [(i, i + 1) for i in range(0, 30, 2)]
    edges += [(500, 500 + i) for i in range(1, 7)]
    edges += [(rng.randint(600, 620), rng.randint(600, 620)) for _ in range(30)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    fast = sorted(
        map(tuple, components.resolve_clusters(
            pairs, small_edge_threshold=10**9).collect())
    )
    dist_df = components.resolve_clusters(pairs, small_edge_threshold=0)
    dist = sorted(map(tuple, dist_df.collect()))
    assert fast == dist and len(fast) > 0
    plan = dist_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
