"""SemDeDup hot-cluster skew, measured through the real operator.

The within-cluster pairwise stage of ``semdedup_verdicts`` is
``Σ_s c_s²`` over cluster sizes — the same cost law as the n-gram
count join's shingle term, but keyed by the QUANTIZER's assignment
instead of corpus statistics: a bad/stale quantizer that funnels a
large fraction of the corpus into one cell re-creates the all-pairs
blow-up no matter how uniform the data is. Salting cannot fix it (a
pruning decision must see every earlier-in-order member of its
cluster), and AQE's skew logic only splits JOINS whose partitions it
can cut independently — the dominance self-join's both sides are the
same hot partition.

The mitigation is the one the SemDeDup paper itself uses: hold CLUSTER
SIZE constant by scaling k with n (LAION-440M / 50k clusters ≈ 9k per
cell); operationally, re-train or subdivide any cell whose population
crosses the target. This tool prices the failure and the fix through
the real operator on the same corpus:

1. ``hot``: a quantizer that captures ``HOT_FRACTION`` of the corpus
   in one cell (centroid placed on the hot direction), k=8 — the
   stale-quantizer shape.
2. ``scaled``: the same corpus under k = n / TARGET_CELL deterministic
   centroids — the paper's constant-cell-size answer.
3. ``uniform-k8`` control: the same corpus with the hot direction
   removed, k=8 — what the fixed-k default costs when the quantizer
   is healthy.

Run: ``python tools/skew_semdedup.py [n_vectors]`` — prints one JSON
line (docs/skew_semdedup.json mirrors it; SCALING.md embeds the
numbers). Expect minutes: the hot cell's quadratic stage IS the
measurement.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recon_spark.operators import semdedup as SD  # noqa: E402
from recon_spark.session import get_spark  # noqa: E402

N_DEFAULT = 10_000
DIM = 16              # smaller dim: the measurement targets pair VOLUME,
                      # not per-pair dot cost
HOT_FRACTION = 0.5
TARGET_CELL = 500


def _coin(token: str) -> float:
    """md5 coin in [-1, 1) — deterministic, no rand()."""
    h = int(hashlib.md5(token.encode()).hexdigest()[:8], 16)
    return (h / 0xFFFFFFFF) * 2.0 - 1.0


def build_vectors(spark, n: int, hot: bool):
    """n DIM-dim vectors; when ``hot``, HOT_FRACTION of them point near
    one direction (first axis dominant). Among the low ids the
    deterministic quantizer seeds from, ONLY id 0 is hot — one hot
    centroid captures the whole hot mass (seeding several hot ids would
    split it across near-identical centroids and hide the skew, which
    is exactly what the first draft of this tool measured)."""
    rows = []
    for i in range(n):
        base = [_coin(f"v{i}:{d}") * 0.5 for d in range(DIM)]
        if hot and (i == 0 or (i >= 64 and (i % 100) < int(HOT_FRACTION * 100))):
            base[0] = 3.0 + _coin(f"h{i}") * 0.1  # hot direction
        rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def time_op(df_fn) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # warm lap
    best = None
    for _ in range(2):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        lap = time.time() - t0
        best = lap if best is None else min(best, lap)
    return round(best, 2)


def cell_profile(assigned) -> dict:
    per = (
        assigned.groupBy("cell_id").count().orderBy(F.desc("count")).collect()
    )
    total = sum(r["count"] for r in per)
    return {
        "n_cells": len(per),
        "top_cell_share": round(per[0]["count"] / total, 3),
        "sum_c2": int(sum(r["count"] ** 2 for r in per)),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    spark = get_spark("skew-semdedup", cpus=8)
    out: dict = {"n_vectors": n, "dim": DIM, "hot_fraction": HOT_FRACTION}

    from recon_spark.operators.similarity import ivf_centroids_kmeans

    hot_corpus = build_vectors(spark, n, hot=True).persist()
    hot_corpus.count()
    uni_corpus = build_vectors(spark, n, hot=False).persist()
    uni_corpus.count()
    k_scaled = max(SD.SEMDEDUP_K, n // TARGET_CELL)

    # raising k alone CANNOT fix an id-seeded quantizer here — the extra
    # seeds are wherever the low ids happen to sit, not in the hot blob.
    # The mitigation is the trained quantizer: k-means allocates
    # centroids proportional to mass, so the blob subdivides. Measured
    # as the (stale/id-seeded, trained-k8, trained-scaled-k) triple.
    variants = (
        ("hot_idseed_k8", hot_corpus, SD.SEMDEDUP_K, None),
        (
            "hot_kmeans_k8",
            hot_corpus,
            SD.SEMDEDUP_K,
            ivf_centroids_kmeans(hot_corpus, k=SD.SEMDEDUP_K),
        ),
        (
            "hot_kmeans_scaled",
            hot_corpus,
            k_scaled,
            ivf_centroids_kmeans(hot_corpus, k=k_scaled),
        ),
        ("uniform_idseed_k8", uni_corpus, SD.SEMDEDUP_K, None),
    )
    for name, corpus, k, cents in variants:
        if cents is not None:
            cents = cents.persist()
            cents.count()
        out[name] = {
            "k": k,
            "wall_s": time_op(
                lambda c=corpus, kk=k, ct=cents: SD.semdedup_verdicts(
                    c, k=kk, centroids=ct
                )
            ),
            **cell_profile(SD.assign_with_rank(corpus, centroids=cents, k=k)),
        }
        spark.catalog.clearCache()
        hot_corpus.persist(); uni_corpus.persist()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "skew_semdedup.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
