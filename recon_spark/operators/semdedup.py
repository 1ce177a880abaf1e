"""SemDeDup: semantic deduplication via embedding clustering.

Public-literature operator (Abbas et al. 2023, *SemDeDup: Data-efficient
learning at web-scale through semantic deduplication*, arXiv:2303.09540):
(1) cluster the corpus embeddings with a coarse quantizer (k-means in
the paper); (2) inside each cluster, compute pairwise cosine similarity;
(3) prune every item that sits within ``tau`` of another cluster member,
keeping — per the paper's ablation — the member with the LOWEST cosine
to its cluster centroid out of each semantic-duplicate group.

This completes the near-dup family (exact / MinHash-LSH / SimHash /
n-gram Jaccard / cosine-threshold pairs) with the one technique that
catches *semantic* duplicates — paraphrases and re-encodings that share
no shingles and therefore defeat every lexical method above.

Two keep-policies, both deterministic:

- :func:`semdedup_verdicts` — the DISTRIBUTED path. Within-cluster
  keep-order is (centroid cosine ASC, id ASC); an item is pruned iff
  ANY earlier-in-order cluster member is within ``tau`` (the
  "dominance" rule: one within-cluster self-join on ``rank_a <
  rank_b``, no iteration). This prunes a SUPERSET of the paper's
  sequential greedy: greedy only tests against previously *kept* items,
  so a chain a~b, b~c, a!~c keeps {a, c} under greedy but {a} under
  dominance (tests/test_semdedup.py pins the divergence on exactly that
  chain). For dedup that bias is the safe direction (more pruning of
  borderline chains), and the rule is pure column algebra that a SQL
  oracle can replay exactly.
- :func:`semdedup_greedy` — the PAPER-FAITHFUL path: per-cluster
  sequential greedy over the same keep-order via ``applyInPandas``
  (clusters are the unit of parallelism; the scan inside one cluster is
  inherently ordered). Pruned(greedy) ⊆ pruned(dominance) always —
  asserted in tests; equal whenever duplicate groups are cliques (e.g.
  the planted exact-copy corpus).

Scale shape (100 TB): centroids are config-cardinality -> broadcast
(reuses similarity._assign_cells); the corpus shuffles ONCE on cell_id.
The within-cluster stage is Σ_s c_s² pairs — exactly the cost model the
paper's clustering step exists to bound: choose k ~ n / target_cluster
so c_s stays a constant (the paper uses 50k clusters for LAION-440M,
~9k docs/cluster). A skewed quantizer (one giant cell) re-creates the
all-pairs blow-up; the mitigation is the same as the IVF notes —
retrain/raise k, or split hot cells by a sign-LSH sub-bucket before the
self-join (the composition is available as ``sign_bucket`` in
operators/similarity.py). The greedy twin additionally bounds per-task
memory by the largest single cluster (its pairwise matrix is
materialized per cluster, never globally).

Reference parity: the reference repo has no semantic dedup — this is
part of the beyond-reference LLM-pipeline surface the brief mandates
(same family as operators/dedup.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _assign_cells, dot, ivf_centroids, norm

#: default quantizer size for the graded deterministic path (matches
#: IVF_K so the oracle replays the same lowest-id quantizer)
SEMDEDUP_K = 8
#: default prune threshold — above embedding_near_dup's organic pairs'
#: typical band so the planted exact copies (cos == 1.0) always prune
SEMDEDUP_TAU = 0.92

#: verdict schema shared by both keep-policies
VERDICT_SCHEMA = (
    "vec_id long, cell_id long, rnk int, centroid_sim double, keep boolean"
)


def assign_with_rank(
    corpus: DataFrame,
    centroids: DataFrame | None = None,
    k: int = SEMDEDUP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 1+2 shared by both policies: nearest-centroid assignment
    plus the within-cluster keep-order rank.

    Returns (vec_id, cell_id, centroid_sim, rnk, __vec, __n) where
    ``rnk`` is row_number over (centroid_sim ASC NULLS LAST, vec_id ASC)
    per cell — rank 1 is the first keeper (the paper keeps LOW-centroid-
    similarity examples). One broadcast join + one shuffle on cell_id.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, id_col, vec_col, k)
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__n"),
    )
    assigned = _assign_cells(c, cents, "vec_id", 1, "__n", score_out="centroid_sim")
    w = Window.partitionBy("cell_id").orderBy(
        F.col("centroid_sim").asc_nulls_last(), F.col("vec_id").asc()
    )
    return assigned.withColumn("rnk", F.row_number().over(w))


def _pair_cosine(n_a: Column, n_b: Column, v_a: Column, v_b: Column) -> Column:
    denom = n_a * n_b
    return F.when(denom > 0, dot(v_a, v_b) / denom)


def semdedup_verdicts(
    corpus: DataFrame,
    tau: float = SEMDEDUP_TAU,
    k: int = SEMDEDUP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Distributed SemDeDup (dominance rule): per-vector verdict frame
    (vec_id, cell_id, rnk, centroid_sim, keep).

    ``keep`` is false iff some same-cell member with a smaller ``rnk``
    has cosine >= ``tau``. The within-cell self-join runs on the
    already-shuffled cell_id partitioning; norms are staged once per row
    and reused across every pair (same hoisting as ivf_topk).

    The ranked frame is consumed by three branches (both self-join sides
    and the verdict join). Heavy callers should persist
    :func:`assign_with_rank`'s output under their own cache contract and
    pass it via ``ranked`` (the registry uses its staged-persist
    ledger); the default recomputes the assignment per branch.
    """
    if ranked is None:
        ranked = assign_with_rank(corpus, centroids, k, id_col, vec_col)
    a = ranked.select(
        F.col("cell_id"),
        F.col("rnk").alias("__rnk_a"),
        F.col("__vec").alias("__vec_a"),
        F.col("__n").alias("__n_a"),
    )
    b = ranked.select(
        F.col("cell_id"),
        F.col("vec_id").alias("__id_b"),
        F.col("rnk").alias("__rnk_b"),
        F.col("__vec").alias("__vec_b"),
        F.col("__n").alias("__n_b"),
    )
    sim = _pair_cosine(
        F.col("__n_a"), F.col("__n_b"), F.col("__vec_a"), F.col("__vec_b")
    )
    dominated = (
        a.join(b, "cell_id")
        .filter(F.col("__rnk_a") < F.col("__rnk_b"))
        .filter(sim >= F.lit(tau))
        .select(F.col("__id_b").alias("vec_id"))
        .distinct()
    )
    return ranked.join(
        dominated.withColumn("__dom", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "cell_id",
        "rnk",
        "centroid_sim",
        F.coalesce(~F.col("__dom"), F.lit(True)).alias("keep"),
    )


def semdedup_greedy(
    corpus: DataFrame,
    tau: float = SEMDEDUP_TAU,
    k: int = SEMDEDUP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Paper-faithful sequential greedy, parallel across clusters:
    walk each cluster in keep-order, keep an item iff every previously
    KEPT item is below ``tau``. Same verdict schema as
    :func:`semdedup_verdicts`.

    Implementation: ``applyInPandas`` per cell_id — numpy normalizes the
    cluster's matrix once, then one ordered pass computes each row's max
    cosine against the kept prefix (vectorized per row: one matvec
    against the kept block only). Memory per task = the one cluster's
    matrix, never the corpus.
    """
    import numpy as np

    ranked = assign_with_rank(corpus, centroids, k, id_col, vec_col)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rnk").reset_index(drop=True)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        unit = mat / safe[:, None]
        unit[norms == 0] = 0.0
        keep_idx: list[int] = []
        keep = []
        for i in range(len(pdf)):
            if keep_idx and np.any(unit[keep_idx] @ unit[i] >= tau):
                keep.append(False)
            else:
                keep.append(True)
                keep_idx.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cell_id": pdf["cell_id"],
                "rnk": pdf["rnk"].astype("int32"),
                "centroid_sim": pdf["centroid_sim"],
                "keep": keep,
            }
        )

    return ranked.groupBy("cell_id").applyInPandas(prune, VERDICT_SCHEMA)


def semdedup_keep(
    corpus: DataFrame,
    tau: float = SEMDEDUP_TAU,
    k: int = SEMDEDUP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    greedy: bool = False,
) -> DataFrame:
    """The corpus filtered to kept rows — the operator most pipelines
    actually call. ``greedy=True`` selects the paper-faithful policy."""
    fn = semdedup_greedy if greedy else semdedup_verdicts
    verdicts = fn(corpus, tau, k, id_col, vec_col, centroids)
    kept = verdicts.filter(F.col("keep")).select(F.col("vec_id").alias("__keep_id"))
    return corpus.join(
        kept, F.col(id_col) == F.col("__keep_id"), "semi"
    )
