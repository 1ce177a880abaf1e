"""Product quantization (operators/pq.py): encode semantics, trained
codebooks, geometry validation, and a seeded differential fuzz of the
ADC top-k against the verbatim DuckDB oracle SQL (the 'pq' method row
graded inside similarity_recall)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from recon_spark.operators import pq, similarity
from recon_spark.oracles import llm_sql


def _emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")


def test_encode_one_code_per_subspace_and_seed_self_assignment(spark):
    emb = _emb(spark)
    codes = pq.pq_encode(emb).collect()
    per = {}
    for r in codes:
        assert 0 <= r.code < pq.PQ_K
        per.setdefault(r.id, set()).add(r.m)
    n = emb.count()
    assert len(per) == n
    assert all(ms == set(range(pq.PQ_M)) for ms in per.values())
    # a codebook seed vector's subvectors are distance-0 from their own
    # codeword -> every seed encodes to its own id in every subspace
    for r in codes:
        if r.id < pq.PQ_K:
            assert r.code == r.id, (r.id, r.m, r.code)


def test_dim_must_divide(spark):
    bad = spark.createDataFrame(
        [(1, [0.1] * 63)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_encode(bad)


def test_trained_codebooks_beat_or_match_deterministic(spark):
    """KMeans-per-subspace codebooks (production path) on held-out
    queries: recall@10 vs brute force must be >= the lowest-id pick's
    (same discipline as the IVF trained-vs-id test)."""
    emb = _emb(spark)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    truth = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )

    def recall(codebooks):
        got = pq.pq_topk(emb, queries, k=10, codebooks=codebooks).select(
            "query_id", "neighbor_id"
        )
        return got.join(truth, ["query_id", "neighbor_id"]).count()

    det = recall(pq.pq_codebooks(emb))
    trained = recall(pq.pq_codebooks_kmeans(emb, max_iter=5))
    assert trained >= det, (trained, det)


def _oracle(rows, sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    out = con.sql(sql).fetchall()
    con.close()
    return out


def test_pq_topk_differential_fuzz(spark):
    """Random float32-exact 64-dim corpora through pq_topk (deterministic
    codebooks, the graded composition) vs the VERBATIM PQ_ANN_SQL —
    codebook build, encoding argmin, pinned-order ADC sum and ranking
    must all agree."""
    rnd = random.Random(0x5EEDE)
    for _trial in range(3):
        rows = [
            (i, [rnd.randrange(-128, 129) / 128 for _ in range(64)])
            for i in range(50)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.score, 9))
            for r in pq.pq_topk(emb, emb.filter(F.col("vec_id") < 5)).collect()
        )
        spark.catalog.clearCache()
        want = sorted(
            (q, n, rk, round(s, 9))
            for q, n, rk, s in _oracle(rows, llm_sql.PQ_ANN_SQL)
        )
        assert got == want


def test_ivfpq_topk_differential_fuzz(spark):
    """The full IVF-PQ composition (cell routing + in-cell ADC) vs the
    VERBATIM IVFPQ_ANN_SQL over random float32-exact corpora."""
    rnd = random.Random(0x5EEDF)
    for _trial in range(2):
        rows = [
            (i, [rnd.randrange(-128, 129) / 128 for _ in range(64)])
            for i in range(50)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.score, 9), r.cell_id)
            for r in pq.ivfpq_topk(emb, emb.filter(F.col("vec_id") < 5)).collect()
        )
        spark.catalog.clearCache()
        want = sorted(
            (q, n, rk, round(s, 9), c)
            for q, n, rk, s, c in _oracle(rows, llm_sql.IVFPQ_ANN_SQL)
        )
        assert got == want


def test_ivfpq_candidates_live_in_probed_cells(spark):
    """Every returned neighbor's cell must be one the query probed —
    the structural property that gives IVF-PQ its cost model."""
    from recon_spark.operators.similarity import (
        IVF_NPROBE, _assign_cells, ivf_centroids, norm,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    out = pq.ivfpq_topk(emb, q, k=10)
    cents = ivf_centroids(emb)
    qn = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__vec"),
        norm(F.col("embedding")).alias("__qn"),
    )
    probed = {
        (r.query_id, r.cell_id)
        for r in _assign_cells(qn, cents, "query_id", IVF_NPROBE, "__qn").collect()
    }
    for r in out.collect():
        assert (r.query_id, r.cell_id) in probed


def test_ivfpq_rerank_differential_fuzz(spark):
    """The exact-re-rank tail (ivfpq_topk_rerank — Jégou §V IVFADC+R) vs
    the VERBATIM IVFPQ_RERANK_SQL over random float32-exact corpora: the
    ADC top-C shortlist, the true-cosine re-score, and the final rank
    must all agree."""
    rnd = random.Random(0x5EED10)
    for _trial in range(2):
        rows = [
            (i, [rnd.randrange(-128, 129) / 128 for _ in range(64)])
            for i in range(50)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.score, 9))
            for r in pq.ivfpq_topk_rerank(
                emb, emb.filter(F.col("vec_id") < 5)
            ).collect()
        )
        spark.catalog.clearCache()
        want = sorted(
            (q, n, rk, round(s, 9))
            for q, n, rk, s in _oracle(rows, llm_sql.IVFPQ_RERANK_SQL)
        )
        assert got == want


def test_ivfpq_rerank_improves_recall(spark):
    """The re-rank row's whole reason to exist: recall@10 must be >= the
    plain IVF-PQ row's by construction (ADC top-k is a subset of the
    ADC top-C shortlist, and true neighbors outrank non-neighbors once
    scored exactly) — and STRICTLY greater on the fixture corpus, where
    ADC approximation error demotes real neighbors out of the ADC top-10
    (measured 0.44 -> 0.78 at sf0.001)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    r_adc = recall(pq.ivfpq_topk(emb, q, k=10))
    r_rr = recall(pq.ivfpq_topk_rerank(emb, q, k=10))
    assert r_rr >= r_adc
    assert r_rr > r_adc  # the fixture corpus exercises the rescue path


def test_ivfpq_rerank_is_exact_order_of_shortlist(spark):
    """Structural contract: the re-ranked top-k is exactly the first k of
    the ADC top-C shortlist ordered by TRUE cosine (score desc, id asc) —
    i.e. the tail changes the ORDER (using exact scores), never the
    candidate pool."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in pq.ivfpq_topk(emb, q, k=pq.RERANK_C).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in similarity.brute_force_topk(emb, q, k=emb.count()).collect()
    }
    out = pq.ivfpq_topk_rerank(emb, q, k=10).collect()
    per_query: dict[int, list] = {}
    for r in out:
        assert (r.query_id, r.neighbor_id) in shortlist
        assert r.score == pytest.approx(exact[(r.query_id, r.neighbor_id)])
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rs in per_query.items():
        rs.sort(key=lambda r: r.rank)
        want = sorted(
            (p for p in shortlist if p[0] == qid),
            key=lambda p: (-exact[p], p[1]),
        )[: len(rs)]
        assert [(r.query_id, r.neighbor_id) for r in rs] == want


def test_ivfpq_rerank_rejects_shortlist_plus_pipeline_kwargs(spark):
    """ADVICE r10 contract: passing shortlist= together with ADC-pipeline
    kwargs (codebooks/codes) raises — those only parameterize how a
    shortlist is BUILT and would otherwise be silently ignored. A deeper
    shortlist than n_candidates is clamped via its rank column."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    shortlist = pq.ivfpq_topk(emb, q, k=pq.RERANK_C)
    cb = pq.pq_codebooks(emb)
    with pytest.raises(ValueError, match="codebooks"):
        pq.ivfpq_topk_rerank(emb, q, k=10, shortlist=shortlist, codebooks=cb)
    # clamp: a depth-C shortlist re-ranked at n_candidates=5 must only
    # draw candidates from each query's ADC top-5
    top5 = {
        (r.query_id, r.neighbor_id)
        for r in shortlist.filter(F.col("rank") <= 5).collect()
    }
    out = pq.ivfpq_topk_rerank(
        emb, q, k=3, n_candidates=5, shortlist=shortlist
    ).collect()
    assert out
    for r in out:
        assert (r.query_id, r.neighbor_id) in top5
