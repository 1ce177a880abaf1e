"""Registry queries that hold no driver grading slot but must stay
value-correct: dedup_simhash_pairs lost its slot in round 6 (the near-dup
family is graded three other ways), so this test replays the driver's
compare — Spark query vs DuckDB oracle SQL on the same parquet — locally.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_simhash_pairs_matches_oracle(spark, duck):
    from recon_spark.oracles import llm_sql
    from recon_spark.registry import q_simhash_pairs

    got = sorted(map(tuple, q_simhash_pairs(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(llm_sql.SIMHASH_PAIRS_SQL).fetchall()))
    assert got == want
    assert len(got) > 0  # planted near-dups must surface


def test_topk_bruteforce_matches_oracle(spark, duck):
    """Score column compared at micro precision: the DuckDB fold mirrors
    Spark's left-to-right accumulation order, but the driver-grade-exact
    check lives in similarity_recall; this guard only needs to catch
    real ranking/score drift."""
    from recon_spark.oracles import llm_sql
    from recon_spark.registry import q_topk_brute

    got = sorted(
        (r.query_id, r.neighbor_id, r["rank"], round(r.score * 1e6))
        for r in q_topk_brute(spark, SF).collect()
    )
    want = sorted(
        (q, n, rk, round(s * 1e6))
        for q, n, rk, s in duck.execute(llm_sql.TOPK_BRUTE_SQL).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_graded_queries_pin_union_partitioning_off(spark):
    """The grading driver supplies its OWN session (with Spark 4.1
    defaults), so every registered query must pin the wrong-results conf
    off itself — see tools/union_partitioning_repro.py."""
    from recon_spark.registry import QUERIES

    spark.conf.set("spark.sql.unionOutputPartitioning", "true")
    try:
        df = QUERIES["clean_roth_basis"](spark, SF)
        assert spark.conf.get("spark.sql.unionOutputPartitioning") == "false"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.unionOutputPartitioning", "false")


def test_long_session_staged_persist_growth_bounded(spark):
    """Cache contract (registry._STAGED_PERSISTS): builders that persist
    a staging frame (text_stats token pass, the shared shingle index,
    the SimHash signature frame) hand it to the ledger, and the next
    query build releases it — so N queries back-to-back hold at most one
    query's staged frames, not N caches."""
    from recon_spark import registry

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    # baseline can be non-zero in a long shared session: localCheckpoint
    # RDDs from earlier tests survive clearCache (they live outside the
    # SQL cache) until the ContextCleaner GCs them — measure GROWTH over
    # the baseline, not absolute counts
    base = jsc.getPersistentRDDs().size()
    persisting = ["text_stats", "dedup_ngram_jaccard", "dedup_exact_documents"]
    high_water = 0
    for _ in range(2):  # two laps = a long session in miniature
        for name in persisting:
            assert registry.QUERIES[name](spark, SF).count() > 0
            high_water = max(high_water, jsc.getPersistentRDDs().size())
    # at most the CURRENT query's staged frames are ever live; a leak
    # would accumulate 2 laps x 3 queries of token/shingle caches.
    # Bound = 4 since round 10: dedup_exact's Bloom-gate replay holds
    # its replay corpus + one micro-batch's fps + verdicts persists
    # concurrently mid-drain (all released before the builder returns —
    # the no-growth assertion below is the leak check proper).
    assert high_water - base <= 4
    # two-tier contract: the ledger releases registry-staged frames;
    # operator-internal persists (dedup.py module docstring) are
    # caller-owned and fall to clearCache, as bench/check_correctness do
    assert registry.release_staged_frames() >= 1
    spark.catalog.clearCache()
    assert jsc.getPersistentRDDs().size() <= base
