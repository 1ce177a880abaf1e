"""DuckDB oracle replay of the Bloom-backed streaming ingestion gate
(round-10 graded fold on dedup_exact_documents): the gate's verdict
table is deterministic given the batch sequence, so an INDEPENDENT
engine can replay the whole batch-evolving bitset — md5 probe
positions, the all-hashes-present 'seen_prior' test, in-batch
keep-first, and the accepted-only store growth — and must land on
cell-identical verdicts, INCLUDING the deliberately provoked false
positives (the small GATE_FOLD_BITS bitset over-drops a few unique
docs; the fold counts them as n_bgate_overdrop).

The SQL comes from the same :mod:`recon_spark.oracles.llm_sql`
generator the graded query embeds (llm_sql.bloom_gate_ctes), so the
two renderings share constants and cannot drift silently.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from recon_spark.oracles import llm_sql as Q
from recon_spark.streaming import bloom_gate as BG

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _oracle(docs_pdf):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    verdicts = con.sql(
        "WITH " + Q.bloom_gate_ctes()
        + " SELECT id, status, dup_of, batch_id FROM bgate_verdicts"
    ).fetchall()
    parity = con.sql(
        "WITH " + Q.bloom_gate_ctes() + " SELECT * FROM bgate_parity"
    ).fetchall()[0]
    con.close()
    return verdicts, parity


@pytest.fixture(scope="module")
def replay(spark):
    docs = spark.read.parquet(SF_DOCS).select("doc_id", "text")
    v = BG.run_bloom_gate_replay(spark, docs).persist()
    yield docs, v
    v.unpersist()


def test_verdict_table_matches_oracle_cell_for_cell(spark, replay):
    docs, v = replay
    got = sorted(
        (r.id, r.status, r.dup_of, r.batch_id) for r in v.collect()
    )
    want_v, _ = _oracle(docs.toPandas())
    assert got == sorted(want_v)


def test_all_verdict_classes_and_overdrops_exercised(spark, replay):
    """The fold is only a certificate if the corpus drives every branch:
    cross-batch dups ('seen_prior'), the in-batch plants
    (GATE_INBATCH_MOD -> 'exact_dup_in_batch'), uniques, AND measurable
    Bloom over-drops at the deliberately small GATE_FOLD_BITS."""
    docs, v = replay
    by_status = {r["status"]: r["n"] for r in
                 v.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_status.get("seen_prior", 0) > 0
    assert by_status.get("exact_dup_in_batch", 0) > 0
    assert by_status.get("unique", 0) > 0
    _, parity = _oracle(docs.toPandas())
    n_verdicts, n_overdrop, _ck = parity
    assert n_verdicts == sum(by_status.values())
    assert n_overdrop > 0  # FPs exist at this bitset size

    # no false negatives: every planted exact copy whose source was
    # accepted in an EARLIER batch must be flagged seen_prior (Bloom
    # never under-drops)
    fp_first = v.groupBy("fp").agg(
        F.min(F.struct("batch_id", "id")).alias("__f")
    )
    later_copies = (
        v.join(fp_first, "fp")
        .filter(F.col("batch_id") > F.col("__f.batch_id"))
    )
    assert later_copies.filter(F.col("status") != "seen_prior").count() == 0
