"""DuckDB oracle replay of the streaming near-dup ingestion gate
(VERDICT r7 task #6): the gate's per-micro-batch verdict table is
deterministic given the batch sequence, so an INDEPENDENT engine can
replay the whole signature-store state machine — fingerprint store,
MinHash signatures, LSH band candidate generation, signature-agreement
threshold, the four-rule priority resolution, and the batch-over-batch
store evolution — and must land on cell-identical verdicts.

The SQL is built from the same :mod:`recon_spark.oracles.llm_sql`
generator helpers the graded queries use (md5 fingerprints, salted-md5
minhash, band-slice hashes), so the two renderings share constants and
cannot drift silently. No grading slot is consumed; this gives the most
deployment-shaped streaming component the same oracle discipline as the
graded surface.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from recon_spark.oracles import llm_sql as Q
from recon_spark.operators import dedup as D
from recon_spark.streaming.dedup_ingest import run_dedup_ingest

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
THRESHOLD = 0.5  # signature-agreement fraction (6 of 12 hashes)


def _band_selects(src: str) -> str:
    return "\n  UNION ALL\n".join(
        f"""  SELECT id, sig, {b} AS band_idx,
    md5(array_to_string(list_slice(sig, {b * D.BAND_ROWS + 1}, {b * D.BAND_ROWS + D.BAND_ROWS}), '|')) AS band_hash
  FROM {src} WHERE sig IS NOT NULL"""
        for b in range(D.N_BANDS)
    )


def _oracle_batch(con, batch_pdf: pd.DataFrame) -> pd.DataFrame:
    """One micro-batch through the gate, replayed in DuckDB SQL against
    the accumulated ``store`` table. Returns the verdict frame and
    appends this batch's accepted signatures to the store."""
    con.register("batch_raw", batch_pdf)
    thr_num = int(THRESHOLD * D.N_MINHASH)
    con.sql(
        f"""
CREATE OR REPLACE TEMP TABLE batch_sigs AS
SELECT doc_id AS id, {Q.fingerprint('text')} AS fp,
       {Q.minhash_signature_from(Q.shingles('text'))} AS sig
FROM batch_raw"""
    )
    verdicts = con.sql(
        f"""
WITH nb AS MATERIALIZED (
{_band_selects('batch_sigs')}
),
pb AS MATERIALIZED (
{_band_selects('store')}
),
agreement_pairs_prior AS (
  SELECT DISTINCT n.id, p.id AS dup_of
  FROM nb n JOIN pb p USING (band_idx, band_hash)
  WHERE len(list_filter(range(1, {D.N_MINHASH} + 1), i -> n.sig[i] = p.sig[i]))
        >= {thr_num}
),
agreement_pairs_batch AS (
  SELECT DISTINCT a.id AS id_a, c.id AS id_c
  FROM nb a JOIN nb c USING (band_idx, band_hash)
  WHERE a.id < c.id
    AND len(list_filter(range(1, {D.N_MINHASH} + 1), i -> a.sig[i] = c.sig[i]))
        >= {thr_num}
),
hits AS (
  SELECT s.id, 0 AS prio, 'exact_dup' AS status, min(p.id) AS dup_of
  FROM batch_sigs s JOIN store p USING (fp) GROUP BY s.id
  UNION ALL
  SELECT id, 1, 'near_dup', min(dup_of) FROM agreement_pairs_prior GROUP BY id
  UNION ALL
  SELECT s.id, 2, 'exact_dup', f.dup_of
  FROM batch_sigs s
  JOIN (SELECT fp, min(id) AS dup_of FROM batch_sigs GROUP BY fp) f USING (fp)
  WHERE s.id > f.dup_of
  UNION ALL
  SELECT id_c, 3, 'near_dup', min(id_a) FROM agreement_pairs_batch GROUP BY id_c
),
best AS (
  SELECT id, status, dup_of FROM (
    SELECT id, status, dup_of,
           row_number() OVER (PARTITION BY id ORDER BY prio, dup_of) AS rn
    FROM hits
  ) WHERE rn = 1
)
SELECT s.id, COALESCE(b.status, 'unique') AS status, b.dup_of
FROM batch_sigs s LEFT JOIN best b USING (id)
ORDER BY s.id"""
    ).df()
    accepted = verdicts[verdicts.status == "unique"].id
    id_list = ",".join(str(int(i)) for i in accepted) or "NULL"
    con.sql(f"INSERT INTO store SELECT * FROM batch_sigs WHERE id IN ({id_list})")
    con.unregister("batch_raw")
    return verdicts


def test_gate_matches_duckdb_replay(spark, tmp_path):
    """Three fixture micro-batches drawn from the sf0.001 documents table
    plus planted exact/near copies (in-batch AND cross-batch) run through
    the real foreachBatch gate; DuckDB replays every batch's signature
    math and store evolution independently, and all three verdict
    partitions must match cell-for-cell."""
    docs = (
        spark.read.parquet(SF_DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 60")
        .collect()
    )
    base = {r.doc_id: r.text for r in docs}
    batches = [
        # batch 0: 20 organic + one in-batch exact + one in-batch near
        [(i, base[i]) for i in range(20)]
        + [(1000, base[3]), (1001, base[5] + " tail tokens appended here")],
        # batch 1: 20 fresh + cross-batch exact of doc 3 + cross-batch
        # near of doc 7 + in-batch exact pair
        [(i, base[i]) for i in range(20, 40)]
        + [
            (1100, base[3]),
            (1101, base[7] + " slightly extended ending"),
            (1102, base[21]),
        ],
        # batch 2: fresh + a near copy of a batch-1 ACCEPTED doc + an
        # exact copy of a batch-0 DROPPED doc's content (1201 == doc 3's
        # text: dup_of must resolve to the STORE's id 3, not 1000)
        [(i, base[i]) for i in range(40, 60)]
        + [(1200, base[25] + " more trailing text"), (1201, base[3])],
    ]

    src, store, verdicts, ckpt = (
        str(tmp_path / d) for d in ("src", "store", "verdicts", "ckpt")
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE store (id BIGINT, fp VARCHAR, sig VARCHAR[])")
    oracle_verdicts: dict[int, tuple] = {}
    for bid, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite" if bid == 0 else "append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        run_dedup_ingest(stream, store, verdicts, ckpt, threshold=THRESHOLD)

        batch_pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        for r in _oracle_batch(con, batch_pdf).itertuples():
            oracle_verdicts[int(r.id)] = (
                r.status,
                None if pd.isna(r.dup_of) else int(r.dup_of),
                bid,
            )

    got = {
        r.id: (r.status, r.dup_of, r["__batch_id"])
        for r in spark.read.parquet(verdicts).collect()
    }
    assert got == oracle_verdicts
    # every planted relationship must actually have fired (the compare
    # above would pass vacuously if e.g. the near copies scored unique on
    # BOTH engines)
    assert got[1000] == ("exact_dup", 3, 0)
    assert got[1001][0] == "near_dup"
    assert got[1100] == ("exact_dup", 3, 1)
    assert got[1101][0] == "near_dup"
    assert got[1201] == ("exact_dup", 3, 2)
    # the store itself must agree too: same accepted ids + fingerprints
    spark_store = {(r.id, r.fp) for r in spark.read.parquet(store).collect()}
    oracle_store = {
        (int(r.id), r.fp) for r in con.sql("SELECT id, fp FROM store").df().itertuples()
    }
    assert spark_store == oracle_store


def test_gate_replay_fold_is_not_vacuous(spark):
    """The graded fold's replay corpus must actually exercise the gate:
    all three verdict statuses occur, the cross-batch exact plant for
    doc 0 resolves to the organic id, and a wrap-around plant (organic
    doc_id % 3 == 2, so the plant lands in batch 0 BEFORE its source)
    makes the ORGANIC doc defer — both directions of the store lookup."""
    from recon_spark.streaming.dedup_ingest import (
        GATE_EXACT_MOD,
        GATE_EXACT_OFFSET,
        run_gate_replay,
    )

    docs = spark.read.parquet(SF_DOCS).select("doc_id", "text")
    got = {
        r.id: (r.status, r.dup_of, r.batch_id)
        for r in run_gate_replay(spark, docs).collect()
    }
    assert {s for s, _, _ in got.values()} == {"unique", "exact_dup", "near_dup"}
    # doc 0: organic in batch 0, exact plant in batch 1 -> plant defers
    assert got[GATE_EXACT_OFFSET] == ("exact_dup", 0, 1)
    # first wrap-around source (doc_id % 17 == 0 and % 3 == 2): its plant
    # is accepted in batch 0, so the organic doc is the duplicate
    wrap = next(
        d for d in range(0, 500, GATE_EXACT_MOD) if d % 3 == 2
    )
    assert got[wrap] == ("exact_dup", wrap + GATE_EXACT_OFFSET, 2)
    assert got[wrap + GATE_EXACT_OFFSET][0] == "unique"
