"""JSONL ingestion (sources/jsonl.py, r14): schema-enforced permissive
scan, corrupt-line quarantine + audit, drift tolerance (missing/extra
fields), round-trip, and the corrupt-column-only-reference gotcha the
helpers encapsulate."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from recon_spark.sources import jsonl as J

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _write_fixture(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        # drift: missing field -> NULL
        json.dumps({"doc_id": 2, "text": "sin idioma"}),
        # drift: extra field -> ignored
        json.dumps({"doc_id": 3, "text": "mit extra", "lang": "de", "x": 9}),
        # malformed line -> quarantine
        '{"doc_id": 4, "text": "broken',
        "not json at all",
    ]
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_split_audit(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = J.read_jsonl(spark, path, SCHEMA)
    clean, bad = J.split_jsonl(df)
    rows = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert rows == {
        1: ("hello world", "en"),
        2: ("sin idioma", None),
        3: ("mit extra", "de"),
    }
    assert set(clean.columns) == {"doc_id", "text", "lang"}
    quarantined = sorted(r.raw_line for r in bad.collect())
    assert quarantined == ["not json at all", '{"doc_id": 4, "text": "broken']
    audit = J.jsonl_audit(df).collect()[0]
    assert (audit.n_lines, audit.n_corrupt) == (5, 2)
    assert audit.corrupt_rate_micros == 400_000


def test_clean_file_audit_zero(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text(json.dumps({"doc_id": 1, "text": "a", "lang": "en"}) + "\n")
    audit = J.jsonl_audit(J.read_jsonl(spark, str(p), SCHEMA)).collect()[0]
    assert (audit.n_lines, audit.n_corrupt, audit.corrupt_rate_micros) == (1, 0, 0)


def test_round_trip(spark, tmp_path):
    path = _write_fixture(tmp_path)
    clean, _ = J.split_jsonl(J.read_jsonl(spark, path, SCHEMA))
    out = str(tmp_path / "out_jsonl")
    J.write_jsonl(clean, out)
    back = J.read_jsonl(spark, out, SCHEMA)
    assert J.jsonl_audit(back).collect()[0].n_corrupt == 0
    got = {r.doc_id for r in back.collect()}
    assert got == {1, 2, 3}


def test_feeds_corpus_operators(spark, tmp_path):
    """The ingested frame drops straight into the documents-shaped
    operator surface (the point of the source)."""
    from recon_spark.operators import text as TX

    path = _write_fixture(tmp_path)
    clean, _ = J.split_jsonl(J.read_jsonl(spark, path, SCHEMA))
    stats = TX.token_entropy(clean.select("doc_id", "text"))
    assert stats.count() == 3
    assert stats.filter(F.col("n_tokens") > 0).count() == 3
