"""Regime-adaptive n-gram Jaccard dispatcher (round 12 — the r11
VERDICT's last perf_weak): ngram_regime_probe must MEASURE the corpus's
shingle-frequency profile and ngram_jaccard_auto must route each of the
three documented regimes (SCALING.md table, tools/ngram_regimes.py) to
its measured winner, with exact-route outputs identical to the
count-based reference pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from recon_spark.operators import dedup as DD


def _organic_docs(spark):
    """Small organic-regime corpus: mostly-unique texts plus a planted
    near-dup pair — low amplification, routes to the count join."""
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(40)
    ]
    rows.append((100, rows[0][1] + " extra tail words here"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _boilerplate_docs(spark, n_docs=2000, n_templates=8):
    """Zipf/boilerplate regime (tools/ngram_regimes.py shape): 20-token
    shared template + 40 doc-unique rare tokens — hot template shingles
    carry the Σc² mass, the rare tail feeds PPJoin prefixes."""
    tmpl = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.concat(
                F.lit("tmpl"), (F.col("doc_id") % n_templates).cast("string"),
                F.lit("w"), i.cast("string"),
            ),
        ),
        " ",
    )
    rare = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.concat(
                F.lit("r"), F.col("doc_id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    return (
        spark.range(0, n_docs, 1, 8)
        .select(F.col("id").alias("doc_id"))
        .withColumn("text", F.concat(tmpl, F.lit(" "), rare))
    )


def _saturated_docs(spark, n_docs=3000, vocab=10, doc_len=40):
    """Saturated/flat regime: a tiny vocabulary whose complete shingle
    space every doc draws from uniformly (md5 coin) — no rare shingles,
    amplification far above the count budget; MinHash-LSH territory."""
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        (
            F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                              F.lit("#"), j.cast("string"))), 1, 6), 16, 10)
            .cast("long") % vocab
        ).cast("string"),
    )
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(doc_len)), tok), " "
    )
    return (
        spark.range(0, n_docs, 1, 8)
        .select(F.col("id").alias("doc_id"))
        .withColumn("text", text)
    )


def _probe(spark, docs):
    sh = DD.staged_shingles(docs)
    p = DD.ngram_regime_probe(DD.shingle_index(sh))
    sh.unpersist()
    return p


def test_probe_routes_organic_to_count(spark):
    p = _probe(spark, _organic_docs(spark))
    assert p["route"] == "count"
    assert p["amplification"] <= DD.AUTO_AMPLIFICATION


def test_probe_routes_boilerplate_to_prefix(spark):
    p = _probe(spark, _boilerplate_docs(spark))
    assert p["route"] == "prefix"
    assert p["amplification"] > DD.AUTO_AMPLIFICATION
    assert p["rare_mass_frac"] >= DD.AUTO_RARE_MASS


def test_probe_routes_saturated_to_minhash(spark):
    p = _probe(spark, _saturated_docs(spark))
    assert p["route"] == "minhash"
    assert p["amplification"] > DD.AUTO_AMPLIFICATION
    assert p["rare_mass_frac"] < DD.AUTO_RARE_MASS


def test_auto_count_route_matches_reference_pairs(spark):
    docs = _organic_docs(spark)
    probe: dict = {}
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in DD.ngram_jaccard_auto(docs, probe_out=probe).collect()
    }
    assert probe["route"] == "count"
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in DD.ngram_jaccard_pairs(docs).collect()
    }
    assert got == want and len(got) >= 1
    spark.catalog.clearCache()


def test_auto_prefix_route_matches_reference_pairs(spark):
    # small boilerplate corpus that still crosses the amplification
    # budget (2k docs measures ~78; threshold 32)
    docs = _boilerplate_docs(spark, n_docs=2000)
    probe: dict = {}
    auto = DD.ngram_jaccard_auto(docs, probe_out=probe)
    assert probe["route"] == "prefix"
    # prefix is EXACT: pair set identical to the count-based join
    sh = DD.staged_shingles(docs)
    want = DD.ngram_jaccard_pairs_from_shingles(sh)
    diff = auto.select("id_a", "id_b").exceptAll(
        want.select("id_a", "id_b")
    ).union(want.select("id_a", "id_b").exceptAll(auto.select("id_a", "id_b")))
    assert diff.count() == 0
    spark.catalog.clearCache()


def test_auto_minhash_route_schema_and_exact_only_fallback(spark):
    docs = _saturated_docs(spark)
    probe: dict = {}
    auto = DD.ngram_jaccard_auto(docs, probe_out=probe)
    assert probe["route"] == "minhash"
    # normalized schema on every route; jaccard is the exact verified value
    assert auto.columns == ["id_a", "id_b", "jaccard"]
    spark.catalog.clearCache()

    # exact_only forbids the approximate route: falls back to count and
    # records that the caller knowingly pays the quadratic join
    probe2: dict = {}
    auto2 = DD.ngram_jaccard_auto(docs, exact_only=True, probe_out=probe2)
    assert probe2["route"] == "count"
    assert probe2.get("exact_only_fallback") is True
    assert auto2.columns == ["id_a", "id_b", "jaccard"]
    spark.catalog.clearCache()


def test_auto_requires_docs_or_staged(spark):
    import pytest

    with pytest.raises(ValueError):
        DD.ngram_jaccard_auto(None)


def test_probe_empty_corpus_routes_count(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    p = _probe(spark, docs)
    assert p["route"] == "count" and p["index_rows"] == 0
    out = DD.ngram_jaccard_auto(docs)
    assert out.count() == 0
    spark.catalog.clearCache()
