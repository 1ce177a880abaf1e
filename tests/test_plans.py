"""Correction builder (F11/P3/F10) and analytics (A2-A7) tests.

Reference: tests/pipelines/test_new_tax_code_unified.py:284-351 (builder
suggestion masks) and tests/visualization/*."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from recon_spark.plans import analytics, corrections
from recon_spark.sources import sinks

D = datetime.date


def _analysis_frame(spark):
    """The reference's 5-row builder fixture (test_new_tax_code_unified.py:284)."""
    rows = [
        ("match_needs_correction", "UPDATE_1099", None, None, 0.0, None, "tx_taxable_update", D(2025, 1, 1), "123456780", "A", "acct1", "B", "", "r1"),
        ("match_needs_correction", "UPDATE_1099\nINVESTIGATE", None, None, None, 2020, "tx_year_update", D(2025, 1, 2), "123456781", "B", "acct2", "B", "", "r2"),
        ("match_needs_correction", "INVESTIGATE", None, None, 10.0, None, "tx_investigate", D(2025, 1, 3), "123456782", "C", "acct3", "B", "", "r3"),
        ("match_needs_review", "UPDATE_1099", None, None, 5.0, 2020, "tx_review", D(2025, 1, 4), "123456783", "D", "acct4", "B", "", "r4"),
        ("match_needs_correction", "UPDATE_1099", None, None, None, None, "tx_no_suggestion", D(2025, 1, 5), "123456784", "E", "acct5", "B", "", "r5"),
    ]
    return spark.createDataFrame(
        rows,
        "match_status string, action string, suggested_tax_code_1 string, "
        "suggested_tax_code_2 string, suggested_taxable_amt double, "
        "suggested_first_roth_tax_year long, transaction_id string, txn_date date, "
        "ssn string, participant_name string, matrix_account string, "
        "tax_code_1 string, tax_code_2 string, correction_reason string",
    )


def test_builder_exports_taxable_or_year_updates(spark):
    out = corrections.build_correction_df(_analysis_frame(spark))
    rows = {r["Transaction Id"]: r for r in out.collect()}
    assert set(rows) == {"tx_taxable_update", "tx_year_update", "tx_investigate", "tx_review"}
    assert rows["tx_taxable_update"]["New Taxable Amount"] == 0.0
    assert rows["tx_year_update"]["New First Year contrib"] == 2020
    assert rows["tx_investigate"]["New Taxable Amount"] == 10.0
    assert rows["tx_review"]["New Taxable Amount"] == 5.0
    assert rows["tx_review"]["New First Year contrib"] == 2020


def test_builder_template_columns(spark):
    out = corrections.build_correction_df(_analysis_frame(spark))
    assert out.columns == corrections.CORRECTION_COLUMNS


def test_builder_computes_new_tax_code_when_missing(spark):
    df = _analysis_frame(spark).withColumn(
        "suggested_tax_code_1", F.lit("B")
    ).withColumn("suggested_tax_code_2", F.lit("7"))
    out = corrections.build_correction_df(df)
    assert out.collect()[0]["New Tax Code"] == "B7"


def test_builder_respects_merge_and_tolerance_masks(spark):
    df = _analysis_frame(spark).withColumn("merge_side", F.lit("left_only"))
    assert corrections.build_correction_df(df).count() == 0
    df = (
        _analysis_frame(spark)
        .withColumn("merge_side", F.lit("both"))
        .withColumn("date_within_tolerance", F.lit(False))
    )
    assert corrections.build_correction_df(df).count() == 0


def test_split_by_action_duplicates_dual_rows(spark):
    out = corrections.build_correction_df(_analysis_frame(spark))
    tabs = corrections.split_corrections_by_action(out)
    upd = {r["Transaction Id"] for r in tabs["Correction"].collect()}
    inv = {r["Transaction Id"] for r in tabs["Investigate"].collect()}
    assert upd == {"tx_taxable_update", "tx_year_update", "tx_review"}
    assert inv == {"tx_year_update", "tx_investigate"}
    # Action cell rewritten to the tab's token
    assert {r["Action"] for r in tabs["Correction"].collect()} == {"UPDATE_1099"}
    assert {r["Action"] for r in tabs["Investigate"].collect()} == {"INVESTIGATE"}


def test_write_correction_file_partitions(spark, tmp_path):
    out = corrections.build_correction_df(_analysis_frame(spark))
    path = sinks.write_correction_file(out, tmp_path / "corr")
    back = spark.read.parquet(path)
    tabs = {r["Tab"] for r in back.select("Tab").distinct().collect()}
    assert tabs == {"Correction", "Investigate"}
    # dual-action row appears in both partitions
    assert (
        back.filter(F.col("`Transaction Id`") == "tx_year_update").count() == 2
    )


def test_dedupe_sheet_names():
    names = ["a" * 40, "a" * 40, "short"]
    out = sinks.dedupe_sheet_names(names)
    assert out[0] == "a" * 31
    assert out[1] == "a" * 29 + "_1"
    assert out[2] == "short"
    assert len(set(out)) == 3


# --- analytics ----------------------------------------------------------------

def _status_frame(spark):
    rows = [
        ("match_no_action", D(2025, 1, 10), 100.0, "r1", "7", "UPDATE_1099"),
        ("match_no_action", D(2025, 1, 20), 50.0, "r1", "7", None),
        ("match_needs_correction", D(2025, 2, 10), 70.0, "r2", "1", "UPDATE_1099\nINVESTIGATE"),
        ("unmatched_relius", D(2025, 2, 15), 30.0, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "match_status string, txn_date date, gross_amt double, "
        "correction_reason string, tax_code_1 string, action string",
    )


def test_kpi_summary_counts_and_pct(spark):
    out = {r["match_status"]: r for r in analytics.build_kpi_summary(_status_frame(spark)).collect()}
    assert out["match_no_action"]["n"] == 2
    assert out["match_no_action"]["pct"] == 50.0
    assert out["unmatched_relius"]["pct"] == 25.0


def test_monthly_metrics(spark):
    out = {
        r["month"]: r
        for r in analytics.build_monthly_metrics(_status_frame(spark)).collect()
    }
    jan, feb = out[D(2025, 1, 1)], out[D(2025, 2, 1)]
    assert jan["total_txns"] == 2 and jan["correction_count"] == 0
    assert feb["total_txns"] == 2 and feb["correction_count"] == 1
    assert feb["correction_rate"] == 0.5


def test_value_counts(spark):
    out = {
        r["tax_code_1"]: r["n"]
        for r in analytics.build_value_counts(_status_frame(spark), "tax_code_1").collect()
    }
    assert out == {"7": 2, "1": 1, None: 1}


def test_crosstab_fills_zero(spark):
    out = analytics.build_crosstab(
        _status_frame(spark), "tax_code_1", "correction_reason", ["r1", "r2"]
    )
    rows = {r["tax_code_1"]: r for r in out.collect()}
    assert rows["7"]["r1"] == 2 and rows["7"]["r2"] == 0
    assert rows["1"]["r2"] == 1
    assert rows["(none)"]["r1"] == 0


def test_action_mix(spark):
    out = analytics.build_action_mix(_status_frame(spark)).collect()[0]
    assert out["n_update"] == 2
    assert out["n_investigate"] == 1
    assert out["n_both"] == 1
    assert out["n_none"] == 2
    assert out["n_total"] == 4


def test_reason_trends_exploded(spark):
    df = spark.createDataFrame(
        [(D(2025, 1, 5), "- a\n- b"), (D(2025, 1, 25), "- a"), (D(2025, 2, 5), "- b")],
        "txn_date date, correction_reason string",
    )
    out = {
        (r["month"], r["reason"]): r["n"]
        for r in analytics.build_reason_trends_exploded(df).collect()
    }
    assert out == {
        (D(2025, 1, 1), "a"): 2,
        (D(2025, 1, 1), "b"): 1,
        (D(2025, 2, 1), "b"): 1,
    }


def test_unmatched_summary(spark):
    out = analytics.build_unmatched_summary(_status_frame(spark)).collect()
    assert len(out) == 1
    assert out[0]["match_status"] == "unmatched_relius"
    assert out[0]["n"] == 1
    assert float(out[0]["gross_total"]) == 30.0


def test_taxable_delta_distribution(spark):
    from recon_spark.plans.analytics import build_taxable_delta_distribution

    df = spark.createDataFrame(
        [
            (100.0, 0.0),     # delta -100.00 -> -10000 cents
            (100.0, 0.0),
            (50.25, 49.25),   # delta -1.00 -> -100 cents
            (None, 0.0),      # dropped: null current
            (10.0, None),     # dropped: null suggested
        ],
        ["fed_taxable_amt", "suggested_taxable_amt"],
    )
    rows = {r.delta_cents: r.n for r in build_taxable_delta_distribution(df).collect()}
    assert rows == {-10000: 2, -100: 1}


def test_compact_rewrites_small_files(spark, tmp_path):
    """200 tiny files -> few right-sized files; content identical; range
    clustering leaves per-file disjoint key ranges (file-skipping stats)."""
    from pyspark.sql import functions as F

    from recon_spark.sources import sinks

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    spark.range(0, 20_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(200).write.parquet(src)

    n = sinks.compact(spark, src, dst, sort_cols=["id"], target_file_mb=1)
    import pathlib

    src_files = [f for f in pathlib.Path(src).rglob("*.parquet")]
    dst_files = [f for f in pathlib.Path(dst).rglob("*.parquet")]
    assert len(src_files) == 200 and len(dst_files) == n and n < 20

    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert after.count() == 20_000
    assert before.exceptAll(after).count() == 0

    # range clustering: per-file [min, max] id spans do not overlap
    spans = sorted(
        tuple(r)
        for r in after.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .select("lo", "hi")
        .collect()
    )
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_compact_guards(spark, tmp_path):
    """Round-6 hardening: missing src raises (no silent 1-file collapse
    from a 0-byte listing), src == dst raises (lazy read + overwrite
    would destroy the input), and sizing goes through the Hadoop
    FileSystem API so a file:// URI spelling sizes identically to the
    bare path."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from recon_spark.sources import sinks

    src = str(tmp_path / "in")
    spark.range(0, 1000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("p")
    ).repartition(10).write.parquet(src)

    with _pytest.raises(FileNotFoundError):
        sinks.compact(spark, str(tmp_path / "nope"), str(tmp_path / "out"))
    with _pytest.raises(ValueError, match="same path"):
        sinks.compact(spark, src, src)
    with _pytest.raises(ValueError, match="same path"):
        # URI spelling vs bare path must still be caught (makeQualified)
        sinks.compact(spark, f"file://{src}", src)

    n = sinks.compact(spark, f"file://{src}", str(tmp_path / "out"))
    assert n >= 1
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_benford_audit_separates_natural_from_fabricated(spark):
    """10^U amounts are Benford by construction (chi2 small); uniform
    amounts are not (chi2 large); zero-filled digit domain and exact
    expected-count arithmetic."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from recon_spark.plans.analytics import build_benford_audit

    n = 9000
    base = spark.range(n).select(
        F.col("id"),
        # deterministic pseudo-uniform in [0,1) from md5 bits
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
         .cast("double") / float(1 << 32)).alias("u"),
    )
    natural = base.select(
        F.lit("natural").alias("plan_id"),
        F.pow(F.lit(10.0), F.col("u") * 4 + 1).alias("gross_amt"),  # 10^[1,5)
    )
    uniform = base.select(
        F.lit("uniform").alias("plan_id"),
        (F.col("u") * 89999 + 10000).alias("gross_amt"),  # uniform [1e4, 1e5)
    )
    out = build_benford_audit(natural.unionByName(uniform))
    rows = [r for r in out.collect()]
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_key, []).append(r)
    for g, rs in by_group.items():
        assert sorted(x.digit for x in rs) == list(range(1, 10))
        assert all(x.n_total == n for x in rs)
        # expected counts follow log10(1 + 1/d) exactly
        for x in rs:
            assert x.expected == pytest.approx(n * math.log10(1 + 1 / x.digit))
    chi_nat = by_group["natural"][0].chi2
    chi_uni = by_group["uniform"][0].chi2
    assert chi_nat < 20.1  # ~chi2_8 at p=0.01; 10^U is Benford
    assert chi_uni > 1000  # uniform amounts violently reject Benford
