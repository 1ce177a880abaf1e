"""S1 loader tests: path mode with header validation, sample fallback."""

import pytest

from recon_spark.sources import load

SF = "/root/testdata/sf0.001"


def test_sample_fallback(spark):
    df = load.load_relius(spark, None, sample_sf_dir=SF)
    assert "PLANID_1" in df.columns
    assert df.count() > 0


def test_sample_disabled_raises(spark):
    with pytest.raises(ValueError, match="sample fallback disabled"):
        load.load_matrix(spark, None, use_sample_if_none=False)


def test_path_mode_validates_headers(spark, tmp_path):
    # write a valid raw export, read it back through the loader
    raw = load.load_matrix(spark, None, sample_sf_dir=SF)
    p = str(tmp_path / "matrix")
    raw.write.parquet(p)
    df = load.load_matrix(spark, p)
    assert df.count() == raw.count()


def test_path_mode_missing_headers_raises(spark, tmp_path):
    bad = spark.createDataFrame([(1,)], ["not_a_header"])
    p = str(tmp_path / "bad")
    bad.write.parquet(p)
    with pytest.raises(ValueError, match="Relius: missing required columns"):
        load.load_relius(spark, p)


def test_csv_roundtrip(spark, tmp_path):
    raw = load.load_relius_demo(spark, None, sample_sf_dir=SF)
    p = str(tmp_path / "demo_csv")
    raw.write.option("header", "true").csv(p)
    df = load.load_relius_demo(spark, p, fmt="csv")
    assert df.count() == raw.count()
