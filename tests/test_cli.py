"""End-to-end CLI test (reference build_correction_file.py:367-420 parity)."""

from recon_spark import cli

SF = "/root/testdata/sf0.001"


def test_cli_end_to_end(spark, tmp_path, capsys):
    rc = cli.main(["--sf-dir", SF, "--out", str(tmp_path / "corr"), "--cpus", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Corrections written to:" in out
    assert "Total corrections:" in out
    n = int(out.strip().rsplit(" ", 1)[-1])
    assert n > 0
    written = spark.read.parquet(str(tmp_path / "corr"))
    assert written.count() >= n  # both-token rows duplicated across tabs
    assert "Tab" in written.columns


def test_cli_month_filter_and_no_rules(spark, tmp_path, capsys):
    rc = cli.main(
        [
            "--sf-dir", SF,
            "--out", str(tmp_path / "corr2"),
            "--months", "Jan,feb,3",
            "--no-business-rules",
            "--cpus", "8",
        ]
    )
    assert rc == 0
    # without business rules nothing is actionable -> zero corrections
    assert "Total corrections: 0" in capsys.readouterr().out


def test_cli_engine_selection(spark, tmp_path, capsys):
    for engine in ["b", "c", "d"]:
        rc = cli.main(
            ["--sf-dir", SF, "--engine", engine,
             "--out", str(tmp_path / f"corr_{engine}"), "--cpus", "8"]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "Total corrections:" in out
        assert int(out.strip().rsplit(" ", 1)[-1]) > 0
