"""Native .xlsx ingestion (S1 parity — reference load_data.py:119-306
reads four Excel exports with pd.read_excel; sources/xlsx.py is the
stdlib OOXML-subset equivalent + lake-boundary parquet converter)."""

import datetime
import zipfile

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import cleaning
from recon_spark.sources import fixtures, load, sinks, xlsx

SF = "/root/testdata/sf0.001"


def test_write_read_round_trip(tmp_path):
    header = ["name", "qty", "price", "flag", "when", "empty"]
    rows = [
        ["alpha & <beta>", 3, 1.5, True, datetime.date(2025, 3, 1), None],
        [None, -7, 2.25e10, False, "2025-12-31", "x"],
    ]
    p = xlsx.write_xlsx(tmp_path / "t.xlsx", header, rows)
    grid = xlsx.read_xlsx_rows(p)
    assert grid[0] == header
    assert grid[1] == ["alpha & <beta>", 3, 1.5, True, "2025-03-01", None]
    assert grid[2] == [None, -7, 2.25e10, False, "2025-12-31", "x"]
    pdf = xlsx.read_xlsx(p)
    assert list(pdf.columns) == header
    assert list(pdf["qty"]) == [3, -7]


def test_reader_handles_shared_strings_and_date_styles(tmp_path):
    """Files written by openpyxl/Excel use sharedStrings + date-styled
    serial numbers; hand-build one to exercise that path."""
    p = str(tmp_path / "excel_like.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        # 45717 = 2025-03-01 in the 1900 serial system; s=1 -> date style
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" s="1"><v>45717</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst {ns} count="3" uniqueCount="3">'
        "<si><t>label</t></si><si><t>paid on</t></si><si><t>row one</t></si></sst>"
    )
    styles = (
        f'<styleSheet {ns}><cellXfs count="2">'
        '<xf numFmtId="0"/><xf numFmtId="14"/></cellXfs></styleSheet>'
    )
    # reuse the minimal writer's envelope, swapping in the hand-built
    # sheet and adding sharedStrings/styles (rebuild rather than append:
    # a duplicate zip entry name draws a zipfile UserWarning)
    p0 = str(tmp_path / "envelope.xlsx")
    xlsx.write_xlsx(p0, ["x"], [])
    with zipfile.ZipFile(p0) as zin, zipfile.ZipFile(p, "w") as z:
        for info in zin.infolist():
            if info.filename != "xl/worksheets/sheet1.xml":
                z.writestr(info.filename, zin.read(info.filename))
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/styles.xml", styles)
    grid = xlsx.read_xlsx_rows(p)
    assert grid[0] == ["label", "paid on"]
    assert grid[1] == ["row one", datetime.datetime(2025, 3, 1)]


def test_is_date_format():
    assert xlsx._is_date_format("yyyy-mm-dd")
    assert xlsx._is_date_format("[$-409]d\\-mmm\\-yy")
    assert not xlsx._is_date_format("#,##0.00")
    assert not xlsx._is_date_format('"yes";"no"')  # quoted literals only


def test_xlsx_to_parquet_types(spark, tmp_path):
    p = xlsx.write_xlsx(
        tmp_path / "typed.xlsx",
        ["s", "i", "f"],
        [["a", 1, 0.5], ["b", 2, 1.5], [None, None, None]],
    )
    out = xlsx.xlsx_to_parquet(p, tmp_path / "typed.parquet")
    df = spark.read.parquet(out)
    assert dict(df.dtypes) == {"s": "string", "i": "bigint", "f": "double"}
    assert df.count() == 3


def test_load_relius_from_xlsx(spark, tmp_path):
    """The reference's entry shape: hand the loader an .xlsx export."""
    sample = fixtures.relius_raw(spark, SF)
    pdf = sample.limit(50).toPandas()
    rows = [[None if v != v and isinstance(v, float) else v for v in r]
            for r in pdf.itertuples(index=False)]
    p = xlsx.write_xlsx(tmp_path / "relius.xlsx", list(pdf.columns), rows)
    df = load.load_relius(spark, p)  # fmt auto-detected from extension
    assert set(load.REQUIRED_RELIUS) <= set(df.columns)
    assert df.count() == 50
    cleaned = cleaning.clean_relius(df)
    assert cleaned.count() > 0


def test_load_xlsx_missing_header_raises(spark, tmp_path):
    p = xlsx.write_xlsx(tmp_path / "bad.xlsx", ["WRONG"], [["x"]])
    with pytest.raises(ValueError, match="missing required columns"):
        load.load_relius(spark, p, fmt="xlsx")


def test_write_excel_sink_round_trip(spark, tmp_path):
    """S3 literal-xlsx deliverable, no longer gated on openpyxl."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "name string, n long")
    p = sinks.write_excel(df, tmp_path / "out.xlsx")
    back = xlsx.read_xlsx(p)
    assert sorted(zip(back["name"], back["n"])) == [("a", 1), ("b", 2)]


def test_cli_from_xlsx_inputs(spark, tmp_path, capsys):
    """End-to-end: the reference's four-Excel-export entry point."""
    from recon_spark import cli

    paths = {}
    for name, fn in [
        ("relius", fixtures.relius_raw),
        ("matrix", fixtures.matrix_raw),
    ]:
        pdf = fn(spark, SF).toPandas()
        rows = [
            [None if (isinstance(v, float) and v != v) else v for v in r]
            for r in pdf.itertuples(index=False)
        ]
        paths[name] = xlsx.write_xlsx(
            tmp_path / f"{name}.xlsx", list(pdf.columns), rows
        )
    rc = cli.main(
        [
            "--sf-dir", SF,
            "--relius", paths["relius"],
            "--matrix", paths["matrix"],
            "--out", str(tmp_path / "corr"),
            "--cpus", "8",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    n = int(out.strip().rsplit(" ", 1)[-1])
    assert n > 0
    # same corrections as the parquet-sample path (xlsx is only an I/O shim)
    rc2 = cli.main(
        ["--sf-dir", SF, "--out", str(tmp_path / "corr_ref"), "--cpus", "8"]
    )
    assert rc2 == 0
    n2 = int(capsys.readouterr().out.strip().rsplit(" ", 1)[-1])
    assert n == n2
