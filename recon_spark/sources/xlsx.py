"""Native .xlsx ingestion (closes the S1 I/O parity gap).

Parity target: ``/root/reference/src/core/load_data.py:119-306`` — the
reference reads its four raw exports with ``pd.read_excel``. This
container ships no openpyxl, so this module implements the small OOXML
subset those exports actually use with only the stdlib (``zipfile`` +
``xml.etree``): shared strings, inline strings, numbers, booleans, and
date-styled numeric cells (builtin + custom date number formats). When
openpyxl *is* installed, ``read_xlsx`` delegates to ``pd.read_excel`` so
behavior matches the reference exactly.

The scale story is unchanged: xlsx is a single-node format, so ingestion
is a driver-side convert-to-parquet step (``xlsx_to_parquet``) at the
lake boundary; everything downstream is a distributed parquet scan. The
reference's exports are ~10k rows — the convert step is trivially sized,
and a 100 TB deployment would land columnar files upstream anyway.

``write_xlsx`` is the matching minimal writer (inline strings), used by
the sink fallback and the round-trip tests.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

#: Excel serial date epoch (the standard 1900 system, with its phantom
#: 1900-02-29 already absorbed: serial 1 = 1900-01-01, so day 0 is
#: 1899-12-30 for post-Feb-1900 dates — all dates this pipeline sees).
_EPOCH = _dt.datetime(1899, 12, 30)

#: builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'C7' -> 2 (0-based column)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    """0 -> 'A', 27 -> 'AB'."""
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(65 + r) + s
    return s


def _is_date_format(code: str) -> bool:
    """True when a custom format code renders a date/time: contains a
    y/m/d/h/s token outside quoted literals, brackets, and escapes."""
    code = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
    return bool(re.search(r"[ymdhs]", code, re.IGNORECASE))


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, member_path)] in workbook order."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels if _local(r.tag) == "Relationship"
    }
    out: list[tuple[str, str]] = []
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        rid = next(
            (v for k, v in el.attrib.items() if _local(k) == "id" and "}" in k),
            el.get("id"),
        )
        target = rid_to_target.get(rid, f"worksheets/sheet{len(out) + 1}.xml")
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        out.append((el.get("name", f"Sheet{len(out) + 1}"), target))
    return out


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    out = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        out.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))
    return out


def _date_styles(z: zipfile.ZipFile) -> set[int]:
    """Indices into cellXfs whose number format is a date format."""
    if "xl/styles.xml" not in z.namelist():
        return set()
    root = ET.fromstring(z.read("xl/styles.xml"))
    custom: dict[int, bool] = {}
    for el in root.iter():
        if _local(el.tag) == "numFmt":
            custom[int(el.get("numFmtId", "0"))] = _is_date_format(
                el.get("formatCode", "")
            )
    date_styles: set[int] = set()
    for el in root.iter():
        if _local(el.tag) == "cellXfs":
            for i, xf in enumerate(x for x in el if _local(x.tag) == "xf"):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in _BUILTIN_DATE_FMTS or custom.get(fmt, False):
                    date_styles.add(i)
            break
    return date_styles


def _cell_value(c: ET.Element, shared: list[str], date_styles: set[int]):
    t = c.get("t", "n")
    v_el = next((x for x in c if _local(x.tag) == "v"), None)
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter() if _local(x.tag) == "t")
    if v_el is None or v_el.text is None:
        return None
    v = v_el.text
    if t == "s":
        return shared[int(v)]
    if t == "str":
        return v
    if t == "b":
        return bool(int(v))
    if t == "e":
        return None
    num = float(v)
    if int(c.get("s", "0")) in date_styles:
        return _EPOCH + _dt.timedelta(days=num)
    if num.is_integer() and "e" not in v.lower() and "." not in v:
        return int(num)
    return num


def read_xlsx_rows(
    path: str | Path, sheet_name: int | str = 0
) -> list[list[object]]:
    """Raw cell grid of one sheet (row-major, None-padded to the widest
    row). Stdlib OOXML-subset parser — see module docstring."""
    with zipfile.ZipFile(str(path)) as z:
        sheets = _sheet_targets(z)
        if isinstance(sheet_name, int):
            target = sheets[sheet_name][1]
        else:
            match = [t for n, t in sheets if n == sheet_name]
            if not match:
                raise KeyError(f"sheet {sheet_name!r} not in {[n for n, _ in sheets]}")
            target = match[0]
        shared = _shared_strings(z)
        date_styles = _date_styles(z)
        root = ET.fromstring(z.read(target))
        rows: list[list[object]] = []
        for row_el in root.iter():
            if _local(row_el.tag) != "row":
                continue
            cells: list[object] = []
            for c in row_el:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                cells.append(_cell_value(c, shared, date_styles))
            rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx(path: str | Path, sheet_name: int | str = 0) -> pd.DataFrame:
    """First row = header, like ``pd.read_excel`` defaults (which this
    delegates to when openpyxl is installed — the reference's exact
    path, load_data.py:161)."""
    try:
        import openpyxl  # noqa: F401

        return pd.read_excel(str(path), sheet_name=sheet_name)
    except ImportError:
        pass
    grid = read_xlsx_rows(path, sheet_name)
    if not grid:
        return pd.DataFrame()
    header = [str(h) if h is not None else f"Unnamed: {i}" for i, h in enumerate(grid[0])]
    cols = {h: [r[i] for r in grid[1:]] for i, h in enumerate(header)}
    return pd.DataFrame(cols, columns=header, dtype=object)


def xlsx_to_parquet(
    xlsx_path: str | Path, out_path: str | Path, sheet_name: int | str = 0
) -> str:
    """The lake-boundary converter: one xlsx sheet -> one parquet file
    (pyarrow-typed; all-null or mixed-type columns degrade to string)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = read_xlsx(xlsx_path, sheet_name)
    arrays, fields = [], []
    for col in pdf.columns:
        vals = list(pdf[col])
        try:
            arr = pa.array(vals)
            if pa.types.is_null(arr.type):
                arr = pa.array([None] * len(vals), type=pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arr = pa.array([None if v is None else str(v) for v in vals])
        arrays.append(arr)
        fields.append(pa.field(str(col), arr.type))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    out = str(out_path)
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, out)
    return out


def write_xlsx(
    path: str | Path,
    header: list[str],
    rows: list[list[object]],
    *,
    sheet_name: str = "data",
) -> str:
    """Minimal single-sheet xlsx writer (inline strings; numbers kept
    numeric; dates/datetimes written as ISO strings so the round trip
    needs no style table). Sample-scale by design — the scale sink is
    parquet (sinks.py)."""

    def cell(ref: str, v: object) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        if isinstance(v, (_dt.datetime, _dt.date)):
            v = v.isoformat()
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    body = []
    for ri, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(cell(f"{_col_letters(ci)}{ri}", v) for ci, v in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    p = str(path)
    Path(p).parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return p
