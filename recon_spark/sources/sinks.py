"""Sinks (SURVEY.md §2: S3-S5) — Spark-native renderings of the
reference's Excel writers (/root/reference/src/outputs/export_utils.py:
47-107, build_correction_file.py:309-361).

Excel is a single-node format; the scale-correct equivalents are:

- S3 single-sheet sink  -> one parquet (or csv) directory per dataset
- S4 multi-sheet sink   -> ``partitionBy(key)`` parquet layout, one
  partition directory per "sheet"
- S5 correction sink    -> the corrections frame written
  ``partitionBy("Action")`` after F10 token expansion, so the
  Correction/Investigate "tabs" are partition directories written in a
  single pass (rows with both tokens are duplicated into both, exactly
  like the reference's dual-tab workbook)

A tiny pandas round-trip (`to_excel`) is provided behind an import guard
for users who need the literal .xlsx deliverable at sample scale.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import normalizers as N

EXCEL_SHEETNAME_LIMIT = 31


def dedupe_sheet_names(names: list[str]) -> list[str]:
    """Truncate to Excel's 31-char limit and dedupe with _N suffixes
    (export_utils.py:47-61)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for raw in names:
        base = raw[:EXCEL_SHEETNAME_LIMIT]
        if base not in seen:
            seen[base] = 0
            out.append(base)
            continue
        seen[base] += 1
        suffix = f"_{seen[base]}"
        out.append(base[: EXCEL_SHEETNAME_LIMIT - len(suffix)] + suffix)
    return out


def _safe_dirname(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", name)


def write_df(df: DataFrame, path: str | Path, *, fmt: str = "parquet") -> str:
    """S3: single-dataset sink."""
    p = str(path)
    df.write.mode("overwrite").format(fmt).save(p)
    return p


def write_multi_sheet(
    sheets: dict[str, DataFrame], base_path: str | Path, *, fmt: str = "parquet"
) -> dict[str, str]:
    """S4: one directory per sheet under ``base_path`` (sheet names
    truncated + deduped like the Excel writer)."""
    names = dedupe_sheet_names(list(sheets.keys()))
    out: dict[str, str] = {}
    for (raw, df), name in zip(sheets.items(), names):
        p = str(Path(base_path) / _safe_dirname(name))
        df.write.mode("overwrite").format(fmt).save(p)
        out[raw] = p
    return out


def write_correction_file(
    corrections: DataFrame, path: str | Path, *, fmt: str = "parquet"
) -> str:
    """S5: dual-tab correction sink as a single ``partitionBy("Action")``
    write (build_correction_file.py:309-361 + F10 split semantics).

    Rows whose multi-line Action carries both tokens are exploded into
    both partitions; each row's Action cell is rewritten to its tab's
    token. One shuffle-free pass over the corrections frame.
    """
    tokens = N.action_tokens("Action")
    exploded = (
        corrections.withColumn(
            "Action",
            F.explode(
                F.array_distinct(
                    F.filter(tokens, lambda t: t.isin("UPDATE_1099", "INVESTIGATE"))
                )
            ),
        )
        .withColumn(
            "Tab",
            F.when(F.col("Action") == "UPDATE_1099", "Correction").otherwise(
                "Investigate"
            ),
        )
    )
    p = str(path)
    exploded.write.mode("overwrite").format(fmt).partitionBy("Tab").save(p)
    return p


def write_excel(df: DataFrame, path: str | Path, *, sheet_name: str = "data") -> str:
    """Literal .xlsx deliverable (sample scale only — collects to the
    driver). Uses pandas/openpyxl when installed, else the stdlib
    minimal writer (sources/xlsx.py) — no longer gated."""
    pdf = df.toPandas()
    name = sheet_name[:EXCEL_SHEETNAME_LIMIT]
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(str(path), sheet_name=name, index=False)
    except ImportError:
        import pandas as pd

        from .xlsx import write_xlsx

        rows = [
            [None if pd.isna(v) else v for v in row]
            for row in pdf.itertuples(index=False)
        ]
        write_xlsx(path, [str(c) for c in pdf.columns], rows, sheet_name=name)
    return str(path)


def compact(
    spark,
    src: str,
    dst: str,
    *,
    sort_cols: list[str] | None = None,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    right-sized files, optionally range-clustered on ``sort_cols``.

    The small-files problem is the classic failure mode of incremental
    writes at scale (a streaming ``foreachBatch`` sink or daily appends
    leave thousands of KB-sized files; every downstream scan pays a task
    and a metadata round-trip per file). This op sizes the output from
    the ACTUAL input bytes — ``ceil(input_bytes / target_file_mb)``
    files — rather than a guessed partition count, and uses
    ``repartitionByRange`` when ``sort_cols`` is given so each output
    file covers a contiguous key range (min/max footer stats then let
    downstream key-range filters skip whole files, the poor man's
    Z-order for a single sort axis).

    Returns the number of files written. One shuffle; safe to run
    repeatedly (idempotent overwrite of ``dst``).

    Input sizing and output counting go through the Hadoop FileSystem
    API, so any scheme Spark can read (``file://``, ``hdfs://``,
    ``s3a://``) sizes correctly — a driver-side ``os.stat`` walk would
    silently report 0 bytes for a remote URI and collapse everything
    into one file. A missing ``src`` raises instead of compacting an
    empty frame, and ``src == dst`` raises: the read is lazy, so an
    overwrite of the input would destroy it mid-scan.
    """
    import math

    def _fs_and_path(p: str):
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, fs.makeQualified(hpath)

    def _data_files(fs, qpath):
        """(name, bytes) of data files under qpath, recursively —
        skipping _SUCCESS/_committed markers, dotfiles and .crc."""
        it = fs.listFiles(qpath, True)
        out = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith(("_", ".")) and not name.endswith(".crc"):
                out.append((name, int(st.getLen())))
        return out

    src_fs, src_q = _fs_and_path(src)
    dst_fs, dst_q = _fs_and_path(dst)
    if not src_fs.exists(src_q):
        raise FileNotFoundError(f"compact: src does not exist: {src}")
    if str(src_q) == str(dst_q):
        raise ValueError(
            f"compact: src and dst resolve to the same path ({src_q}); "
            "the lazy read + overwrite would destroy the input"
        )

    df = spark.read.format(fmt).load(src)
    input_bytes = sum(b for _, b in _data_files(src_fs, src_q))
    n_files = max(1, math.ceil(input_bytes / (target_file_mb * 1024 * 1024)))
    if sort_cols:
        df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").format(fmt).save(dst)
    return len(_data_files(dst_fs, _fs_and_path(dst)[1]))
