"""Production-shape loaders for the four raw input tables (operator S1).

Parity target: ``/root/reference/src/core/load_data.py:119-306``
(``load_relius_excel`` / ``load_relius_roth_basis_excel`` /
``load_relius_demo_excel`` / ``load_matrix_excel``) — each validates the
required raw headers (S2) and falls back to seeded sample data when no
path is given (``use_sample_if_none``, reference ``USE_SAMPLE_DATA_DEFAULT``
``src/config.py:427``).

Spark-era shape: inputs are parquet or csv directories/files read with
``spark.read``; ``.xlsx`` inputs (the reference's native format) are
converted at the lake boundary by :mod:`.xlsx` — a driver-side
per-file step sized to Excel's own limits, after which everything
downstream is a distributed parquet scan. The sample fallback is the
deterministic TPC-H-derived fixture generator (S6) at ``DEFAULT_SF_DIR``.
"""

from __future__ import annotations

import hashlib
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..plans.quality import validate_columns
from ..session import DEFAULT_SF_DIR
from . import fixtures

#: required raw headers per source (the rename-map keys ARE the contract;
#: extra columns are allowed and pruned later — reference load_data.py:92-115)
REQUIRED_RELIUS = [
    "PLANID_1", "SSNUM_1", "GROSSDISTRAMT", "EXPORTEDDATE", "TAXYR",
    "DISTR1CD", "DISTRNAM",
]
REQUIRED_MATRIX = [
    "Matrix Account", "Client Account", "Participant SSN", "Gross Amount",
    "Transaction Date", "Transaction Type", "Tax Code", "Tax Code 2",
]
REQUIRED_DEMO = ["PLANID", "SSNUM", "BIRTHDATE", "TERM_DATE"]
REQUIRED_ROTH_BASIS = ["PLANID", "SSNUM", "FIRSTTAXYEARROTH", "Total"]


def _read(
    spark: SparkSession, path: str, fmt: str, sheet_name: int | str = 0
) -> DataFrame:
    if fmt == "xlsx" or (fmt == "parquet" and str(path).endswith(".xlsx")):
        from . import xlsx

        key = hashlib.md5(
            f"{Path(path).resolve()}:{Path(path).stat().st_mtime_ns}:{sheet_name}".encode()
        ).hexdigest()[:16]
        out = Path(tempfile.gettempdir()) / "recon_spark_xlsx" / f"{key}.parquet"
        if not out.exists():
            xlsx.xlsx_to_parquet(path, out, sheet_name)
        return spark.read.parquet(str(out))
    if fmt == "csv":
        return spark.read.option("header", "true").csv(path)
    return spark.read.format(fmt).load(path)


def _load(
    spark: SparkSession,
    path: str | None,
    *,
    fmt: str,
    required: list[str],
    source_name: str,
    sample_fn,
    use_sample_if_none: bool,
    sample_sf_dir: str | None,
    sheet_name: int | str = 0,
) -> DataFrame:
    if path is None:
        if not use_sample_if_none:
            raise ValueError(f"{source_name}: no path given and sample fallback disabled.")
        return sample_fn(spark, sample_sf_dir or DEFAULT_SF_DIR)
    df = _read(spark, path, fmt, sheet_name)
    validate_columns(df, required, source_name)
    return df


def load_relius(
    spark: SparkSession,
    path: str | None = None,
    *,
    fmt: str = "parquet",
    use_sample_if_none: bool = True,
    sample_sf_dir: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Relius distributions export (raw headers) or the seeded sample."""
    return _load(
        spark, path, fmt=fmt, required=REQUIRED_RELIUS, source_name="Relius",
        sample_fn=fixtures.relius_raw, use_sample_if_none=use_sample_if_none,
        sample_sf_dir=sample_sf_dir, sheet_name=sheet_name,
    )


def load_matrix(
    spark: SparkSession,
    path: str | None = None,
    *,
    fmt: str = "parquet",
    use_sample_if_none: bool = True,
    sample_sf_dir: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Matrix disbursements export (raw headers) or the seeded sample."""
    return _load(
        spark, path, fmt=fmt, required=REQUIRED_MATRIX, source_name="Matrix",
        sample_fn=fixtures.matrix_raw, use_sample_if_none=use_sample_if_none,
        sample_sf_dir=sample_sf_dir, sheet_name=sheet_name,
    )


def load_relius_demo(
    spark: SparkSession,
    path: str | None = None,
    *,
    fmt: str = "parquet",
    use_sample_if_none: bool = True,
    sample_sf_dir: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Participant demographics export or the seeded sample."""
    return _load(
        spark, path, fmt=fmt, required=REQUIRED_DEMO,
        source_name="Relius demographics", sample_fn=fixtures.relius_demo_raw,
        use_sample_if_none=use_sample_if_none, sample_sf_dir=sample_sf_dir,
        sheet_name=sheet_name,
    )


def load_roth_basis(
    spark: SparkSession,
    path: str | None = None,
    *,
    fmt: str = "parquet",
    use_sample_if_none: bool = True,
    sample_sf_dir: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Roth basis extract or the seeded sample."""
    return _load(
        spark, path, fmt=fmt, required=REQUIRED_ROTH_BASIS,
        source_name="Roth basis", sample_fn=fixtures.roth_basis_raw,
        use_sample_if_none=use_sample_if_none, sample_sf_dir=sample_sf_dir,
        sheet_name=sheet_name,
    )
