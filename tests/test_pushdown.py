"""Production-shape pushdown evidence: against materialized raw parquet,
the F1 account exclusion reaches the scan as a pushed filter."""

import contextlib
import io

from recon_spark.operators import cleaning
from recon_spark.sources import fixtures, load

SF = "/root/testdata/sf0.001"


def test_account_exclusion_pushes_to_scan(spark, tmp_path):
    p = str(tmp_path / "matrix_raw")
    fixtures.matrix_raw(spark, SF).write.parquet(p)
    cleaned = cleaning.clean_matrix(load.load_matrix(spark, p))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cleaned.explain("formatted")
    plan = buf.getvalue()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "07B00442" in pushed[0], plan
    # and the result over materialized raw equals the derived-fixture run
    assert cleaned.count() == cleaning.clean_matrix(fixtures.matrix_raw(spark, SF)).count()


def test_partitioned_layout_prunes_directories(spark, tmp_path):
    """The 100 TB layout story's second half: a tax_year-partitioned
    write lets a year-scoped engine run skip other years' files at the
    DIRECTORY level (PartitionFilters, no data read), independent of
    row-group predicate pushdown."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "relius_by_year")
    fixtures.relius_raw(spark, SF).withColumn(
        # raw TAXYR carries junk formats ("2026.0", nulls) by design;
        # try_cast mirrors the cleaner's tolerant parse for the layout
        "tax_year",
        F.coalesce(F.expr("try_cast(try_cast(TAXYR as double) as int)"), F.lit(0)),
    ).write.partitionBy("tax_year").parquet(p)

    whole = spark.read.parquet(p)
    year = whole.filter("tax_year > 0").groupBy("tax_year").count().orderBy(
        F.col("count").desc()
    ).first()[0]
    df = whole.filter(F.col("tax_year") == year)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part and str(year) in part[0], plan
    # pruning is real, not cosmetic: the scan lists only the one
    # partition directory's files
    scanned = df.select(F.input_file_name()).distinct().collect()
    assert scanned and all(f"tax_year={year}" in r[0] for r in scanned)
