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
