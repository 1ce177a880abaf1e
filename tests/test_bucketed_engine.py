"""Engine A over bucketed clean tables: the deployment shape where the
cleaners' output is persisted bucketed by the match key and every
downstream reconciliation run joins WITHOUT shuffling either side."""

import contextlib
import io

from pyspark.sql import functions as F

from recon_spark.engines import match_planid
from recon_spark.operators import partitioning as P
from recon_spark.registry import clean_tables

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_engine_a_exchange_free_over_bucketed_cleans(spark, tmp_path):
    t = clean_tables(spark, SF)
    # Bucket by the STRING key prefix (plan_id, ssn), not the full 3-part
    # join key: gross_amt is DOUBLE, and Spark's NormalizeFloatingNumbers
    # rewrites float join keys, which makes the planner disable bucketed
    # scans ("Bucketed: false (disabled by query planner)"). Hash
    # partitioning on a subset of the join keys still co-locates the join,
    # so bucketing by the string prefix gives the exchange-free plan.
    keys = ["plan_id", "ssn"]
    P.write_bucketed(t["relius"], "b_relius", keys, buckets=8,
                     sort_by=keys, path=str(tmp_path / "r"))
    P.write_bucketed(t["matrix"], "b_matrix", keys, buckets=8,
                     sort_by=keys, path=str(tmp_path / "m"))
    try:
        out = match_planid.reconcile_relius_matrix(
            spark.table("b_relius"), spark.table("b_matrix")
        )
        plan = _plan(out)
        assert "Exchange" not in plan, plan

        # result parity with the unbucketed run
        base = match_planid.reconcile_relius_matrix(t["relius"], t["matrix"])
        cols = ["plan_id", "ssn", "gross_amt", "match_status", "new_tax_code"]
        got = sorted(map(tuple, out.select(*cols).collect()))
        want = sorted(map(tuple, base.select(*cols).collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_relius")
        spark.sql("DROP TABLE IF EXISTS b_matrix")
