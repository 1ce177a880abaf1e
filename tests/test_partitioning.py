"""Bucketed co-located joins + salted skew joins (operators/partitioning)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import partitioning as P


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def facts(spark):
    return spark.range(0, 10_000).select(
        (F.col("id") % 50).alias("plan_id"),
        (F.col("id") % 997).alias("ssn"),
        (F.col("id") * 7 % 1000).cast("double").alias("amt"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(0, 997).select(
        (F.col("id") % 50).alias("plan_id"),
        F.col("id").alias("ssn"),
        F.concat(F.lit("p"), F.col("id")).alias("name"),
    ).dropDuplicates(["plan_id", "ssn"])


def test_bucketed_join_has_no_exchange(spark, facts, dim, tmp_path):
    # disable auto-broadcast so the join would normally shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        P.write_bucketed(facts, "t_facts", ["plan_id", "ssn"], buckets=8,
                         sort_by=["plan_id", "ssn"], path=str(tmp_path / "f"))
        P.write_bucketed(dim, "t_dim", ["plan_id", "ssn"], buckets=8,
                         sort_by=["plan_id", "ssn"], path=str(tmp_path / "d"))
        joined = P.bucketed_join(spark, "t_facts", "t_dim", ["plan_id", "ssn"], "left")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # row preservation: left join keeps every fact row
        assert joined.count() == facts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_facts")
        spark.sql("DROP TABLE IF EXISTS t_dim")


def test_salted_join_matches_plain_join(spark, facts, dim):
    cols = ["plan_id", "ssn", "amt", "name"]
    plain = sorted(map(tuple, facts.join(dim, ["plan_id", "ssn"], "left").select(*cols).collect()))
    salted = sorted(map(tuple, P.salted_join(facts, dim, ["plan_id", "ssn"], "left").select(*cols).collect()))
    assert salted == plain


def test_salted_join_inner(spark, facts, dim):
    plain = facts.join(dim, ["plan_id", "ssn"]).count()
    assert P.salted_join(facts, dim, ["plan_id", "ssn"]).count() == plain
