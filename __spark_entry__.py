"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship Engine A reconciliation at
sf0.001; ``queries()`` / ``oracle_sql()`` expose every registered operator
(see ``recon_spark.registry``) for the sf0.01 DuckDB correctness compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Engine A end-to-end (fixtures -> cleaners ->
    full-outer reconciliation) at sf0.001, reduced to the status KPI
    summary (A3)."""
    from recon_spark import registry

    out = registry.q_engine_a(spark, "/root/testdata/sf0.001")
    return (
        out.groupBy("match_status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("action").isNotNull(), 1).otherwise(0)).alias("n_actionable"),
        )
        .orderBy("match_status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from recon_spark import registry

    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from recon_spark import registry

    return dict(registry.ORACLES)
