"""Readers for the driver's testdata tables (TESTDATA.md).

Parquet scans are the entry point for every query; expressing filters and
projections *after* ``spark.read.parquet`` is fine — Catalyst pushes
predicates and prunes columns into the scan (verify with
``df.explain('formatted')`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with ``ts`` as TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects outright) and, in newer testdata, as
    TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ). Branch on the
    *loaded* type rather than assuming a storage layout:

    - plain read succeeds, ``ts`` is a timestamp -> cast TIMESTAMP_NTZ to
      the session-zone TIMESTAMP (UTC session, so wall-clock values are
      unchanged) and use as-is;
    - plain read fails (nanos file) or yields ``bigint`` (caller already
      set ``nanosAsLong``) -> re-read with ``nanosAsLong`` and truncate to
      microseconds with integer arithmetic (``DIV 1000`` — floor, exactly
      what DuckDB does when narrowing ns -> its native us timestamps; a
      float division would round and drift by 1us on half-cases).
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        df = None  # schema inference rejected TIMESTAMP(NANOS)
    if df is not None and dict(df.dtypes).get("ts") not in ("bigint", "long"):
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
