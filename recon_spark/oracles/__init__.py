"""DuckDB-dialect SQL mirroring every Spark operator, for the driver's
correctness oracle (__spark_entry__.oracle_sql) and the local test harness.
"""
