"""recon_spark — a PySpark-native reconciliation & analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``manuel-reyes-ml/1099_reconciliation_pipeline``
(single-node pandas ETL), redesigned for distributed execution:

- All scalar normalizers / validators are pure ``pyspark.sql.Column``
  expression builders (JVM-side, whole-stage-codegen'd; zero Python UDFs
  in the reference surface).
- The four rule engines (A: inherited-plan reconciliation, B: age-based
  tax-code audit, C: Roth taxable analysis, D: IRA rollover audit) are
  declarative DataFrame DAGs so Catalyst handles pushdown/pruning/join
  selection; joins are unhinted so AQE/threshold picks broadcast only
  while a side actually fits (participant dims grow with the data).
- Analytics (KPI summaries, trends, crosstabs) are groupBy/pivot queries.
- Beyond the reference surface: large-scale data-pipeline operators
  (dedup exact/MinHash-LSH/SimHash, similarity search, text analysis,
  multimodal column plumbing) and a Structured Streaming variant of the
  monthly-trend aggregation.

Layout:
    functions/   scalar Column-expression builders (normalizers, validators)
    sources/     testdata readers + reference-shaped fixture derivations
    operators/   cleaning, dedup, text, similarity, multimodal
    engines/     the four business-rule engines
    plans/       analytics aggregations + correction-file builder
    streaming/   Structured Streaming operators
    oracles/     DuckDB-dialect SQL mirroring every operator (correctness oracle)
    cli.py       end-to-end correction-file CLI (python -m recon_spark.cli)
    registry.py  every graded operator as a (Spark callable, oracle SQL) pair
"""

__version__ = "0.1.0"
