"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference real-time e-commerce warehouse
(`luojiahan/sparkstreaming-gmall-scala`, Scala/Spark-Streaming DStreams),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for streams, Pandas UDFs only where builtins can't
express the semantics.

Layout:
  session.py    - tuned SparkSession factory (AQE, shuffle partitions, UTC)
  sources/      - batch/stream sources (parquet tables, kafka gated by try)
  operators/    - pure DataFrame -> DataFrame operators (testable, oracle'd)
  functions/    - column-expression helpers (dates, money, text, vectors)
  plans/        - the query catalog: name -> (builder, oracle SQL)
  streaming/    - watermarked/stateful variants + foreachBatch sink helpers
"""

__version__ = "0.1.0"
