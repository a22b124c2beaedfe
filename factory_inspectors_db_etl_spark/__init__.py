"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL repo (DmitryDolbin15/factory-inspectors-db-etl,
surveyed in SURVEY.md), rebuilt Spark-first.

Layout:
  session       -- SparkSession bootstrap tuned for local[N] testing
  sources       -- readers: parquet test tables, HTML-table source (U2)
  functions     -- columnar scalar functions (F1-F10 of SURVEY.md §2.3)
  operators     -- composable DataFrame operators: dims (J*), fills (W*),
                   as-of (J6), dedup / similarity / text analysis (M6)
  plans         -- end-to-end pipelines (the inspectors ETL) + query catalog
  streaming     -- Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
