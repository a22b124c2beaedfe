"""Bucketed (co-located) joins — the shuffle-elimination path for
repeated big-big joins (SURVEY.md §4, 100 TB posture).

A fact table joined on the same key job after job should not pay the
shuffle every time.  Writing both sides bucketed by the join key with the
same bucket count lets Spark plan a SortMergeJoin with NO Exchange on
either side: each task zips bucket i of the left with bucket i of the
right.  At 100 TB this turns the nightly fact/orders join from the
dominant shuffle into a local merge.

Local note: bucketed tables go through the session catalog
(``saveAsTable``) because bucket metadata lives in the table definition,
not the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket counts the physical plan contains no Exchange on either side
    (verified by tests/test_plan_shapes.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
