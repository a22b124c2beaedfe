"""JSONL document ingestion with corrupt-record quarantine — the
standard interchange format of training-data pipelines (one JSON doc per
line), read with an EXPLICIT schema and a rejects channel instead of
schema inference and silent row loss.

Why this shape at 100 TB:
* Explicit schema: inference is a full extra pass over the data and
  locks in whatever the sample happened to contain; a declared schema
  makes the scan single-pass and the contract visible.
* PERMISSIVE + ``_corrupt_record``: a malformed line becomes a row whose
  payload columns are NULL and whose raw text lands in the corrupt
  column — the job survives dirty data AND nothing is silently dropped
  (DROPMALFORMED) or fatally poisoned (FAILFAST, where one bad line in
  terabyte N kills hour M).
* The quarantine split mirrors the HTML ETL's rejects table
  (`plans/inspectors_etl.py`): good rows flow on, bad raw lines are
  preserved for triage with their source file.

Spark caveat encoded here: referencing ONLY the corrupt column is
disallowed (the parser would never run) — the split materializes from
one cached scan with payload columns present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl_docs(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read JSONL documents; returns {'docs', 'rejects', 'raw'}.

    docs: rows that parsed (corrupt column absent); rejects: one row per
    malformed line (source file + raw line), the triage channel; raw:
    the CACHED parsed scan both branches split from — call
    ``raw.unpersist()`` once docs/rejects are consumed, or the cached
    corpus pins executor storage for the session lifetime."""
    raw = (
        spark.read.schema(DOCS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("_source_file", F.input_file_name())
        # Spark disallows queries that reference ONLY the corrupt column
        # over a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
        # RECORD_COLUMN) — the rejects branch is exactly that.  The
        # documented workaround: materialize the parsed rows first, then
        # both branches split from the cached scan (which also makes the
        # docs/rejects split one parse instead of two).
        .cache()
    )
    docs = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_source_file"
    )
    rejects = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_source_file").alias("source_file"),
        F.col("_corrupt_record").alias("raw_line"),
    )
    return {"docs": docs, "rejects": rejects, "raw": raw}
