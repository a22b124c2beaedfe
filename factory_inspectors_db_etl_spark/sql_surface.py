"""Thin Spark SQL surface (SURVEY.md §7 design stance): register the test
tables as temp views and the engine's scalar/table functions as SQL
functions, so the full query surface is reachable from ``spark.sql``:

    from factory_inspectors_db_etl_spark.sql_surface import register_sql_surface
    register_sql_surface(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT standardize_text(n_name) FROM nation").show()
    spark.sql(\"\"\"
        SELECT a.name, a.rank_abbr
        FROM (SELECT explode(parse_personnel('Иванов И.И.<br>Петров П.П.')) AS a)
    \"\"\").show()

Two registration tiers, honestly separated:

* **Views** — zero-cost aliases over the parquet loaders; all pushdown /
  pruning behavior is identical to the DataFrame path.
* **SQL functions** — the scalar functions' *Python twin* forms
  (``standardize_text_py`` etc.) wrapped as UDFs plus the pandas-UDF
  personnel parser.  The twins are the SLOW path (row-at-a-time Python):
  they exist so ad-hoc SQL can reach the semantics, not for production
  pipelines — pipelines should use the columnar forms
  (``functions.text``), which compile to pure Catalyst expressions and
  cannot be registered as SQL functions (they are expression builders,
  not callables over values).  The dual forms are equivalence-tested in
  tests/test_text_forms_agree.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .functions.personnel_parser import parse_personnel_udf
from .functions.text import (
    canonicalize_person_name_py,
    clean_number_py,
    standardize_text_py,
)
from .sources.tables import TABLE_NAMES, load_table


def register_sql_surface(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register temp views (when ``sf_dir`` given) + SQL functions."""
    if sf_dir is not None:
        for name in TABLE_NAMES:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.udf.register("standardize_text", standardize_text_py, T.StringType())
    # LongType, NOT IntegerType: the pickle serializer silently WRAPS a
    # python int that exceeds 32 bits under IntegerType (verified:
    # clean_number('4000000000') returned -294967296).  The columnar twin
    # casts to int and raises under ANSI for the same input — neither
    # form may silently corrupt.
    spark.udf.register("clean_number", clean_number_py, T.LongType())
    spark.udf.register(
        "canonicalize_person_name", canonicalize_person_name_py, T.StringType()
    )
    spark.udf.register("parse_personnel", parse_personnel_udf)
