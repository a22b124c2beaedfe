"""U2 third native form: the Spark-4 Python UDTF arm of the HTML roster
reader must produce row-for-row identical output to the mapInPandas
batch reader on the full reference corpus (VERDICT r6 item #8)."""

from __future__ import annotations

import glob

import pandas as pd

from factory_inspectors_db_etl_spark.sources.html_table import (
    READER_SCHEMA,
    read_roster_rows,
)
from factory_inspectors_db_etl_spark.sources.html_udtf import (
    read_roster_rows_udtf,
)

CORPUS = "/root/reference/diplom/fabric*.html"


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(["source_file", "row_idx"])
        .reset_index(drop=True)
        .fillna("<NULL>")
    )


def test_udtf_arm_matches_mapinpandas_reader_row_for_row(spark):
    a = _canon(read_roster_rows(spark, CORPUS))
    b = _canon(read_roster_rows_udtf(spark, CORPUS))
    assert list(a.columns) == [f.name for f in READER_SCHEMA.fields]
    assert list(b.columns) == list(a.columns)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_udtf_arm_schema_and_lateral_plan(spark):
    df = read_roster_rows_udtf(spark, CORPUS)
    assert df.schema == READER_SCHEMA
    # the UDTF is a generator, not a shuffle: no Exchange in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_udtf_skips_files_without_year_like_the_batch_reader(spark, tmp_path):
    p = tmp_path / "notayear.html"
    p.write_text("<table><tr><td>x</td></tr></table>")
    out = read_roster_rows_udtf(spark, str(p))
    assert out.count() == 0


def test_udtf_single_file_parity(spark):
    one = sorted(glob.glob("/root/reference/diplom/fabric*.html"))[0]
    a = _canon(read_roster_rows(spark, one))
    b = _canon(read_roster_rows_udtf(spark, one))
    pd.testing.assert_frame_equal(a, b)
