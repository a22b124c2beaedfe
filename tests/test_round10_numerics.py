"""Round-10 numerics pins for the VERDICT r9 ADVICE fixes.

Each fix hardened arithmetic that only breaks far above driver scale
(BIGINT c² overflow near 3e9-row groups; double-cast rounding past
2^53; a zero total divisor from signed cancellation), so the driver
oracle alone cannot regress-test them — these tests construct the
degenerate inputs directly and pin BOTH engines where the divergence
would appear.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.plans.catalog_ext7 import (
    O_W35_CHANGEPOINT,
    q_w35_changepoint,
)


def test_w35_zero_total_series_pins_cusum_rel_null(spark, tmp_path):
    """Signed cents can cancel a type's grand total t to 0; cusum_rel
    divides by n*t, so without the NULLIF Spark yields NULL while
    DuckDB's IEEE float division yields NaN/Inf (VERDICT r9 ADVICE
    item 2).  Both engines must now pin the degenerate row to NULL."""
    sf = str(tmp_path)
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 03:00:00", "2024-01-02 11:00:00", "2024-01-03 09:00:00"]
            ),
            "user_id": [1, 2, 3],
            "event_type": ["refund", "refund", "refund"],
            "value": [1.5, 1.0, -2.5],  # daily cents 150, 100, -250 -> t = 0
            "props": ["{}", "{}", "{}"],
        }
    ).to_parquet(f"{sf}/events.parquet")

    rows = q_w35_changepoint(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_days"] == 3
    assert rows[0]["cusum_rel"] is None

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    (orows,) = con.sql(O_W35_CHANGEPOINT).fetchall()
    cusum_rel = orows[3]  # event_type, n_days, cp_day, cusum_rel, ...
    assert cusum_rel is None, "oracle must NULLIF the zero divisor too"


def test_a26_squared_count_discipline_survives_past_bigint(spark):
    """a26's Gini-Simpson term sums c² per group; at 100 TB a group's
    hour-bin count c passes ~3e9 and c*c overflows BIGINT (ANSI Spark
    errors; pre-ANSI wraps silently).  The fixed form multiplies IN
    decimal(38,0) — pin that the decimal product stays exact exactly
    where the BIGINT product dies (VERDICT r9 ADVICE item 1)."""
    c = 3_100_000_000  # > sqrt(2^63): c*c overflows BIGINT
    df = spark.createDataFrame([(c,), (c + 7,)], "c long")
    got = df.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("c2")
    ).collect()[0]["c2"]
    assert int(got) == c * c + (c + 7) * (c + 7)

    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        # the pre-fix BIGINT product must fail loudly under ANSI — if
        # this ever stops raising, the session has silently left ANSI
        # mode and the wrap would be SILENT corruption; re-audit every
        # g7-discipline site before relaxing this pin
        df.agg(F.sum(F.col("c") * F.col("c"))).collect()


def test_integer_div_agrees_cross_engine_past_2p53(spark):
    """t_rake's phrase score is (_sum * _plen) / _nw with the product
    exactly divisible; the double route (`/` then CAST) truncates in
    Spark but ROUNDS in DuckDB once the product passes 2^53, flipping
    ranks by 1 (VERDICT r9 ADVICE item 3).  Pin that the fixed route —
    Spark `div`, DuckDB `//` — is exact and engine-identical there."""
    nw = 6
    score = (1 << 53) + 12_345  # true per-occurrence score, > 2^53
    s, plen = score * 3, 2  # _sum = k*score with k=3, _nw = k*plen = 6

    got_spark = (
        spark.createDataFrame([(s, plen, nw)], "s long, p long, n long")
        .select(F.expr("s * p div n").alias("q"))
        .collect()[0]["q"]
    )
    (got_duck,) = duckdb.sql(
        f"SELECT CAST({s} AS BIGINT) * CAST({plen} AS BIGINT) // CAST({nw} AS BIGINT)"
    ).fetchone()
    assert got_spark == int(got_duck) == (s * plen) // nw == score

    # and the OLD route really does diverge at this magnitude: DuckDB's
    # BIGINT `/` is IEEE double division, whose nearest double rounds
    # UP past the exact quotient here, while Spark's cast truncates
    (old_duck,) = duckdb.sql(
        f"SELECT CAST(CAST({s} AS BIGINT) * {plen} / {nw} AS BIGINT)"
    ).fetchone()
    assert int(old_duck) != score, (
        "expected the double-division route to be inexact past 2^53 — "
        "if DuckDB changed semantics, re-derive the t_rake fix rationale"
    )
