"""GROUPED_AGG pandas UDAFs for q_u3_grouped_agg_udaf.

Deliberately NO ``from __future__ import annotations`` here (ADVICE
r11): pandas_udf infers the GROUPED_AGG eval type from REAL type hints
(``pd.Series -> scalar``), and PEP-563 stringified hints are rejected
by the signature inference ("Unsupported signature: (v: 'pd.Series')").
The deprecated ``F.PandasUDFType`` enum the r11 form used is gone.

Import requires an ACTIVE SparkSession (pandas_udf parses the DDL
return type against the context), which is why plans/catalog.py imports
this module lazily inside the query builder, never at module scope.

The median pins the all-null group to None (NULL) instead of
float(NaN), matching DuckDB ``median()`` — no current dataset has an
all-null group (checked at sf0.001/0.01/0.1: zero NULL values in
events.value), so outputs are byte-identical today; the pin closes the
latent divergence ADVICE r11 flagged.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def u3_median(v: pd.Series) -> float:
    m = v.median()
    return None if pd.isna(m) else float(m)


@F.pandas_udf("long")
def u3_count(v: pd.Series) -> int:
    return len(v)
