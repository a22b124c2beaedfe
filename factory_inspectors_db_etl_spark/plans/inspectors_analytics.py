"""Analytical query pack over the inspectors star schema (SURVEY.md §2.5
A2/A3, §2.6 W7; README.md:8 of the reference names these analyses as the
database's purpose: social origin, education, regional distribution, and
career movement of inspectors).

The reference only *stores* for these queries (indexes on
Year/Gubernia/Okrug/Inspector, populate_db_ru_v1.py:168) — it never runs
them.  Here each is a first-class DataFrame plan over the warehouse built
by ``plans.inspectors_etl.build_warehouse``.

Scale notes: every query aggregates or windows on low-cardinality keys
(year, gubernia, inspector) after partition-pruned scans of the
year-partitioned fact; dims join broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# -- extension: raw date phrases -> DateType --------------------------------

# month-name (standardized, pre-reform collapsed) -> month number
MONTHS_RU = {
    "январ": 1, "феврал": 2, "март": 3, "апрел": 4, "мая": 5, "ма": 5,
    "июн": 6, "июл": 7, "август": 8, "сентябр": 9, "октябр": 10,
    "ноябр": 11, "декабр": 12, "дек": 12, "янв": 1, "фев": 2, "апр": 4,
    "авг": 8, "сент": 9, "окт": 10, "нояб": 11, "июн.": 6,
}


def parse_raw_date(raw: Column, year: Column) -> Column:
    """Upgrade the reference's deliberately-untyped date strings
    ("с 10 дек") to DateType using the fact row's year — the SURVEY §1.2
    extension.  Unparseable phrases stay NULL (never error)."""
    day = F.regexp_extract(raw, r"(\d{1,2})", 1)
    month_tok = F.regexp_extract(raw, r"\d{1,2}\s+([а-яё.]+)", 1)
    # One chained CASE WHEN, longest keys first: branches evaluate in chain
    # order, so "март" is tested before its prefix "ма" (wrapping otherwise()
    # around prior branches would invert that and turn every March into May).
    ladder: Column | None = None
    for tok in sorted(MONTHS_RU, key=len, reverse=True):
        cond = month_tok.startswith(tok)
        ladder = F.when(cond, F.lit(MONTHS_RU[tok])) if ladder is None else ladder.when(cond, F.lit(MONTHS_RU[tok]))
    month_num: Column = ladder.otherwise(F.lit(None).cast("int"))
    # no try_make_date builtin in this Spark; guard day validity by hand so
    # ANSI mode's make_date never throws on malformed phrases
    d = day.cast("int")
    leap = (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))
    max_day = (
        F.when(month_num == 2, F.when(leap, 29).otherwise(28))
        .when(month_num.isin(4, 6, 9, 11), 30)
        .otherwise(31)
    )
    valid = (day != "") & month_num.isNotNull() & (d >= 1) & (d <= max_day)
    return F.when(valid, F.make_date(year, month_num, d))


# -- A2: regional distribution ----------------------------------------------

def regional_rollup(assignments: DataFrame) -> DataFrame:
    """Establishments/workers/boilers totals per (okrug, gubernia) with
    ROLLUP subtotals (A3) and distinct-inspector counts, per year."""
    return (
        assignments.rollup("year", "okrug_name", "gubernia_name")
        .agg(
            F.sum("establishments_count").alias("establishments"),
            F.sum("worker_count").alias("workers"),
            F.sum("boiler_count").alias("boilers"),
            F.countDistinct("inspector_id").alias("n_inspectors"),
            F.count(F.lit(1)).alias("n_assignments"),
        )
    )


# -- W7: career trajectories -------------------------------------------------

def career_trajectories(assignments: DataFrame) -> DataFrame:
    """Year-over-year movement per inspector: previous year/location/rank
    alongside the current one, with change flags — lag windows over
    (inspector_id) ordered by year."""
    w = W.partitionBy("inspector_id").orderBy("year", "assignment_id")
    prev = lambda c: F.lag(c).over(w)  # noqa: E731
    return (
        assignments.filter(F.col("inspector_id").isNotNull())
        .select(
            "inspector_id", "year", "gubernia_name", "okrug_name",
            "position_role", "rank_id", "inspector_location_id", "assignment_id",
        )
        .withColumn("prev_year", prev("year"))
        .withColumn("prev_gubernia", prev("gubernia_name"))
        .withColumn("prev_role", prev("position_role"))
        .withColumn("prev_rank_id", prev("rank_id"))
        .withColumn(
            "moved_gubernia",
            F.when(prev("gubernia_name").isNull(), F.lit(None)).otherwise(
                F.col("gubernia_name") != prev("gubernia_name")
            ),
        )
        .withColumn(
            "rank_changed",
            F.when(prev("rank_id").isNull(), F.lit(None)).otherwise(
                ~F.col("rank_id").eqNullSafe(prev("rank_id"))
            ),
        )
    )


def career_summary(assignments: DataFrame) -> DataFrame:
    """Per-inspector career span and breadth: first/last year, number of
    distinct gubernias/roles served, total assignments."""
    return (
        assignments.filter(F.col("inspector_id").isNotNull())
        .groupBy("inspector_id")
        .agg(
            F.min("year").alias("first_year"),
            F.max("year").alias("last_year"),
            (F.max("year") - F.min("year")).alias("span_years"),
            F.countDistinct("gubernia_name").alias("n_gubernias"),
            F.countDistinct("position_role").alias("n_roles"),
            F.count(F.lit(1)).alias("n_assignments"),
        )
    )


# -- education / social-origin distribution ---------------------------------

def education_distribution(assignments: DataFrame, educations: DataFrame) -> DataFrame:
    """Inspector counts per education credential per year (broadcast dim
    join -> groupBy)."""
    return (
        assignments.filter(F.col("education_id").isNotNull())
        .join(F.broadcast(educations), "education_id")
        .groupBy("year", "full_name_ru")
        .agg(F.countDistinct("inspector_id").alias("n_inspectors"))
    )


def tenure_dates(assignments: DataFrame) -> DataFrame:
    """Typed start/end dates (extension): raw phrases upgraded to
    DateType within the assignment's year."""
    return assignments.select(
        "assignment_id",
        "year",
        "start_date_raw",
        "end_date_raw",
        parse_raw_date(F.col("start_date_raw"), F.col("year")).alias("start_date"),
        parse_raw_date(F.col("end_date_raw"), F.col("year")).alias("end_date"),
    )


def top_mobile_inspectors(assignments: DataFrame, k: int = 10) -> DataFrame:
    """O5 top-k: inspectors who served the most distinct gubernias."""
    return (
        career_summary(assignments)
        .orderBy(F.col("n_gubernias").desc(), F.col("inspector_id").asc())
        .limit(k)
    )
