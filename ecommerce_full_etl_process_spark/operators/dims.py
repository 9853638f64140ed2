"""Dimension builders — dim_date generation (reference ETL/etl.py:122-144).

The reference inserts calendar rows one-by-one for each date it encounters;
here the calendar is generated declaratively with ``sequence`` + ``explode``
(single narrow stage, no shuffle) and the upsert is an anti-join append.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import calendar_attrs


def build_dim_date(spark: SparkSession, start: date, end: date) -> DataFrame:
    """Full calendar between start and end inclusive (ISO week/weekday,
    yyyymmdd date_id — reference ETL/etl.py:119-143)."""
    base = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    attrs = calendar_attrs(F.col("d"))
    return base.select(*[expr.alias(name) for name, expr in attrs.items()])


def missing_dim_date_rows(
    spark: SparkSession, dim_date: DataFrame, dates: DataFrame
) -> DataFrame:
    """Rows to append so every date in ``dates`` (single ``d`` date column)
    exists in dim_date (reference ensure_dim_date semantics)."""
    needed = dates.select(F.col("d").cast("date").alias("d")).distinct()
    missing = needed.join(
        dim_date.select(F.col("full_date").alias("d")), "d", "left_anti"
    )
    attrs = calendar_attrs(F.col("d"))
    return missing.select(*[expr.alias(name) for name, expr in attrs.items()])
