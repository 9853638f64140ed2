"""Date/calendar column expressions (SURVEY §2.8, F1-F5).

All pure Column expressions — JVM-side, codegen-friendly, zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_id(d: Column) -> Column:
    """yyyymmdd integer encoding (reference ETL/etl.py:119-120)."""
    return (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).cast("int")


def iso_week(d: Column) -> Column:
    """ISO week number (reference uses ``d.isocalendar()`` at ETL/etl.py:131;
    Spark's ``weekofyear`` is already ISO-8601)."""
    return F.weekofyear(d).cast("int")


def iso_weekday(d: Column) -> Column:
    """ISO weekday 1=Monday..7=Sunday (reference ETL/etl.py:131).

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday; remap.
    """
    return ((F.dayofweek(d) + 5) % 7 + 1).cast("int")


def parse_date_multi(s: Column) -> Column:
    """Multi-format tolerant date parse (reference ETL/validation.py:89-103).

    Accepts EXACTLY the reference's four formats, in its try-order:
      1. ``yyyy-MM-dd``
      2. ``yyyy/MM/dd``
      3. ISO datetime — anything before a literal ``T`` that parses as (1)
      4. 8-digit ``yyyyMMdd``
    Anything else (notably ``dd-MM-yyyy`` and ``Mon dd, yyyy`` — injected by
    the dirty-data generator, generate_invalid.py:303-309) yields NULL, which
    the validator turns into a ``bad_date_format`` rejection (V12).

    NB ``try_to_date`` (not ``to_date``) so unparseable input is NULL, not an
    ANSI error.
    """
    return F.coalesce(
        F.try_to_date(s, "yyyy-MM-dd"),
        F.try_to_date(s, "yyyy/MM/dd"),
        F.when(
            s.contains("T"),
            F.try_to_date(F.substring_index(s, "T", 1), "yyyy-MM-dd"),
        ),
        F.when(s.rlike(r"^[0-9]{8}$"), F.try_to_date(s, "yyyyMMdd")),
    )


def calendar_attrs(d: Column) -> dict[str, Column]:
    """Full dim_date attribute set (reference ETL/etl.py:122-144)."""
    return {
        "date_id": date_id(d),
        "full_date": d.cast("date"),
        "year": F.year(d).cast("int"),
        "month": F.month(d).cast("int"),
        "day": F.dayofmonth(d).cast("int"),
        "week": iso_week(d),
        "weekday": iso_weekday(d),
    }
