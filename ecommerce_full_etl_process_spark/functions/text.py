"""Text/normalization column expressions (SURVEY §2.8, F8-F10, P4-P5)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference ETL/validation.py:19 — anchored email shape check
EMAIL_PATTERN = r"^[^\s@]+@[^\s@]+\.[^\s@]+$"


def is_blank(c: Column) -> Column:
    """NULL or whitespace-only (reference ``not name or not name.strip()``,
    ETL/validation.py:38,67)."""
    return c.isNull() | (F.trim(c) == F.lit(""))


def is_valid_email(c: Column) -> Column:
    """Email shape predicate (reference ETL/validation.py:19,43)."""
    return c.isNotNull() & c.rlike(EMAIL_PATTERN)


def norm_lower(c: Column) -> Column:
    """Case normalization applied to payment_type/status on the valid path
    (reference ETL/validation.py:167-172)."""
    return F.lower(c)
