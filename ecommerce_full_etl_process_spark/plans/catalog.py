"""Registry mapping query names → (spark callable, oracle SQL).

This is the single source of truth consumed by ``__spark_entry__``.
Every operator from SURVEY.md §2 that is implemented gets a named entry;
oracle SQL is omitted only for genuinely non-SQL-expressible operators
(the driver then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics

# name -> (callable, oracle_sql | None)
_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "flagship_revenue_by_nation": (
        analytics.flagship_revenue_by_nation,
        analytics.FLAGSHIP_ORACLE,
    ),
    "pricing_summary": (
        analytics.pricing_summary,
        analytics.PRICING_SUMMARY_ORACLE,
    ),
}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
