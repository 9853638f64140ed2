"""Incremental aggregate maintenance (materialized-view refresh).

Beyond-reference operator family: the reference recomputes every report
aggregate from the full fact table on each run (its report queries
re-scan the OLAP star per invocation). At 100 TB that is the single
biggest avoidable cost in a daily pipeline — the day's delta is ~1/1000
of history, yet a naive refresh pays the full scan.

The fix is the classic decomposable-aggregate (commutative-monoid)
contract: keep a PARTIAL-aggregate state table (count / sum / min / max
per group — every one mergeable), and refresh by aggregating ONLY the
new batch and merging the two states group-wise. Derived metrics that
are not themselves mergeable (avg = sum/count) are computed at
finalization from the merged partials, never maintained directly.
Refresh cost is O(batch + |state|) regardless of history size; the
merge is one union + one map-side-combined groupBy on the (small,
group-cardinality-sized) state frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_agg", "merge_partials", "finalize_aggs"]

#: partial-state columns maintained per (group, measure). All four are
#: commutative + associative, so any merge order/tree gives one answer.
_PARTIAL_SUFFIXES = ("cnt", "sum", "min", "max")


def partial_agg(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate ``df`` to mergeable partial state per ``keys`` group:
    ``(cnt, sum, min, max)`` of ``value_col``. This runs map-side
    combined (hash partial aggregate before the exchange), so the
    shuffle carries one row per (partition, group), not per input row.
    """
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("sum"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )


def merge_partials(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial-state frames group-wise. Groups present in only
    one state pass through unchanged (union semantics); groups present
    in several combine by the measure's own monoid (sum of counts/sums,
    min of mins, max of maxes). The inputs are state-sized — group
    cardinality, not fact cardinality — so this exchange is tiny no
    matter how much history the state summarizes.
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finalize_aggs(state: DataFrame, round_to: int = 2) -> DataFrame:
    """Produce consumer-facing metrics from partial state: the mergeable
    four plus avg derived as sum/cnt (the canonical non-mergeable metric
    that must be finalized, never maintained). Rounding pins the float
    representation for cross-engine comparison."""

    def r(c: Column) -> Column:
        return F.round(c, round_to)

    return state.select(
        *[c for c in state.columns if c not in _PARTIAL_SUFFIXES],
        F.col("cnt").alias("n_rows"),
        r(F.col("sum")).alias("value_sum"),
        r(F.col("sum") / F.col("cnt")).alias("value_avg"),
        r(F.col("min")).alias("value_min"),
        r(F.col("max")).alias("value_max"),
    )
