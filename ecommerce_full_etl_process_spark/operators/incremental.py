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

__all__ = [
    "partial_agg",
    "merge_partials",
    "finalize_aggs",
    "histogram_partial",
    "merge_histogram_partials",
    "quantiles_from_histogram",
    "adaptive_histogram_partial",
    "merge_adaptive_histogram_partials",
    "quantiles_from_adaptive_histogram",
    "distinct_partial",
    "merge_distinct_partials",
    "finalize_distinct",
]

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


# ---------------------------------------------------------------------------
# Mergeable QUANTILE state (fixed-bin histogram) — round 10
# ---------------------------------------------------------------------------
# Exact quantiles are not decomposable (the classic non-monoid), so an
# incrementally-maintained P50/P95 dashboard needs a mergeable sketch.
# A fixed-bin histogram IS a monoid (bin-wise count sum), deterministic
# (the same value lands in the same bin on any engine — no randomized sketch state), and its
# quantile read-out has a hard error bound of one bin width. t-digest /
# KLL trade bins for adaptivity but carry randomized, engine-specific
# state; the fixed grid is what stays ORACLE-CHECKABLE cross-engine.


def histogram_partial(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Aggregate ``df`` into mergeable histogram state per group:
    ``(keys..., bin, cnt)``, sparse (absent bins mean zero). Values are
    clamped into the edge bins so out-of-range rows are counted, not
    lost (they degrade the edge quantiles' error, never correctness of
    the count). NULL values are dropped, matching ``count(value)``
    semantics. Map-side combined: the shuffle carries one row per
    (partition, group, non-empty bin)."""
    if bins < 1:
        raise ValueError(f"histogram_partial: bins must be >= 1 (got {bins})")
    if not float(hi) > float(lo):
        # a zero/negative width would clamp every row into bin 0 and yield
        # a wrong-but-plausible quantile state — fail loudly instead
        raise ValueError(
            f"histogram_partial: hi must exceed lo (got lo={lo!r}, hi={hi!r})"
        )
    w = (float(hi) - float(lo)) / bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("long")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, clamped.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_partials(
    states: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Bin-wise count sum — the histogram monoid. State-sized exchange
    (groups × non-empty bins), independent of how much history the
    state summarizes."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def quantiles_from_histogram(
    state: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
) -> DataFrame:
    """Finalize quantiles from histogram state: per group and q, the
    UPPER EDGE of the first bin whose cumulative count reaches
    ``ceil(q * total)`` — a deterministic type-1-style read-out every
    engine reproduces bit-for-bit (integer bin index → one double
    multiply-add), with error ≤ one bin width by construction. Returns
    ``(keys..., q, q_value)``."""
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / bins
    cum = F.sum("cnt").over(
        Window.partitionBy(*keys).orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    tot = F.sum("cnt").over(Window.partitionBy(*keys))
    c = state.select(*keys, "bin", cum.alias("cum"), tot.alias("tot"))
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    return (
        c.select(*keys, "bin", "cum", "tot", qcol)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("tot")))
        .groupBy(*keys, "q")
        .agg(
            F.round(
                F.lit(float(lo)) + (F.min("bin") + 1) * F.lit(w), 2
            ).alias("q_value")
        )
    )


# ---------------------------------------------------------------------------
# ADAPTIVE mergeable quantile state (width-doubling histogram) — round 11
# ---------------------------------------------------------------------------
# The fixed-grid form above needs an a-priori [lo, hi]: at 100 TB with
# drifting value ranges, out-of-range rows clamp into the edge bins and
# the edge-quantile error degrades silently. The adaptive form keeps the
# anchor ``lo`` fixed but picks each partial's bin WIDTH from its own
# per-group max: width = base_width * 2^d, the smallest power-of-2
# multiple whose grid STRICTLY covers the group's values. Power-of-2
# widths over a shared anchor make coarsening LOSSLESS:
#
#     floor(floor((v - lo)/w) / m) == floor((v - lo)/(m*w))   (integer m)
#
# so merging re-bins every state to the coarsest width present (per
# group) by an exact integer shift — the merged state is bit-identical
# to histogramming all rows at that width in one pass, which is exactly
# what the DuckDB oracle replays. Width selection uses pure comparisons
# over 2^d (d = 0..40 — covers a 10^12× range blow-up), no log2/float
# transcendentals, so both engines pick the same d from the same max.
# Error stays ≤ one (final) bin width; state is (groups × ≤bins) rows.


def _covering_width(
    gmax: Column, gmin: Column, lo: float, bins: int, base_width: float
):
    """Smallest width = base_width * 2^d (d in 0..40) whose ``bins``-bin
    grid anchored at ``lo`` STRICTLY covers the group's span on BOTH
    sides of the anchor (bins*width > gmax-lo and bins*width > lo-gmin,
    so every bin index lies in [-bins, bins-1] with no clamping —
    clamping would break the lossless-coarsening identity). Comparison-
    only: no log2, so the choice is reproducible on any engine. If even
    d=40 (a 10^12× range blow-up over the base grid) can't cover the
    span, raise loudly — the silent alternative is a NULL width that
    clamps every row into bin 0, the wrong-but-plausible state the
    fixed-grid form's validation rejects up front."""
    span = F.lit(float(bins) * float(base_width))
    need = F.greatest(gmax - F.lit(float(lo)), F.lit(float(lo)) - gmin)
    # try_element_at: under ANSI mode plain element_at on the empty
    # filtered sequence throws a cryptic ArrayIndexOutOfBounds before the
    # clear raise below could fire — NULL here, loud message there
    d = F.try_element_at(
        F.filter(
            F.sequence(F.lit(0), F.lit(40)),
            lambda i: span * F.pow(F.lit(2.0), i.cast("double")) > need,
        ),
        F.lit(1),
    )
    d = F.when(d.isNotNull(), d).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "adaptive_histogram_partial: no covering width in "
                    "base_width*2^[0..40] for group span "
                ),
                need.cast("string"),
                F.lit(" — raise base_width or bins"),
            )
        )
    )
    return F.lit(float(base_width)) * F.pow(F.lit(2.0), d.cast("double"))


def adaptive_histogram_partial(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    bins: int,
    base_width: float,
) -> DataFrame:
    """Aggregate ``df`` into width-tagged mergeable histogram state per
    group: ``(keys..., bin, cnt, width)``. No value range is required —
    the width is derived per group from the batch's own max AND min
    (one extra group-cardinality-sized aggregate + a broadcastable join
    back, both keyed identically to the final groupBy). ``lo`` is only
    a shared grid ANCHOR (any fixed point, e.g. 0): values below it get
    negative bin indices rather than clamping — floor division is exact
    for negatives too, so the power-of-2 coarsening identity holds on
    both sides and signed metrics (deltas, offsets, PnL) bin correctly
    (round 12, lifting the round-11 floor-anchor caveat). State is ≤
    2·bins rows per group. NULLs are dropped, matching ``count(value)``
    semantics."""
    if bins < 1:
        raise ValueError(
            f"adaptive_histogram_partial: bins must be >= 1 (got {bins})"
        )
    if not float(base_width) > 0:
        raise ValueError(
            "adaptive_histogram_partial: base_width must be > 0 "
            f"(got {base_width!r})"
        )
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull()).select(*keys, v.alias("_v"))
    widths = rows.groupBy(*keys).agg(
        _covering_width(
            F.max("_v"), F.min("_v"), lo, bins, base_width
        ).alias("width")
    )
    b = F.floor((F.col("_v") - F.lit(float(lo))) / F.col("width")).cast(
        "long"
    )
    return (
        rows.join(widths, keys)
        .groupBy(*keys, b.alias("bin"), "width")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_adaptive_histogram_partials(
    states: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Merge width-tagged histogram states: per group, coarsen every
    state to the LARGEST width present (``bin' = floor(bin / (target /
    width))`` — target/width is an exact power of 2, so the shift is
    exact), then bin-wise count sum. State-sized exchange; widths may
    differ per group (each group's grid tracks its own range)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    from pyspark.sql import Window

    target = F.max("width").over(Window.partitionBy(*keys))
    rebinned = merged.select(
        *keys,
        F.floor(F.col("bin") / (target / F.col("width")))
        .cast("long")
        .alias("bin"),
        target.alias("width"),
        "cnt",
    )
    return rebinned.groupBy(*keys, "bin", "width").agg(
        F.sum("cnt").alias("cnt")
    )


def quantiles_from_adaptive_histogram(
    state: DataFrame,
    keys: list[str],
    lo: float,
    qs: list[float],
) -> DataFrame:
    """Same deterministic type-1-style read-out as
    :func:`quantiles_from_histogram`, but the bin width comes from the
    state itself (constant per group after merge). Returns
    ``(keys..., q, q_value)`` with error ≤ one (group-final) bin
    width."""
    from pyspark.sql import Window

    cum = F.sum("cnt").over(
        Window.partitionBy(*keys).orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    tot = F.sum("cnt").over(Window.partitionBy(*keys))
    c = state.select(
        *keys, "bin", "width", cum.alias("cum"), tot.alias("tot")
    )
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    return (
        c.select(*keys, "bin", "width", "cum", "tot", qcol)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("tot")))
        .groupBy(*keys, "q")
        .agg(
            F.round(
                F.lit(float(lo)) + (F.min("bin") + 1) * F.max("width"), 2
            ).alias("q_value")
        )
    )


# ---------------------------------------------------------------------------
# Mergeable DISTINCT-COUNT state (HLL sketch) — round 10
# ---------------------------------------------------------------------------
# Exact distinct is the other classic non-monoid (merging requires the
# key sets themselves). Spark 3.5+ ships Apache DataSketches HLL as
# first-class aggregates, so distinct-count state becomes a binary
# column maintained per group at O(2^lgK) bytes — mergeable across
# batches with hll_union_agg, estimated at read time. No SQL oracle
# (DuckDB has no DataSketches); evidence is pytest: merge-split
# invariance and a relative-error bound vs exact distinct
# (tests/test_incremental_aggs.py).


def distinct_partial(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Aggregate ``df`` into HLL sketch state per group:
    ``(keys..., sketch)``. lgK=12 → ~2 KiB/group, ~1.6% standard
    error — the dashboard-grade default. The sketch aggregate accepts
    int/long/string/binary only, so other types go in as their Spark
    string rendering — stable within the engine (the identity being
    counted is the rendered value)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(
            F.col(value_col).cast("string"), F.lit(lgk)
        ).alias("sketch")
    )


def merge_distinct_partials(
    states: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Union sketches group-wise (the HLL monoid)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )


def finalize_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """Estimate distinct counts from sketch state."""
    return state.select(
        *keys, F.hll_sketch_estimate("sketch").alias("distinct_est")
    )
