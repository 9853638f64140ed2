"""Join operators (SURVEY §2.4, J1-J7).

The reference implements joins as per-row correlated SQLite lookups; here
each is a set-based DataFrame join. Small dimension sides are broadcast so
the big (fact) side never shuffles for a lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def semi_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J1: FK-existence (reference set probe, ETL/validation.py:116,121)."""
    return df.join(F.broadcast(keys), on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J4/J6: complement of J1 — orphans / not-yet-loaded rows."""
    return df.join(F.broadcast(keys), on, "left_anti")


def join_current_version(
    facts: DataFrame, dim: DataFrame, natural_key: str, select_cols: list[str]
) -> DataFrame:
    """J2: equi lookup against the dimension's current version
    (reference ``WHERE <nk>=? AND current_flag=1``, ETL/etl.py:271-275)."""
    current = dim.where(F.col("current_flag")).select(natural_key, *select_cols)
    return facts.join(F.broadcast(current), natural_key, "left")


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    natural_key: str,
    fact_date_col: str,
    select_cols: list[str],
    defensive_unique: bool = False,
) -> DataFrame:
    """J3: point-in-time (as-of) surrogate-key resolution.

    Reference (ETL/etl.py:326-352): ``start_date <= d AND (end_date IS NULL
    OR end_date >= d) ORDER BY start_date DESC LIMIT 1``.

    SCD2 validity intervals are disjoint per natural key, so the range match
    is unique and no LIMIT-1 tie-break is needed; ``defensive_unique=True``
    adds the row_number guard anyway (for corrupted dims).

    Physical plan: broadcast hash join on the equi key with the interval
    predicate as post-join filter — the scalable shape for a big fact vs a
    dimensional right side.
    """
    d = F.col(fact_date_col).cast("date")
    cond = (
        (facts[natural_key] == dim[natural_key])
        & (dim["start_date"] <= d)
        & (F.coalesce(dim["end_date"], F.lit("9999-12-31").cast("date")) >= d)
    )
    out = facts.join(F.broadcast(dim), cond, "left").select(
        *[facts[c] for c in facts.columns],
        *[dim[c] for c in select_cols],
        *([dim["start_date"].alias("__asof_start")] if defensive_unique else []),
    )
    if defensive_unique:
        w = Window.partitionBy(
            *[facts[c] for c in facts.columns]  # full-row identity
        ).orderBy(F.desc("__asof_start"))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__asof_start")
        )
    return out


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, descending: bool = True
) -> DataFrame:
    """O2: greatest-per-group (reference ``ORDER BY x DESC LIMIT 1`` per key,
    ETL/etl.py:285-291) via a row_number window."""
    order = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*key_cols).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def fuzzy_match_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    block,
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution fuzzy join: match each left record to its best
    right record by edit distance, with a blocking key so the candidate
    space is per-block, never all-pairs.

    ``block`` is a Column→Column function deriving the blocking key from
    the text (e.g. a stable suffix, a phonetic code, a sorted-token
    prefix). Returns (left_id, right_id, distance) keeping, per left row,
    the candidate with the lexicographically smallest (distance,
    right_id) among those within ``max_distance``; left rows whose block
    contains no candidate within the threshold are absent (inner
    semantics — anti-join the result to list non-matches).

    Scale shape: one shuffle per side on the block key, then a hash join;
    Levenshtein runs JVM-side only WITHIN blocks, so cost is
    Σ |L_b|·|R_b| — the block function choice bounds the quadratic term
    exactly like an LSH bucket. The best-match reduction is a single
    struct-min groupBy (map-side combined), not a window sort. A hot
    block is AQE-skew-splittable because the join is a plain equi join.
    """
    l = left.select(
        F.col(left_id),
        F.col(left_text).alias("__lt"),
        block(F.col(left_text)).alias("__blk"),
    )
    r = right.select(
        F.col(right_id),
        F.col(right_text).alias("__rt"),
        block(F.col(right_text)).alias("__blk"),
    )
    cand = (
        l.join(r, "__blk")
        .withColumn("distance", F.levenshtein("__lt", "__rt"))
        .where(F.col("distance") <= max_distance)
    )
    best = cand.groupBy(left_id).agg(
        F.min(F.struct("distance", right_id)).alias("__m")
    )
    return best.select(
        left_id,
        F.col(f"__m.{right_id}").alias(right_id),
        F.col("__m.distance").alias("distance"),
    )
