"""Skew mitigation tools for 100 TB-scale joins (SURVEY §4 / BASELINE
north-star: "skewed keys → salting or AQE skew-join").

AQE's skew-join splitting (on in `session.py`) handles most cases at
runtime; explicit salting remains necessary when one side must be
replicated (e.g. a hot dimension key joined from an enormous fact side
where AQE's post-shuffle splitting still leaves a straggler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the big side gets a random salt in
    [0, salt_buckets); the small side is replicated once per salt value via
    an exploded literal range. The join key becomes (key, salt), spreading a
    hot key over ``salt_buckets`` reducers.

    Semantics identical to ``big.join(small, on, how)`` for equi-joins with
    a unique small-side key. Cost: small side × salt_buckets (still tiny),
    one extra column on the big side.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def top_key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — what you run before deciding on salting/broadcast.

    One pass over the input: the total is re-aggregated from the per-key
    counts (cached — they are the report's working set anyway) and joined
    back as a broadcast single row, instead of a second full-table
    count(). No single-partition window: per-key cardinality can itself
    be huge."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows")).cache()
    per_key.count()  # eager: two branches read this concurrently below
    total = per_key.agg(F.sum("n_rows").alias("__total"))
    report = (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("__total"), 6))
        .drop("__total")
        .orderBy(F.desc("n_rows"))
        .limit(top_n)
        # top-N is tiny: materialize it so the per-key working set can be
        # released immediately instead of pinning a full per-key aggregate
        # for the session lifetime
        .localCheckpoint(eager=True)
    )
    per_key.unpersist()
    return report
