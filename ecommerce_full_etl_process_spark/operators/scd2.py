"""SCD Type 2 merge — the reference's centerpiece operator (SURVEY §2.6).

The reference does per-row probe/UPDATE/INSERT loops
(``ETL/etl.py:170-263``); here it is one declarative DataFrame merge:

    incoming ⟕ current(dim) on natural key → classify new|changed|unchanged
    closed    = current ⋉ changed, end_date = eff - 1 day, current_flag = F
    new_rows  = (new ∪ changed) + surrogate keys (max_sk + row_number)
    result    = history ∪ untouched_current ∪ closed ∪ new_rows

Semantic parity notes (SURVEY §7.4):
- change detection is EXACT comparison on tracked attrs (incl. float price —
  reference ``price != old_price`` at ETL/etl.py:243); null-safe.
- users open brand-new history at ``join_date``; products at the run date
  (the asymmetry at ETL/etl.py:183-189 vs 231-237) — callers pass
  ``new_key_start_col``.
- surrogate keys are dense and deterministic: ``max(existing_sk) +
  row_number() over (order by natural key)`` — replicating AUTOINCREMENT
  assigned in the reference's ``ORDER BY <natural key>`` iteration order.

Scale: one broadcast-able join (incoming vs current dim) + sk assignment.
Surrogate keys are assigned with a RANGE-BUCKETED window: new-version rows
are range-partitioned on the natural key, ranked inside each bucket, and
offset by the running count of earlier buckets — the exact global
ORDER BY nk row_number result with no single-partition sort, so a
pathological billion-row dim batch still spreads over the cluster. The dim
rewrite itself is a union of narrow scans, shuffle-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Scd2Config:
    natural_key: str
    surrogate_key: str
    tracked_cols: tuple[str, ...]  # attrs whose change opens a new version
    carried_cols: tuple[str, ...] = ()  # attrs copied but not change-tracked
    # column (on incoming) providing start_date for brand-new keys;
    # None → the effective date (products). Users pass "join_date".
    new_key_start_col: str | None = None


USER_SCD2 = Scd2Config(
    natural_key="user_id",
    surrogate_key="user_sk",
    tracked_cols=("name", "email"),  # reference ETL/etl.py:193-195
    carried_cols=("join_date",),
    new_key_start_col="join_date",  # history begins at join (ETL/etl.py:183-189)
)

PRODUCT_SCD2 = Scd2Config(
    natural_key="product_id",
    surrogate_key="product_sk",
    tracked_cols=("name", "category", "price"),  # reference ETL/etl.py:241-243
    carried_cols=(),
    new_key_start_col=None,  # history begins at run date (ETL/etl.py:231-237)
)


@dataclass
class Scd2Result:
    dim: DataFrame  # the full post-merge dimension
    n_inserted: int  # brand-new natural keys
    n_updated: int  # changed keys (old version closed + new opened)
    n_unchanged: int
    _cached: tuple[DataFrame, ...] = ()

    def unpersist(self) -> None:
        """Release the merge's internal caches. Call after ``dim`` has been
        materialized (written/collected); otherwise each merge leaks a
        cached dimension generation across a multi-day soak run.

        NB ``DataFrame.unpersist()`` clears CacheManager entries only; any
        local-checkpoint RDD blocks among ``_cached`` stay until the
        ContextCleaner reclaims them on GC of the DataFrame — that is the
        normal lifecycle for checkpointed frames, not a leak."""
        for df in self._cached:
            df.unpersist()


def scd2_merge(
    dim: DataFrame,
    incoming: DataFrame,
    config: Scd2Config,
    effective_date: date,
) -> Scd2Result:
    """Merge one batch of incoming records into an SCD2 dimension.

    ``dim`` must have config.surrogate_key, config.natural_key, tracked +
    carried cols, start_date/end_date/current_flag. ``incoming`` must have
    natural key + tracked + carried cols (one row per natural key).
    """
    nk, sk = config.natural_key, config.surrogate_key
    attrs = list(config.tracked_cols) + list(config.carried_cols)
    eff = F.lit(effective_date).cast("date")

    dim.cache()
    current = dim.where(F.col("current_flag"))
    not_current = dim.where(~F.col("current_flag"))

    cur_cmp = current.select(
        F.col(nk),
        F.lit(True).alias("__exists"),
        *[F.col(c).alias(f"__cur_{c}") for c in config.tracked_cols],
    )
    joined = incoming.join(cur_cmp, nk, "left").cache()

    changed_pred = F.lit(False)
    for c in config.tracked_cols:
        changed_pred = changed_pred | ~F.col(c).eqNullSafe(F.col(f"__cur_{c}"))

    new_keys = joined.where(F.col("__exists").isNull())
    changed = joined.where(F.col("__exists").isNotNull() & changed_pred)

    # one aggregate pass for all three classification counters (instead of
    # three separate count() jobs over the cached join)
    counts = joined.agg(
        F.sum(F.col("__exists").isNull().cast("long")).alias("n_new"),
        F.sum((F.col("__exists").isNotNull() & changed_pred).cast("long")).alias(
            "n_changed"
        ),
        F.sum(
            (F.col("__exists").isNotNull() & ~changed_pred).cast("long")
        ).alias("n_unchanged"),
    ).collect()[0]
    n_inserted = counts["n_new"] or 0
    n_updated = counts["n_changed"] or 0
    unchanged_cnt = counts["n_unchanged"] or 0

    # close out the old versions of changed keys (end = eff - 1 day)
    changed_key_set = changed.select(nk)
    closed = (
        current.join(changed_key_set, nk, "left_semi")
        .withColumn("end_date", F.date_sub(eff, 1))
        .withColumn("current_flag", F.lit(False))
    )
    untouched = current.join(changed_key_set, nk, "left_anti")

    # build the new version rows (brand-new ∪ changed), sk-ordered by nk
    if config.new_key_start_col is not None:
        new_start = F.col(config.new_key_start_col).cast("date")
    else:
        new_start = eff
    new_rows = new_keys.select(nk, *attrs).withColumn("start_date", new_start)
    changed_rows = changed.select(nk, *attrs).withColumn("start_date", eff)
    to_insert = new_rows.unionByName(changed_rows)

    max_sk = (dim.agg(F.max(sk)).collect()[0][0]) or 0

    # Bucketed surrogate-key assignment: range-partition the new-version
    # rows on the natural key (bucket i's keys all sort before bucket
    # i+1's), rank within each bucket, then add the running count of
    # earlier buckets. Dense + deterministic and identical to a global
    # ORDER BY nk row_number — without the single-partition sort a global
    # window would plan.
    n_buckets = max(
        1, to_insert.sparkSession.sparkContext.defaultParallelism
    )
    # localCheckpoint (not cache): the offsets collected below are only
    # valid for THIS materialization's bucket ids. A cache can be silently
    # recomputed (executor loss) with re-sampled range boundaries, pairing
    # stale offsets with new buckets → duplicate/skipped sks. Checkpoint
    # truncates lineage, so a lost partition fails the job instead of
    # silently corrupting the dimension.
    ranged = (
        to_insert.repartitionByRange(n_buckets, F.col(nk))
        .withColumn("__bucket", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    bucket_counts = {
        r["__bucket"]: r["n"]
        for r in ranged.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, running = [], 0
    for b in range(n_buckets):
        offsets.append(running)
        running += bucket_counts.get(b, 0)
    w = Window.partitionBy("__bucket").orderBy(F.col(nk))
    sk_expr = (
        F.row_number().over(w)
        + F.element_at(F.lit(offsets), F.col("__bucket") + 1)
        + F.lit(max_sk)
    ).cast("long")
    inserted = (
        ranged.withColumn(sk, sk_expr)
        .drop("__bucket")
        .withColumn("end_date", F.lit(None).cast("date"))
        .withColumn("current_flag", F.lit(True))
    )

    out_cols = dim.columns
    result = (
        not_current.select(*out_cols)
        .unionByName(untouched.select(*out_cols))
        .unionByName(closed.select(*out_cols))
        .unionByName(inserted.select(*out_cols))
    )
    return Scd2Result(
        dim=result,
        n_inserted=n_inserted,
        n_updated=n_updated,
        n_unchanged=unchanged_cnt,
        _cached=(dim, joined, ranged),
    )
