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

Scale: one broadcast-able join (incoming vs current dim) + one window for sk
assignment. The sk window is a single-partition sort over only the NEW
version rows of the batch (≪ dim size, ≪ fact size); the dim rewrite itself
is a union of narrow scans, shuffle-free. At 100 TB fact scale the dims this
operator rewrites remain millions of rows — comfortably one executor's work;
if a dim ever outgrew that, the same algorithm holds with the sk window
partitioned by a key-hash bucket and offset by bucket counts.
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
    w = Window.orderBy(F.col(nk))
    inserted = (
        to_insert.withColumn(sk, F.row_number().over(w) + F.lit(max_sk))
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
    )
