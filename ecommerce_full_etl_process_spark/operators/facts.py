"""Fact-transactions load (SURVEY §2.4 J3/J4, §2.5 A7; reference
``load_fact_transactions``, ETL/etl.py:307-381).

Steps, all set-based:
1. As-of resolve user_sk / product_sk at the transaction date (J3).
   Unresolvable rows are logged as orphans and skipped (reference 335-342).
2. Re-run idempotence: anti-join incoming against transaction_ids already in
   the fact table — keyed on transaction_id ALONE, exactly like the
   reference's prefetch set (ETL/etl.py:308-311): a re-run skips every line
   of a seen transaction.
3. In-batch composite-PK dedup: first row per (transaction_id, product_sk)
   wins; later ones are dropped (the reference's PK + IntegrityError
   fallback, OLAP/scripts/create_db.py:59 + ETL/etl.py:375-378).

Scale: the two dim sides are broadcast; the only shuffles of the fact batch
are the composite-key dedup window and (if the existing-ids side is large)
the anti join — both keyed on transaction_id, so partitioning the fact table
by a transaction_id hash bucket would co-locate them at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import date_id
from .joins import asof_join


@dataclass
class FactLoadResult:
    facts: DataFrame  # rows to append to fact_transactions
    orphan_users: DataFrame  # tx rows with unresolvable user_sk
    orphan_products: DataFrame  # tx rows with unresolvable product_sk
    dupe_rows: DataFrame  # lines dropped by in-batch composite-PK dedup
    n_skipped_rerun: int  # lines skipped because their tx id was loaded before
    n_skipped_dupe: int  # lines dropped by in-batch composite-PK dedup
    _cached: tuple[DataFrame, ...] = ()

    def unpersist(self) -> None:
        """Release the load's internal caches once facts + log rows have
        been materialized (same soak-run hygiene as Scd2Result)."""
        for df in self._cached:
            df.unpersist()


def load_fact_transactions(
    valid_tx: DataFrame,
    dim_user: DataFrame,
    dim_product: DataFrame,
    existing_fact: DataFrame,
    order_col: str | None = None,
) -> FactLoadResult:
    """``valid_tx``: normalized valid transactions (date already DateType).

    ``order_col``: batch-order column for the first-wins dedup; defaults to
    an input-position surrogate (see validation.validate_transactions).
    """
    tx = valid_tx
    if order_col is None:
        order_col = "__batch_pos"
        tx = tx.withColumn(order_col, F.monotonically_increasing_id())

    # J3: as-of surrogate-key resolution at the transaction date
    tx = asof_join(
        tx,
        dim_user.select("user_id", "user_sk", "start_date", "end_date"),
        "user_id",
        "date",
        ["user_sk"],
    )
    tx = asof_join(
        tx,
        dim_product.select("product_id", "product_sk", "start_date", "end_date"),
        "product_id",
        "date",
        ["product_sk"],
    )

    tx = tx.cache()  # one as-of resolution pass serves orphans + load
    orphan_users = tx.where(F.col("user_sk").isNull())
    orphan_products = tx.where(
        F.col("user_sk").isNotNull() & F.col("product_sk").isNull()
    )
    resolved = tx.where(F.col("user_sk").isNotNull() & F.col("product_sk").isNotNull())

    # J4 layer 1: re-run idempotence on transaction_id alone
    existing_ids = existing_fact.select("transaction_id").distinct()
    fresh = resolved.join(existing_ids, "transaction_id", "left_anti").cache()

    # J4 layer 2 / A7: in-batch first-wins dedup on the composite PK.
    # Dropped rows are returned so the pipeline can log each as a
    # 'duplicate_tx_id' warning — the reference's IntegrityError handler
    # logs every such skip (ETL/etl.py:375-378).
    w = Window.partitionBy("transaction_id", "product_sk").orderBy(F.col(order_col))
    ranked = fresh.withColumn("__rn", F.row_number().over(w)).cache()
    deduped = ranked.where(F.col("__rn") == 1).drop("__rn")
    dupe_rows = ranked.where(F.col("__rn") > 1).drop("__rn")
    n_skipped_rerun = resolved.count() - fresh.count()
    n_skipped_dupe = fresh.count() - deduped.count()

    facts = deduped.select(
        F.col("transaction_id").cast("long"),
        F.col("user_sk").cast("long"),
        F.col("product_sk").cast("long"),
        date_id(F.col("date")).alias("date_id"),
        F.col("quantity").cast("int"),
        # OLTP `price` is the line total; renamed `total` in the fact
        # (reference OLAP/scripts/create_db.py:55, SURVEY §1.3)
        F.col("price").cast("double").alias("total"),
        F.col("payment_type"),
        F.col("status"),
        F.current_timestamp().alias("load_date"),
    )
    return FactLoadResult(
        facts=facts,
        orphan_users=orphan_users.select("transaction_id", "user_id"),
        orphan_products=orphan_products.select("transaction_id", "product_id"),
        dupe_rows=dupe_rows.select("transaction_id", "product_sk"),
        n_skipped_rerun=n_skipped_rerun,
        n_skipped_dupe=n_skipped_dupe,
        _cached=(tx, fresh, ranked),
    )
