"""Change-detected snapshot append (SURVEY §2.7) — fact_stock_history.

Reference ``load_fact_stock_history`` (ETL/etl.py:265-305): per valid
product, look up the latest recorded stock and append a new row only if the
stock changed or no history exists; products missing from the dim are logged
``orphan_product`` and skipped.

Spark shape: greatest-per-group window over history + one broadcast join —
no per-row probes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import join_current_version, latest_per_key


@dataclass
class SnapshotResult:
    appended: DataFrame  # new fact_stock_history rows
    orphans: DataFrame  # valid products with no current dim row


def stock_history_delta(
    valid_products: DataFrame,
    dim_product: DataFrame,
    fact_stock_history: DataFrame,
    date_id: int,
) -> SnapshotResult:
    """Compute the rows to append for this run's stock snapshot."""
    with_sk = join_current_version(
        valid_products.select("product_id", "stock"),
        dim_product,
        "product_id",
        ["product_sk"],
    )
    orphans = with_sk.where(F.col("product_sk").isNull()).select("product_id")
    resolved = with_sk.where(F.col("product_sk").isNotNull())

    latest = latest_per_key(
        fact_stock_history.select("product_sk", "date_id", "stock"),
        ["product_sk"],
        "date_id",
    ).select("product_sk", F.col("stock").alias("__last_stock"))

    changed = (
        resolved.join(latest, "product_sk", "left")
        .where(
            F.col("__last_stock").isNull()
            | (F.col("stock") != F.col("__last_stock"))
        )
        .select(
            "product_sk",
            F.lit(date_id).cast("int").alias("date_id"),
            F.col("stock").cast("int").alias("stock"),
            F.current_timestamp().alias("load_date"),
        )
    )
    return SnapshotResult(appended=changed, orphans=orphans)
