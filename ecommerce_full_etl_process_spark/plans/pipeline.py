"""The daily incremental ETL pipeline — entry point 1 of the reference
(``ETL/etl.py:402-559``), re-expressed as one Spark job (SURVEY §3).

Stage order is preserved (extract → validate → dims → facts → audit), and so
is the reference's per-step commit granularity: each table write lands before
the next stage starts, so a failure leaves prior stages durable and the run
log row honestly 'failed' (status is pre-set at start, flipped at finish).

Input contract: the OLTP slice for ``source_date`` (users, products, and that
day's transactions) as DataFrames — the analogue of the reference's
``fetch_oltp_*`` day-filtered scans (S1-S3). With date-partitioned parquet
the day filter is partition pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import facts as facts_op
from ..operators import snapshot as snapshot_op
from ..operators import validation as validation_op
from ..operators.dims import missing_dim_date_rows
from ..operators.scd2 import PRODUCT_SCD2, USER_SCD2, scd2_merge
from ..sources.io import TableStore
from . import audit

DIM_USER = "dim_user"
DIM_PRODUCT = "dim_product"
DIM_DATE = "dim_date"
FACT_TRANSACTIONS = "fact_transactions"
FACT_STOCK_HISTORY = "fact_stock_history"


@dataclass
class RunSummary:
    run_id: int
    status: str = "failed"
    counters: dict[str, int] = field(default_factory=dict)
    error_count: int = 0
    warning_count: int = 0


def bootstrap_warehouse(store: TableStore) -> None:
    """S7: CREATE TABLE IF NOT EXISTS for the star schema + audit tables."""
    store.create_if_not_exists(DIM_USER, schemas.DIM_USER)
    store.create_if_not_exists(DIM_PRODUCT, schemas.DIM_PRODUCT)
    store.create_if_not_exists(DIM_DATE, schemas.DIM_DATE)
    store.create_if_not_exists(FACT_TRANSACTIONS, schemas.FACT_TRANSACTIONS)
    store.create_if_not_exists(FACT_STOCK_HISTORY, schemas.FACT_STOCK_HISTORY)
    audit.ensure_audit_tables(store)


def run(
    spark: SparkSession,
    store: TableStore,
    source_date: date,
    users: DataFrame,
    products: DataFrame,
    transactions: DataFrame,
) -> RunSummary:
    """Run the full pipeline for one source date. Returns the run summary
    (the reference's printed report + run-log row, ETL/etl.py:500-559)."""
    started = datetime.now()
    bootstrap_warehouse(store)
    run_id = audit.start_run(store, source_date, started)
    summary = RunSummary(run_id=run_id)

    scratch: list[DataFrame] = []  # caches to release when the run ends
    # operator-result cleanups (scd2/fact merges cache internally): released
    # early on the success path, but registered here too so a failure after
    # the merge doesn't leak them across a soak session (unpersist is
    # idempotent, so the double release on success is a no-op)
    cleanups: list = []
    try:
        # -- validate (stage 6; rule DAG: users/products feed transactions) --
        results = validation_op.validate_all(users, products, transactions)
        valid_users = results["user"].valid.cache()
        valid_products = results["product"].valid.cache()
        valid_tx = results["transaction"].valid.cache()
        scratch += [valid_users, valid_products, valid_tx]

        # -- seed dim_date for run date + tx dates (stage 4) ---------------
        dim_date = store.read(DIM_DATE)
        needed = valid_tx.select(F.col("date").alias("d")).union(
            spark.createDataFrame([(source_date,)], "d date")
        )
        new_dates = missing_dim_date_rows(spark, dim_date, needed)
        store.append(DIM_DATE, new_dates)

        # -- SCD2 dims (stage 7) -------------------------------------------
        incoming_users = valid_users.select(
            "user_id",
            "name",
            "email",
            F.to_date("join_date", "yyyy-MM-dd").alias("join_date"),
        )
        u_res = scd2_merge(
            store.read(DIM_USER), incoming_users, USER_SCD2, source_date
        )
        cleanups.append(u_res.unpersist)
        store.overwrite(DIM_USER, u_res.dim)
        u_res.unpersist()  # dim landed; drop the merge's internal caches

        incoming_products = valid_products.select(
            "product_id", "name", "category", "price"
        )
        p_res = scd2_merge(
            store.read(DIM_PRODUCT), incoming_products, PRODUCT_SCD2, source_date
        )
        cleanups.append(p_res.unpersist)
        store.overwrite(DIM_PRODUCT, p_res.dim)
        p_res.unpersist()

        # -- fact_stock_history (stage 8a, compute) ------------------------
        sd_id = int(source_date.strftime("%Y%m%d"))
        snap = snapshot_op.stock_history_delta(
            valid_products,
            store.read(DIM_PRODUCT),
            store.read(FACT_STOCK_HISTORY),
            sd_id,
        )
        snap_rows = snap.appended.cache()
        scratch.append(snap_rows)
        n_stock = snap_rows.count()

        # -- fact_transactions (stage 8b, compute) -------------------------
        fact_res = facts_op.load_fact_transactions(
            valid_tx,
            store.read(DIM_USER),
            store.read(DIM_PRODUCT),
            store.read(FACT_TRANSACTIONS),
        )
        cleanups.append(fact_res.unpersist)
        fact_rows = fact_res.facts.cache()
        scratch.append(fact_rows)
        n_fact = fact_rows.count()

        # -- error log (validation + load-stage orphans) -------------------
        # Written BEFORE the fact appends: the orphan/dupe frames' lineage
        # scans the pre-append fact tables, and a parquet append into a
        # directory invalidates every cached plan reading that path —
        # evaluating the log afterwards would rescan mutated state.
        err_frames = [
            results["user"].error_records("user", F.col("user_id")),
            results["product"].error_records("product", F.col("product_id")),
            results["transaction"].error_records(
                "transaction", F.col("transaction_id")
            ),
            snap.orphans.select(
                F.lit("product").alias("entity"),
                F.col("product_id").cast("string").alias("record_id"),
                F.lit("orphan_product").alias("error_type"),
                F.format_string(
                    "Stock snapshot: product %s has no current dim row",
                    F.col("product_id"),
                ).alias("message"),
                F.lit("warning").alias("severity"),
            ),
            fact_res.orphan_users.select(
                F.lit("transaction").alias("entity"),
                F.col("transaction_id").cast("string").alias("record_id"),
                F.lit("orphan_user").alias("error_type"),
                F.format_string(
                    "Fact load: no dim_user version covers transaction %s",
                    F.col("transaction_id"),
                ).alias("message"),
                F.lit("warning").alias("severity"),
            ),
            fact_res.orphan_products.select(
                F.lit("transaction").alias("entity"),
                F.col("transaction_id").cast("string").alias("record_id"),
                F.lit("orphan_product").alias("error_type"),
                F.format_string(
                    "Fact load: no dim_product version covers transaction %s",
                    F.col("transaction_id"),
                ).alias("message"),
                F.lit("warning").alias("severity"),
            ),
            # reference logs every composite-PK duplicate skip via its
            # IntegrityError handler (ETL/etl.py:375-378)
            fact_res.dupe_rows.select(
                F.lit("transaction").alias("entity"),
                F.col("transaction_id").cast("string").alias("record_id"),
                F.lit("duplicate_tx_id").alias("error_type"),
                F.format_string(
                    "Fact load: duplicate (transaction %s, product_sk %s) line skipped",
                    F.col("transaction_id"),
                    F.col("product_sk"),
                ).alias("message"),
                F.lit("warning").alias("severity"),
            ),
        ]
        all_errors = err_frames[0]
        for f in err_frames[1:]:
            all_errors = all_errors.unionByName(f)
        audit.append_errors(store, run_id, all_errors)

        # -- land the facts (the reference's per-step commits) -------------
        store.append(FACT_STOCK_HISTORY, snap_rows)
        store.append(FACT_TRANSACTIONS, fact_rows, partition_by=["date_id"])
        fact_res.unpersist()

        # -- summarize + close run (stages 9-10) ---------------------------
        n_err, n_warn = audit.run_error_counts(store, run_id)
        summary.counters = {
            # reference run log stores only brand-new natural keys (the
            # upsert's current-is-None branch, ETL/etl.py:461-462); new
            # versions of changed keys count as 'updated', not 'inserted'
            "rows_dim_user_inserted": u_res.n_inserted,
            "rows_dim_product_inserted": p_res.n_inserted,
            "rows_fact_transactions_inserted": n_fact,
            "rows_fact_stock_history_inserted": n_stock,
            "errors": n_err,
            "warnings": n_warn,
        }
        summary.error_count, summary.warning_count = n_err, n_warn
        summary.status = "success"
        return summary
    finally:
        audit.finish_run(
            store,
            run_id,
            summary.status,
            datetime.now(),
            summary.counters,
        )
        for df in scratch:  # no cached-generation leak across soak runs
            df.unpersist()
        for release in cleanups:  # idempotent; covers mid-run failures
            release()
