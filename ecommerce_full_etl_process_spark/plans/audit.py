"""Run/error audit logs (SURVEY §1.1/§3; reference ETL/etl.py:58-117 and
ETL/scripts/create_db.py:10-42).

The run log is a tiny table updated read-modify-overwrite (the reference's
``UPDATE etl_run_log SET ... WHERE run_id=?``, S6); the error log is
append-only with dense ids assigned ``max_id + row_number``.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import schemas
from ..sources.io import TableStore

RUN_LOG = "etl_run_log"
ERROR_LOG = "etl_error_log"


def ensure_audit_tables(store: TableStore) -> None:
    store.create_if_not_exists(RUN_LOG, schemas.ETL_RUN_LOG)
    store.create_if_not_exists(ERROR_LOG, schemas.ETL_ERROR_LOG)


def start_run(store: TableStore, source_date: date, started_at: datetime) -> int:
    """Open a run-log row with status pre-set 'failed' until finish
    (reference ETL/etl.py:70 — a crash leaves the honest record)."""
    log = store.read(RUN_LOG)
    run_id = (log.agg(F.max("run_id")).collect()[0][0] or 0) + 1
    row = store.spark.createDataFrame(
        [
            (
                run_id,
                started_at.date(),
                source_date,
                "failed",
                started_at,
                None,
                None,
                None,
                None,
                None,
                None,
                None,
                None,
                None,
            )
        ],
        schemas.ETL_RUN_LOG,
    )
    store.append(RUN_LOG, row)
    return run_id


def finish_run(
    store: TableStore,
    run_id: int,
    status: str,
    ended_at: datetime,
    counters: dict[str, int],
    notes: str | None = None,
) -> None:
    """Close the run-log row (reference finish_etl_run, ETL/etl.py:97-117):
    read-modify-overwrite of the small log table."""
    log = store.read(RUN_LOG).cache()
    log.count()  # materialize before overwriting the directory we read from
    updated = (
        log.withColumn(
            "status",
            F.when(F.col("run_id") == run_id, F.lit(status)).otherwise(
                F.col("status")
            ),
        )
        .withColumn(
            "ended_at",
            F.when(F.col("run_id") == run_id, F.lit(ended_at)).otherwise(
                F.col("ended_at")
            ),
        )
        .withColumn(
            "duration_ms",
            F.when(
                F.col("run_id") == run_id,
                (
                    F.unix_millis(F.lit(ended_at))
                    - F.unix_millis(F.col("started_at"))
                ),
            ).otherwise(F.col("duration_ms")),
        )
    )
    for col in (
        "rows_dim_user_inserted",
        "rows_dim_product_inserted",
        "rows_fact_transactions_inserted",
        "rows_fact_stock_history_inserted",
        "errors",
        "warnings",
    ):
        updated = updated.withColumn(
            col,
            F.when(
                F.col("run_id") == run_id,
                F.lit(counters.get(col)).cast("long"),
            ).otherwise(F.col(col)),
        )
    if notes is not None:
        updated = updated.withColumn(
            "notes",
            F.when(F.col("run_id") == run_id, F.lit(notes)).otherwise(
                F.col("notes")
            ),
        )
    store.overwrite(RUN_LOG, updated)


def append_errors(
    store: TableStore,
    run_id: int,
    error_rows: DataFrame,
    table_name_by_entity: dict[str, str] | None = None,
) -> int:
    """Append exploded validation/load errors.

    ``error_rows``: (entity, record_id, error_type, message, severity).
    Returns the number appended. Ids are dense ``max_id + row_number``.
    """
    table_name_by_entity = table_name_by_entity or {
        "user": "users",
        "product": "products",
        "transaction": "transactions",
        "date": "dim_date",
    }
    log = store.read(ERROR_LOG)
    max_id = log.agg(F.max("error_id")).collect()[0][0] or 0

    mapping = F.create_map(
        *[F.lit(x) for kv in table_name_by_entity.items() for x in kv]
    )
    w = Window.orderBy("entity", "record_id", "error_type")
    rows = (
        error_rows.withColumn("error_id", F.row_number().over(w) + F.lit(max_id))
        .withColumn("run_id", F.lit(run_id).cast("long"))
        .withColumn("table_name", mapping[F.col("entity")])
        .withColumn("created_at", F.current_timestamp())
        .select([f.name for f in schemas.ETL_ERROR_LOG.fields])
    )
    n = rows.count()
    if n:
        store.append(ERROR_LOG, rows)
    return n


def run_error_counts(store: TableStore, run_id: int) -> tuple[int, int]:
    """Recount errors/warnings from the log (the reference recounts from the
    DB at ETL/etl.py:522-530 because its in-memory counters drift)."""
    log = store.read(ERROR_LOG).where(F.col("run_id") == run_id)
    by_sev = {
        r["severity"]: r["cnt"]
        for r in log.groupBy("severity").agg(F.count("*").alias("cnt")).collect()
    }
    return by_sev.get("error", 0), by_sev.get("warning", 0)
