"""Warehouse reporting — entry point 2 of the reference (demo.ipynb
analytic cells, SURVEY §3): latest-run lookup, error breakdown, sample
reads, and the orphan QA checks, as reusable functions over a TableStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.io import TableStore


def latest_run(store: TableStore) -> DataFrame:
    """The most recent ETL run (reference demo.ipynb cell 14:
    ``ORDER BY run_id DESC LIMIT 1``)."""
    return store.read("etl_run_log").orderBy(F.desc("run_id")).limit(1)


def error_breakdown(store: TableStore, run_id: int | None = None) -> DataFrame:
    """Per-type/severity error counts, descending (reference demo.ipynb
    cell 16 — the A3 group-by-count query)."""
    log = store.read("etl_error_log")
    if run_id is not None:
        log = log.where(F.col("run_id") == run_id)
    return (
        log.groupBy("error_type", "severity")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "error_type")
    )


def warehouse_row_counts(store: TableStore) -> DataFrame:
    """Table cardinality summary (reference summary queries,
    ETL/etl.py:503-516)."""
    rows = []
    for t in (
        "dim_user",
        "dim_product",
        "dim_date",
        "fact_transactions",
        "fact_stock_history",
        "etl_run_log",
        "etl_error_log",
    ):
        if store.exists(t):
            rows.append((t, store.read(t).count()))
    return store.spark.createDataFrame(rows, "table_name string, n_rows long")


def orphan_checks(store: TableStore) -> DataFrame:
    """The two orphan-sk left-anti QA checks (reference demo.ipynb cell 26
    checks 8-9, J6) — rows must be zero in a healthy warehouse."""
    ft = store.read("fact_transactions")
    du = store.read("dim_user").select("user_sk")
    dp = store.read("dim_product").select("product_sk")
    rows = [
        ("fact_orphan_user_sk", ft.join(du, "user_sk", "left_anti").count()),
        ("fact_orphan_product_sk", ft.join(dp, "product_sk", "left_anti").count()),
    ]
    return store.spark.createDataFrame(rows, "check string, n_bad long")


def current_dim_sample(store: TableStore, dim: str, n: int = 10) -> DataFrame:
    """Current-version sample (reference demo.ipynb cells 18-24 LIMIT n)."""
    return store.read(dim).where(F.col("current_flag")).limit(n)
