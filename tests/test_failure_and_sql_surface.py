"""Failure-path audit honesty + the spark.sql query surface."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.plans import pipeline
from ecommerce_full_etl_process_spark.sources.io import TableStore


def test_failed_run_leaves_failed_status(spark, tmp_path, monkeypatch):
    """A crash mid-pipeline must leave the run-log row status='failed' with
    an ended_at timestamp (reference pre-sets 'failed' at start and only
    flips on success — ETL/etl.py:70,552-559)."""
    store = TableStore(spark, str(tmp_path / "wh"))
    users = spark.createDataFrame(
        [(1, "Ann", "ann@example.com", "2026-01-01")], schemas.USERS
    )
    products = spark.createDataFrame(
        [(1, "Widget", "Electronics", 10.0, 5)], schemas.PRODUCTS
    )
    tx = spark.createDataFrame(
        [(1, "2026-02-02", 1, 1, 1, 10.0, "visa", "success")],
        schemas.TRANSACTIONS,
    )

    from ecommerce_full_etl_process_spark.plans import pipeline as pl

    def boom(*a, **k):
        raise RuntimeError("injected failure in SCD2 stage")

    monkeypatch.setattr(pl, "scd2_merge", boom)
    with pytest.raises(RuntimeError, match="injected failure"):
        pl.run(spark, store, date(2026, 2, 2), users, products, tx)

    runs = store.read("etl_run_log").collect()
    assert len(runs) == 1
    assert runs[0]["status"] == "failed"
    assert runs[0]["ended_at"] is not None  # finally-block closed the row


def test_spark_sql_surface_matches_dataframe(spark, sf_dir):
    """The engine's queries are equally runnable through spark.sql over
    registered views — the SQL API surface a reference user would expect."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    sql_result = spark.sql(
        """
        SELECT n_name AS nation, r_name AS region,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS line_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
        """
    )
    from ecommerce_full_etl_process_spark.plans.analytics import (
        flagship_revenue_by_nation,
    )

    df_result = flagship_revenue_by_nation(spark, sf_dir)
    assert sorted(map(tuple, sql_result.collect())) == sorted(
        map(tuple, df_result.select(*sql_result.columns).collect())
    )