"""Fixture twin of the reference's notebook-driven alt workload
(OLTP/main.ipynb cells 18-21): 100 users / 20 products, 300 transaction
lines at status weights [0.7, 0.3] on 2026-02-02, plus 100 dirty records —
a heavier dirty load than demo.ipynb's 30. The pipeline must stay clean:
golden invariants hold, every injected dirty class reconciles with the
error log, and the status mix reflects the skewed weights."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.plans import audit, pipeline
from ecommerce_full_etl_process_spark.sources import generators as G
from ecommerce_full_etl_process_spark.sources.io import TableStore

TODAY = date(2026, 2, 2)


@pytest.fixture(scope="module")
def alt_warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("alt_warehouse"))
    store = TableStore(spark, root)
    dfs, batch = G.generate_oltp(
        spark,
        seed=7,
        n_users=100,
        n_products=20,
        n_transactions=300,
        n_dirty=100,
        today=TODAY,
        status_weights=(0.7, 0.3),
    )
    summary = pipeline.run(
        spark, store, TODAY, dfs["users"], dfs["products"], dfs["transactions"]
    )
    return store, batch, summary


def test_run_survives_heavy_dirty_load(alt_warehouse):
    _, batch, summary = alt_warehouse
    assert summary.status == "success"
    assert sum(batch.dirty_counts.values()) == 100
    assert summary.counters["rows_fact_transactions_inserted"] > 0
    # the heavy dirty load must show up in the run log
    assert summary.error_count + summary.warning_count > 0


def test_status_weights_propagate(alt_warehouse):
    store, _, _ = alt_warehouse
    ft = store.read(pipeline.FACT_TRANSACTIONS)
    by_status = {
        r["status"]: r["n"]
        for r in ft.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_status) <= {"success", "failed"}
    n_success, n_failed = by_status.get("success", 0), by_status.get("failed", 0)
    # weights (0.7, 0.3): failed share must be well above the demo config's
    # 0.15 and success must still dominate
    failed_share = n_failed / (n_success + n_failed)
    assert 0.15 < failed_share < 0.5, failed_share


def test_golden_invariants_hold(alt_warehouse):
    store, _, _ = alt_warehouse
    du = store.read(pipeline.DIM_USER)
    dp = store.read(pipeline.DIM_PRODUCT)
    ft = store.read(pipeline.FACT_TRANSACTIONS)
    checks = {
        "dim_user_empty_name": du.where(
            F.col("name").isNull() | (F.trim("name") == "")
        ).count(),
        "dim_product_negative_price": dp.where(F.col("price") < 0).count(),
        "fact_qty_le_0": ft.where(F.col("quantity") <= 0).count(),
        "fact_bad_status": ft.where(
            ~F.col("status").isin("success", "failed")
        ).count(),
        "fact_orphan_user_sk": ft.join(
            du.select("user_sk"), "user_sk", "left_anti"
        ).count(),
        "fact_orphan_product_sk": ft.join(
            dp.select("product_sk"), "product_sk", "left_anti"
        ).count(),
    }
    assert checks == {k: 0 for k in checks}, checks


def test_dirty_classes_reach_error_log(alt_warehouse):
    """Every injected error-severity dirty class must surface at least one
    error-log row of a matching rule (count reconciliation at the
    100-dirty scale of main.ipynb cell 21)."""
    store, batch, summary = alt_warehouse
    log = store.read(audit.ERROR_LOG).where(
        F.col("run_id") == summary.run_id
    )
    by_type = {
        r["error_type"]: r["n"]
        for r in log.groupBy("error_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    class_to_rule = {
        "user_empty_name": "invalid_user",
        "user_bad_email": "invalid_user",
        "user_null_join_date": "invalid_user",
        "product_empty_name": "invalid_product",
        "product_price_ge_10000": "price_ge_10000",
        "product_negative_stock": "negative_stock",
        "tx_orphan_user": "orphan_user",
        "tx_orphan_product": "orphan_product",
        "tx_qty_zero": "qty_zero",
        "tx_qty_negative": "qty_negative",
        "tx_bad_payment_type": "invalid_payment_type",
        "tx_bad_status": "invalid_status",
        "tx_bad_date": "bad_date_format",
        "tx_duplicate_id": "duplicate_tx_id",
    }
    for cls, n_injected in batch.dirty_counts.items():
        if n_injected == 0 or cls not in class_to_rule:
            continue
        rule = class_to_rule[cls]
        assert by_type.get(rule, 0) >= 1, (cls, rule, by_type)
