"""End-to-end pipeline test — the reference's demo.ipynb flow (SURVEY §5):
seeded dirty batch → pipeline run → 9 golden zero-count invariants + SCD2
properties + day re-run idempotence."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.plans import pipeline
from ecommerce_full_etl_process_spark.sources import generators as G
from ecommerce_full_etl_process_spark.sources.io import TableStore

TODAY = date(2026, 2, 2)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse"))
    store = TableStore(spark, root)
    dfs, batch = G.generate_oltp(spark, seed=42, n_dirty=30)
    summary = pipeline.run(
        spark, store, TODAY, dfs["users"], dfs["products"], dfs["transactions"]
    )
    return store, dfs, batch, summary


def test_run_success(warehouse):
    _, _, _, summary = warehouse
    assert summary.status == "success"
    assert summary.counters["rows_fact_transactions_inserted"] > 0
    assert summary.counters["rows_dim_user_inserted"] > 0


def test_golden_invariants(warehouse):
    """The 9 zero-count checks of demo.ipynb cell 26."""
    store, _, _, _ = warehouse
    du = store.read(pipeline.DIM_USER)
    dp = store.read(pipeline.DIM_PRODUCT)
    ft = store.read(pipeline.FACT_TRANSACTIONS)

    checks = {
        "dim_user_empty_name": du.where(
            F.col("name").isNull() | (F.trim("name") == "")
        ).count(),
        "dim_user_bad_email": du.where(~F.col("email").like("%@%.%")).count(),
        "dim_product_negative_price": dp.where(F.col("price") < 0).count(),
        "dim_product_price_ge_10000": dp.where(F.col("price") >= 10000).count(),
        "fact_qty_le_0": ft.where(F.col("quantity") <= 0).count(),
        "fact_bad_status": ft.where(
            ~F.col("status").isin("success", "failed")
        ).count(),
        "fact_bad_payment": ft.where(
            ~F.col("payment_type").isin("visa", "mastercard", "wire transfer", "other")
        ).count(),
        "fact_orphan_user_sk": ft.join(
            du.select("user_sk"), "user_sk", "left_anti"
        ).count(),
        "fact_orphan_product_sk": ft.join(
            dp.select("product_sk"), "product_sk", "left_anti"
        ).count(),
    }
    assert checks == {k: 0 for k in checks}, checks


def test_scd2_properties(warehouse):
    store, _, _, _ = warehouse
    for table, nk in ((pipeline.DIM_USER, "user_id"), (pipeline.DIM_PRODUCT, "product_id")):
        dim = store.read(table)
        # exactly one current version per natural key
        bad_current = (
            dim.groupBy(nk)
            .agg(F.sum(F.col("current_flag").cast("int")).alias("n"))
            .where(F.col("n") != 1)
            .count()
        )
        assert bad_current == 0, table
        # surrogate keys dense & unique
        sk = "user_sk" if nk == "user_id" else "product_sk"
        n = dim.count()
        assert dim.select(sk).distinct().count() == n
        assert dim.agg(F.max(sk)).collect()[0][0] == n


def test_error_log_reconciles(warehouse):
    """Audit-log reconciliation (SURVEY §5.3): per-type error counts match
    the injected dirty-class counts."""
    store, _, batch, summary = warehouse
    el = store.read("etl_error_log")
    got = {
        r["error_type"]: r["cnt"]
        for r in el.where(F.col("run_id") == summary.run_id)
        .where(F.col("severity") == "error")
        .groupBy("error_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    d = batch.dirty_counts
    expected_user = (
        d.get("user_empty_name", 0)
        + d.get("user_bad_email", 0)
        + d.get("user_null_join_date", 0)
    )
    assert got.get("invalid_user", 0) == expected_user
    assert got.get("price_ge_10000", 0) == d.get("product_price_ge_10000", 0)
    assert got.get("negative_stock", 0) == d.get("product_negative_stock", 0)
    assert got.get("orphan_user", 0) == d.get("tx_orphan_user", 0)
    assert got.get("orphan_product", 0) == d.get("tx_orphan_product", 0)
    assert got.get("bad_date_format", 0) == d.get("tx_bad_date", 0)


def test_rerun_idempotent(warehouse, spark):
    """Re-running the same day must be a no-op for facts and dims
    (reference J4 anti-join on transaction_id; SCD2 unchanged short-circuit)."""
    store, dfs, _, _ = warehouse
    before_facts = store.read(pipeline.FACT_TRANSACTIONS).count()
    before_dim_user = store.read(pipeline.DIM_USER).count()
    before_stock = store.read(pipeline.FACT_STOCK_HISTORY).count()

    summary2 = pipeline.run(
        spark, store, TODAY, dfs["users"], dfs["products"], dfs["transactions"]
    )
    assert summary2.status == "success"
    assert store.read(pipeline.FACT_TRANSACTIONS).count() == before_facts
    assert store.read(pipeline.DIM_USER).count() == before_dim_user
    assert store.read(pipeline.FACT_STOCK_HISTORY).count() == before_stock
    assert summary2.counters["rows_fact_transactions_inserted"] == 0
    assert summary2.counters["rows_dim_user_inserted"] == 0


def test_load_stage_orphan_before_history(spark, tmp_path_factory):
    """A transaction dated BEFORE the user's dim history begins passes
    validation (user exists in OLTP) but cannot as-of-resolve a user_sk —
    the load stage must skip it and log orphan_user (reference
    ETL/etl.py:335-342)."""
    from ecommerce_full_etl_process_spark import schemas

    root = str(tmp_path_factory.mktemp("warehouse3"))
    store = TableStore(spark, root)
    d = date(2026, 2, 2)
    users = spark.createDataFrame(
        [(1, "Ann Lee", "ann@example.com", "2026-01-15")], schemas.USERS
    )
    products = spark.createDataFrame(
        [(1, "Widget", "Electronics", 10.0, 5)], schemas.PRODUCTS
    )
    tx = spark.createDataFrame(
        [
            (1, "2026-01-01", 1, 1, 1, 10.0, "visa", "success"),  # pre-history
            (2, "2026-02-02", 1, 1, 1, 10.0, "visa", "success"),  # fine
        ],
        schemas.TRANSACTIONS,
    )
    s = pipeline.run(spark, store, d, users, products, tx)
    assert s.status == "success"
    facts = store.read(pipeline.FACT_TRANSACTIONS).collect()
    assert [r["transaction_id"] for r in facts] == [2]
    el = store.read("etl_error_log").where(
        (F.col("run_id") == s.run_id) & (F.col("error_type") == "orphan_user")
    )
    assert el.where(F.col("record_id") == "1").count() == 1


def test_scd2_versioning_across_days(spark, tmp_path_factory):
    """Day 2 with a changed product price must close the old version, open a
    new one, and as-of-resolve facts to the version valid at their date."""
    root = str(tmp_path_factory.mktemp("warehouse2"))
    store = TableStore(spark, root)
    d1, d2 = date(2026, 2, 2), date(2026, 2, 3)

    users = [(1, "Ann Lee", "ann@example.com", "2026-01-01")]
    products_d1 = [(1, "Widget", "Electronics", 100.0, 10)]
    products_d2 = [(1, "Widget", "Electronics", 120.0, 10)]  # price change
    tx_d1 = [(1, "2026-02-02", 1, 1, 2, 200.0, "visa", "success")]
    tx_d2 = [(2, "2026-02-03", 1, 1, 1, 120.0, "visa", "success")]

    from ecommerce_full_etl_process_spark import schemas

    def dfs(u, p, t):
        return (
            spark.createDataFrame(u, schemas.USERS),
            spark.createDataFrame(p, schemas.PRODUCTS),
            spark.createDataFrame(t, schemas.TRANSACTIONS),
        )

    u1, p1, t1 = dfs(users, products_d1, tx_d1)
    s1 = pipeline.run(spark, store, d1, u1, p1, t1)
    assert s1.status == "success"

    u2, p2, t2 = dfs(users, products_d2, tx_d2)
    s2 = pipeline.run(spark, store, d2, u2, p2, t2)
    assert s2.status == "success"

    dim = store.read(pipeline.DIM_PRODUCT).orderBy("product_sk").collect()
    assert len(dim) == 2
    old, new = dim
    assert old["price"] == 100.0 and not old["current_flag"]
    assert str(old["end_date"]) == "2026-02-02"  # closed at d2 - 1 day
    assert new["price"] == 120.0 and new["current_flag"]
    assert str(new["start_date"]) == "2026-02-03"

    facts = {
        r["transaction_id"]: r["product_sk"]
        for r in store.read(pipeline.FACT_TRANSACTIONS).collect()
    }
    # tx 1 (Feb 2) → old version sk; tx 2 (Feb 3) → new version sk
    assert facts[1] == old["product_sk"]
    assert facts[2] == new["product_sk"]

    # reference parity: latest-stock lookup is keyed on product_sk
    # (ETL/etl.py:285-291), so the day-2 NEW version sk has no history and
    # gets a fresh snapshot row even though the stock value didn't change
    stock = store.read(pipeline.FACT_STOCK_HISTORY).collect()
    assert {(r["product_sk"], r["stock"]) for r in stock} == {
        (old["product_sk"], 10),
        (new["product_sk"], 10),
    }
