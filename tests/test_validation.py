"""Validation engine V1-V14: per-error-type counts must reconcile exactly
with the injected dirty-class counts (the reference's audit-log
reconciliation strategy, SURVEY §5)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators import validation as V
from ecommerce_full_etl_process_spark.sources import generators as G


@pytest.fixture(scope="module")
def batch(spark):
    dfs, batch = G.generate_oltp(spark, seed=7, n_dirty=40)
    results = V.validate_all(dfs["users"], dfs["products"], dfs["transactions"])
    return dfs, batch, results


def _error_counts(results, entity, id_col):
    df = results[entity].error_records(entity, F.col(id_col))
    return {
        (r["error_type"], r["severity"]): r["cnt"]
        for r in df.groupBy("error_type", "severity").agg(F.count("*").alias("cnt")).collect()
    }


def test_user_rules(batch):
    dfs, b, results = batch
    dirty_users = (
        b.dirty_counts.get("user_empty_name", 0)
        + b.dirty_counts.get("user_bad_email", 0)
        + b.dirty_counts.get("user_null_join_date", 0)
    )
    counts = _error_counts(results, "user", "user_id")
    assert counts.get(("invalid_user", "error"), 0) == dirty_users
    assert results["user"].rejected.count() == dirty_users
    assert results["user"].valid.count() == dfs["users"].count() - dirty_users


def test_product_rules(batch):
    dfs, b, results = batch
    counts = _error_counts(results, "product", "product_id")
    assert counts.get(("invalid_product", "error"), 0) == b.dirty_counts.get(
        "product_empty_name", 0
    )
    assert counts.get(("price_ge_10000", "error"), 0) == b.dirty_counts.get(
        "product_price_ge_10000", 0
    )
    assert counts.get(("negative_stock", "error"), 0) == b.dirty_counts.get(
        "product_negative_stock", 0
    )


def test_transaction_rules(batch):
    dfs, b, results = batch
    counts = _error_counts(results, "transaction", "transaction_id")
    for cls, etype in [
        ("tx_orphan_user", "orphan_user"),
        ("tx_orphan_product", "orphan_product"),
        ("tx_qty_zero", "qty_zero"),
        ("tx_qty_negative", "qty_negative"),
        ("tx_bad_payment_type", "invalid_payment_type"),
        ("tx_bad_status", "invalid_status"),
        ("tx_bad_date", "bad_date_format"),
    ]:
        assert counts.get((etype, "error"), 0) == b.dirty_counts.get(cls, 0), etype

    # V14 price drift warnings
    assert counts.get(("price_mismatch", "warning"), 0) == b.dirty_counts.get(
        "tx_price_drift", 0
    )

    # V13: warnings = all rows beyond the first occurrence of each tx id,
    # in batch order (clean multi-line transactions warn too — reference
    # semantics, validation.py:155-159)
    seen, expected_dups = set(), 0
    for t in b.transactions:
        if t[0] in seen:
            expected_dups += 1
        seen.add(t[0])
    assert counts.get(("duplicate_tx_id", "warning"), 0) == expected_dups


def test_warning_rows_still_load(batch):
    _, b, results = batch
    # every rejected row must have at least one error-severity violation;
    # warning-only rows stay in the valid stream (reference semantics)
    ann = results["transaction"].annotated
    warn_only = ann.where(
        (F.size(F.filter(F.col("errors"), lambda e: e["severity"] == "error")) == 0)
        & (F.size("errors") > 0)
    ).count()
    assert warn_only > 0  # duplicates/multi-line guarantee some
    assert results["transaction"].valid.count() + results[
        "transaction"
    ].rejected.count() == ann.count()


def test_valid_tx_normalized(batch):
    _, _, results = batch
    rows = results["transaction"].valid.select("payment_type", "status").distinct().collect()
    for r in rows:
        assert r["payment_type"] == r["payment_type"].lower()
        assert r["status"] in ("success", "failed")


def test_negative_price_product_passes_validation(spark):
    """Reference parity quirk (SURVEY §7.4): the validator checks
    price >= 10000 but has NO negative-price rule — a price < 0 product
    must pass validation and load (only the notebook QA queries would
    flag it). Mirror, don't silently fix."""
    from ecommerce_full_etl_process_spark import schemas

    products = spark.createDataFrame(
        [(1, "Weird", "Electronics", -5.0, 10)], schemas.PRODUCTS
    )
    res = V.validate_products(products)
    assert res.rejected.count() == 0
    assert res.valid.count() == 1


def test_multiformat_dates_parse(spark):
    """F5: exactly the reference's four accepted formats; two rejected ones."""
    from ecommerce_full_etl_process_spark.functions.dates import parse_date_multi

    df = spark.createDataFrame(
        [
            ("2026-02-02",),
            ("2026/02/02",),
            ("2026-02-02T14:30:00",),
            ("20260202",),
            ("02-02-2026",),  # %d-%m-%Y → must reject
            ("Feb 02, 2026",),  # %b %d, %Y → must reject
        ],
        "s string",
    ).withColumn("d", parse_date_multi(F.col("s")))
    got = {r["s"]: r["d"] for r in df.collect()}
    assert str(got["2026-02-02"]) == "2026-02-02"
    assert str(got["2026/02/02"]) == "2026-02-02"
    assert str(got["2026-02-02T14:30:00"]) == "2026-02-02"
    assert str(got["20260202"]) == "2026-02-02"
    assert got["02-02-2026"] is None
    assert got["Feb 02, 2026"] is None
