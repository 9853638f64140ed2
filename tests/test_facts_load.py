"""Fact-load unit tests: composite-PK dedup must RETURN the dropped rows so
the pipeline can log each as a 'duplicate_tx_id' warning (the reference's
IntegrityError handler logs every skip, ETL/etl.py:375-378)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.facts import load_fact_transactions

DIM_USER_ROWS = [(1, 10, date(2020, 1, 1), None)]
DIM_USER_SCHEMA = "user_id long, user_sk long, start_date date, end_date date"
DIM_PROD_ROWS = [(7, 70, date(2020, 1, 1), None)]
DIM_PROD_SCHEMA = (
    "product_id long, product_sk long, start_date date, end_date date"
)
TX_SCHEMA = (
    "transaction_id long, user_id long, product_id long, date date, "
    "quantity int, price double, payment_type string, status string"
)
FACT_SCHEMA = "transaction_id long"


def test_dupe_rows_returned_and_first_wins(spark):
    d = date(2026, 2, 2)
    tx = spark.createDataFrame(
        [
            (100, 1, 7, d, 2, 20.0, "card", "completed"),
            (100, 1, 7, d, 9, 90.0, "card", "completed"),  # dup (tx, sk) line
            (101, 1, 7, d, 1, 10.0, "card", "completed"),
        ],
        TX_SCHEMA,
    )
    res = load_fact_transactions(
        tx,
        spark.createDataFrame(DIM_USER_ROWS, DIM_USER_SCHEMA),
        spark.createDataFrame(DIM_PROD_ROWS, DIM_PROD_SCHEMA),
        spark.createDataFrame([], FACT_SCHEMA),
    )
    assert res.n_skipped_dupe == 1
    dupes = res.dupe_rows.collect()
    assert [(r["transaction_id"], r["product_sk"]) for r in dupes] == [(100, 70)]
    # first occurrence wins: quantity 2 is kept
    kept = {r["transaction_id"]: r["quantity"] for r in res.facts.collect()}
    assert kept == {100: 2, 101: 1}


def test_rerun_skips_and_no_dupes(spark):
    d = date(2026, 2, 2)
    tx = spark.createDataFrame(
        [(100, 1, 7, d, 2, 20.0, "card", "completed")], TX_SCHEMA
    )
    res = load_fact_transactions(
        tx,
        spark.createDataFrame(DIM_USER_ROWS, DIM_USER_SCHEMA),
        spark.createDataFrame(DIM_PROD_ROWS, DIM_PROD_SCHEMA),
        spark.createDataFrame([(100,)], FACT_SCHEMA),
    )
    assert res.n_skipped_rerun == 1
    assert res.facts.count() == 0
    assert res.dupe_rows.count() == 0
