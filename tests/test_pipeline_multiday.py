"""Multi-day pipeline soak: four consecutive daily runs with evolving
dimension data through the FULL pipeline; invariants must hold after every
day and SCD2 history must accumulate correctly."""

from __future__ import annotations

import random
from datetime import date, timedelta

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.plans import pipeline
from ecommerce_full_etl_process_spark.sources.io import TableStore

START = date(2026, 3, 1)
N_USERS, N_PRODUCTS = 30, 10


def _day_data(rng: random.Random, day_idx: int, product_state: dict):
    users = [
        (uid, f"User {uid}", f"u{uid}@example.com", "2026-01-01")
        for uid in range(1, N_USERS + 1)
    ]
    # mutate ~30% of product prices each day; stock drifts for half
    for pid in product_state:
        if rng.random() < 0.3:
            product_state[pid]["price"] = round(
                product_state[pid]["price"] + rng.uniform(1, 10), 2
            )
        if rng.random() < 0.5:
            product_state[pid]["stock"] = max(
                0, product_state[pid]["stock"] + rng.randint(-20, 20)
            )
    products = [
        (pid, s["name"], s["category"], s["price"], s["stock"])
        for pid, s in product_state.items()
    ]
    d = (START + timedelta(days=day_idx)).strftime("%Y-%m-%d")
    txs = []
    for i in range(40):
        pid = rng.randint(1, N_PRODUCTS)
        qty = rng.randint(1, 4)
        txs.append(
            (
                day_idx * 1000 + i,
                d,
                rng.randint(1, N_USERS),
                pid,
                qty,
                round(product_state[pid]["price"] * qty, 2),
                "visa",
                "success",
            )
        )
    return users, products, txs


@pytest.mark.slow
def test_four_day_soak(spark, tmp_path_factory):
    rng = random.Random(77)
    store = TableStore(spark, str(tmp_path_factory.mktemp("wh_soak")))
    product_state = {
        pid: {
            "name": f"Prod {pid}",
            "category": "Electronics",
            "price": round(rng.uniform(10, 100), 2),
            "stock": rng.randint(10, 100),
        }
        for pid in range(1, N_PRODUCTS + 1)
    }

    fact_total = 0
    for day_idx in range(4):
        users, products, txs = _day_data(rng, day_idx, product_state)
        s = pipeline.run(
            spark,
            store,
            START + timedelta(days=day_idx),
            spark.createDataFrame(users, schemas.USERS),
            spark.createDataFrame(products, schemas.PRODUCTS),
            spark.createDataFrame(txs, schemas.TRANSACTIONS),
        )
        assert s.status == "success", day_idx
        fact_total += s.counters["rows_fact_transactions_inserted"]

        dim = store.read(pipeline.DIM_PRODUCT)
        # exactly one current version per product, every day
        bad = (
            dim.groupBy("product_id")
            .agg(F.sum(F.col("current_flag").cast("int")).alias("n"))
            .where(F.col("n") != 1)
            .count()
        )
        assert bad == 0, day_idx
        # no orphan SKs, every day
        ft = store.read(pipeline.FACT_TRANSACTIONS)
        assert ft.join(dim.select("product_sk"), "product_sk", "left_anti").count() == 0

    # facts accumulated across all days; every line loaded exactly once
    ft = store.read(pipeline.FACT_TRANSACTIONS)
    assert ft.count() == fact_total == 160
    assert ft.select("transaction_id", "product_sk").distinct().count() == 160

    # SCD2 history grew: more version rows than products, intervals tile
    dim = store.read(pipeline.DIM_PRODUCT).orderBy("product_id", "start_date")
    assert dim.count() > N_PRODUCTS
    rows = dim.collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["product_id"], []).append(r)
    for pid, versions in by_key.items():
        for prev, nxt in zip(versions, versions[1:]):
            assert nxt["start_date"] == prev["end_date"] + timedelta(days=1), pid

    # stock history: appended only on change (≤ products × days, ≥ products)
    n_stock = store.read(pipeline.FACT_STOCK_HISTORY).count()
    assert N_PRODUCTS <= n_stock <= N_PRODUCTS * 4

    # run log: 4 successful runs with durations
    runs = store.read("etl_run_log").orderBy("run_id").collect()
    assert [r["status"] for r in runs] == ["success"] * 4
    assert all(r["duration_ms"] > 0 for r in runs)