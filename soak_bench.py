#!/usr/bin/env python
"""Multi-day warehouse soak: N consecutive synthetic days through the FULL
pipeline (validate → SCD2 dims → as-of facts → audit) at volume, with
daily SCD2 churn.

The claim under test is the one a nightly 100 TB warehouse lives on: **per-
day cost stays flat while state grows**. Dimensions accumulate SCD2 history
every day and the fact table accumulates rows, but a daily incremental run
touches only the day's partition and the dims' current versions — so day 30
must cost what day 3 cost. A super-linear day-wall curve would flag a plan
that re-reads accumulated state (the reference's full-table re-scan failure
mode, ETL/etl.py's per-run full SELECTs).

Each day also re-verifies the 9 golden zero-count invariants
(demo.qa_checks — the reference's demo.ipynb cell-26 QA battery) over the
WHOLE accumulated warehouse, so correctness is pinned per-day, not just at
the end.

Usage:
    python soak_bench.py                      # 30 days, writes SOAK.json
    python soak_bench.py --days 10 --tx-per-day 500   # quick mode

Prints ONE JSON line: {"metric": "soak_day_wall", "days": N,
"day_wall": [...], "flatness_late_over_early": r, "qa_failures": 0, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from datetime import date, timedelta

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_full_etl_process_spark import schemas  # noqa: E402
from ecommerce_full_etl_process_spark.demo import qa_checks  # noqa: E402
from ecommerce_full_etl_process_spark.plans import pipeline  # noqa: E402
from ecommerce_full_etl_process_spark.session import get_spark  # noqa: E402
from ecommerce_full_etl_process_spark.sources.io import TableStore  # noqa: E402

START = date(2026, 4, 1)


def _day_batch(
    rng: random.Random,
    day_idx: int,
    n_users: int,
    product_state: dict,
    tx_per_day: int,
):
    """One synthetic OLTP day. ~30% of products reprice (SCD2 churn on the
    type-2 attribute), ~50% drift stock (change-detected snapshot)."""
    users = [
        (uid, f"User {uid}", f"u{uid}@example.com", "2026-01-01")
        for uid in range(1, n_users + 1)
    ]
    for pid in product_state:
        if rng.random() < 0.3:
            product_state[pid]["price"] = round(
                min(product_state[pid]["price"] + rng.uniform(1, 10), 9999.0), 2
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
    n_products = len(product_state)
    for i in range(tx_per_day):
        pid = rng.randint(1, n_products)
        qty = rng.randint(1, 4)
        txs.append(
            (
                day_idx * 1_000_000 + i,
                d,
                rng.randint(1, n_users),
                pid,
                qty,
                round(product_state[pid]["price"] * qty, 2),
                rng.choice(["visa", "mastercard", "wire transfer", "other"]),
                "success" if rng.random() < 0.85 else "failed",
            )
        )
    return users, products, txs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=30)
    ap.add_argument("--users", type=int, default=1000)
    ap.add_argument("--products", type=int, default=500)
    ap.add_argument("--tx-per-day", type=int, default=2000)
    ap.add_argument("--warehouse", default="/tmp/soak_wh")
    ap.add_argument("--out", default="SOAK.json")
    args = ap.parse_args()

    spark = get_spark(app_name="soak_bench")
    spark.sparkContext.setLogLevel("ERROR")
    import shutil

    shutil.rmtree(args.warehouse, ignore_errors=True)
    store = TableStore(spark, args.warehouse)

    rng = random.Random(1234)
    product_state = {
        pid: {
            "name": f"Prod {pid}",
            "category": rng.choice(["Electronics", "Books", "Garden"]),
            "price": round(rng.uniform(10, 100), 2),
            "stock": rng.randint(10, 100),
        }
        for pid in range(1, args.products + 1)
    }

    day_wall: list[float] = []
    qa_failures = 0
    fact_total = 0
    import gc

    for day_idx in range(args.days):
        users, products, txs = _day_batch(
            rng, day_idx, args.users, product_state, args.tx_per_day
        )
        udf_ = spark.createDataFrame(users, schemas.USERS)
        pdf_ = spark.createDataFrame(products, schemas.PRODUCTS)
        tdf_ = spark.createDataFrame(txs, schemas.TRANSACTIONS)
        t0 = time.perf_counter()
        s = pipeline.run(
            spark, store, START + timedelta(days=day_idx), udf_, pdf_, tdf_
        )
        wall = time.perf_counter() - t0
        day_wall.append(round(wall, 2))
        if s.status != "success":
            qa_failures += 1
            print(f"soak: day {day_idx} run FAILED", file=sys.stderr)
        fact_total += s.counters.get("rows_fact_transactions_inserted", 0)
        # retention, as a real nightly warehouse would run it: keep the
        # last 3 dim versions so version dirs don't accumulate unbounded
        # (not inside day_wall — the flatness metric isolates pipeline
        # cost; vacuum is bounded by keep_versions regardless of day)
        for t in (pipeline.DIM_USER, pipeline.DIM_PRODUCT):
            store.vacuum(t, keep_versions=3)
        checks = qa_checks(store)
        bad = {k: v for k, v in checks.items() if v != 0}
        if bad:
            qa_failures += 1
            print(f"soak: day {day_idx} QA violations {bad}", file=sys.stderr)
        print(
            f"soak: day {day_idx:02d} wall {wall:5.1f}s qa_ok={not bad}",
            file=sys.stderr,
        )
        # same measurement hygiene as scale_bench: don't let day N's GC
        # debt land in day N+1's wall
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # flatness: steady-state late-window mean over early-window mean.
    # Days 0-2 absorb JVM/codegen warmup and are excluded.
    early = day_wall[3:8] if len(day_wall) >= 8 else day_wall
    late = day_wall[-5:] if len(day_wall) >= 8 else day_wall
    flat = round(
        (sum(late) / len(late)) / (sum(early) / len(early)), 2
    )

    dim_product_rows = store.read(pipeline.DIM_PRODUCT).count()
    fact_rows = store.read(pipeline.FACT_TRANSACTIONS).count()
    result = {
        "metric": "soak_day_wall",
        "unit": "sec",
        "days": args.days,
        "users": args.users,
        "products": args.products,
        "tx_per_day": args.tx_per_day,
        "day_wall": day_wall,
        "flatness_late_over_early": flat,
        "qa_failures": qa_failures,
        "fact_rows": fact_rows,
        "fact_rows_expected": fact_total,
        "dim_product_versions": dim_product_rows,
    }
    line = json.dumps(result)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
