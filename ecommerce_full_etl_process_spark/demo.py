"""End-to-end demo — entry point 2 of the reference (demo.ipynb, SURVEY §3):
populate clean OLTP data, inject dirty records, run the ETL pipeline, print
the run report and the 9-check data-quality verification.

Usage:
    python -m ecommerce_full_etl_process_spark.demo \
        --today 2026-02-02 --users 100 --products 25 --transactions 250 \
        --invalid 30 --warehouse /tmp/etl_warehouse

Exit code 0 iff the run succeeds AND all QA checks pass (the reference's
PASS/FAIL report, demo.ipynb cell 26).
"""

from __future__ import annotations

import argparse
import sys
from datetime import date, datetime

from pyspark.sql import functions as F

from .plans import pipeline
from .session import get_spark
from .sources import generators as G
from .sources.io import TableStore


def qa_checks(store: TableStore) -> dict[str, int]:
    """The 9 golden zero-count invariants (demo.ipynb cell 26)."""
    du = store.read(pipeline.DIM_USER)
    dp = store.read(pipeline.DIM_PRODUCT)
    ft = store.read(pipeline.FACT_TRANSACTIONS)
    return {
        "empty_or_null_dim_user_names": du.where(
            F.col("name").isNull() | (F.trim("name") == "")
        ).count(),
        "invalid_dim_user_emails": du.where(~F.col("email").like("%@%.%")).count(),
        "negative_dim_product_prices": dp.where(F.col("price") < 0).count(),
        "dim_product_price_ge_10000": dp.where(F.col("price") >= 10000).count(),
        "fact_quantity_le_0": ft.where(F.col("quantity") <= 0).count(),
        "fact_invalid_status": ft.where(
            ~F.col("status").isin("success", "failed")
        ).count(),
        "fact_invalid_payment_type": ft.where(
            ~F.col("payment_type").isin(
                "visa", "mastercard", "wire transfer", "other"
            )
        ).count(),
        "fact_orphan_user_sk": ft.join(
            du.select("user_sk"), "user_sk", "left_anti"
        ).count(),
        "fact_orphan_product_sk": ft.join(
            dp.select("product_sk"), "product_sk", "left_anti"
        ).count(),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--today", default="2026-02-02")
    ap.add_argument("--users", type=int, default=100)
    ap.add_argument("--products", type=int, default=25)
    ap.add_argument("--transactions", type=int, default=250)
    ap.add_argument("--invalid", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--warehouse", default="/tmp/etl_warehouse")
    args = ap.parse_args(argv)

    today = datetime.strptime(args.today, "%Y-%m-%d").date()
    spark = get_spark(app_name="etl-demo")
    spark.sparkContext.setLogLevel("ERROR")
    store = TableStore(spark, args.warehouse)

    print(f"== populate: {args.users} users, {args.products} products, "
          f"{args.transactions} tx lines, {args.invalid} dirty records ==")
    dfs, batch = G.generate_oltp(
        spark,
        seed=args.seed,
        n_users=args.users,
        n_products=args.products,
        n_transactions=args.transactions,
        n_dirty=args.invalid,
        today=today,
    )

    print(f"== run ETL for {today} ==")
    summary = pipeline.run(
        spark, store, today, dfs["users"], dfs["products"], dfs["transactions"]
    )
    print(f"status: {summary.status}  run_id: {summary.run_id}")
    for k, v in summary.counters.items():
        print(f"  {k}: {v}")

    print("== error breakdown ==")
    el = store.read("etl_error_log").where(F.col("run_id") == summary.run_id)
    for r in (
        el.groupBy("error_type", "severity")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .collect()
    ):
        print(f"  {r['error_type']:<22} {r['severity']:<8} {r['n']}")

    print("== data-quality verification (expect all 0) ==")
    checks = qa_checks(store)
    ok = True
    for name, n in checks.items():
        mark = "PASS" if n == 0 else "FAIL"
        ok = ok and n == 0
        print(f"  [{mark}] {name}: {n}")
    print("RESULT:", "PASS" if ok and summary.status == "success" else "FAIL")
    return 0 if ok and summary.status == "success" else 1


if __name__ == "__main__":
    sys.exit(main())
