"""Reporting module (entry-point-2 parity) + multi-format round-trips."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.plans import pipeline, reporting
from ecommerce_full_etl_process_spark.sources import generators as G
from ecommerce_full_etl_process_spark.sources.formats import (
    delta_available,
    read_table,
    write_table,
)
from ecommerce_full_etl_process_spark.sources.io import TableStore


@pytest.fixture(scope="module")
def loaded_store(spark, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("wh_report")))
    dfs, _ = G.generate_oltp(spark, seed=5, n_users=40, n_products=12,
                             n_transactions=80, n_dirty=12)
    s = pipeline.run(spark, store, date(2026, 2, 2),
                     dfs["users"], dfs["products"], dfs["transactions"])
    assert s.status == "success"
    return store, s


def test_latest_run_and_breakdown(loaded_store):
    store, s = loaded_store
    run = reporting.latest_run(store).collect()[0]
    assert run["run_id"] == s.run_id and run["status"] == "success"
    bd = reporting.error_breakdown(store, s.run_id).collect()
    assert sum(r["n"] for r in bd) == s.error_count + s.warning_count
    # descending
    assert [r["n"] for r in bd] == sorted((r["n"] for r in bd), reverse=True)


def test_row_counts_and_orphans(loaded_store):
    store, _ = loaded_store
    counts = {r["table_name"]: r["n_rows"] for r in
              reporting.warehouse_row_counts(store).collect()}
    assert counts["fact_transactions"] > 0 and counts["dim_user"] > 0
    oc = {r["check"]: r["n_bad"] for r in reporting.orphan_checks(store).collect()}
    assert oc == {"fact_orphan_user_sk": 0, "fact_orphan_product_sk": 0}
    sample = reporting.current_dim_sample(store, "dim_user", 5).collect()
    assert 0 < len(sample) <= 5
    assert all(r["current_flag"] for r in sample)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(
        [(1, "2026-02-02", 1, 1, 2, 20.0, "visa", "success"),
         (2, "2026-02-03", 2, 2, 1, 10.0, "mastercard", "failed")],
        schemas.TRANSACTIONS,
    )
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=schemas.TRANSACTIONS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_delta_stubbed_absent():
    # image has no Delta jars; the capability flag must say so (the SCD2
    # MERGE path stays on the parquet algorithm)
    assert delta_available() is False