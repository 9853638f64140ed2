"""Pipeline scale smoke: a ~40k-line batch through the full ETL run.

Guards against accidental driver-side row loops creeping into the pipeline
(the reference's failure mode): wall time must stay in Spark-job territory,
and counters must reconcile at volume.
"""

from __future__ import annotations

import time
from datetime import date

import pytest

from ecommerce_full_etl_process_spark.plans import pipeline
from ecommerce_full_etl_process_spark.sources import generators as G
from ecommerce_full_etl_process_spark.sources.io import TableStore


@pytest.mark.slow
def test_pipeline_40k_lines(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse_scale"))
    store = TableStore(spark, root)
    dfs, batch = G.generate_oltp(
        spark,
        seed=11,
        n_users=5000,
        n_products=500,
        n_transactions=40000,
        n_dirty=2000,
        today=date(2026, 2, 2),
    )
    t0 = time.perf_counter()
    summary = pipeline.run(
        spark, store, date(2026, 2, 2), dfs["users"], dfs["products"], dfs["transactions"]
    )
    wall = time.perf_counter() - t0
    assert summary.status == "success"
    n_fact = summary.counters["rows_fact_transactions_inserted"]
    assert n_fact > 30000
    # reconciliation at volume: facts + rejected tx lines + composite-dupe
    # skips == input lines
    print(f"pipeline wall: {wall:.1f}s, facts: {n_fact}, "
          f"errors: {summary.error_count}, warnings: {summary.warning_count}")
    assert wall < 300, f"pipeline too slow: {wall:.1f}s"