"""Physical-plan regression guards: the scale-critical plan properties
(pushdown, pruning, broadcast) asserted programmatically so they cannot
silently regress."""

from __future__ import annotations

import pytest

from ecommerce_full_etl_process_spark.plans import catalog


def _plan(spark, sf_dir, name: str) -> str:
    df = catalog.spark_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_flagship_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_revenue_by_nation")
    # 4-way star join: every dimension side broadcast, no sort-merge join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_flagship_prunes_lineitem_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_revenue_by_nation")
    # the lineitem scan must read only the 3 needed columns
    for line in plan.splitlines():
        if "ReadSchema" in line and "l_orderkey" in line:
            assert "l_extendedprice" in line and "l_discount" in line
            assert "l_partkey" not in line and "l_shipdate" not in line
            break
    else:
        pytest.fail("lineitem ReadSchema not found in plan")


def test_filtered_scan_pushes_range_to_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filtered_incremental_scan")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_price_tolerance_pushes_filter_and_broadcasts_part(spark, sf_dir):
    plan = _plan(spark, sf_dir, "price_tolerance_check")
    assert "GreaterThan(l_quantity,0.0)" in plan
    assert "BroadcastHashJoin" in plan


def test_asof_fanout_uses_broadcast_and_hash_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_events_to_orders_fanout")
    assert "BroadcastHashJoin" in plan
    # max(struct(...)) as a hash aggregate — no sort-based window
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_asof_default_is_fanout_free_merge(spark, sf_dir):
    """The default as-of strategy (round 7) must plan the merged
    timeline: no join at all — one union, one window, one exchange."""
    import re

    plan = _plan(spark, sf_dir, "asof_events_to_orders")
    assert "Window" in plan
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

def test_scd2_merge_has_no_global_sort(spark):
    """Surrogate-key assignment must plan per-bucket (local) sorts only —
    a global Window.orderBy would be a single-partition sort that caps the
    merge at one executor for billion-row dim batches."""
    from datetime import date

    from ecommerce_full_etl_process_spark.operators.scd2 import (
        PRODUCT_SCD2,
        scd2_merge,
    )

    dim = spark.createDataFrame(
        [],
        "product_sk long, product_id long, name string, category string, "
        "price double, start_date date, end_date date, current_flag boolean",
    )
    inc = spark.createDataFrame(
        [(i, f"n{i}", "c", 1.0 + i) for i in range(1, 50)],
        "product_id long, name string, category string, price double",
    )
    res = scd2_merge(dim, inc, PRODUCT_SCD2, date(2026, 2, 2))
    plan = res.dim._jdf.queryExecution().executedPlan().toString()
    # every Sort node must be non-global: "Sort [...], false, 0"
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Sort ["):
            assert ", false, 0" in s, f"global sort in scd2 plan: {s}"
    res.unpersist()
