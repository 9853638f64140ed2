"""Bucketed co-located join: the zero-exchange fact⋈fact path.

Pins the three claims sources/bucketed.py makes:
1. same-bucketed tables join with NO exchange on either side;
2. pre-sorted buckets also remove the per-task sort;
3. results are identical to the plain (shuffled) join.
"""

from __future__ import annotations

import re

import pytest

from ecommerce_full_etl_process_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)

BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "b_orders", "o_orderkey", BUCKETS, path=str(root / "o")
    )
    write_bucketed(
        lineitem, "b_lineitem", "o_orderkey", BUCKETS, path=str(root / "l")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _smb_plan(spark, lt, rt):
    """Plan the co-located join with broadcast disabled so the
    SortMergeJoin path (the one bucketing optimizes) is chosen."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_join(spark, lt, rt, "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return df, plan


def test_colocated_join_plans_zero_exchanges(spark, bucketed_tables):
    lt, rt = bucketed_tables
    _, plan = _smb_plan(spark, lt, rt)
    assert "SortMergeJoin" in plan
    n = len(
        re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )
    assert n == 0, f"bucketed join should shuffle nothing, planned:\n{plan}"


def test_colocated_join_sorts_are_local_only(spark, bucketed_tables):
    """Spark 3+ keeps a per-task sort above bucketed scans (sorted-bucket
    metadata sits behind a legacy flag) — assert every Sort node is
    LOCAL (global=false), i.e. no range exchange was introduced, and the
    scans really are bucketed."""
    lt, rt = bucketed_tables
    _, plan = _smb_plan(spark, lt, rt)
    assert plan.count("Bucketed: true") == 2
    for line in plan.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort crept in: {line}"


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    df, _ = _smb_plan(spark, lt, rt)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(
        f"{sf_dir}/lineitem.parquet"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    plain = orders.join(lineitem, "o_orderkey")
    assert df.count() == plain.count()
    assert df.exceptAll(plain).count() == 0


def test_bucket_count_mismatch_falls_back_to_shuffle(
    spark, sf_dir, tmp_path, bucketed_tables
):
    """Documented sharp edge: differing bucket counts (without the
    coalesce feature enabled) reintroduce at least one exchange — the
    layout contract is bucket-count agreement, and this test keeps the
    docstring honest."""
    coalesce = (
        spark.conf.get(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        )
        == "true"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        orders, "b_orders_4", "o_orderkey", 4, path=str(tmp_path / "o4")
    )
    try:
        _, plan = _smb_plan(spark, "b_orders_4", "b_orders_4")
        # same table twice: 4 vs 4 matches, still zero exchanges
        assert "Exchange hashpartitioning" not in plan
        _, plan = _smb_plan(spark, "b_orders_4", "b_lineitem")
        if not coalesce:
            assert "Exchange hashpartitioning" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_4")


def test_catalog_entry_plan_zero_exchange(spark, sf_dir, tmp_path):
    """The driver-graded catalog entry (bucketed_colocated_revenue)
    returns a checkpointed frame, so the catalog-wide shuffle lint sees
    an empty plan — this test lints the REAL pre-checkpoint plan via the
    factored builder: bucketed scans on both sides, SortMergeJoin, and
    ZERO exchanges end-to-end INCLUDING the per-order aggregate (the
    SMJ's hash partitioning on the bucket key satisfies the groupBy's
    clustering, so the layout pays for the join AND the fold)."""
    import re as _re

    from ecommerce_full_etl_process_spark.plans.operator_queries import (
        bucketed_join_frame,
    )

    out, tables = bucketed_join_frame(spark, sf_dir, str(tmp_path))
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        n = len(
            _re.findall(
                r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
                plan,
            )
        )
        assert n == 0, f"layout should remove every exchange, planned:\n{plan}"
        assert "HashAggregate" in plan  # the fold really is in this plan
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
