"""Scale tooling: salted joins preserve semantics; bucketed tables join
without a shuffle (the co-located-join story for 100 TB facts)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.skew import (
    salted_join,
    top_key_skew_report,
)


def test_salted_join_equivalent(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", salt_buckets=8)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_report(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rep = top_key_skew_report(li, "l_suppkey", top_n=5).collect()
    assert len(rep) == 5
    assert all(r["share"] > 0 for r in rep)
    # descending
    assert [r["n_rows"] for r in rep] == sorted(
        (r["n_rows"] for r in rep), reverse=True
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join with NO
    Exchange on either side — the pre-partitioned co-located join that
    makes repeated fact⋈fact joins affordable at scale."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").select("o_orderkey", "o_totalprice"), "o_orderkey"
    )
    # broadcast would dodge the question — force SMJ path by disabling
    # auto-broadcast for this check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")