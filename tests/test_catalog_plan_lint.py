"""Catalog-wide plan lint: no query may plan an unconstrained Cartesian
product (broadcast nested-loop joins from intentional 1-row crossJoins are
fine; a CartesianProduct over real tables is always a bug at scale)."""

from __future__ import annotations

from ecommerce_full_etl_process_spark.plans import catalog


def test_no_cartesian_products(spark, sf_dir):
    offenders = {}
    for name, fn in catalog.spark_queries().items():
        if name == "streaming_event_counts":
            continue  # starts a streaming query; plan inspected via its own test
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if "CartesianProduct" in plan:
            offenders[name] = True
    assert not offenders, f"CartesianProduct in: {sorted(offenders)}"