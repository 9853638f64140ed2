"""Incremental aggregate maintenance (operators/incremental.py).

Contract: merging the partial states of ANY disjoint split of the input
— any number of batches, any order, including empty batches and groups
appearing in only some batches — finalizes to exactly the metrics of a
single full-table aggregate.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.incremental import (
    finalize_aggs,
    merge_partials,
    partial_agg,
)


def _rows(rng: random.Random, n: int):
    return [
        (rng.choice(["a", "b", "c", "d"]), round(rng.uniform(-100, 100), 2))
        for _ in range(n)
    ]


def test_merge_of_random_splits_equals_full(spark):
    rng = random.Random(11)
    rows = _rows(rng, 400)
    df = spark.createDataFrame(rows, "g string, v double")
    full = sorted(
        tuple(r)
        for r in finalize_aggs(partial_agg(df, ["g"], "v")).collect()
    )
    for n_batches in (2, 5):
        marks = [rng.randrange(n_batches) for _ in rows]
        states = []
        for b in range(n_batches):
            batch_rows = [r for r, m in zip(rows, marks) if m == b]
            bdf = spark.createDataFrame(
                batch_rows or [], "g string, v double"
            )
            states.append(partial_agg(bdf, ["g"], "v"))
        rng.shuffle(states)  # merge order must not matter
        merged = sorted(
            tuple(r)
            for r in finalize_aggs(merge_partials(states, ["g"])).collect()
        )
        assert merged == full, n_batches


def test_group_present_in_single_batch_passes_through(spark):
    a = spark.createDataFrame([("only_a", 1.0)], "g string, v double")
    b = spark.createDataFrame([("only_b", 2.0), ("only_b", 4.0)], "g string, v double")
    out = {
        r["g"]: (r["n_rows"], r["value_sum"], r["value_avg"])
        for r in finalize_aggs(
            merge_partials(
                [partial_agg(a, ["g"], "v"), partial_agg(b, ["g"], "v")],
                ["g"],
            )
        ).collect()
    }
    assert out == {"only_a": (1, 1.0, 1.0), "only_b": (2, 6.0, 3.0)}


def test_null_values_do_not_count(spark):
    df = spark.createDataFrame(
        [("g", 2.0), ("g", None), ("g", 4.0)], "g string, v double"
    )
    r = finalize_aggs(partial_agg(df, ["g"], "v")).collect()[0]
    assert (r["n_rows"], r["value_sum"], r["value_avg"]) == (2, 6.0, 3.0)


def test_refresh_plan_is_history_free(spark, sf_dir):
    """The refresh side of the catalog query must not re-scan history:
    after the state checkpoint, the merged plan's scans are the batch
    filter only."""
    from ecommerce_full_etl_process_spark.plans.operator_queries import (
        incremental_monthly_revenue,
    )

    df = incremental_monthly_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one parquet relation (the batch scan); history enters via
    # the checkpointed state RDD, not a second table scan
    assert plan.count("Relation") - plan.count("LogicalRDD") <= 1
    assert "LogicalRDD" in plan
