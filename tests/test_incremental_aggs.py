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


def test_histogram_merge_split_invariance(spark, sf_dir):
    """Any K-way split of orders merges to the same histogram state —
    and the same quantile read-out — as a single pass (the monoid
    property the incremental quantile refresh rests on)."""
    import os
    import random

    from ecommerce_full_etl_process_spark.operators.incremental import (
        histogram_partial,
        merge_histogram_partials,
        quantiles_from_histogram,
    )

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    keys = ["o_orderpriority"]
    args = ("o_totalprice", 0.0, 600_000.0, 600)
    whole = histogram_partial(o, keys, *args)
    want_state = sorted(map(tuple, whole.collect()))
    want_q = sorted(
        map(
            tuple,
            quantiles_from_histogram(
                whole, keys, 0.0, 600_000.0, 600, [0.5, 0.9]
            ).collect(),
        )
    )
    rng = random.Random(7)
    for _ in range(3):
        kways = rng.randrange(2, 5)
        pivot = rng.randrange(1, 1000)
        parts = [
            histogram_partial(
                o.where((F.col("o_orderkey") + pivot) % kways == m),
                keys,
                *args,
            )
            for m in range(kways)
        ]
        merged = merge_histogram_partials(parts, keys)
        assert sorted(map(tuple, merged.collect())) == want_state
        got_q = sorted(
            map(
                tuple,
                quantiles_from_histogram(
                    merged, keys, 0.0, 600_000.0, 600, [0.5, 0.9]
                ).collect(),
            )
        )
        assert got_q == want_q


def test_histogram_quantile_error_bound_and_clamping(spark):
    """The read-out is within one bin width of the exact quantile, and
    out-of-range values are clamped into edge bins (counted, never
    lost)."""
    from ecommerce_full_etl_process_spark.operators.incremental import (
        histogram_partial,
        merge_histogram_partials,
        quantiles_from_histogram,
    )

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    lo, hi, bins, w = 0.0, 1000.0, 50, 20.0
    state = histogram_partial(df, ["g"], "v", lo, hi, bins)
    got = {
        r["q"]: r["q_value"]
        for r in quantiles_from_histogram(
            state, ["g"], lo, hi, bins, [0.25, 0.5, 0.95]
        ).collect()
    }
    exact = {0.25: 249.0, 0.5: 499.0, 0.95: 949.0}
    for q, e in exact.items():
        assert abs(got[q] - e) <= w + 1, (q, got[q], e)

    # clamping: rows far outside [lo, hi) land in the edge bins
    wild = df.unionByName(
        spark.range(0, 100).select(
            F.lit("g").alias("g"), F.lit(1e9).alias("v")
        )
    ).unionByName(
        spark.range(0, 100).select(
            F.lit("g").alias("g"), F.lit(-1e9).alias("v")
        )
    )
    st = merge_histogram_partials(
        [histogram_partial(wild, ["g"], "v", lo, hi, bins)], ["g"]
    ).collect()
    total = sum(r["cnt"] for r in st)
    assert total == 5200  # nothing lost
    assert {r["bin"] for r in st} <= set(range(bins))


def test_histogram_partial_rejects_degenerate_ranges(spark):
    """hi <= lo or bins < 1 must fail loudly, not clamp every row into
    bin 0 and yield a wrong-but-plausible quantile state."""
    import pytest

    from ecommerce_full_etl_process_spark.operators.incremental import (
        histogram_partial,
    )

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    for lo, hi, bins in [(10.0, 10.0, 5), (10.0, 5.0, 5), (0.0, 1.0, 0)]:
        with pytest.raises(ValueError):
            histogram_partial(df, ["g"], "v", lo, hi, bins)


def test_adaptive_histogram_survives_range_blowup(spark):
    """The round-11 width-doubling state: batch 3's values blow past
    batch 1's range by ~1000×, and the merged state still (a) equals a
    one-pass histogram of all rows at the final width — the lossless
    power-of-2 coarsening identity — and (b) reads out quantiles within
    one FINAL bin width of exact."""
    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
        quantiles_from_adaptive_histogram,
    )

    lo, bins, base_w = 0.0, 64, 1.0
    # batch 1: 0..99; batch 2: 0..999; batch 3: 0..99999 — each batch's
    # own grid is fine-grained for ITS range, the merge must coarsen
    b1 = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    b2 = spark.range(0, 1000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    b3 = spark.range(0, 100_000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    parts = [
        adaptive_histogram_partial(b, ["g"], "v", lo, bins, base_w)
        for b in (b1, b2, b3)
    ]
    # batch widths really differ (the scenario is exercised)
    widths = [p.select("width").distinct().collect()[0][0] for p in parts]
    assert widths[0] < widths[1] < widths[2], widths
    merged = merge_adaptive_histogram_partials(parts, ["g"])
    onepass = adaptive_histogram_partial(
        b1.unionByName(b2).unionByName(b3), ["g"], "v", lo, bins, base_w
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, onepass.collect())
    )
    final_w = merged.select("width").distinct().collect()[0][0]
    got = {
        r["q"]: r["q_value"]
        for r in quantiles_from_adaptive_histogram(
            merged, ["g"], lo, [0.5, 0.9, 0.99]
        ).collect()
    }
    import numpy as np

    vals = np.concatenate(
        [np.arange(100), np.arange(1000), np.arange(100_000)]
    ).astype(float)
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= final_w + 1e-9, (q, got[q], exact)


def test_adaptive_histogram_per_group_widths_and_below_anchor(spark):
    """Widths are chosen PER GROUP (a small-valued group keeps its fine
    grid even when another group's range explodes), and values below the
    anchor get NEGATIVE bin indices (round 12 — the old clamp-into-bin-0
    silently corrupted signed metrics' low quantiles)."""
    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
    )

    df = spark.createDataFrame(
        [("small", float(v)) for v in range(10)]
        + [("big", float(v) * 1000) for v in range(10)]
        + [("small", -5.0)],
        "g string, v double",
    )
    state = merge_adaptive_histogram_partials(
        [adaptive_histogram_partial(df, ["g"], "v", 0.0, 16, 1.0)], ["g"]
    )
    rows = state.collect()
    w = {g: {r["width"] for r in rows if r["g"] == g} for g in ("small", "big")}
    assert len(w["small"]) == 1 and len(w["big"]) == 1
    assert max(w["small"]) < max(w["big"])
    assert sum(r["cnt"] for r in rows) == 21  # the below-anchor row counted
    below = [r for r in rows if r["g"] == "small" and r["bin"] < 0]
    assert len(below) == 1 and below[0]["cnt"] == 1  # its own bin, not bin 0


def test_adaptive_histogram_signed_merge_invariance_and_quantiles(spark):
    """Round-12 signed-metric contract: batches split around the anchor
    with wildly different ranges still merge to exactly the one-pass
    histogram (the coarsening identity holds for negative bins because
    floor division is exact there too), and quantile read-out stays
    within one final bin width of exact — including quantiles that land
    BELOW the anchor."""
    import numpy as np

    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
        quantiles_from_adaptive_histogram,
    )

    lo, bins, base_w = 0.0, 64, 1.0
    b1 = spark.range(0, 200).select(
        F.lit("g").alias("g"), (F.col("id") - 100).cast("double").alias("v")
    )  # -100..99 — two-sided, fine grid
    b2 = spark.range(0, 100).select(
        F.lit("g").alias("g"),
        (-(F.col("id") * 50)).cast("double").alias("v"),
    )  # 0..-4950 — deep negative tail forcing a coarsen
    parts = [
        adaptive_histogram_partial(b, ["g"], "v", lo, bins, base_w)
        for b in (b1, b2)
    ]
    merged = merge_adaptive_histogram_partials(parts, ["g"])
    onepass = adaptive_histogram_partial(
        b1.unionByName(b2), ["g"], "v", lo, bins, base_w
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, onepass.collect())
    )
    rows = merged.collect()
    assert min(r["bin"] for r in rows) < 0  # negative side genuinely used
    final_w = rows[0]["width"]
    got = {
        r["q"]: r["q_value"]
        for r in quantiles_from_adaptive_histogram(
            merged, ["g"], lo, [0.1, 0.5, 0.9]
        ).collect()
    }
    vals = np.concatenate([np.arange(-100, 100), -np.arange(100) * 50.0])
    for q in (0.1, 0.5, 0.9):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= final_w + 1e-9, (q, got[q], exact)


def test_covering_width_raises_loudly_when_span_exceeds_grid(spark):
    """Round-12 advice fix: a span no d in 0..40 covers must raise, not
    silently produce a NULL width that clamps every row into bin 0."""
    import pytest

    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
    )

    df = spark.createDataFrame(
        [("g", 0.0), ("g", 1e18)], "g string, v double"
    )
    with pytest.raises(Exception, match="no covering width"):
        # bins*base_width*2^40 = 1*1*2^40 ≈ 1.1e12 << 1e18
        adaptive_histogram_partial(df, ["g"], "v", 0.0, 1, 1.0).collect()


def test_adaptive_histogram_rejects_degenerate_params(spark):
    import pytest

    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
    )

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        adaptive_histogram_partial(df, ["g"], "v", 0.0, 0, 1.0)
    with pytest.raises(ValueError):
        adaptive_histogram_partial(df, ["g"], "v", 0.0, 16, 0.0)


def test_hll_distinct_split_invariance_and_error(spark, sf_dir):
    """HLL sketch state: any split merges to the same estimate as one
    pass (same lgK), and the estimate lands within 5% of exact distinct
    at lgK=12."""
    import os

    from ecommerce_full_etl_process_spark.operators.incremental import (
        distinct_partial,
        finalize_distinct,
        merge_distinct_partials,
    )

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    keys = ["o_orderpriority"]
    whole = {
        r["o_orderpriority"]: r["distinct_est"]
        for r in finalize_distinct(
            distinct_partial(o, keys, "o_custkey"), keys
        ).collect()
    }
    k = F.col("o_orderkey")
    parts = [
        distinct_partial(o.where(k % 3 == m), keys, "o_custkey")
        for m in (0, 1, 2)
    ]
    merged = {
        r["o_orderpriority"]: r["distinct_est"]
        for r in finalize_distinct(
            merge_distinct_partials(parts, keys), keys
        ).collect()
    }
    assert merged == whole
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy(*keys)
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(merged[g] - n) / n < 0.05, (g, merged[g], n)
