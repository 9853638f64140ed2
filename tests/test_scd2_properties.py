"""Property-based tests for the SCD2 merge (SURVEY §5): interval tiling,
single current version, idempotence, determinism — under randomized
multi-day change sequences (seeded hypothesis-style scenarios)."""

from __future__ import annotations

import random
from datetime import date, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecommerce_full_etl_process_spark.operators.scd2 import (
    PRODUCT_SCD2,
    scd2_merge,
)

PRODUCT_DIM_SCHEMA = T.StructType(
    [
        T.StructField("product_sk", T.LongType()),
        T.StructField("product_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("start_date", T.DateType()),
        T.StructField("end_date", T.DateType()),
        T.StructField("current_flag", T.BooleanType()),
    ]
)

INCOMING_SCHEMA = "product_id long, name string, category string, price double"


def _random_scenario(seed: int, n_products: int = 12, n_days: int = 5):
    """A multi-day sequence of incoming snapshots with random mutations."""
    rng = random.Random(seed)
    base = {
        pid: [f"P{pid}", rng.choice(["A", "B", "C"]), round(rng.uniform(5, 100), 2)]
        for pid in range(1, n_products + 1)
    }
    days = []
    start = date(2026, 3, 1)
    for d in range(n_days):
        day = start + timedelta(days=d)
        # mutate ~1/4 of products; occasionally drop / add products
        for pid in list(base):
            if rng.random() < 0.25:
                base[pid][2] = round(base[pid][2] + rng.uniform(0.5, 5), 2)
            if rng.random() < 0.05:
                base[pid][1] = rng.choice(["A", "B", "C", "D"])
        present = [pid for pid in base if rng.random() > 0.1]
        if rng.random() < 0.5:
            new_pid = max(base) + 1
            base[new_pid] = [f"P{new_pid}", "A", round(rng.uniform(5, 100), 2)]
            present.append(new_pid)
        days.append(
            (day, [(pid, *[*base[pid]]) for pid in sorted(present)])
        )
    return days


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_scd2_invariants_random_multiday(spark, seed):
    dim = spark.createDataFrame([], PRODUCT_DIM_SCHEMA)
    for day, rows in _random_scenario(seed):
        incoming = spark.createDataFrame(rows, INCOMING_SCHEMA)
        res = scd2_merge(dim, incoming, PRODUCT_SCD2, day)
        dim = spark.createDataFrame(res.dim.collect(), PRODUCT_DIM_SCHEMA)

    rows = sorted(
        dim.collect(), key=lambda r: (r["product_id"], str(r["start_date"]))
    )
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["product_id"], []).append(r)

    for pid, versions in by_key.items():
        # exactly one current; it is the last version and open-ended
        currents = [v for v in versions if v["current_flag"]]
        assert len(currents) == 1, pid
        assert versions[-1]["current_flag"] and versions[-1]["end_date"] is None
        # intervals are disjoint and tile: next start = prev end + 1 day
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["end_date"] is not None
            assert nxt["start_date"] == prev["end_date"] + timedelta(days=1), pid

    # surrogate keys unique and dense 1..N
    sks = sorted(r["product_sk"] for r in rows)
    assert sks == list(range(1, len(rows) + 1))


def test_scd2_idempotent_same_day(spark):
    incoming = spark.createDataFrame(
        [(1, "X", "A", 10.0), (2, "Y", "B", 20.0)], INCOMING_SCHEMA
    )
    d = date(2026, 3, 1)
    dim = spark.createDataFrame([], PRODUCT_DIM_SCHEMA)
    r1 = scd2_merge(dim, incoming, PRODUCT_SCD2, d)
    dim1 = spark.createDataFrame(r1.dim.collect(), PRODUCT_DIM_SCHEMA)
    r2 = scd2_merge(dim1, incoming, PRODUCT_SCD2, d)
    assert r2.n_inserted == 0 and r2.n_updated == 0 and r2.n_unchanged == 2
    assert sorted(map(tuple, r2.dim.collect())) == sorted(map(tuple, dim1.collect()))


def test_scd2_deterministic(spark):
    """Same inputs → identical dim including surrogate keys (reproducible
    max_sk + row_number-over-natural-key assignment)."""
    incoming = spark.createDataFrame(
        [(3, "C", "A", 3.0), (1, "A", "A", 1.0), (2, "B", "B", 2.0)],
        INCOMING_SCHEMA,
    )
    d = date(2026, 3, 1)
    empty = spark.createDataFrame([], PRODUCT_DIM_SCHEMA)
    out1 = sorted(map(tuple, scd2_merge(empty, incoming, PRODUCT_SCD2, d).dim.collect()))
    out2 = sorted(map(tuple, scd2_merge(empty, incoming, PRODUCT_SCD2, d).dim.collect()))
    assert out1 == out2
    # sks follow natural-key order
    sk_by_pid = {r[1]: r[0] for r in out1}
    assert sk_by_pid[1] < sk_by_pid[2] < sk_by_pid[3]