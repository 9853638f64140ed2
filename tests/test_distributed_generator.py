"""Distributed generator (S10 at scale): deterministic, partition-invariant,
validation-clean output."""

from __future__ import annotations

from datetime import date

from ecommerce_full_etl_process_spark.operators import validation as V
from ecommerce_full_etl_process_spark.sources.generators import (
    generate_clean_distributed,
)

TODAY = date(2026, 2, 2)


def test_deterministic_and_partition_invariant(spark):
    a = generate_clean_distributed(spark, 500, 50, seed=9, today=TODAY)
    b = generate_clean_distributed(spark, 500, 50, seed=9, today=TODAY)
    assert sorted(map(tuple, a["users"].collect())) == sorted(
        map(tuple, b["users"].collect())
    )
    # repartitioned input must yield identical rows (hash is id-derived)
    c = generate_clean_distributed(spark, 500, 50, seed=9, today=TODAY)
    assert sorted(map(tuple, a["products"].collect())) == sorted(
        map(tuple, c["products"].repartition(13).collect())
    )


def test_output_is_validation_clean(spark):
    dfs = generate_clean_distributed(spark, 300, 30, seed=4, today=TODAY)
    u = V.validate_users(dfs["users"])
    p = V.validate_products(dfs["products"])
    assert u.rejected.count() == 0
    assert p.rejected.count() == 0
    assert u.valid.count() == 300
    assert p.valid.count() == 30