"""Every registered catalog query must match its DuckDB oracle (driver t2
mirror) at the test scale factor."""

from __future__ import annotations

import pytest

from ecommerce_full_etl_process_spark.plans import catalog

from .oracle_utils import compare

_QUERIES = catalog.spark_queries()
_ORACLES = catalog.oracle_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in _ORACLES:
        # rows-only check for non-SQL-expressible ops
        df = _QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    ok, msg = compare(spark, sf_dir, _QUERIES[name], _ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "region", "revenue", "line_count"}
