"""Session-cache-leak lint: after any catalog query materializes, no
DataFrame cache may remain registered in Spark's CacheManager.

Every operator that caches internally must release via the
checkpoint-then-unpersist pattern (materialize the small result with
``localCheckpoint(eager=True)``, then ``unpersist()`` the working set)
so repeated invocations in a shared session — the bench's min-of-N loop,
the driver's 71-query grading pass, a multi-day soak — don't pin working
sets for the session lifetime.

The lint checks the CacheManager, not ``getPersistentRDDs()``: local
checkpoint blocks also appear in the latter but are reclaimed by the
ContextCleaner once the result DataFrame is garbage-collected, which is
the documented lifecycle for checkpointed results (see Scd2Result).
"""

from __future__ import annotations

import pytest

from ecommerce_full_etl_process_spark.plans import catalog

_QUERIES = catalog.spark_queries()


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_cache_left_behind(spark, sf_dir, name):
    spark.catalog.clearCache()  # isolate from other modules in the session
    df = _QUERIES[name](spark, sf_dir)
    df.count()
    del df
    assert _cache_manager_empty(spark), (
        f"{name} left a cached DataFrame registered after materializing — "
        "release internal caches with localCheckpoint(eager=True) + unpersist()"
    )
