"""Bucketed (co-located) tables — the shuffle-free fact⋈fact join path.

The reference has no notion of physical layout (SQLite b-trees,
ETL/etl.py:146-168); on a 100 TB cluster the layout IS the optimization:
two facts bucketed by the same key into the same bucket count join with
ZERO exchanges — each task reads bucket i of both sides. For a join that
repeats every day (orders ⋈ lineitem on orderkey, facts ⋈ yesterday's
facts for change detection), paying one bucketed write amortizes the
shuffle out of every subsequent join.

Spark specifics this module pins down:

- ``bucketBy`` requires ``saveAsTable`` (the bucket metadata lives in the
  session catalog, not in the parquet files) — ``.parquet(path)`` would
  silently drop the bucketing.
- ``sortBy`` within buckets writes each bucket pre-sorted; note Spark 3+
  does NOT consume that ordering by default (the one-file-per-bucket
  check behind ``spark.sql.legacy.bucketedTableScan.outputOrdering`` was
  disabled for planning-cost reasons), so the plan keeps a LOCAL
  per-task sort — already-sorted input makes it a cheap verify pass,
  and the expensive part (the exchange) is what bucketing removes.
- Both sides must agree on bucket count; a mismatch silently falls back
  to a shuffle (Spark only avoids the exchange when counts line up, or
  when ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` can coalesce
  one side's count into a divisor of the other's).
- The join must be on (a superset of) the bucket columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``repartition(bucket_cols)`` first so each bucket is ONE file —
    without it every input partition writes a file per bucket
    (task_count × num_buckets small files at scale) and per-bucket sort
    order cannot be used by readers.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.repartition(num_buckets, *cols)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``,
    not ``spark.read.parquet`` — a path read loses the bucket spec and
    re-shuffles on the next join)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans a
    SortMergeJoin with NO exchange on either side (asserted by
    tests/test_bucketed_join.py). At 100 TB this is the difference
    between moving both tables over the network and moving nothing."""
    keys = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), keys, how
    )
