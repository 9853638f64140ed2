"""S3 end-to-end: date-partitioned OLTP store → one-day slice read with
provable partition pruning."""

from __future__ import annotations

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.sources.io import (
    read_day_slice,
    write_day_partitioned,
)


def test_day_slice_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "tx_partitioned")
    rows = [
        (1, "2026-02-01", 1, 1, 1, 5.0, "visa", "success"),
        (2, "2026-02-02", 1, 1, 1, 5.0, "visa", "success"),
        (3, "2026-02-02", 2, 2, 2, 10.0, "visa", "failed"),
        (4, "2026-02-03", 1, 1, 1, 5.0, "visa", "success"),
    ]
    df = spark.createDataFrame(rows, schemas.TRANSACTIONS)
    write_day_partitioned(df, path)

    sliced = read_day_slice(spark, path, "2026-02-02")
    got = sorted(r["transaction_id"] for r in sliced.collect())
    assert got == [2, 3]
    assert sliced.columns == df.columns  # dt dropped, original shape back

    # the physical plan must prune at the partition level, not post-scan
    plan = sliced._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            assert "dt" in line and "2026-02-02" in line
            break