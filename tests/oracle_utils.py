"""Local mirror of the driver's t2 DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir and
compares row count + order-insensitive values (column order normalized by
name, rows sorted). Used by tests so every catalog entry is validated before
the driver ever sees it.
"""

from __future__ import annotations

import math
import os

import duckdb

from ecommerce_full_etl_process_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise at 9 significant decimals
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _canonical(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark, sf_dir: str, spark_fn, oracle_sql: str) -> tuple[bool, str]:
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    if sorted(scols) != sorted(ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    a, b = _canonical(srows, scols), _canonical(orows, ocols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
