"""Local mirror of the driver's t2 DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir and
compares row count + order-insensitive values (column order normalized by
name, rows sorted). Used by tests so every catalog entry is validated before
the driver ever sees it.

Round-2 hardening: both sides are fetched through pandas dataframes
(``DataFrame.toPandas()`` / ``duckdb.fetchdf()``) and every cell is tagged
with its *type class* before comparison. Round 1 compared ``fetchall()``
Python values, where DuckDB's HUGEINT ``sum()`` arrived as a Python ``int``
and compared equal to Spark's ``int`` — while the driver's dataframe-rendered
hash saw ``0.0 != 0`` (HUGEINT → float64 through pandas). With type-class
tags a float-rendered aggregate can never match an int64 one, so the local
gate is at least as strict as the driver on numeric dtype drift.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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


def _cell(v):
    """Canonical (type-class, value) tag for one rendered cell.

    Classes: null, b(ool), i(nt), f(loat — incl. Decimal), d(ate),
    t(imestamp), s(tr), y(bytes), a(rray). DATE and TIMESTAMP stay
    distinct classes: the oracle side is fetched through Arrow (date32 vs
    timestamp preserved), so a Spark DateType vs oracle date_trunc
    TIMESTAMP drift fails here exactly as it would at the driver.
    """
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        if f == 0.0:  # collapse -0.0
            f = 0.0
        return ("f", round(f, 9))
    if isinstance(v, Decimal):
        return ("f", round(float(v), 9))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return ("t", v.isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_cell(x) for x in v))
    if isinstance(v, str):
        return ("s", v)
    return ("o", repr(v))


def _canonical_pdf(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def _canonical_records(records: list[dict], cols: list[str]) -> list[tuple]:
    rows = [tuple(_cell(r[c]) for c in cols) for r in records]
    return sorted(rows, key=repr)


def compare(spark, sf_dir: str, spark_fn, oracle_sql: str) -> tuple[bool, str]:
    # Constraint this mirrors from the driver: the Spark side renders via
    # toPandas, so a NULLABLE integer output column with actual NULLs
    # becomes float64 (type-class 'f') while DuckDB yields ints ('i') —
    # such a column can never pass the gate. Catalog entries must therefore
    # not emit nullable integer result columns (coalesce() them or cast to
    # double on both sides).
    spdf = spark_fn(spark, sf_dir).toPandas()

    con = duckdb_connection(sf_dir)
    # Arrow fetch keeps DATE (date32) and TIMESTAMP distinct — fetchdf
    # renders DATE as midnight datetime64, which would mask date-vs-
    # timestamp dtype drift. to_pylist() yields native date/datetime/
    # int/float/Decimal values (HUGEINT → Decimal, still != int class).
    tbl = con.execute(oracle_sql).arrow()

    scols, ocols = sorted(spdf.columns), sorted(tbl.column_names)
    if scols != ocols:
        return False, f"column mismatch: spark={scols} oracle={ocols}"
    if len(spdf) != tbl.num_rows:
        return False, f"row count mismatch: spark={len(spdf)} oracle={tbl.num_rows}"
    a = _canonical_pdf(spdf)
    b = _canonical_records(tbl.to_pylist(), ocols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
