"""Strict StructType schemas for every table in the engine's data model.

The reference declares its model as SQLite DDL (weakly typed); here every
table is a strict Spark schema. Domain tables mirror
``/root/reference/OLTP/scripts/create_db.py:10-42`` (OLTP),
``/root/reference/OLAP/scripts/create_db.py:10-75`` (star schema) and
``/root/reference/ETL/scripts/create_db.py:10-42`` (audit), per SURVEY.md §1.3.
Raw ingest schemas keep dirty-capable columns as strings (e.g. transaction
``date``) so validation — not storage — decides what is well-formed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# OLTP source tables (raw ingest: dirty-capable columns stay strings)
# --------------------------------------------------------------------------

# reference: OLTP/scripts/create_db.py:25-32 (users)
USERS = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("join_date", T.StringType(), True),  # validated → DateType
    ]
)

# reference: OLTP/scripts/create_db.py:34-42 (products)
PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("stock", T.IntegerType(), True),
    ]
)

# reference: OLTP/scripts/create_db.py:10-23 (transactions; no PK by design —
# duplicate transaction_ids and multi-line transactions are legal input)
TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.LongType(), True),
        T.StructField("date", T.StringType(), True),  # multi-format; validated
        T.StructField("user_id", T.LongType(), True),
        T.StructField("product_id", T.LongType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),  # LINE TOTAL (unit*qty)
        T.StructField("payment_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# OLAP star schema
# --------------------------------------------------------------------------

# reference: OLAP/scripts/create_db.py:10-20; ISO week/weekday per ETL/etl.py:131
DIM_DATE = T.StructType(
    [
        T.StructField("date_id", T.IntegerType(), False),  # yyyymmdd
        T.StructField("full_date", T.DateType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("week", T.IntegerType(), False),  # ISO week
        T.StructField("weekday", T.IntegerType(), False),  # ISO 1=Mon..7=Sun
    ]
)

# reference: OLAP/scripts/create_db.py:22-33
DIM_USER = T.StructType(
    [
        T.StructField("user_sk", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("join_date", T.DateType(), True),
        T.StructField("start_date", T.DateType(), False),
        T.StructField("end_date", T.DateType(), True),  # NULL = open version
        T.StructField("current_flag", T.BooleanType(), False),
    ]
)

# reference: OLAP/scripts/create_db.py:35-46 (stock deliberately excluded —
# it goes to fact_stock_history; see ETL/etl.py:223)
DIM_PRODUCT = T.StructType(
    [
        T.StructField("product_sk", T.LongType(), False),
        T.StructField("product_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("start_date", T.DateType(), False),
        T.StructField("end_date", T.DateType(), True),
        T.StructField("current_flag", T.BooleanType(), False),
    ]
)

# reference: OLAP/scripts/create_db.py:48-64; OLTP `price` renamed `total`
# (line total, proven by populate.py:263-264 / validation.py:163)
FACT_TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.LongType(), False),
        T.StructField("user_sk", T.LongType(), True),
        T.StructField("product_sk", T.LongType(), True),
        T.StructField("date_id", T.IntegerType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("total", T.DoubleType(), True),
        T.StructField("payment_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("load_date", T.TimestampType(), True),
    ]
)

# reference: OLAP/scripts/create_db.py:66-75 (append-only change snapshot)
FACT_STOCK_HISTORY = T.StructType(
    [
        T.StructField("product_sk", T.LongType(), False),
        T.StructField("date_id", T.IntegerType(), False),
        T.StructField("stock", T.IntegerType(), True),
        T.StructField("load_date", T.TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# ETL audit tables (reference: ETL/scripts/create_db.py:10-42)
# --------------------------------------------------------------------------

ETL_RUN_LOG = T.StructType(
    [
        T.StructField("run_id", T.LongType(), False),
        T.StructField("run_date", T.DateType(), True),
        T.StructField("source_date", T.DateType(), True),
        T.StructField("status", T.StringType(), True),  # success | failed
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("ended_at", T.TimestampType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rows_dim_user_inserted", T.LongType(), True),
        T.StructField("rows_dim_product_inserted", T.LongType(), True),
        T.StructField("rows_fact_transactions_inserted", T.LongType(), True),
        T.StructField("rows_fact_stock_history_inserted", T.LongType(), True),
        T.StructField("errors", T.LongType(), True),
        T.StructField("warnings", T.LongType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

ETL_ERROR_LOG = T.StructType(
    [
        T.StructField("error_id", T.LongType(), False),
        T.StructField("run_id", T.LongType(), True),
        T.StructField("entity", T.StringType(), True),  # user|product|transaction|date
        T.StructField("table_name", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("error_type", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("severity", T.StringType(), True),  # error | warning
    ]
)

# --------------------------------------------------------------------------
# Driver test corpus (/root/testdata/sf*/ — TPC-H-ish; see TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
