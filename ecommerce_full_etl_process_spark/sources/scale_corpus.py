"""Deterministic scale-corpus generator for scale-headroom benchmarking.

Synthesizes ``documents`` / ``embeddings`` / ``events`` tables that match
the driver testdata's schemas and distributions (vocab-sampled texts with
the driver's n_chars range, dim-64 float embeddings, a 30-day event stream)
at an arbitrary size multiplier, so the heavy operators can be timed at ×1
vs ×10 on IDENTICALLY-distributed data and the ratio isolates data-volume
scaling from distribution shift.

Generation is fully distributed and deterministic:

- ``spark.range`` partitions the id space across executors — no
  driver-side row materialization at any size (the ×1000 corpus generates
  the same way the ×1 does);
- every attribute derives from ``xxhash64(id, salt)`` column expressions —
  pure JVM whole-stage-codegen, no UDFs, and re-running yields
  byte-identical tables (the scale bench is reproducible);
- events model GROWTH correctly: 10× data means 10× USERS at a constant
  ~67 events/user (the real-world shape — histories don't get 10× deeper
  because the corpus grew), so per-user window partitions stay bounded and
  the sessionize measurement reflects row volume, not partition skew.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: vocabulary mirroring the driver corpus's token style (short common words
#: → realistic shingle collision rates for MinHash/SimHash)
_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group query table stream filter big merge join agg vector key "
    "window customer data the a"
).split()

BASE_DOCS = 5_000  # sf0.1 documents rows
BASE_VECS = 2_000  # sf0.1 embeddings rows
BASE_EVENTS = 100_000  # sf0.1 events rows
BASE_USERS = 1_500  # sf0.1 distinct user_ids

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _h(col: F.Column, salt: int) -> F.Column:
    """Non-negative deterministic hash of (col, salt)."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def gen_documents(spark: SparkSession, n: int, parts: int) -> DataFrame:
    """``documents(doc_id, text, lang, source, n_chars)`` — texts of 8..115
    vocab words (driver range: n_chars 44..577), 5 langs, 20 sources."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    d = spark.range(0, n, 1, parts).select(F.col("id").alias("doc_id"))
    n_words = (_h(F.col("doc_id"), 1) % 108 + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab, (_h(F.col("doc_id") * 1000 + i, 2) % len(_VOCAB) + 1).cast("int")
        ),
    )
    return d.select(
        "doc_id",
        F.array_join(words, " ").alias("text"),
        F.concat(F.lit("l"), (_h(F.col("doc_id"), 3) % 5).cast("string")).alias(
            "lang"
        ),
        F.concat(F.lit("src"), (_h(F.col("doc_id"), 4) % 20).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))


def gen_embeddings(spark: SparkSession, n: int, parts: int, dim: int = 64) -> DataFrame:
    """``embeddings(vec_id, embedding array<float>, label int)`` — values
    uniform in [-0.5, 0.5), 10 labels."""
    d = spark.range(0, n, 1, parts).select(F.col("id").alias("vec_id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (_h(F.col("vec_id") * dim + i, 5) % 100_000) / 100_000.0 - 0.5
        ).cast("float"),
    )
    return d.select(
        "vec_id",
        vec.alias("embedding"),
        (_h(F.col("vec_id"), 6) % 10).cast("int").alias("label"),
    )


def gen_events(
    spark: SparkSession, n: int, n_users: int, parts: int
) -> DataFrame:
    """``events(event_id, ts, user_id, event_type, value, props)`` — 30
    days of naive-UTC micros timestamps from 2024-01-01, JSON props."""
    span_us = 30 * 24 * 3600 * 1_000_000
    d = spark.range(0, n, 1, parts).select(F.col("id").alias("event_id"))
    etype = F.array(*[F.lit(t) for t in _EVENT_TYPES])
    epoch = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    return d.select(
        "event_id",
        F.timestamp_add(
            "MICROSECOND", _h(F.col("event_id"), 7) % span_us, epoch
        ).alias("ts"),
        (_h(F.col("event_id"), 8) % n_users + 1).alias("user_id"),
        F.element_at(
            etype, (_h(F.col("event_id"), 9) % len(_EVENT_TYPES) + 1).cast("int")
        ).alias("event_type"),
        ((_h(F.col("event_id"), 10) % 10_000) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), (_h(F.col("event_id"), 11) % 100).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


BASE_CUSTOMERS = 15_000  # sf0.1 customer rows
BASE_ORDERS = 150_000  # sf0.1 orders rows
LINES_PER_ORDER = 4  # sf0.1 lineitem/orders ≈ 4.07

_STATUSES = ("O", "P", "F")
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_SEGMENTS = ("BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY", "AUTOMOBILE")
_RETURNFLAGS = ("N", "A", "R")
_LINESTATUSES = ("O", "F")


def _pick(options: tuple[str, ...], key: F.Column, salt: int) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (_h(key, salt) % len(options) + 1).cast("int"))


def gen_customer(spark: SparkSession, n: int, parts: int) -> DataFrame:
    """``customer`` matching the driver schema: 25 nations, 5 segments."""
    d = spark.range(0, n, 1, parts).select((F.col("id") + 1).alias("c_custkey"))
    return d.select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.col("c_custkey")).alias("c_name"),
        (_h(F.col("c_custkey"), 20) % 25).cast("int").alias("c_nationkey"),
        ((_h(F.col("c_custkey"), 21) % 1_100_000) / 100.0 - 1000.0).alias(
            "c_acctbal"
        ),
        _pick(_SEGMENTS, F.col("c_custkey"), 22).alias("c_mktsegment"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int, parts: int) -> DataFrame:
    """``orders`` matching the driver's ranges: orderdates spanning
    1995-01-01..2001-08-01 (so the TPC-H-shaped date predicates keep the
    same selectivity at every multiplier), custkeys over the scaled
    customer table."""
    span_days = 2404  # 1995-01-01 .. 2001-08-01
    d = spark.range(0, n, 1, parts).select((F.col("id") + 1).alias("o_orderkey"))
    epoch = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    return d.select(
        "o_orderkey",
        (_h(F.col("o_orderkey"), 23) % n_cust + 1).alias("o_custkey"),
        _pick(_STATUSES, F.col("o_orderkey"), 24).alias("o_orderstatus"),
        ((_h(F.col("o_orderkey"), 25) % 45_000_000) / 100.0 + 900.0).alias(
            "o_totalprice"
        ),
        F.timestamp_add(
            "DAY", (_h(F.col("o_orderkey"), 26) % span_days).cast("int"), epoch
        ).alias("o_orderdate"),
        _pick(_PRIORITIES, F.col("o_orderkey"), 27).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, n_orders: int, parts: int) -> DataFrame:
    """``lineitem``: LINES_PER_ORDER rows per order, shipdate = orderdate +
    1..95 days (reproduced from the orderkey hash so no join is needed at
    generation time), quantities/prices/discounts in the driver's ranges."""
    span_days = 2404
    n = n_orders * LINES_PER_ORDER
    d = spark.range(0, n, 1, parts).select(
        (F.col("id") / LINES_PER_ORDER + 1).cast("long").alias("l_orderkey"),
        (F.col("id") % LINES_PER_ORDER + 1).cast("int").alias("l_linenumber"),
        F.col("id").alias("_i"),
    )
    epoch = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    order_day = (_h(F.col("l_orderkey"), 26) % span_days).cast("int")
    return d.select(
        "l_orderkey",
        (_h(F.col("_i"), 30) % 20_000 + 1).alias("l_partkey"),
        (_h(F.col("_i"), 31) % 1_000 + 1).alias("l_suppkey"),
        "l_linenumber",
        (_h(F.col("_i"), 32) % 50 + 1).cast("double").alias("l_quantity"),
        ((_h(F.col("_i"), 33) % 10_400_000) / 100.0 + 900.0).alias(
            "l_extendedprice"
        ),
        ((_h(F.col("_i"), 34) % 11) / 100.0).alias("l_discount"),
        ((_h(F.col("_i"), 35) % 9) / 100.0).alias("l_tax"),
        _pick(_RETURNFLAGS, F.col("_i"), 36).alias("l_returnflag"),
        _pick(_LINESTATUSES, F.col("_i"), 37).alias("l_linestatus"),
        F.timestamp_add(
            "DAY",
            order_day + (_h(F.col("_i"), 38) % 95 + 1).cast("int"),
            epoch,
        ).alias("l_shipdate"),
    )


def write_scale_dir(spark: SparkSession, out_dir: str, multiplier: int) -> None:
    """Materialize the three scale tables at ``multiplier``× the sf0.1 row
    counts under ``out_dir`` (idempotent: skips tables already written).
    Partition count scales with the multiplier so file sizes — and thus
    scan parallelism per byte — stay constant across scales."""
    parts = max(4, 4 * multiplier)
    jobs = [
        ("documents", lambda: gen_documents(spark, BASE_DOCS * multiplier, parts)),
        ("embeddings", lambda: gen_embeddings(spark, BASE_VECS * multiplier, parts)),
        (
            "events",
            lambda: gen_events(
                spark, BASE_EVENTS * multiplier, BASE_USERS * multiplier, parts
            ),
        ),
    ]
    for name, build in jobs:
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        build().write.mode("overwrite").parquet(path)


def write_relational_scale_dir(
    spark: SparkSession,
    out_dir: str,
    multiplier: int,
    dims_from: str = "/root/testdata/sf0.1",
) -> None:
    """Materialize the star-schema tables at ``multiplier``× the sf0.1 row
    counts: customer/orders/lineitem scale with the multiplier (facts and
    the customer dimension grow with the business), while nation/region/
    supplier/part are copied fixed-size from the driver testdata — exactly
    TPC-H's model, where nation and region are constant at every SF. Also
    writes the scaled ``events`` table so the as-of join (events⋈orders)
    can be timed on co-scaled inputs. Idempotent per table."""
    parts = max(4, 4 * multiplier)
    n_cust = BASE_CUSTOMERS * multiplier
    jobs = [
        ("customer", lambda: gen_customer(spark, n_cust, parts)),
        (
            "orders",
            lambda: gen_orders(spark, BASE_ORDERS * multiplier, n_cust, parts),
        ),
        (
            "lineitem",
            lambda: gen_lineitem(spark, BASE_ORDERS * multiplier, parts),
        ),
        (
            "events",
            lambda: gen_events(
                spark, BASE_EVENTS * multiplier, BASE_USERS * multiplier, parts
            ),
        ),
    ] + [
        (dim, lambda dim=dim: spark.read.parquet(
            os.path.join(dims_from, f"{dim}.parquet")
        ))
        for dim in ("nation", "region", "supplier", "part")
    ]
    for name, build in jobs:
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        build().write.mode("overwrite").parquet(path)
