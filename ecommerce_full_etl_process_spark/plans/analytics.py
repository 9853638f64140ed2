"""Analytic query catalog over the driver testdata corpus.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; each is
registered in ``__spark_entry__.queries()`` with a DuckDB oracle SQL string.
Together they exercise every operator family of SURVEY.md §2 (scans, filters,
predicates, joins incl. semi/anti/as-of, aggregation, windows/top-k, dedup,
set ops, scalar functions) on the TPC-H-ish corpus.

Design rules:
- Every computed column is aliased identically to its oracle SQL.
- Money aggregates are rounded to 2dp on BOTH sides so double summation
  order (Spark partial aggregation vs DuckDB serial) cannot flip the hash.
- Plans stay fully declarative: Catalyst handles pushdown/pruning; small
  dimension sides are explicitly broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Flagship: revenue by nation (scan → filter → 4-way join → agg → sort)
# ---------------------------------------------------------------------------

def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation, big fact joined to small
    broadcast dims (reference analogue: the star-schema group-by analytics of
    demo.ipynb cell 16 / SURVEY §2.5 A3, at warehouse scale).

    Scale: lineitem⋈orders shuffles on orderkey; customer/nation/region are
    broadcast so only the two big tables shuffle once each.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(nation.n_name.alias("nation"), region.r_name.alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue"))
    )


FLAGSHIP_ORACLE = """
SELECT n_name AS nation,
       r_name AS region,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY revenue DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (wide aggregation; SURVEY §2.5)
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + groupBy with sum/avg/count — the aggregation workhorse.

    Map-side partial aggregation keeps the shuffle tiny (4 groups) at any
    scale; the shipdate filter pushes down to the parquet scan.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped: shipping priority (selective join + agg + top-k)
# ---------------------------------------------------------------------------

def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed before a date with lines shipped after it — revenue
    per order, top 10. The selective-filter + big-join + top-k shape."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_ORACLE = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q18-shaped: large-volume customers (HAVING over a join)
# ---------------------------------------------------------------------------

def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big_orders.join(o, big_orders.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


LARGE_VOLUME_CUSTOMERS_ORACLE = """
SELECT c_custkey, c_name, l_orderkey AS orderkey,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Event sessionization: gap-based session assignment (window running sum)
# ---------------------------------------------------------------------------

def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign session ids per user: a gap > 30 minutes starts a new
    session; report events + duration per session. Pure window functions
    (lag → boundary flag → running sum), the standard behavioral-analytics
    operator on event streams."""
    from .operator_queries import _events, ntz_epoch_micros
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds as double on BOTH engines (exact µs / 1e6,
    # matching DuckDB's epoch()) — unix_timestamp() truncates to whole
    # seconds BEFORE subtracting, which drifts ±1s vs fractional epoch,
    # and TIMESTAMP_NTZ can't cast to DOUBLE directly
    epoch = ntz_epoch_micros(F.col("ts")) / F.lit(1_000_000.0)
    gap = epoch - F.lag(epoch).over(w)
    flagged = e.withColumn(
        "new_session",
        (F.lag("ts").over(w).isNull() | (gap > 1800)).cast("long"),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(epoch) - F.min(epoch)).cast("long").alias("duration_s"),
        )
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, did view → click → purchase happen in
    that temporal order? One conditional aggregation pass (min event time
    per stage), then ordering predicates — no joins, no windows."""
    from .operator_queries import _events

    e = _events(spark, sf_dir)
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    t_click = F.min(F.when(F.col("event_type") == "click", F.col("ts")))
    t_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    per_user = e.groupBy("user_id").agg(
        t_view.alias("t_view"),
        t_click.alias("t_click"),
        t_purchase.alias("t_purchase"),
    )
    reached_click = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
    )
    reached_purchase = (
        reached_click
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_click"))
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_viewed"),
        F.sum(reached_click.cast("long")).alias("n_clicked_after_view"),
        F.sum(reached_purchase.cast("long")).alias("n_purchased_after_click"),
    )


EVENT_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_viewed,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_view THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clicked_after_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_view AND t_purchase IS NOT NULL
                 AND t_purchase > t_click THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchased_after_click
FROM per_user
"""


def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week; for each
    cohort, distinct users active k weeks later. Two aggregations + one
    broadcast-able join — the standard warehouse retention matrix."""
    from .operator_queries import _events

    e = _events(spark, sf_dir).select("user_id", "ts")
    first_week = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        active.join(F.broadcast(first_week), "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


WEEKLY_RETENTION_COHORTS_ORACLE = """
WITH first_week AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
       count(DISTINCT user_id) AS n_active
FROM active JOIN first_week USING (user_id)
GROUP BY cohort_week, week_offset
"""


def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (n-gram LM statistics): shingle →
    explode → count, deterministic tie-break."""
    from ..operators.dedup import word_shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(F.explode(word_shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


TOP_BIGRAMS_ORACLE = """
WITH grams AS (
  SELECT unnest(list_distinct(
           [ array_to_string(w[i:i+1], ' ')
             for i in range(1, greatest(len(w), 1)) ]
         )) AS bigram
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
)
SELECT bigram, count(*) AS n
FROM grams GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT 20
"""


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization (the streaming-ready form
    of sessionize_events): per user, events within 30 minutes of the
    previous one merge into a session. Oracle = the lag/cumsum formulation
    with the matching >= boundary (a new session starts when the gap
    reaches the timeout)."""
    from .operator_queries import _events

    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


SESSION_WINDOW_EVENTS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
per_session AS (
  SELECT user_id, session_seq, count(*) AS n_events
  FROM sessioned GROUP BY user_id, session_seq
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(n_events) AS max_session_events
FROM per_session GROUP BY user_id
"""


SESSIONIZE_EVENTS_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       CAST(trunc(max(epoch(ts)) - min(epoch(ts))) AS BIGINT) AS duration_s
FROM sessioned
GROUP BY user_id, session_seq
"""
