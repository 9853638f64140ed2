"""Differential query fuzzing (SURVEY §5 extension): generate seeded random
query specs, compile each to BOTH a Spark DataFrame plan and a DuckDB SQL
string from the same spec, and compare results. Catches operator-semantics
drift the hand-written catalog misses.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import math

from .oracle_utils import compare, duckdb_connection


def compare_grouped_tolerant(spark, sf_dir, spark_fn, oracle_sql):
    """Group-keyed comparison with relative float tolerance — the hand
    -written catalog rounds identically on both sides, but the fuzzer's
    random aggregates can land exactly on a rounding boundary where the
    engines' summation order flips the last digit."""
    sdf = spark_fn(spark, sf_dir)
    srows = {r["g"]: r for r in sdf.collect()}
    cur = duckdb_connection(sf_dir).execute(oracle_sql)
    cols = [d[0] for d in cur.description]
    orows = {dict(zip(cols, r))["g"]: dict(zip(cols, r)) for r in cur.fetchall()}
    if set(srows) != set(orows):
        return False, f"group keys differ: {set(srows) ^ set(orows)}"
    for g, sr in srows.items():
        orow = orows[g]
        if sr["n_rows"] != orow["n_rows"]:
            return False, f"n_rows mismatch at g={g}"
        a, b = sr["agg_val"], orow["agg_val"]
        if a is None or b is None:
            if a != b:
                return False, f"null mismatch at g={g}: {a} vs {b}"
        elif not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
            return False, f"agg mismatch at g={g}: {a} vs {b}"
    return True, "ok"

# (table, columns usable for filters/groups/aggs)
TABLES = {
    "orders": {
        "num": ["o_totalprice", "o_orderkey", "o_custkey"],
        "cat": ["o_orderstatus", "o_orderpriority"],
    },
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "cat": ["l_returnflag", "l_linestatus"],
    },
    "customer": {
        "num": ["c_acctbal", "c_custkey", "c_nationkey"],
        "cat": ["c_mktsegment"],
    },
    "part": {
        "num": ["p_retailprice", "p_size", "p_partkey"],
        "cat": ["p_brand", "p_type"],
    },
}

OPS = ["<", "<=", ">", ">=", "="]


def _gen_spec(rng: random.Random) -> dict:
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    n_filters = rng.randint(0, 2)
    filters = []
    for _ in range(n_filters):
        col = rng.choice(cols["num"])
        op = rng.choice(OPS)
        # threshold scaled roughly to plausible column magnitudes
        base = {
            "o_totalprice": 200000, "o_orderkey": 3000, "o_custkey": 100,
            "l_quantity": 25, "l_extendedprice": 40000, "l_discount": 0.05,
            "l_tax": 0.04, "c_acctbal": 5000, "c_custkey": 100,
            "c_nationkey": 12, "p_retailprice": 1200, "p_size": 25,
            "p_partkey": 100,
        }[col]
        val = round(base * rng.uniform(0.3, 1.5), 2)
        filters.append((col, op, val))
    group = rng.choice(cols["cat"])
    agg_col = rng.choice(cols["num"])
    agg = rng.choice(["sum", "avg", "min", "max", "count"])
    return {
        "table": table, "filters": filters, "group": group,
        "agg": agg, "agg_col": agg_col,
    }


def _spark_query(spec):
    def q(spark, sf_dir):
        import os

        df = spark.read.parquet(
            os.path.join(sf_dir, f"{spec['table']}.parquet")
        )
        for col, op, val in spec["filters"]:
            c = F.col(col)
            cond = {
                "<": c < val, "<=": c <= val, ">": c > val,
                ">=": c >= val, "=": c == val,
            }[op]
            df = df.where(cond)
        a = spec["agg"]
        if a == "count":
            expr = F.count(F.lit(1)).alias("agg_val")
        else:
            fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[a]
            expr = fn(spec["agg_col"]).alias("agg_val")
        return df.groupBy(F.col(spec["group"]).alias("g")).agg(
            expr, F.count(F.lit(1)).alias("n_rows")
        )

    return q


def _sql_query(spec) -> str:
    where = " AND ".join(
        f"{c} {op} {v}" for c, op, v in spec["filters"]
    )
    where_clause = f"WHERE {where}" if where else ""
    a = spec["agg"]
    agg_expr = "count(*)" if a == "count" else f"{a}({spec['agg_col']})"
    return f"""
SELECT {spec['group']} AS g, {agg_expr} AS agg_val, count(*) AS n_rows
FROM {spec['table']} {where_clause} GROUP BY {spec['group']}
"""


@pytest.mark.parametrize("seed", range(40))
def test_random_query_matches_duckdb(spark, sf_dir, seed):
    rng = random.Random(1000 + seed)
    spec = _gen_spec(rng)
    ok, msg = compare_grouped_tolerant(
        spark, sf_dir, _spark_query(spec), _sql_query(spec)
    )
    assert ok, f"spec={spec}: {msg}"


# ---------------------------------------------------------------------------
# join fuzzing: fact ⋈ dim with filters on both sides + grouped aggregation
# ---------------------------------------------------------------------------

JOINS = [
    # (fact, fact_key, dim, dim_key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
]


def _gen_join_spec(rng: random.Random) -> dict:
    fact, fkey, dim, dkey = rng.choice(JOINS)
    fcols, dcols = TABLES[fact], TABLES[dim]
    join_how = rng.choice(["inner", "left"])
    f_filter = None
    if rng.random() < 0.7:
        col = rng.choice(fcols["num"])
        base = {
            "o_totalprice": 200000, "o_orderkey": 3000, "o_custkey": 100,
            "l_quantity": 25, "l_extendedprice": 40000, "l_discount": 0.05,
            "l_tax": 0.04,
        }.get(col, 100)
        f_filter = (col, rng.choice(OPS), round(base * rng.uniform(0.3, 1.5), 2))
    group = rng.choice(dcols["cat"] + fcols["cat"])
    agg_col = rng.choice(fcols["num"])
    agg = rng.choice(["sum", "avg", "min", "max", "count"])
    return {
        "fact": fact, "fkey": fkey, "dim": dim, "dkey": dkey,
        "how": join_how, "f_filter": f_filter, "group": group,
        "agg": agg, "agg_col": agg_col,
    }


def _spark_join_query(spec):
    def q(spark, sf_dir):
        import os

        fact = spark.read.parquet(os.path.join(sf_dir, f"{spec['fact']}.parquet"))
        dim = spark.read.parquet(os.path.join(sf_dir, f"{spec['dim']}.parquet"))
        if spec["f_filter"]:
            col, op, val = spec["f_filter"]
            c = F.col(col)
            fact = fact.where(
                {"<": c < val, "<=": c <= val, ">": c > val,
                 ">=": c >= val, "=": c == val}[op]
            )
        joined = fact.join(
            dim, fact[spec["fkey"]] == dim[spec["dkey"]], spec["how"]
        )
        a = spec["agg"]
        if a == "count":
            expr = F.count(F.lit(1)).alias("agg_val")
        else:
            fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[a]
            expr = fn(spec["agg_col"]).alias("agg_val")
        return joined.groupBy(F.col(spec["group"]).alias("g")).agg(
            expr, F.count(F.lit(1)).alias("n_rows")
        )

    return q


def _sql_join_query(spec) -> str:
    where = ""
    if spec["f_filter"]:
        col, op, val = spec["f_filter"]
        where = f"WHERE {col} {op} {val}"
    a = spec["agg"]
    agg_expr = "count(*)" if a == "count" else f"{a}({spec['agg_col']})"
    how = "JOIN" if spec["how"] == "inner" else "LEFT JOIN"
    return f"""
SELECT {spec['group']} AS g, {agg_expr} AS agg_val, count(*) AS n_rows
FROM (SELECT * FROM {spec['fact']} {where}) f
{how} {spec['dim']} d ON f.{spec['fkey']} = d.{spec['dkey']}
GROUP BY {spec['group']}
"""


@pytest.mark.parametrize("seed", range(30))
def test_random_join_matches_duckdb(spark, sf_dir, seed):
    rng = random.Random(5000 + seed)
    spec = _gen_join_spec(rng)
    ok, msg = compare_grouped_tolerant(
        spark, sf_dir, _spark_join_query(spec), _sql_join_query(spec)
    )
    assert ok, f"spec={spec}: {msg}"


# ---------------------------------------------------------------------------
# window fuzzing: rank/row_number/lag/lead/running-sum over random specs
# (deterministic: order always includes a unique key tie-break)
# ---------------------------------------------------------------------------

WINDOW_TABLES = {
    "orders": ("o_custkey", "o_totalprice", "o_orderkey"),
    "lineitem": ("l_suppkey", "l_extendedprice", ("l_orderkey", "l_linenumber")),
}


def _gen_window_spec(rng: random.Random) -> dict:
    table = rng.choice(list(WINDOW_TABLES))
    part, val, uniq = WINDOW_TABLES[table]
    fn = rng.choice(["row_number", "rank", "lag", "lead", "cumsum"])
    desc = rng.random() < 0.5
    return {"table": table, "part": part, "val": val, "uniq": uniq,
            "fn": fn, "desc": desc}


def _uniq_cols(spec):
    u = spec["uniq"]
    return list(u) if isinstance(u, tuple) else [u]


def _spark_window_query(spec):
    def q(spark, sf_dir):
        import os

        from pyspark.sql.window import Window

        df = spark.read.parquet(os.path.join(sf_dir, f"{spec['table']}.parquet"))
        order = [
            F.desc(spec["val"]) if spec["desc"] else F.asc(spec["val"])
        ] + [F.asc(c) for c in _uniq_cols(spec)]
        w = Window.partitionBy(spec["part"]).orderBy(*order)
        fn = spec["fn"]
        if fn == "row_number":
            expr = F.row_number().over(w)
        elif fn == "rank":
            expr = F.rank().over(w)
        elif fn == "lag":
            expr = F.round(F.lag(spec["val"]).over(w), 4)
        elif fn == "lead":
            expr = F.round(F.lead(spec["val"]).over(w), 4)
        else:
            expr = F.round(
                F.sum(spec["val"]).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                4,
            )
        return df.select(
            *_uniq_cols(spec), F.col(spec["part"]).alias("p"), expr.alias("wv")
        )

    return q


def _sql_window_query(spec) -> str:
    direction = "DESC" if spec["desc"] else "ASC"
    order = f"{spec['val']} {direction}, " + ", ".join(
        f"{c} ASC" for c in _uniq_cols(spec)
    )
    fn = spec["fn"]
    if fn in ("row_number", "rank"):
        expr = f"{fn}() OVER w"
    elif fn in ("lag", "lead"):
        expr = f"round({fn}({spec['val']}) OVER w, 4)"
    else:
        expr = (
            f"round(sum({spec['val']}) OVER (PARTITION BY {spec['part']} "
            f"ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)"
        )
    uniq = ", ".join(_uniq_cols(spec))
    return f"""
SELECT {uniq}, {spec['part']} AS p, {expr} AS wv
FROM {spec['table']}
WINDOW w AS (PARTITION BY {spec['part']} ORDER BY {order})
"""


@pytest.mark.parametrize("seed", range(20))
def test_random_window_matches_duckdb(spark, sf_dir, seed):
    rng = random.Random(9000 + seed)
    spec = _gen_window_spec(rng)
    ok, msg = compare(
        spark, sf_dir, _spark_window_query(spec), _sql_window_query(spec)
    )
    assert ok, f"spec={spec}: {msg}"

# ---------------------------------------------------------------------------
# integer-aggregate fuzzing through the STRICT (driver-mirror) comparator:
# DuckDB promotes integer sum() to HUGEINT, which renders float64 through
# pandas and breaks the driver's dtype-faithful hash unless the oracle casts
# the outermost aggregate to BIGINT. These specs generate conditional-sum /
# count shapes with that cast convention and compare via the strict gate, so
# HUGEINT-class drift can never re-enter the catalog unnoticed.
# ---------------------------------------------------------------------------


def _gen_intagg_spec(rng: random.Random) -> dict:
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    col = rng.choice(cols["num"])
    base = {
        "o_totalprice": 200000, "o_orderkey": 3000, "o_custkey": 100,
        "l_quantity": 25, "l_extendedprice": 40000, "l_discount": 0.05,
        "l_tax": 0.04, "c_acctbal": 5000, "c_custkey": 100,
        "c_nationkey": 12, "p_retailprice": 1200, "p_size": 25,
        "p_partkey": 100,
    }[col]
    thr = round(base * rng.uniform(0.3, 1.5), 2)
    op = rng.choice(OPS)
    group = rng.choice(cols["cat"])
    kind = rng.choice(["cond_sum", "sum_int", "count_distinct"])
    return {
        "table": table, "col": col, "op": op, "thr": thr,
        "group": group, "kind": kind,
    }


def _spark_intagg_query(spec):
    def q(spark, sf_dir):
        import os

        df = spark.read.parquet(
            os.path.join(sf_dir, f"{spec['table']}.parquet")
        )
        c = F.col(spec["col"])
        pred = {
            "<": c < spec["thr"], "<=": c <= spec["thr"],
            ">": c > spec["thr"], ">=": c >= spec["thr"],
            "=": c == spec["thr"],
        }[spec["op"]]
        if spec["kind"] == "cond_sum":
            expr = F.sum(pred.cast("long")).alias("v")
        elif spec["kind"] == "sum_int":
            expr = F.sum(F.floor(c).cast("long")).alias("v")
        else:
            expr = F.countDistinct(F.floor(c)).alias("v")
        return df.groupBy(F.col(spec["group"]).alias("g")).agg(
            expr, F.count(F.lit(1)).alias("n_rows")
        )

    return q


def _sql_intagg_query(spec) -> str:
    pred = f"{spec['col']} {spec['op']} {spec['thr']}"
    if spec["kind"] == "cond_sum":
        expr = f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
    elif spec["kind"] == "sum_int":
        expr = f"CAST(sum(CAST(floor({spec['col']}) AS BIGINT)) AS BIGINT)"
    else:
        expr = f"count(DISTINCT floor({spec['col']}))"
    return f"""
SELECT {spec['group']} AS g, {expr} AS v, count(*) AS n_rows
FROM {spec['table']} GROUP BY {spec['group']}
"""


@pytest.mark.parametrize("seed", range(20))
def test_random_intagg_matches_duckdb_strict(spark, sf_dir, seed):
    rng = random.Random(4000 + seed)
    spec = _gen_intagg_spec(rng)
    ok, msg = compare(
        spark, sf_dir, _spark_intagg_query(spec), _sql_intagg_query(spec)
    )
    assert ok, f"spec={spec}: {msg}"


# ---------------------------------------------------------------------------
# date/calendar-function fuzzing (strict comparator): the Spark↔DuckDB
# calendar mappings are subtle (dayofweek origins differ, weekofyear is ISO
# in Spark but not every DuckDB week function) — fuzz the agreed mappings so
# any future date-function use inherits a verified equivalence table.
# ---------------------------------------------------------------------------

DATE_FNS = [
    # (name, spark expr builder, duckdb sql template)
    ("year", lambda c: F.year(c).cast("int"), "CAST(year({c}) AS INT)"),
    ("month", lambda c: F.month(c).cast("int"), "CAST(month({c}) AS INT)"),
    ("day", lambda c: F.dayofmonth(c).cast("int"), "CAST(day({c}) AS INT)"),
    ("quarter", lambda c: F.quarter(c).cast("int"), "CAST(quarter({c}) AS INT)"),
    ("iso_week", lambda c: F.weekofyear(c).cast("int"), "CAST(weekofyear({c}) AS INT)"),
    ("iso_dow", lambda c: ((F.dayofweek(c) + 5) % 7 + 1).cast("int"), "CAST(isodow({c}) AS INT)"),
    ("doy", lambda c: F.dayofyear(c).cast("int"), "CAST(dayofyear({c}) AS INT)"),
    (
        "month_trunc",
        lambda c: F.date_trunc("month", c).cast("date"),
        "CAST(date_trunc('month', {c}) AS DATE)",
    ),
    (
        "days_to_epoch2000",
        lambda c: F.datediff(c.cast("date"), F.lit("2000-01-01").cast("date")).cast("int"),
        "CAST(date_diff('day', DATE '2000-01-01', CAST({c} AS DATE)) AS INT)",
    ),
]

DATE_COLS = [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]


def _gen_datefn_spec(rng: random.Random) -> dict:
    table, col = rng.choice(DATE_COLS)
    fn = rng.choice(range(len(DATE_FNS)))
    return {"table": table, "col": col, "fn": fn}


def _spark_datefn_query(spec):
    def q(spark, sf_dir):
        import os

        name, build, _ = DATE_FNS[spec["fn"]]
        df = spark.read.parquet(
            os.path.join(sf_dir, f"{spec['table']}.parquet")
        )
        return df.groupBy(build(F.col(spec["col"])).alias("g")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )

    return q


def _sql_datefn_query(spec) -> str:
    _, _, tpl = DATE_FNS[spec["fn"]]
    expr = tpl.format(c=spec["col"])
    return f"""
SELECT {expr} AS g, count(*) AS n_rows
FROM {spec['table']} GROUP BY 1
"""


@pytest.mark.parametrize("seed", range(15))
def test_random_datefn_matches_duckdb_strict(spark, sf_dir, seed):
    rng = random.Random(6000 + seed)
    spec = _gen_datefn_spec(rng)
    ok, msg = compare(
        spark, sf_dir, _spark_datefn_query(spec), _sql_datefn_query(spec)
    )
    assert ok, f"spec={spec} fn={DATE_FNS[spec['fn']][0]}: {msg}"


# ---------------------------------------------------------------------------
# event-timestamp fuzzing (strict comparator): the events ``ts`` column has
# changed physical representation between rounds and broke three components
# in round 3. These specs exercise the normalized TIMESTAMP_NTZ surface the
# way the analytics layer does — truncation buckets, exact epoch-µs math,
# and lag-gap predicates (the sessionize shape) — against DuckDB's naive-
# timestamp semantics, so a representation or timezone regression in the
# reader surfaces here with a minimal repro spec instead of inside a
# 40-line catalog query.
# ---------------------------------------------------------------------------

TRUNC_UNITS = ["minute", "hour", "day"]
EVENT_TYPES = ["view", "click", "purchase", "add_to_cart"]


def _gen_ts_spec(rng: random.Random) -> dict:
    kind = rng.choice(["trunc_count", "epoch_minmax", "gap_count"])
    return {
        "kind": kind,
        "unit": rng.choice(TRUNC_UNITS),
        "etype": rng.choice(EVENT_TYPES) if rng.random() < 0.5 else None,
        "gap_s": rng.choice([60, 300, 1800, 7200]),
    }


def _spark_ts_query(spec):
    def q(spark, sf_dir):
        from pyspark.sql.window import Window

        from ecommerce_full_etl_process_spark.plans.operator_queries import (
            _events,
            ntz_epoch_micros,
        )

        e = _events(spark, sf_dir)
        if spec["etype"]:
            e = e.where(F.col("event_type") == spec["etype"])
        if spec["kind"] == "trunc_count":
            return e.groupBy(
                F.date_trunc(spec["unit"], "ts").cast("timestamp_ntz").alias("g")
            ).agg(F.count(F.lit(1)).alias("n_rows"))
        if spec["kind"] == "epoch_minmax":
            return e.groupBy(F.col("event_type").alias("g")).agg(
                F.min(ntz_epoch_micros(F.col("ts"))).alias("lo"),
                F.max(ntz_epoch_micros(F.col("ts"))).alias("hi"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        # gap_count: per user, events whose gap from the previous event
        # (ordered by ts, event_id) exceeds the threshold — sessionize's
        # boundary predicate with a fuzzed threshold
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        epoch = ntz_epoch_micros(F.col("ts")) / F.lit(1_000_000.0)
        gap = epoch - F.lag(epoch).over(w)
        return (
            e.withColumn("brk", (gap > spec["gap_s"]).cast("long"))
            .groupBy(F.col("user_id").alias("g"))
            .agg(
                F.coalesce(F.sum("brk"), F.lit(0)).cast("long").alias("n_breaks"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )

    return q


def _sql_ts_query(spec) -> str:
    where = f"WHERE event_type = '{spec['etype']}'" if spec["etype"] else ""
    if spec["kind"] == "trunc_count":
        # CAST: duckdb date_trunc('day') yields DATE, Spark yields a
        # timestamp — normalize the oracle to the timestamp class
        return f"""
SELECT CAST(date_trunc('{spec["unit"]}', ts) AS TIMESTAMP) AS g,
       count(*) AS n_rows
FROM events {where} GROUP BY 1
"""
    if spec["kind"] == "epoch_minmax":
        return f"""
SELECT event_type AS g, min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi,
       count(*) AS n_rows
FROM events {where} GROUP BY 1
"""
    return f"""
WITH gaps AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {spec["gap_s"]}
              THEN 1 ELSE 0 END AS brk
  FROM events {where}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id AS g, CAST(sum(brk) AS BIGINT) AS n_breaks,
       count(*) AS n_rows
FROM gaps GROUP BY user_id
"""


@pytest.mark.parametrize("seed", range(15))
def test_random_ts_matches_duckdb_strict(spark, sf_dir, seed):
    rng = random.Random(7000 + seed)
    spec = _gen_ts_spec(rng)
    ok, msg = compare(
        spark, sf_dir, _spark_ts_query(spec), _sql_ts_query(spec)
    )
    assert ok, f"spec={spec}: {msg}"
