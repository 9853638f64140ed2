"""Testdata-drift canary (round-4 verdict item 5).

The driver regenerates /root/testdata between rounds, and a silent physical-
type change has real blast radius: in round 3 `events.ts` flipped from INT64
TIMESTAMP(NANOS) to parquet timestamp[us], which hard-broke sessionization,
silently corrupted the streaming hourly counts (micros force-read as nanos →
everything landed in 1970), and crashed the whole bench run.

This file makes the NEXT such regeneration fail loudly in exactly one
obvious place:

- pin the logical schema (names + arrow types) of every corpus table the
  engine reads, with `ts` allowed any representation the normalizer
  supports;
- assert the one choke point (`_events`) yields TIMESTAMP_NTZ and sane
  epoch values for whatever representation is on disk.

Footer-only reads (pyarrow) — no Spark jobs, so the whole module runs in
milliseconds on top of an already-built session.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

# Exact logical schemas the engine's queries assume (column name → arrow
# type). `ts`-like columns list every representation the reader normalizes;
# anything else appearing on disk is a drift the engine has never seen.
_TS_OK = {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64"}

EXPECTED = {
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
    "events": {
        "event_id": "int64",
        "ts": _TS_OK,
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": _TS_OK,
    },
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": _TS_OK,
        "o_orderpriority": "string",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
}


def _sf_dirs() -> list[str]:
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    return [d for d in dirs if os.path.isdir(d)]


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_pinned(table: str) -> None:
    """Every scale factor's parquet matches the schema the engine assumes."""
    checked = 0
    for d in _sf_dirs():
        path = os.path.join(d, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        checked += 1
        actual = {f.name: str(f.type) for f in pq.read_schema(path)}
        expected = EXPECTED[table]
        assert set(actual) == set(expected), (
            f"{path}: column drift — got {sorted(actual)}, "
            f"engine assumes {sorted(expected)}"
        )
        for col, want in expected.items():
            ok = actual[col] in want if isinstance(want, set) else actual[col] == want
            assert ok, (
                f"{path}: {col} is {actual[col]!r}, engine assumes {want!r} — "
                "corpus representation drifted; update the reader/normalizer "
                "and this canary together"
            )
    assert checked > 0, f"no testdata found for {table}"


def test_events_ts_normalizes_to_ntz(spark, sf_dir) -> None:
    """The one choke point: whatever `ts` is stored as, `_events` must
    yield TIMESTAMP_NTZ with plausible (post-2000, pre-2100) epochs — the
    round-3 silent failure was micros force-read as nanos landing in 1970."""
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.plans.operator_queries import (
        _events,
        ntz_epoch_micros,
    )

    e = _events(spark, sf_dir)
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"
    lo, hi = 946_684_800_000_000, 4_102_444_800_000_000  # 2000..2100 in µs
    bad = e.where(
        ~ntz_epoch_micros(F.col("ts")).between(lo, hi)
        | F.col("ts").isNull()
    ).count()
    assert bad == 0, f"{bad} events outside the plausible epoch range"


def test_streaming_schema_probe_matches_batch(spark, sf_dir) -> None:
    """The streaming reader derives its schema from the same probe the
    batch reader uses — assert they agree so the two paths cannot drift."""
    from ecommerce_full_etl_process_spark.plans.operator_queries import (
        _read_events_raw,
    )

    path = os.path.join(sf_dir, "events.parquet")
    assert _read_events_raw(spark, path).schema == spark.read.parquet(path).schema
