"""foreachBatch streaming → full batch pipeline per micro-batch (SCD2 dims
advance as files arrive), plus TableStore atomicity/time-travel."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.plans import pipeline
from ecommerce_full_etl_process_spark.sources.io import TableStore
from ecommerce_full_etl_process_spark.streaming import stream_pipeline as SP


def test_foreachbatch_pipeline_advances_dims(spark, tmp_path):
    src = str(tmp_path / "tx_src")
    chk = str(tmp_path / "chk")
    wh = str(tmp_path / "wh")

    users = spark.createDataFrame(
        [(1, "Ann Lee", "ann@example.com", "2026-01-01")], schemas.USERS
    )
    products_v1 = spark.createDataFrame(
        [(1, "Widget", "Electronics", 100.0, 10)], schemas.PRODUCTS
    )

    # micro-batch 1: two days of transactions in one file
    spark.createDataFrame(
        [
            (1, "2026-02-02", 1, 1, 1, 100.0, "visa", "success"),
            (2, "2026-02-03", 1, 1, 2, 200.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)

    q = SP.run_incremental_with_warehouse(spark, src, chk, wh, users, products_v1)
    q.awaitTermination(300)

    store = TableStore(spark, wh)
    facts = store.read(pipeline.FACT_TRANSACTIONS)
    assert sorted(r["transaction_id"] for r in facts.collect()) == [1, 2]
    # two pipeline runs (one per source date) in the audit log
    runs = store.read("etl_run_log").collect()
    assert [r["status"] for r in runs] == ["success", "success"]

    # micro-batch 2: price change + new tx → SCD2 must open a version
    products_v2 = spark.createDataFrame(
        [(1, "Widget", "Electronics", 120.0, 10)], schemas.PRODUCTS
    )
    spark.createDataFrame(
        [(3, "2026-02-04", 1, 1, 1, 120.0, "visa", "success")],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)

    q2 = SP.run_incremental_with_warehouse(spark, src, chk, wh, users, products_v2)
    q2.awaitTermination(300)

    dim = store.read(pipeline.DIM_PRODUCT).orderBy("product_sk").collect()
    assert len(dim) == 2 and dim[1]["price"] == 120.0 and dim[1]["current_flag"]
    facts2 = {r["transaction_id"]: r["product_sk"] for r in store.read(
        pipeline.FACT_TRANSACTIONS
    ).collect()}
    assert facts2[3] == dim[1]["product_sk"]  # new tx → new version sk
    assert facts2[1] == dim[0]["product_sk"]  # old facts keep old sk


def test_stateful_user_totals_across_microbatches(spark, tmp_path):
    """applyInPandasWithState keeps per-user running totals across
    micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    src = str(tmp_path / "tx_src")
    chk = str(tmp_path / "chk")

    spark.createDataFrame(
        [
            (1, "2026-02-02", 7, 1, 1, 10.0, "visa", "success"),
            (2, "2026-02-02", 7, 2, 1, 5.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "2026-02-03", 7, 1, 2, 20.0, "visa", "success")],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = SP.transactions_file_stream(spark, src)
    out = SP.stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql(
        "SELECT * FROM stateful_totals WHERE user_id = 7 ORDER BY n_tx"
    ).collect()
    # one emission per micro-batch, cumulative: the final one must hold the
    # running total over BOTH batches (state carried across)
    assert rows[-1]["n_tx"] == 3
    assert rows[-1]["total_spend"] == 35.0
    assert len(rows) == 2  # two micro-batches → two emissions


def test_late_data_beyond_watermark_is_dropped(spark, tmp_path):
    """Late-data policy pin (SURVEY §2.12 — the reference has no policy;
    ours is Spark's and this test documents it): once the watermark has
    advanced past an event time, rows at that event time are DISCARDED at
    the stateful operator's input — a late duplicate is not re-emitted,
    a late never-seen row is not emitted, and a finalized window is never
    revised.

    The watermark only advances across micro-batch BOUNDARIES, so the two
    arrivals are delivered as two separate checkpointed AvailableNow runs
    (the watermark persists in the commit log and is restored on restart —
    memory sinks can't recover, hence parquet sinks here).
    """
    src = str(tmp_path / "tx_src")
    chk = {k: str(tmp_path / f"chk_{k}") for k in ("dd", "wc")}
    out = {k: str(tmp_path / f"out_{k}") for k in ("dd", "wc")}

    def _run(kind, builder):
        stream = SP.with_event_time(SP.transactions_file_stream(spark, src))
        q = (
            builder(stream)
            .writeStream.format("parquet")
            .option("path", out[kind])
            .option("checkpointLocation", chk[kind])
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    # arrival 1: tx1 on 02-01 plus tx2 on 02-10; the 2-day watermark lands
    # at 02-08, so event times before 02-08 are now "too late"
    spark.createDataFrame(
        [
            (1, "2026-02-01", 1, 1, 1, 10.0, "visa", "success"),
            (2, "2026-02-10", 1, 1, 1, 20.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)
    _run("dd", SP.dedup_stream)
    _run("wc", SP.windowed_status_counts)

    assert sorted(
        r["transaction_id"] for r in spark.read.parquet(out["dd"]).collect()
    ) == [1, 2]
    # append mode emits only watermark-finalized windows: [02-01, 02-02)
    assert [
        (str(r["window_start"]), r["status"], r["n"])
        for r in spark.read.parquet(out["wc"]).collect()
    ] == [("2026-02-01 00:00:00", "success", 1)]

    # arrival 2: a late duplicate of tx1, a late NEVER-SEEN tx3 (02-02,
    # beyond the 02-08 watermark), and an on-time tx4
    spark.createDataFrame(
        [
            (1, "2026-02-01", 1, 1, 1, 10.0, "visa", "success"),
            (3, "2026-02-02", 1, 1, 1, 30.0, "visa", "failed"),
            (4, "2026-02-11", 1, 1, 1, 40.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)
    _run("dd", SP.dedup_stream)
    _run("wc", SP.windowed_status_counts)

    # tx3 dropped (late), tx1 dup not re-emitted, tx4 passes — so the
    # dedup guarantee is exactly-once WITHIN the watermark horizon and
    # at-most-once outside it (late rows sacrificed, never duplicated)
    assert sorted(
        r["transaction_id"] for r in spark.read.parquet(out["dd"]).collect()
    ) == [1, 2, 4]
    # the finalized 02-01 window is never revised and tx3's 02-02 window
    # was discarded rather than emitted late; 02-10/02-11 windows are
    # still open (watermark 02-09) so nothing else appears
    assert [
        (str(r["window_start"]), r["status"], r["n"])
        for r in spark.read.parquet(out["wc"]).collect()
    ] == [("2026-02-01 00:00:00", "success", 1)]


def test_stateful_sessionize_emission_cases(spark, tmp_path):
    """Pins the three emission cases of the stateful sessionizer: a
    gap-closed session emits, a final session old enough for the
    event-time timeout emits, a final session still inside the watermark
    horizon stays in state (not emitted)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        stateful_sessionize,
    )

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: session A (3 events), then session B after a 70-min gap
        (1, t0, 1), (2, t0 + 10 * m, 1), (3, t0 + 20 * m, 1),
        (4, t0 + 90 * m, 1),
        # user 2: final session ending 18:50 → timeout 19:20 > wm 19:00 → open
        (5, t0 + 525 * m, 2), (6, t0 + 530 * m, 2),
        # user 99: drives the watermark to 19:00; its own session stays open
        (7, t0 + 600 * m, 99),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = str(tmp_path / "sess_events")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    def us(delta_min):
        # naive wall time treated as UTC — matches ntz_epoch_micros, and
        # keeps the expectation independent of the host timezone
        aware = (t0 + delta_min * m).replace(tzinfo=dt.timezone.utc)
        return int(aware.timestamp() * 1_000_000)

    got = sorted(
        tuple(r)
        for r in stateful_sessionize(spark, d).select(
            "user_id", "session_start_us", "session_end_us", "n_events"
        ).collect()
    )
    assert got == [
        (1, us(0), us(20), 3),    # closed by the 70-min gap
        (1, us(90), us(90), 1),   # final but old → closed by timeout
        # user 2 and user 99: final sessions inside the horizon — in state
    ]


def test_tablestore_schema_evolution_on_read(spark, tmp_path):
    """Appending files with an added column: readers see the union schema
    when mergeSchema is requested — the long-lived-warehouse evolution
    story (new audit columns arrive without rewriting history)."""
    root = str(tmp_path / "store_evo")
    store = TableStore(spark, root)
    store.overwrite("t", spark.createDataFrame([(1, "a")], "id long, v string"))
    store.append(
        "t",
        spark.createDataFrame([(2, "b", 99)], "id long, v string, extra long"),
    )
    import os

    with open(os.path.join(root, "t", "_manifest.json")) as f:
        import json

        version = json.load(f)["version"]
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "t", f"v={version}")
    )
    rows = {r["id"]: (r["v"], r["extra"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 99)}


def test_tablestore_overwrite_is_versioned_and_atomic(spark, tmp_path):
    """Overwrite writes v=n+1 then flips the manifest: the old version stays
    on disk untouched (time-travel / crash-safety story, SURVEY §7.5)."""
    root = str(tmp_path / "store")
    store = TableStore(spark, root)
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    store.overwrite("t", df1)
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    store.overwrite("t", df2)

    assert [r["v"] for r in store.read("t").collect()] == ["b"]
    # manifest points at v=2; v=1 still readable on disk
    with open(os.path.join(root, "t", "_manifest.json")) as f:
        assert json.load(f)["version"] == 2
    old = spark.read.parquet(os.path.join(root, "t", "v=1"))
    assert [r["v"] for r in old.collect()] == ["a"]

    # a torn write (data written, manifest NOT flipped) leaves readers on v=2
    df3 = spark.createDataFrame([(3, "c")], "id long, v string")
    df3.write.parquet(os.path.join(root, "t", "v=3"))  # no manifest flip
    assert [r["v"] for r in store.read("t").collect()] == ["b"]

def test_run_sessionize_scale_state_bounded_by_horizon(spark, tmp_path):
    """The scale-evidence runner (round-10): a chronological multi-file
    stream drives the SAME sessionize pipeline one file per micro-batch;
    per-batch state-store rows must stay bounded by the users active
    inside the watermark horizon (1 h delay + 30 min gap) — eviction via
    event-time timeout — never accumulate with history. 3 hours × 5
    users/hour: state peaks at ≤ 3 hours of users and the final batch
    EVICTS the now-expired hour-0 cohort."""
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        run_sessionize_scale,
    )

    src = str(tmp_path / "events.parquet")
    EV, UPH, HOURS = 20, 5, 3
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast(
        "timestamp_ntz"
    )
    for h in range(HOURS):
        n = UPH * EV
        df = spark.range(n).select(
            (F.lit(h * UPH) + (F.col("id") / EV).cast("long")).alias(
                "user_id"
            ),
            F.timestamp_add(
                "SECOND",
                (F.lit(h * 3600) + (F.col("id") % EV) * 10).cast("int"),
                base,
            ).alias("ts"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.col("id").alias("event_id"),
        )
        df.coalesce(1).write.mode("append").parquet(src)

    n_out, batches = run_sessionize_scale(spark, str(tmp_path))
    # every user has exactly one session; only sessions whose timeout
    # fired (end + gap below the final watermark) are emitted
    assert n_out == UPH  # hour-0 cohort times out; hours 1-2 in horizon
    data = [b for b in batches if b["input_rows"] > 0]
    assert len(data) == HOURS  # one micro-batch per file
    # state never exceeds the horizon's user count (≤ 3 hours × UPH here,
    # because eviction lags one batch behind the watermark) and the final
    # empty batch removes the expired cohort
    assert max(b["state_rows_total"] for b in batches) <= 3 * UPH
    assert batches[-1]["state_rows_removed"] == UPH
    assert batches[-1]["state_rows_total"] == 2 * UPH


def test_dedup_state_growth_bounded_vs_plain(spark, tmp_path):
    """Pins the measured state-growth asymmetry the two dedup forms
    document: plain dropDuplicates (event time NOT in the keys) never
    evicts — numRowsTotal grows linearly with distinct keys ever seen —
    while dropDuplicatesWithinWatermark evicts keys the watermark has
    passed, so state plateaus at the horizon. Functional dedup is pinned
    separately; this is the 100 TB state-store story."""

    def _totals(kind):
        src = str(tmp_path / f"src_{kind}")
        ckpt = str(tmp_path / f"ckpt_{kind}")
        os.makedirs(src)
        stream = SP.with_event_time(SP.transactions_file_stream(spark, src))
        builder = SP.dedup_stream if kind == "plain" else SP.dedup_stream_bounded
        ded = builder(stream, watermark="1 day")
        totals = []
        for b in range(4):
            rows = [
                (b * 100 + i, f"2026-03-{b + 1:02d}", 1, 1, 1, 1.0, "visa",
                 "success")
                for i in range(60)
            ]
            spark.createDataFrame(rows, schemas.TRANSACTIONS).coalesce(
                1
            ).write.mode("append").parquet(src)
            q = (
                ded.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            totals.append(
                q.lastProgress["stateOperators"][0]["numRowsTotal"]
            )
        return totals

    plain = _totals("plain")
    bounded = _totals("bounded")
    # plain: every batch's 60 fresh keys stay in state forever
    assert plain == [60, 120, 180, 240]
    # bounded: the 1-day delay keeps ~2 days of keys; batches older than
    # the watermark horizon are evicted, so state plateaus
    assert bounded[0] == 60 and max(bounded) <= 120
    assert bounded[-1] <= 120 < plain[-1]


def test_bounded_dedup_horizon_boundary(spark, tmp_path):
    """Pins the guarantee boundary dedup_stream_bounded documents: a
    duplicate RESTAMPED with a fresh event time arriving after its
    original's state expired (original ts + delay < watermark) is
    re-emitted — at-least-once beyond the horizon — while a restamped
    duplicate whose original is still inside the horizon is dropped."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    def _run():
        stream = SP.with_event_time(SP.transactions_file_stream(spark, src))
        q = (
            SP.dedup_stream_bounded(stream, watermark="1 day")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # batch 1: tx1 on 03-01, tx2 on 03-05 -> watermark advances to 03-04,
    # so tx1's dedup state (03-01 + 1 day < 03-04) expires
    spark.createDataFrame(
        [
            (1, "2026-03-01", 1, 1, 1, 10.0, "visa", "success"),
            (2, "2026-03-05", 1, 1, 1, 20.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)
    _run()

    # batch 2: both duplicates restamped to 03-05 (on time). tx1's state
    # is gone -> re-emitted; tx2's state (03-05 + 1 day >= 03-04) lives
    # -> dropped
    spark.createDataFrame(
        [
            (1, "2026-03-05", 1, 1, 1, 10.0, "visa", "success"),
            (2, "2026-03-05", 1, 1, 1, 20.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)
    _run()

    ids = sorted(
        r["transaction_id"] for r in spark.read.parquet(out).collect()
    )
    assert ids == [1, 1, 2]
