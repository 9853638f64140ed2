"""Structured Streaming variants of the incremental pipeline (SURVEY §2.12,
§7.6 — the reference's daily ``--today`` batch generalized to micro-batches).

Three building blocks, one code path with batch:

- ``transactions_file_stream``: file-source stream over a transactions
  directory (new parquet files = new micro-batches), ``Trigger.AvailableNow``
  for catch-up runs — the streaming analogue of the reference's day-slice
  fetch (ETL/etl.py:160-168).
- ``dedup_stream`` / ``dedup_stream_bounded``: streaming forms of the J4
  idempotence anti-join — plain ``dropDuplicates`` (strongest dedup,
  O(distinct-keys-ever) state) vs ``dropDuplicatesWithinWatermark``
  (state bounded by the watermark horizon; the continuous-ingestion
  default).
- ``windowed_status_counts``: tumbling-window event-time aggregation with a
  late-data watermark — the streaming form of the A3 group-by breakdown.
- ``run_incremental``: ``foreachBatch`` adapter that feeds each micro-batch
  through the SAME batch pipeline stages (validate → dims → facts), so
  streaming and batch cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def transactions_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of raw OLTP transactions."""
    return (
        spark.readStream.schema(schemas.TRANSACTIONS)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def with_event_time(tx: DataFrame) -> DataFrame:
    """Raw date string → event-time timestamp (invalid dates pass through
    as NULL and are routed to the rejected stream by validation)."""
    from ..functions.dates import parse_date_multi

    return tx.withColumn(
        "event_time", parse_date_multi(F.col("date")).cast("timestamp")
    )


def dedup_stream(tx: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Streaming idempotence: drop duplicate (transaction_id, product_id)
    rows — the standard replacement for the batch anti-join against all
    history.

    STATE GROWTH — the honest version: because the event-time column is
    NOT part of the dedup keys, Spark never evicts this operator's state;
    the watermark only gates late INPUT rows. Measured (6 batches × 200
    fresh keys, 1-day watermark, availableNow restarts): numRowsTotal
    grows 200 → 1200, linear in distinct keys ever seen. That buys the
    strongest guarantee — a duplicate is dropped no matter how far apart
    the copies arrive — at O(distinct keys) state, which at 100 TB of
    facts is unbounded. Use :func:`dedup_stream_bounded` for continuous
    ingestion; keep this form only for short-lived backfill streams where
    total key cardinality is known-bounded.

    Late-data policy (pinned by tests/test_streaming_pipeline.py::
    test_late_data_beyond_watermark_is_dropped): rows whose event time is
    older than the current watermark are DISCARDED at the operator input —
    a late duplicate is never re-emitted and a late never-seen row is
    sacrificed too: exactly-once within the watermark horizon,
    at-most-once outside it. Size ``watermark`` to the real upstream
    disorder bound; the batch anti-join path (operators/facts.py) remains
    the backfill route for older reruns."""
    return tx.withWatermark("event_time", watermark).dropDuplicates(
        ["transaction_id", "product_id"]
    )


def dedup_stream_bounded(tx: DataFrame, watermark: str = "2 days") -> DataFrame:
    """BOUNDED-STATE streaming dedup: ``dropDuplicatesWithinWatermark``
    keeps a key's state only until the watermark passes its event time +
    delay, so state is O(keys inside the watermark horizon), not
    O(distinct keys ever) — measured alongside :func:`dedup_stream`
    (same 6×200-key feed): numRowsTotal plateaus at 400 (current +
    previous day inside the 1-day delay) while the plain form reaches
    1200 and keeps climbing.

    The guarantee trade: duplicates whose copies arrive WITHIN the
    watermark delay of the first occurrence are dropped (the replay /
    at-least-once-source case this exists for); a copy arriving later
    than that may be re-emitted because its key's state was evicted —
    at-least-once beyond the horizon, where :func:`dedup_stream` stays
    exactly-once by hoarding state. Late input older than the watermark
    is discarded the same as the plain form. This is the right default
    for continuous ingestion at scale: size ``watermark`` to the real
    source-replay bound and let the batch anti-join (operators/facts.py)
    own anything older."""
    return tx.withWatermark(
        "event_time", watermark
    ).dropDuplicatesWithinWatermark(["transaction_id", "product_id"])


def windowed_status_counts(
    tx: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Tumbling event-time window × status counts with late-data handling."""
    return (
        tx.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "status",
            "n",
        )
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table, normalized to the same
    TIMESTAMP_NTZ ``ts`` the batch reader yields.

    File streams need an explicit schema; it is probed from a driver-side
    batch read of the same path so the stream tracks whatever physical
    ``ts`` type the corpus currently uses (INT64 nanos in rounds 1-2,
    timestamp[us]/NTZ from round 3) instead of hard-coding one. Handles
    both layouts: a single ``events.parquet`` file (driver testdata) and
    a Spark-written ``events.parquet/part-*.parquet`` directory — THE
    layout at scale; a glob filter of "events.parquet" against the sf dir
    would match no leaf file of a directory table and silently stream 0
    rows (tests/test_events_ts_matrix.py pins both layouts)."""
    import os

    from ..plans.operator_queries import _normalize_events_ts, _read_events_raw

    path = os.path.join(sf_dir, "events.parquet")
    sch = _read_events_raw(spark, path).schema
    if os.path.isdir(path):
        stream = spark.readStream.schema(sch).parquet(path)
    else:
        # single-file layout: stream the parent dir with a filename glob so
        # sibling tables' parquet files are excluded
        stream = (
            spark.readStream.schema(sch)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return _normalize_events_ts(stream)


#: Session conf selecting the state-store engine behind every stateful
#: streaming operator here (applyInPandasWithState group state,
#: dropDuplicatesWithinWatermark key state, stream-stream join buffers).
#: The Spark default is the HDFS-backed provider, which keeps EVERY key's
#: state in executor heap — fine at these SFs, an OOM at 100× state. The
#: RocksDB provider (bundled with Spark since 3.2) spills state to local
#: disk with a bounded block cache, which is the 1000-executor
#: configuration; flip it per session via ``configure_state_store`` or
#: globally with ``SPARK_GRAFT_STATE_STORE=rocksdb`` (round-12 verdict
#: item 4 — the previously-undocumented 100×-scale gap).
STATE_STORE_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def configure_state_store(spark: SparkSession, provider: str | None = None):
    """Route stateful-streaming state to a named provider before a query
    starts (the conf is read at query start; existing checkpoints keep
    the provider they started with — Spark does not migrate state store
    formats mid-checkpoint). ``provider``: ``"rocksdb"``, ``"hdfs"``, or
    None to read ``$SPARK_GRAFT_STATE_STORE`` (unset → leave the session
    untouched). Every AvailableNow drain in this module passes through
    here, so one env var flips the whole stateful family."""
    import os

    name = (provider or os.environ.get("SPARK_GRAFT_STATE_STORE", "")).lower()
    if not name:
        return
    mapping = {"rocksdb": ROCKSDB_STATE_STORE, "hdfs": HDFS_STATE_STORE}
    if name not in mapping:
        raise ValueError(
            f"configure_state_store: unknown provider {name!r} "
            f"(expected one of {sorted(mapping)})"
        )
    spark.conf.set(STATE_STORE_PROVIDER_CONF, mapping[name])


def _stream_state_partitions(spark: SparkSession, source_path: str) -> int:
    """Size a stateful streaming query's shuffle (== its state-store
    count) by the stream's INPUT VOLUME instead of the session's
    core-count default: ~32 MB of source bytes per state partition,
    clamped to [1, session ``spark.sql.shuffle.partitions``].

    Rationale (guide §2.2/§2.5 applied to state stores): every stateful
    operator keeps one file-backed state store PER shuffle partition and
    pays its setup + snapshot + commit EVERY micro-batch, so partition
    count is pure per-batch overhead until state volume fills it —
    measured at sf0.1 on this host: ``streaming_dedup_within_watermark``
    3.64 s at 32 partitions vs 1.84 s at 8/4, identical results. The
    session default (sized to the cluster) stays the CEILING, so on a
    real deployment a 10 TB/day stream still fans out to the full
    configured width; it is the floor case — a stream far smaller than
    the cluster — that stops paying for idle state stores. Unlike batch
    plans, AQE cannot coalesce these (state partitioning is pinned at
    query start), hence the explicit derivation.
    ``SPARK_GRAFT_STREAM_STATE_PARTITIONS`` overrides for experiments.

    NOTE for checkpoint compatibility: the partition count is baked into
    a checkpoint at first start; this helper is for drains that create a
    fresh checkpoint (all catalog entries here do)."""
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "")
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if env:
        return max(1, min(sess, int(env)))
    nbytes = 0
    if os.path.isdir(source_path):
        for base, _dirs, files in os.walk(source_path):
            nbytes += sum(
                os.path.getsize(os.path.join(base, f)) for f in files
            )
    elif os.path.exists(source_path):
        nbytes = os.path.getsize(source_path)
    else:
        return sess
    return max(1, min(sess, -(-nbytes // (32 << 20))))


def _drain_to_memory_sink(
    agg: DataFrame,
    prefix: str,
    output_mode: str,
    shuffle_partitions: int | None = None,
):
    """Run ``agg`` as an AvailableNow streaming query into a uniquely-named
    memory sink; returns (sink_name, spark). Fails loudly on timeout —
    returning a partially-filled sink would surface downstream as a
    confusing oracle value-mismatch instead of a clear error.

    ``shuffle_partitions`` (usually from :func:`_stream_state_partitions`)
    pins the stateful operators' state-store count for THIS query: the
    conf is read once at ``start()`` and restored right after the drain.
    NOTE the override is session-GLOBAL while the drain runs (up to
    300 s): a concurrent query started on the same session in that
    window would silently inherit the stream-sized partition count.
    Single-threaded callers (bench, the grading driver, every catalog
    entry) are unaffected; concurrent use needs a per-query mechanism
    (e.g. a cloned session) instead (r13 ADVICE note)."""
    import uuid

    spark = agg.sparkSession
    configure_state_store(spark)
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                f"{prefix}: AvailableNow query did not finish within 300s"
            )
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (SURVEY §2.12): hourly event-type counts computed BY A
    REAL STREAMING QUERY — file-source stream over events.parquet,
    Trigger.AvailableNow, complete-mode memory sink — then returned as the
    sink's batch contents. AvailableNow processes the whole table, so the
    result equals the batch aggregation and is oracle-checkable."""
    import os

    from pyspark.sql import functions as F

    # window() is NTZ-native since Spark 3.4; the stream shares the batch
    # reader's normalization choke point
    evt = _events_stream(spark, sf_dir)
    agg = evt.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    # unique sink name: re-invocation in a shared session must not collide
    # with a previous run's registered memory table / query name
    sink = _drain_to_memory_sink(
        agg,
        "streaming_event_counts",
        "complete",
        shuffle_partitions=_stream_state_partitions(
            spark, os.path.join(sf_dir, "events.parquet")
        ),
    )
    # window over an NTZ event time is itself NTZ (naive UTC wall time),
    # so collection is host/session-TZ independent; the cast is a no-op
    # guard in case a future corpus reverts ts to an LTZ representation
    out = spark.table(sink).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
    ).localCheckpoint(eager=True)
    # the checkpoint owns the data now — drop the memory-sink view so
    # repeated invocations don't accumulate result copies in the driver
    spark.catalog.dropTempView(sink)
    return out


STREAMING_EVENT_COUNTS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
FROM events GROUP BY ALL
"""


def streaming_click_purchase_join(
    spark: SparkSession, sf_dir: str, state_partitions: int | None = None
) -> DataFrame:
    """Stream-stream INTERVAL JOIN (SURVEY §2.12 extension): click →
    purchase attribution — every (click, purchase) pair of the same user
    with the purchase within 1 hour of the click, computed by a real
    Structured Streaming self-join with event-time watermarks on both
    sides and a time-range join condition.

    Scale shape: the range condition bounds the join state — each side
    buffers only rows within watermark + 1 h of event time, so state is
    O(arrival rate × horizon), not O(stream length); the join itself
    shuffles both sides by user_id. AvailableNow over a static corpus
    ingests everything in one micro-batch (no files arrive beyond it), so
    the append-mode result equals the batch interval join and is
    oracle-checkable; with live data the same query runs unchanged with
    bounded state.

    ``state_partitions`` sizes the join's state stores: a stream-stream
    join keeps FOUR stores per partition per side, each paying file-backed
    setup + commit every micro-batch, so the per-partition overhead — not
    the data — dominates until arrival rate × horizon outgrows it
    (measured at sf0.1: 32 partitions 5.9 s vs 8 partitions 2.3 s vs the
    input-derived 1–2 partitions 2.4 s at a quarter the state stores;
    identical results). ``None`` (the default since round 13) derives it
    from the stream's input volume via :func:`_stream_state_partitions`
    — the session's (cluster-sized) shuffle setting stays the ceiling,
    so this only stops a small stream from paying for idle stores. The
    session's shuffle setting is restored after the query drains."""
    import os

    from pyspark.sql import functions as F

    from ..plans.operator_queries import ntz_epoch_micros

    if state_partitions is None:
        state_partitions = _stream_state_partitions(
            spark, os.path.join(sf_dir, "events.parquet")
        )

    ev = _events_stream(spark, sf_dir)
    # watermarks demand TIMESTAMP (LTZ): pin the naive NTZ instant to the
    # epoch via µs math — timestamp_micros() fixes the instant regardless
    # of session timezone, and every downstream use (watermark horizon,
    # range condition, unix_micros diff) is instant arithmetic, so no
    # wall-clock rendering ever leaks into the result (the round-3 LTZ
    # lesson)
    ts_l = F.timestamp_micros(ntz_epoch_micros(F.col("ts")))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            ts_l.alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            ts_l.alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        on=(
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            )
        ),
        how="inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        # exact integer µs on both engines (whole-second diffs would
        # truncate) — see sessionize_events
        (
            F.unix_micros(F.col("purchase_ts"))
            - F.unix_micros(F.col("click_ts"))
        ).alias("micros_to_purchase"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        # the streaming query's full lifecycle (start → drain → stop) runs
        # inside the sink helper, so the conf can be restored right after —
        # nothing later re-reads it for this query
        sink = _drain_to_memory_sink(
            joined, "streaming_click_purchase_join", "append"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


STREAMING_CLICK_PURCHASE_JOIN_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS micros_to_purchase
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def streaming_enriched_segment_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-STATIC dimension enrichment (SURVEY §2.12 — the third
    streaming join type next to the interval self-join and foreachBatch):
    the events stream joins a static customer dimension (broadcast,
    stateless — no watermark or join state needed; the dim is re-resolved
    per micro-batch, so a dim refresh between batches is picked up) and
    aggregates counts by market segment × event type.

    Scale shape: the dim broadcasts (or hash-joins if large); the only
    stateful piece is the complete-mode aggregate, map-side combined."""
    import os

    from pyspark.sql import functions as F

    ev = _events_stream(spark, sf_dir)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = _drain_to_memory_sink(
        agg,
        "streaming_enriched_segment_counts",
        "complete",
        shuffle_partitions=_stream_state_partitions(
            spark, os.path.join(sf_dir, "events.parquet")
        ),
    )
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


STREAMING_ENRICHED_SEGMENT_COUNTS_ORACLE = """
SELECT c_mktsegment, event_type, count(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY ALL
"""


def stateful_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    state_partitions: int = 16,
) -> DataFrame:
    """Custom stateful streaming SESSIONIZATION via
    ``applyInPandasWithState`` + event-time timeout (SURVEY §2.11/§2.12 —
    the operator shape Spark's built-ins can't express when the per-group
    logic outgrows ``session_window``): per user, an open session lives in
    Arrow-backed group state; a gap > ``gap_minutes`` closes it and emits
    one session row; the event-time timeout closes idle sessions when the
    watermark passes last_seen + gap on a live stream.

    Emission contract (what makes this oracle-checkable): a session row is
    emitted when CLOSED — by an in-batch gap or by event-time timeout.
    Under ``AvailableNow`` on a static corpus the data arrives in one
    micro-batch, then the trigger runs a final empty batch with the
    advanced watermark (global max ts − 1 h) that fires timeouts: every
    non-final session closes by gap, and a user's FINAL session closes by
    timeout iff its end + gap is older than that watermark (ms-truncated,
    strict <). Only final sessions still inside the horizon stay in state
    — exactly as on a live stream. The oracle's QUALIFY clause encodes
    both conditions.

    Scale shape: one shuffle by user_id into ``state_partitions`` state
    stores; per-group work is a sorted scan of that batch's rows; state
    is one (start, last, n) triple per user. Unlike the stream-stream
    join (4 stores/partition/side — fewer partitions win), the cost here
    is the per-group PYTHON apply, so parallelism wins: measured at
    sf0.1, 16 partitions 3.5 s vs 8 partitions 4.1 s vs 2 partitions
    6.8 s. Size to python-worker parallelism, not store count."""
    ev = _events_stream(spark, sf_dir)
    sessions = _sessionize_pipeline(ev, gap_minutes)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        sink = _drain_to_memory_sink(sessions, "stateful_sessionize", "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def _sessionize_pipeline(ev: DataFrame, gap_minutes: int) -> DataFrame:
    """The applyInPandasWithState sessionization plan over an events
    stream (user_id + NTZ ``ts``): shared by the catalog entry above and
    the scale-evidence runner below so both measure the SAME operator.
    See :func:`stateful_sessionize` for the emission contract."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..plans.operator_queries import ntz_epoch_micros
    # Two time columns, one job each: ``ts`` (LTZ) exists ONLY for the
    # watermark/timeout machinery; ``t_us`` carries the instant as epoch µs
    # computed JVM-side. The pandas function must never read ``ts`` —
    # Arrow renders LTZ timestamps in the SESSION timezone, so epoch math
    # done python-side would shift by the TZ offset under a non-UTC
    # session (caught by the bare-session TZ=America/New_York check).
    stream = ev.select(
        "user_id",
        F.timestamp_micros(ntz_epoch_micros(F.col("ts"))).alias("ts"),
        ntz_epoch_micros(F.col("ts")).alias("t_us"),
    ).withWatermark("ts", "1 hour")

    gap_us = gap_minutes * 60 * 1_000_000
    output_schema = (
        "user_id long, session_start_us long, session_end_us long, "
        "n_events long"
    )
    state_schema = "start long, last long, n long"

    # self-contained closure: no module-level references (cloudpickle)
    def _update(key, pdfs, state):
        import pandas as pd

        uid = key[0]
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append((uid, start, last, n))
            state.remove()
        else:
            start, last, n = state.get if state.exists else (None, 0, 0)
            ts = []
            for pdf in pdfs:
                ts.extend(int(v) for v in pdf["t_us"])
            for t in sorted(ts):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    out.append((uid, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            if start is not None:
                state.update((start, last, n))
                # event-time timeout: fires when watermark > last + gap
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
            ],
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_scale(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    state_partitions: int = 16,
) -> tuple[int, list[dict]]:
    """Scale-evidence runner (round-10, carried round-8 verdict item 7):
    drive the SAME sessionization pipeline over a chronologically-split
    file stream with ``maxFilesPerTrigger=1`` — one micro-batch per file
    — and return ``(emitted_session_rows, per_batch_metrics)`` where each
    metrics dict carries the state store's ``numRowsTotal`` /
    ``numRowsUpdated`` / ``numRowsRemoved`` and the batch's input rows,
    read from the query's progress events. The growth claim this feeds:
    as the TIMELINE grows ×N (input volume ×N), per-batch state rows
    stay bounded by the users active inside the watermark horizon —
    eviction (event-time timeout) keeps state ∝ horizon, not history.

    Progress is captured with a ``StreamingQueryListener`` (every batch),
    NOT ``q.recentProgress`` — the latter keeps only the most recent
    ~100 entries (``spark.sql.streaming.numRecentProgressUpdates``), so
    a 300-batch ×30 drain would silently under-report input rows and
    batch count (the first version of this runner did exactly that)."""
    import json
    import os
    import uuid

    from pyspark.sql.streaming import StreamingQueryListener

    sch = spark.read.parquet(
        os.path.join(source_dir, "events.parquet")
    ).schema
    ev = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(source_dir, "events.parquet"))
    )
    sessions = _sessionize_pipeline(ev, gap_minutes)

    captured: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            captured.append(
                p if isinstance(p, dict) else json.loads(p.json)
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    sink = f"sessionize_scale_{uuid.uuid4().hex[:8]}"
    configure_state_store(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    listener = _Capture()
    spark.streams.addListener(listener)
    try:
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise RuntimeError(
                "run_sessionize_scale: AvailableNow query did not finish "
                "within 1800s"
            )
        qid = str(q.id)
        # listener events are delivered asynchronously — settle until the
        # capture stops growing so the final batches aren't missed
        import time as _time

        seen = -1
        for _ in range(30):
            if len(captured) == seen:
                break
            seen = len(captured)
            _time.sleep(1)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.streams.removeListener(listener)
    batches = []
    for p in captured:
        if str(p.get("id")) != qid or not p.get("stateOperators"):
            continue
        ops = p["stateOperators"]
        batches.append(
            {
                "batch_id": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "state_rows_total": ops[0]["numRowsTotal"],
                "state_rows_updated": ops[0].get("numRowsUpdated", 0),
                "state_rows_removed": ops[0].get("numRowsRemoved", 0),
            }
        )
    n_out = spark.table(sink).count()
    spark.catalog.dropTempView(sink)
    return n_out, batches


STATEFUL_SESSIONIZE_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
),
flagged AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 30 * 60 * 1000000
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sess AS (
  SELECT user_id, t,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY t
           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
agg AS (
  SELECT user_id, sid,
         min(t) AS session_start_us, max(t) AS session_end_us,
         count(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, session_start_us, session_end_us, n_events
FROM agg
-- emitted = closed sessions: every non-final session (closed by gap) plus
-- final sessions whose timeout fired in the trailing empty micro-batch —
-- i.e. (end + gap) in ms-truncated event time is strictly below the final
-- watermark (global max ts, ms-truncated, minus the 1 h delay)
QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
     OR (session_end_us + 30 * 60 * 1000000) // 1000
        < (SELECT max(t) FROM e) // 1000 - 3600 * 1000
"""


def stateful_user_totals(tx_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (n_tx, total_spend) maintained across micro-batches in
    Arrow-backed group state — the pattern for operators Spark's built-in
    windowed aggregations can't express (BASELINE north star).

    Emits one row per user per micro-batch with the cumulative totals so
    far. State is unbounded here (NoTimeout); production variants attach a
    timeout to bound state by inactivity.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    output_schema = "user_id long, n_tx long, total_spend double"
    state_schema = "n_tx long, total_spend double"

    # self-contained closure: no module-level references (cloudpickle would
    # otherwise require this package on the executor workers' sys.path)
    def _update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["price"].fillna(0.0).sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_tx": [n], "total_spend": [round(total, 2)]}
        )

    return tx_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_with_warehouse(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    users: DataFrame,
    products: DataFrame,
):
    """The foreachBatch upgrade path (SURVEY §7.6): every micro-batch of
    raw transactions runs through the SAME batch pipeline (validate → SCD2
    dims → facts → audit), one ``pipeline.run`` per distinct source date in
    the batch — so streaming ingestion and the daily batch job share one
    code path and cannot drift. Dimensions advance per micro-batch.

    Returns the started StreamingQuery (AvailableNow trigger).
    """
    from ..plans import pipeline as batch_pipeline
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        parsed = with_event_time(batch_df)
        # one pipeline run per source date present in the micro-batch,
        # oldest first (preserves SCD2 effective-date ordering); unparseable
        # dates ride along and are rejected by validation inside run()
        dates = sorted(
            r["d"]
            for r in parsed.select(
                F.col("event_time").cast("date").alias("d")
            )
            .distinct()
            .collect()
            if r["d"] is not None
        )
        for d in dates:
            day_tx = parsed.where(
                F.col("event_time").cast("date").eqNullSafe(F.lit(d))
            ).drop("event_time")
            batch_pipeline.run(spark, store, d, users, products, day_tx)

    stream = transactions_file_stream(spark, source_dir)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_incremental(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    available_now: bool = True,
    dedup: str = "bounded",
):
    """End-to-end streaming ingestion: stream → event-time → dedup →
    append-only parquet sink. Returns the started StreamingQuery.

    ``foreachBatch`` is deliberately NOT used here for the simple path —
    the append sink is exactly-once via checkpoint + file-sink manifest;
    ``foreachBatch`` + the batch pipeline is the upgrade path when SCD2
    dims must advance per micro-batch.

    ``dedup`` selects the duplicate-suppression contract (the round-10
    default switch from ``dropDuplicates`` to
    ``dropDuplicatesWithinWatermark`` changed the OUTPUT contract, not
    just the state bound, so callers get an explicit knob):

    - ``"bounded"`` (default): state is O(keys inside the watermark
      horizon) — the only shape a continuous ingester survives — but a
      duplicate whose copies arrive MORE than the watermark delay apart
      is re-emitted (at-least-once beyond the horizon).
    - ``"unbounded"``: the pre-round-10 behavior — exactly-once output
      for duplicates however far apart, paid for with state that grows
      with every key ever seen (measured linear in
      tests/test_stream_pipeline.py). Only for bounded replays/backfills.
    """
    if dedup not in ("bounded", "unbounded"):
        raise ValueError(
            f"run_incremental: dedup must be 'bounded' or 'unbounded'"
            f" (got {dedup!r})"
        )
    dedup_fn = dedup_stream_bounded if dedup == "bounded" else dedup_stream
    stream = dedup_fn(
        with_event_time(transactions_file_stream(spark, source_dir))
    )
    configure_state_store(spark)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    n: int = 3,
    min_jaccard: float = 0.5,
    max_files_per_trigger: int | None = None,
):
    """Continuous corpus ingestion with near-dup screening — the
    production dedup loop composed from the incremental-LSH operator and
    the TableStore:

    Per micro-batch of documents (doc_id, text):

    1. probe the PERSISTED band index for near-dups — (batch, archive)
       collisions plus batch-internal pairs — via
       ``minhash_lsh_pairs_incremental`` (first batch: plain
       ``minhash_lsh_pairs`` self-dedup);
    2. connected-components the (collision-sized) pair set and append a
       per-doc decision row to ``dedup_log``: keep = the doc is its
       component's min id (exactly ``corpus_dedup_keep_list`` semantics
       — a greater-side-of-any-pair shortcut would mislabel path-shaped
       components whose hub is a larger id), with the component root as
       the audit pointer;
    3. append the batch's text to ``corpus`` and its band table to
       ``lsh_bands`` — the archive and its index grow together, and the
       NEXT batch probes the updated index.

    Replay semantics: checkpointed ``foreachBatch`` is at-least-once, so
    the writes follow a marker protocol that commits effectively-once
    even across a crash BETWEEN appends (the TableStore crash contract
    only covers torn versioned overwrites, not multi-table appends):

    - ``batch_attempts`` (intent marker) is appended FIRST, the three
      data appends (``dedup_log``, ``corpus``, ``lsh_bands``) follow,
      and ``batch_commits`` (commit marker) is appended LAST;
    - a batch_id already in ``batch_commits`` is skipped entirely;
    - a batch_id in ``batch_attempts`` but NOT in ``batch_commits`` is a
      torn previous attempt: the batch is re-processed with this batch's
      doc_ids anti-joined out of the archive views (restoring the
      disjoint-id contract of the incremental prober) and each append
      filtered to only the rows the torn attempt did not land. The probe
      cost is an ``isin`` over the micro-batch's doc_ids — pruned by
      parquet stats — and is paid ONLY on the rare post-crash replay.

    A crash at any point therefore loses nothing and duplicates
    nothing: before the commit marker lands the batch will be replayed
    and healed; after it lands the batch is skipped.

    Scale shape: per batch, signature work is O(batch); the index probe
    touches archive text only for colliding docs; appends are
    batch-sized. Nothing re-scans the archive — the property proven
    flat-vs-growing in scale_bench's incremental_dedup section, now as
    a continuously-running stream.
    """
    from ..operators import dedup as D
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # no localCheckpoint (round-14, same as the maintenance applies):
        # the foreachBatch frame is file-list-backed; the incremental LSH
        # prober caches what it re-reads, every other consumer is a
        # one-pass scan of the (small) batch files
        batch = batch_df.select("doc_id", "text")
        # ONE probe job for batch emptiness + both marker tables
        # (round-14; was take(1) + one filtered take(1) per marker table)
        nonempty, committed, torn = _probe_batch_and_markers(
            store, batch, batch_id
        )
        if not nonempty:
            return
        if committed:
            return  # at-least-once replay of an already-committed batch
        # torn = a previous attempt started but never committed; its data
        # appends may be partially present and must not be doubled
        if not torn:
            store.append(
                "batch_attempts",
                spark.createDataFrame([(batch_id,)], "batch_id long"),
            )
        batch_ids = batch.select("doc_id")

        def _archive(table: str) -> DataFrame:
            df = store.read(table)
            if torn:  # strip this batch's partial rows from the archive view
                df = df.join(F.broadcast(batch_ids), "doc_id", "left_anti")
            return df

        have_index = store.exists("lsh_bands") and (
            not torn or bool(_archive("lsh_bands").take(1))
        )
        if have_index:
            pairs = D.minhash_lsh_pairs_incremental(
                batch,
                _archive("corpus"),
                _archive("lsh_bands"),
                "doc_id",
                "text",
                n=n,
                min_jaccard=min_jaccard,
            )
        else:
            pairs = D.minhash_lsh_pairs(
                batch, "doc_id", "text", n=n, min_jaccard=min_jaccard
            )
        comps = D.connected_components(pairs).select(
            F.col("node").alias("doc_id"), "comp"
        )
        decisions = (
            batch.join(comps, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.col("comp").isNull()
                    | (F.col("comp") == F.col("doc_id"))
                ).alias("keep"),
                F.when(
                    F.col("comp") != F.col("doc_id"), F.col("comp")
                ).alias("dup_of"),
                # long, matching the marker tables — a Python-int lit
                # would write int32 and clash with any externally
                # repaired/merged log rows
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
        )
        bands = D.minhash_band_index(batch, "doc_id", "text", n=n)

        def _fresh_only(table: str, df: DataFrame) -> DataFrame:
            # on a torn replay, append only rows the dead attempt missed
            if not (torn and store.exists(table)):
                return df
            present = (
                store.read(table)
                .join(F.broadcast(batch_ids), "doc_id", "left_semi")
                .select("doc_id")
            )
            return df.join(F.broadcast(present), "doc_id", "left_anti")

        store.append("dedup_log", _fresh_only("dedup_log", decisions))
        store.append("corpus", _fresh_only("corpus", batch))
        store.append("lsh_bands", _fresh_only("lsh_bands", bands))
        # commit marker LAST: until this lands, a replay heals the batch
        store.append(
            "batch_commits", spark.createDataFrame([(batch_id,)], "batch_id long")
        )

    stream = _backlog_file_stream(
        spark, "doc_id long, text string", source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def init_streaming_ivf_index(
    store,
    centroids: DataFrame,
    train_vectors: DataFrame,
    train_assignments: DataFrame,
) -> None:
    """Bootstrap the streaming ANN warehouse from a trained index:
    frozen ``ivf_centroids``, the training corpus in ``vectors`` and its
    cell assignments in ``ivf_assignments`` (both stamped batch_id -1 so
    stream batches start at 0). ``train_vectors`` must carry
    ``(vec_id, embedding)``; ``train_assignments`` ``(id, cid)`` as
    :func:`~...operators.similarity.kmeans_lite` returns them."""
    store.overwrite("ivf_centroids", centroids)
    store.overwrite(
        "vectors",
        train_vectors.select(
            "vec_id", "embedding", F.lit(-1).cast("long").alias("batch_id")
        ),
    )
    store.overwrite(
        "ivf_assignments",
        train_assignments.select(
            F.col("id").alias("vec_id"),
            "cid",
            F.lit(-1).cast("long").alias("batch_id"),
        ),
    )


def run_streaming_ivf_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    kernel: str = "numpy",
    max_files_per_trigger: int | None = None,
):
    """Continuous embedding ingestion into a persisted IVF ANN index —
    the ANN twin of :func:`run_streaming_dedup_ingest` (round 11,
    carried round-10 verdict item 7): per micro-batch of
    ``(vec_id, embedding)`` rows, assign each vector to its nearest
    FROZEN centroid (``assign_to_centroids`` — one O(batch × k) Arrow
    map pass, never a re-clustering) and append both the vectors and
    their cell assignments, so queries over the growing corpus keep
    probing cells instead of brute-forcing. Centroids are read once per
    batch from the store (k tiny rows) and stay frozen — the measured
    refresh policy (SCALEBENCH §ivf_refresh) governs when a re-train
    pays.

    Replay semantics: checkpointed ``foreachBatch`` is at-least-once and
    the batch writes span TWO tables, so the appends follow the same
    intent/commit marker protocol as the dedup ingester:

    - ``batch_attempts`` first, then ``vectors`` + ``ivf_assignments``
      (each row stamped with ``batch_id``), then ``batch_commits``;
    - a batch_id already committed is skipped outright;
    - an attempted-but-uncommitted batch_id is a torn previous attempt:
      assignment is deterministic under frozen centroids, so the heal
      appends only the vec_ids the dead attempt did not land (a
      broadcast anti-join against the batch's own ids, stats-pruned,
      paid only on the rare post-crash replay).

    Scale shape: per batch, assignment is O(batch × k) with the k×d
    centroid matrix broadcast/driver-resident; appends are batch-sized;
    nothing re-scans or re-clusters the archive. The union-with-training
    probe contract (appended vectors land exactly where training would
    put them, all-cell probe == brute force) is pinned by the batch
    entry's oracle and tests/test_kmeans_ivf.py; the streaming composition
    is graded end-to-end by the ``streaming_ivf_ingest`` catalog entry.
    """
    from ..operators.similarity import assign_to_centroids
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # no localCheckpoint (round-14, same as the maintenance applies):
        # the foreachBatch frame is file-list-backed, so each consumer
        # fuses the (small) batch scan into its own job instead of paying
        # an up-front materialization job + pinned executor memory
        batch = batch_df.select("vec_id", "embedding")
        # ONE probe job for batch emptiness + both marker tables
        # (round-14; was take(1) + one filtered take(1) per marker table)
        nonempty, committed, torn = _probe_batch_and_markers(
            store, batch, batch_id
        )
        if not nonempty:
            return
        if committed:
            return  # at-least-once replay of an already-committed batch
        if not torn:
            store.append(
                "batch_attempts",
                spark.createDataFrame([(batch_id,)], "batch_id long"),
            )
        batch_ids = batch.select("vec_id")
        assigned = assign_to_centroids(
            batch,
            store.read("ivf_centroids"),
            id_col="vec_id",
            vec_col="embedding",
            kernel=kernel,
        ).select(
            F.col("id").alias("vec_id"),
            "cid",
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        vectors = batch.select(
            "vec_id",
            "embedding",
            F.lit(batch_id).cast("long").alias("batch_id"),
        )

        def _fresh_only(table: str, df: DataFrame) -> DataFrame:
            # on a torn replay, append only rows the dead attempt missed —
            # scoped to rows the dead attempt itself stamped (batch_id ==
            # this batch): a vec_id that legitimately exists from training
            # (batch -1) or an earlier committed batch must NOT suppress
            # the replay append, or a healed run and a crash-free run
            # would diverge whenever vec_ids recur (round-12 advice fix)
            if not (torn and store.exists(table)):
                return df
            present = (
                store.read(table)
                .where(F.col("batch_id") == F.lit(batch_id).cast("long"))
                .join(F.broadcast(batch_ids), "vec_id", "left_semi")
                .select("vec_id")
            )
            return df.join(F.broadcast(present), "vec_id", "left_anti")

        store.append("vectors", _fresh_only("vectors", vectors))
        store.append(
            "ivf_assignments", _fresh_only("ivf_assignments", assigned)
        )
        # commit marker LAST: until this lands, a replay heals the batch
        store.append(
            "batch_commits",
            spark.createDataFrame([(batch_id,)], "batch_id long"),
        )

    stream = _backlog_file_stream(
        spark,
        "vec_id long, embedding array<float>",
        source_dir,
        max_files_per_trigger,
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (round 11): the streaming ANN ingest END-TO-END
    under the oracle gate. Centroids train on the vec_id % 3 != 0
    two-thirds of the corpus (k=8), the remaining third arrives as TWO
    stream files (one 2-way split write) and drains through
    :func:`run_streaming_ivf_ingest` — one frozen-centroid assignment
    pass + exactly-once two-table appends per micro-batch — and the
    query probes ALL cells of the persisted (training ∪ streamed) index
    so the rescore set is the full corpus: the result must equal exact
    brute-force top-k over EVERYTHING, proving streamed vectors are
    findable, placed where training would put them, and landed exactly
    once. Same oracle as the batch incremental entry; restart/replay/
    torn-batch behavior is pinned by tests/test_streaming_ivf_ingest.py."""
    import os
    import shutil
    import tempfile

    from ..operators.similarity import ivf_topk, kmeans_lite
    from ..sources.io import TableStore

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    train = e.where(F.col("vec_id") % 3 != 0)
    late = e.where(F.col("vec_id") % 3 == 0)
    q = e.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    root = tempfile.mkdtemp(prefix="ivf_ingest_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        # two stream files in ONE write job (round-13 opt: the exactly-once
        # append protocol makes the result independent of HOW the late
        # third splits across files, so the former two per-parity
        # coalesce(1) writes were an extra sequential job for nothing)
        late.repartition(2).write.mode("append").parquet(src)
        store = TableStore(spark, os.path.join(root, "wh"))
        cents, assigns = kmeans_lite(train, k=8, iters=2)
        init_streaming_ivf_index(store, cents, train, assigns)
        stream_q = run_streaming_ivf_ingest(
            spark, src, os.path.join(root, "ckpt"), os.path.join(root, "wh")
        )
        if not stream_q.awaitTermination(300):
            stream_q.stop()
            raise RuntimeError(
                "streaming_ivf_ingest: AvailableNow query did not finish "
                "within 300s"
            )
        corpus = store.read("vectors").select("vec_id", "embedding")
        index = store.read("ivf_assignments").select(
            F.col("vec_id").alias("id"), "cid"
        )
        out = ivf_topk(
            corpus, q, store.read("ivf_centroids"), index, k=10, nprobe=8
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def streaming_hopping_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HOPPING-window aggregation (round-6, SURVEY §2.12
    extension): per-event-type counts over 1-hour windows sliding every
    15 minutes, computed by a real streaming query — the overlapping-
    window family in its streaming form (each event updates 4 windows'
    state; Spark expands the membership row-locally exactly like the
    batch `hopping_event_rates`, so state rows — not input rows — are
    what multiply).

    AvailableNow + complete-mode memory sink over the static corpus make
    the result equal the batch hopping aggregate, hence oracle-checkable
    (same day-slice filter to keep the window table compact). With live
    data the same query runs append-mode with a watermark and only the
    4×(arrival-rate × horizon) open-window state is retained."""
    import os

    from pyspark.sql import functions as F

    evt = _events_stream(spark, sf_dir).where(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp_ntz"))
    )
    agg = evt.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    sink = _drain_to_memory_sink(
        agg,
        "streaming_hopping_rates",
        "complete",
        shuffle_partitions=_stream_state_partitions(
            spark, os.path.join(sf_dir, "events.parquet")
        ),
    )
    out = spark.table(sink).select(
        F.col("w.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "n_events",
        "total_value",
    ).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


STREAMING_HOPPING_RATES_ORACLE = """
WITH day AS (
  SELECT ts, event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
    AND ts <  TIMESTAMP '2024-01-04 00:00:00'
),
expanded AS (
  SELECT make_timestamp(((epoch_us(ts) // 900000000) - j) * 900000000)
           AS win_start,
         event_type, value
  FROM day, unnest([0, 1, 2, 3]) AS t(j)
)
SELECT win_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM expanded
GROUP BY win_start, event_type
"""


def streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog entry (round 10): BOUNDED-STATE streaming dedup
    (``dropDuplicatesWithinWatermark``) end-to-end under the oracle
    gate. A duplicated events feed — every event whose id ≡ 0 (mod 7)
    appears TWICE — lands as three stream files (one 3-way split write)
    and drains through a real AvailableNow query that dedups on
    ``event_id``; the survivors aggregate per event type. The oracle
    aggregates the ORIGINAL events only, so the entry passes iff the
    streaming operator dropped every injected duplicate and nothing
    else. The 35-day delay exceeds the corpus's 30-day span, making the
    result independent of file arrival order (no key's copy can fall
    behind the watermark mid-run); the operator's actual state
    boundedness — the reason this form exists next to plain
    ``dropDuplicates`` — is pinned by tests/test_streaming_pipeline.py::
    test_dedup_state_growth_bounded_vs_plain."""
    import os
    import shutil
    import tempfile

    from ..plans.operator_queries import _normalize_events_ts, _read_events_raw

    ev = _normalize_events_ts(
        _read_events_raw(spark, os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "ts", "event_type", "value")
    feed = ev.unionByName(ev.where(F.col("event_id") % 7 == 0))

    root = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        # three stream files in ONE write job (round-13 opt: the former
        # per-tertile coalesce(1) writes paid three sequential jobs; the
        # entry's own contract — the 35-day watermark exceeds the corpus
        # span — makes the result independent of HOW rows split across
        # files, so any deterministic 3-way split serves)
        feed.repartition(3).write.mode("overwrite").parquet(src)
        # whole backlog in ONE micro-batch (round-14, same §1.2 move as
        # the maintenance drains): per-file batches paid the per-batch
        # state-store commit + offset-log machinery three extra times for
        # identical output (the 35-day watermark makes the result
        # arrival-order independent); cross-batch dedup semantics stay
        # pinned by tests/test_streaming_pipeline.py
        stream = spark.readStream.schema(feed.schema).parquet(src)
        # watermarks require an LTZ event-time column; the NTZ corpus ts
        # is reinterpreted in the (run-constant) session TZ, which shifts
        # every row and the watermark by the same offset — and the ts
        # column never reaches the output, so the result is TZ-independent
        ded = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "35 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        sink = _drain_to_memory_sink(
            ded,
            "streaming_dedup_within_watermark",
            "append",
            shuffle_partitions=_stream_state_partitions(spark, src),
        )
        out = (
            spark.table(sink)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            )
            .localCheckpoint(eager=True)
        )
        spark.catalog.dropTempView(sink)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


STREAMING_DEDUP_WITHIN_WATERMARK_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY event_type
"""


def _backlog_file_stream(
    spark: SparkSession,
    schema,
    source_dir: str,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """File-source stream for the foreachBatch maintenance runners.

    ``max_files_per_trigger=None`` (the round-14 default for every
    runner) lets an AvailableNow drain take the WHOLE backlog as one
    micro-batch — the production backlog-drain shape: each micro-batch
    pays fixed machinery (offset/commit log writes, replay probe, one
    versioned overwrite per maintained table, and one scheduled job per
    AQE stage of each of those actions), so per-file batches multiply
    pure overhead by the file count. Measured at sf0.1 on the CDC × MV
    loop: 67 jobs / ~5.2 s at one-file batches vs ~1/3 the jobs in one
    batch — r13 verdict item 3 (guide §1.2: remove jobs, not tasks).
    The split-log/multi-batch semantics (late sequences across batches,
    replay skips, torn-batch healing) stay pinned by the pytest suites,
    which pass an explicit ``max_files_per_trigger=1``; a live consumer
    (not AvailableNow) gets one batch per arrival wave either way."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(source_dir)


def _probe_batch_and_markers(store, batch: DataFrame, batch_id: int):
    """ONE Spark job probing micro-batch emptiness + the intent/commit
    marker tables of the two-table append ingesters (round-14 opt, same
    §1.2 rationale as :func:`_probe_batch_and_state`): returns
    ``(batch_nonempty, committed, torn)``. Each marker probe is a
    stats-prunable ``batch_id`` filter + ``limit(1)``, unioned with the
    batch's own ``limit(1)`` so the whole test is a single collect
    instead of three separately scheduled jobs per micro-batch."""
    probe = batch.select(F.lit("b").alias("t")).limit(1)
    for tag, table in (("c", "batch_commits"), ("a", "batch_attempts")):
        if store.exists(table):
            probe = probe.unionAll(
                store.read(table)
                .where(F.col("batch_id") == batch_id)
                .select(F.lit(tag).alias("t"))
                .limit(1)
            )
    seen = {r["t"] for r in probe.collect()}
    return "b" in seen, "c" in seen, "a" in seen


def _probe_batch_and_state(batch: DataFrame, states: dict):
    """ONE Spark job probing micro-batch emptiness AND every maintained
    table's replay marker + row count (round-14 opt, guide §1.2: the
    former ``take(1)`` + per-table ``max(last_batch)`` collect chains
    cost 2-3 separately-scheduled jobs per micro-batch, and at bench
    scale the applies are driver-gap-bound, not task-bound — the r13
    REST profile showed ~4.5 s of driver gaps in an 8.5 s
    ``cdc_mv_maintenance_state`` wall).

    ``states``: {name: DataFrame-with-last_batch or None (missing
    table)}. Returns ``(batch_nonempty, {name: (marker, n_rows)})``
    where ``marker`` is ``max(last_batch)`` (None == empty table or
    all-NULL markers) and ``n_rows`` the table's row count — callers
    must carry non-empty state forward even when the marker is NULL (a
    bootstrapped state table without markers was previously dropped
    silently; r13 ADVICE).

    The batch probe is ``limit(1)`` over the batch's fixed file list —
    like the former ``take(1)`` it reads only enough splits to find one
    row; the state aggregates are column-pruned scans of the (small)
    state tables, unioned so the whole probe is one collect."""
    probe = batch.select(
        F.lit("__batch").alias("t"),
        F.lit(None).cast("long").alias("m"),
        F.lit(1).cast("long").alias("n"),
    ).limit(1)
    for name, df in states.items():
        if df is None:
            continue
        probe = probe.unionAll(
            df.agg(
                F.max("last_batch").alias("m"),
                F.count(F.lit(1)).alias("n"),
            ).select(F.lit(name).alias("t"), "m", "n")
        )
    rows = {r["t"]: r for r in probe.collect()}
    out = {}
    for name, df in states.items():
        if df is None:
            out[name] = (None, 0)
        else:
            r = rows[name]
            out[name] = (r["m"], int(r["n"]))
    return "__batch" in rows, out


def apply_agg_state_batch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
    state_table: str = "agg_state",
) -> bool:
    """Merge ONE micro-batch's partial aggregates into the persisted
    state table, effectively-once. Returns True iff the batch was
    applied (False: empty batch or an already-applied replay).

    Exactly-once WITHOUT a multi-table marker protocol: the
    last-applied ``batch_id`` is a column OF the state table itself, so
    the state and its progress marker commit together in the
    TableStore's single atomic versioned overwrite. Checkpointed
    ``foreachBatch`` is at-least-once with monotonically increasing
    batch ids, so the replay-skip test is ``max(last_batch) >=
    batch_id``: a crash BEFORE the overwrite lands leaves the old
    state+marker (the replay re-merges from the old state — no double
    count), a crash AFTER leaves the new pair (the replay is skipped).
    A nonempty batch always yields >=1 group row, so the marker can
    never be lost to an empty overwrite; empty batches are skipped
    outright (merging nothing is a no-op, so losing their marker is
    harmless).

    Scale shape: per batch, ONE map-side-combined aggregate of the
    batch plus a merge groupBy over two state-sized frames (group
    cardinality, not history size) — the streaming form of the
    ``incremental_monthly_revenue`` refresh, with identical
    semantics to a full recompute (pinned by test against the batch
    union's plain aggregate).
    """
    from ..operators.incremental import merge_partials, partial_agg

    # no localCheckpoint (round-13 opt): foreachBatch's frame is backed
    # by the batch's FIXED file list, so re-evaluation is deterministic,
    # the probe below reads only enough of it to find one row, and each
    # later consumer fuses the scan into its own job — the eager
    # checkpoint was a full extra materialization (plus pinned executor
    # memory for the whole batch) per micro-batch
    batch = batch_df
    state = store.read(state_table) if store.exists(state_table) else None
    # ONE probe job for batch emptiness + marker + state row count
    # (round-14 opt; was take(1) + a separate max() collect)
    nonempty, probes = _probe_batch_and_state(batch, {"s": state})
    if not nonempty:
        return False
    marker, n_rows = probes["s"]
    if marker is not None and marker >= batch_id:
        return False  # at-least-once replay of an applied batch
    states = []
    if state is not None and n_rows > 0:
        # carried whenever the table is NON-EMPTY — a NULL marker no
        # longer drops bootstrapped state (r13 ADVICE fix)
        states.append(state.drop("last_batch"))
    states.append(partial_agg(batch, keys, value_col))
    new_state = (
        merge_partials(states, keys)
        if len(states) > 1
        else states[0]
    ).withColumn("last_batch", F.lit(batch_id).cast("long"))
    store.overwrite(state_table, new_state)
    return True


def run_streaming_agg_maintenance(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    keys: list[str],
    value_col: str,
    state_table: str = "agg_state",
    max_files_per_trigger: int | None = None,
):
    """Continuous materialized-view maintenance: a file stream of fact
    rows keeps the persisted partial-aggregate state table current via
    ``apply_agg_state_batch`` (one state-sized merge per micro-batch,
    never a history rescan). Consumers read the state table and
    finalize with ``operators.incremental.finalize_aggs`` — at any
    point between batches the finalized state equals a full recompute
    over every row ingested so far. ``max_files_per_trigger``: see
    :func:`_backlog_file_stream` (None = whole backlog in one batch)."""
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_agg_state_batch(
            spark, store, batch_df, batch_id, keys, value_col, state_table
        )

    schema = ", ".join(
        [f"{k} string" for k in keys] + [f"{value_col} double"]
    )
    stream = _backlog_file_stream(
        spark, schema, source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_agg_maintenance_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: the streaming materialized-view maintenance loop
    END-TO-END under the oracle gate — events split into three stream
    files, drained through ``run_streaming_agg_maintenance`` (three
    foreachBatch state merges, each an atomic versioned overwrite with
    the state-embedded batch marker), then the persisted state finalized.
    AvailableNow processes every row, and the partial-state merge is
    split-invariant, so the finalized state must equal the oracle's
    plain one-pass aggregate over the whole table — grading both the
    merge algebra and the exactly-once plumbing."""
    import os
    import shutil
    import tempfile

    from ..operators.incremental import finalize_aggs
    from ..sources.io import TableStore

    root = tempfile.mkdtemp(prefix="agg_maint_")
    try:
        src = os.path.join(root, "src")
        ev = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).select(
            "event_type", F.col("value").cast("double").alias("value")
        )
        # three part files; the AvailableNow drain takes the whole
        # backlog as ONE micro-batch (round-14, _backlog_file_stream) —
        # per-file batches only multiplied fixed apply machinery, and the
        # multi-batch merge/replay semantics stay pinned by the pytest
        # suite, which passes max_files_per_trigger=1
        ev.repartition(3).write.parquet(src)
        q = run_streaming_agg_maintenance(
            spark,
            src,
            os.path.join(root, "ckpt"),
            os.path.join(root, "wh"),
            ["event_type"],
            "value",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_agg_maintenance_state: AvailableNow query did "
                "not finish within 300s"
            )
        state = TableStore(spark, os.path.join(root, "wh")).read("agg_state")
        return finalize_aggs(state.drop("last_batch")).localCheckpoint(
            eager=True
        )
    finally:
        # the eager localCheckpoint pins the result; without this every
        # invocation (bench times each query >= 3x) leaked a stream
        # source + checkpoint + warehouse directory
        shutil.rmtree(root, ignore_errors=True)


STREAMING_AGG_MAINTENANCE_STATE_ORACLE = """
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_rows,
       round(sum(value), 2) AS value_sum,
       round(sum(value) / count(value), 2) AS value_avg,
       round(min(value), 2) AS value_min,
       round(max(value), 2) AS value_max
FROM events
GROUP BY event_type
"""


def apply_quantile_state_batch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    state_table: str = "quantile_state",
) -> bool:
    """Merge ONE micro-batch's histogram partials into the persisted
    quantile state, effectively-once — the streaming form of the
    ``incremental_value_quantiles`` refresh, running the exact
    state-embedded-marker protocol of :func:`apply_agg_state_batch`
    (max(last_batch) replay skip; state + marker commit in ONE atomic
    versioned overwrite, so no torn pair is reachable). Per batch: one
    map-side-combined histogram aggregate of the batch plus a bin-wise
    merge over two state-sized frames (groups × non-empty bins,
    independent of history size)."""
    from ..operators.incremental import (
        histogram_partial,
        merge_histogram_partials,
    )

    # no localCheckpoint (round-13 opt): see apply_agg_state_batch
    batch = batch_df
    state = store.read(state_table) if store.exists(state_table) else None
    # ONE probe job (round-14 opt, same as apply_agg_state_batch), and
    # non-empty state is carried even with a NULL marker (r13 ADVICE fix)
    nonempty, probes = _probe_batch_and_state(batch, {"s": state})
    if not nonempty:
        return False
    marker, n_rows = probes["s"]
    if marker is not None and marker >= batch_id:
        return False  # at-least-once replay of an applied batch
    states = []
    if state is not None and n_rows > 0:
        states.append(state.drop("last_batch"))
    states.append(histogram_partial(batch, keys, value_col, lo, hi, bins))
    new_state = (
        merge_histogram_partials(states, keys)
        if len(states) > 1
        else states[0]
    ).withColumn("last_batch", F.lit(batch_id).cast("long"))
    store.overwrite(state_table, new_state)
    return True


def run_streaming_quantile_maintenance(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    state_table: str = "quantile_state",
    max_files_per_trigger: int | None = None,
):
    """Continuous quantile-dashboard maintenance: a fact file stream
    keeps the persisted histogram state current (one state-sized
    bin-wise merge per micro-batch, never a history rescan); consumers
    read the state and finalize with
    ``operators.incremental.quantiles_from_histogram`` at any point —
    the read-out equals a one-pass histogram over every row ingested so
    far, with error ≤ one bin width versus the exact quantile.
    ``max_files_per_trigger``: see :func:`_backlog_file_stream`."""
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_quantile_state_batch(
            spark,
            store,
            batch_df,
            batch_id,
            keys,
            value_col,
            lo,
            hi,
            bins,
            state_table,
        )

    schema = ", ".join(
        [f"{k} string" for k in keys] + [f"{value_col} double"]
    )
    stream = _backlog_file_stream(
        spark, schema, source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_quantile_maintenance_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog entry (round 10): the streaming QUANTILE maintenance
    loop end-to-end under the oracle gate — orders split into three
    stream files, drained through
    :func:`run_streaming_quantile_maintenance` (foreachBatch bin-wise
    state merges, each an atomic versioned overwrite with the
    state-embedded batch marker), then P50/P90/P99 per order priority
    finalized from the persisted histogram state. Histogram merging is
    split-invariant and the read-out arithmetic is engine-exact, so the
    result must equal the oracle's one-pass binned-rank replay over the
    whole table (the same SQL that grades the batch form,
    ``incremental_value_quantiles``) — grading the monoid algebra AND
    the exactly-once plumbing in one key."""
    import os
    import shutil
    import tempfile

    from ..operators.incremental import quantiles_from_histogram
    from ..sources.io import TableStore

    LO, HI, BINS = 0.0, 600_000.0, 600
    root = tempfile.mkdtemp(prefix="quant_maint_")
    try:
        src = os.path.join(root, "src")
        o = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select(
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        o.repartition(3).write.parquet(src)
        q = run_streaming_quantile_maintenance(
            spark,
            src,
            os.path.join(root, "ckpt"),
            os.path.join(root, "wh"),
            ["o_orderpriority"],
            "o_totalprice",
            LO,
            HI,
            BINS,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_quantile_maintenance_state: AvailableNow query "
                "did not finish within 300s"
            )
        state = TableStore(spark, os.path.join(root, "wh")).read(
            "quantile_state"
        )
        return quantiles_from_histogram(
            state.drop("last_batch"),
            ["o_orderpriority"],
            LO,
            HI,
            BINS,
            [0.5, 0.9, 0.99],
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def apply_adaptive_quantile_state_batch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
    lo: float,
    bins: int,
    base_width: float,
    state_table: str = "adaptive_quantile_state",
) -> bool:
    """The RANGE-FREE streaming quantile refresh (round 11): like
    :func:`apply_quantile_state_batch` but on the width-doubling
    adaptive histogram, so no a-priori ``[lo, hi]`` is needed — a
    micro-batch whose values blow past everything seen so far simply
    arrives with a coarser per-group grid, and the merge LOSSLESSLY
    coarsens the persisted state to match (power-of-2 widths over a
    shared anchor; operators/incremental.py). Exactly-once via the same
    state-embedded marker (state + last_batch commit in one atomic
    versioned overwrite). Per batch: one group-max aggregate + one
    map-side-combined histogram aggregate of the batch, then a bin-wise
    merge over two state-sized frames."""
    from ..operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
    )

    # no localCheckpoint (round-13 opt): see apply_agg_state_batch
    batch = batch_df
    state = store.read(state_table) if store.exists(state_table) else None
    # ONE probe job (round-14 opt, same as apply_agg_state_batch), and
    # non-empty state is carried even with a NULL marker (r13 ADVICE fix)
    nonempty, probes = _probe_batch_and_state(batch, {"s": state})
    if not nonempty:
        return False
    marker, n_rows = probes["s"]
    if marker is not None and marker >= batch_id:
        return False  # at-least-once replay of an applied batch
    states = []
    if state is not None and n_rows > 0:
        states.append(state.drop("last_batch"))
    states.append(
        adaptive_histogram_partial(
            batch, keys, value_col, lo, bins, base_width
        )
    )
    new_state = (
        merge_adaptive_histogram_partials(states, keys)
        if len(states) > 1
        else states[0]
    ).withColumn("last_batch", F.lit(batch_id).cast("long"))
    store.overwrite(state_table, new_state)
    return True


def run_streaming_adaptive_quantile_maintenance(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    keys: list[str],
    value_col: str,
    lo: float,
    bins: int,
    base_width: float,
    state_table: str = "adaptive_quantile_state",
    max_files_per_trigger: int | None = None,
):
    """Continuous quantile-dashboard maintenance with NO a-priori value
    range — the production form for metrics whose scale drifts (latency
    regressions, price inflation, token-count growth): each micro-batch
    picks its own per-group power-of-2 grid and the persisted state
    coarsens losslessly when the range grows. Consumers finalize with
    ``quantiles_from_adaptive_histogram`` at any point; error ≤ one
    CURRENT bin width."""
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_adaptive_quantile_state_batch(
            spark,
            store,
            batch_df,
            batch_id,
            keys,
            value_col,
            lo,
            bins,
            base_width,
            state_table,
        )

    schema = ", ".join(
        [f"{k} string" for k in keys] + [f"{value_col} double"]
    )
    stream = _backlog_file_stream(
        spark, schema, source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_adaptive_quantile_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog entry (round 11): the RANGE-FREE streaming quantile loop
    end-to-end under the oracle gate. Orders stream as three files
    split BY VALUE RANGE — batch 1 tops out below 20k, batch 3 blows
    past it by ~25× — so the persisted state must coarsen its grid
    mid-stream (the exact drifting-metric shape the fixed-grid loop
    cannot survive without a guessed-right [lo, hi]). The merged state
    equals a one-pass adaptive histogram at each group's final width
    (lossless power-of-2 coarsening + width selection monotone in the
    group max), so the same oracle SQL that grades the batch form
    (``adaptive_quantile_state``) grades the streaming plumbing too."""
    import os
    import shutil
    import tempfile

    from ..operators.incremental import quantiles_from_adaptive_histogram
    from ..sources.io import TableStore

    LO, BINS, BASE_W = 0.0, 256, 16.0
    root = tempfile.mkdtemp(prefix="aquant_maint_")
    try:
        src = os.path.join(root, "src")
        o = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select(
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        p = F.col("o_totalprice")
        slices = [
            o.where(p < 20_000),
            o.where((p >= 20_000) & (p < 100_000)),
            o.where(p >= 100_000),
        ]
        for s in slices:
            s.coalesce(1).write.mode("append").parquet(src)
        q = run_streaming_adaptive_quantile_maintenance(
            spark,
            src,
            os.path.join(root, "ckpt"),
            os.path.join(root, "wh"),
            ["o_orderpriority"],
            "o_totalprice",
            LO,
            BINS,
            BASE_W,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_adaptive_quantile_state: AvailableNow query "
                "did not finish within 300s"
            )
        state = TableStore(spark, os.path.join(root, "wh")).read(
            "adaptive_quantile_state"
        )
        return quantiles_from_adaptive_histogram(
            state.drop("last_batch"),
            ["o_orderpriority"],
            LO,
            [0.5, 0.9, 0.99],
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# CDC × MV composition (round-8): one foreachBatch loop maintains BOTH the
# versioned snapshot (apply_cdc_versioned) and a group aggregate over it —
# the shape a real warehouse runs off a Debezium feed.
# ---------------------------------------------------------------------------


def init_cdc_mv(
    store,
    snapshot: DataFrame,
    group_cols: list[str],
    value_col: str,
    snapshot_table: str = "snapshot",
    state_table: str = "agg_state",
) -> None:
    """Bootstrap the two maintained tables from an initial snapshot: the
    versioned snapshot (``to_versioned``, seq 0) and its full group
    aggregate — both stamped ``last_batch = -1`` so batch 0 applies."""
    from ..operators.cdc import to_versioned
    from ..operators.incremental import partial_agg

    vsnap = to_versioned(snapshot).withColumn(
        "last_batch", F.lit(-1).cast("long")
    )
    store.overwrite(snapshot_table, vsnap)
    state = partial_agg(snapshot, group_cols, value_col).withColumn(
        "last_batch", F.lit(-1).cast("long")
    )
    store.overwrite(state_table, state)


def apply_cdc_mv_batch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    batch_id: int,
    key_cols: list[str],
    seq_col: str,
    group_cols: list[str],
    value_col: str,
    op_col: str = "op",
    snapshot_table: str = "snapshot",
    state_table: str = "agg_state",
) -> bool:
    """Apply ONE micro-batch of a CDC log to the versioned snapshot AND
    its maintained group aggregate, exactly-once for both. Returns True
    iff any table advanced.

    Aggregate maintenance under updates/deletes cannot use blind partial
    merges (a delete must RETRACT, and min/max are not retractable), so
    the state update is a bounded re-aggregate: only the AFFECTED groups
    — groups the changed keys leave plus groups they enter, both
    change-bounded sets — are recomputed from the post-apply snapshot
    and swapped into the state via anti-join + union. Cost per batch:
    O(changes + rows-in-affected-groups + |state|), never a full-history
    rescan.

    Torn-batch safety across TWO tables without a distributed
    transaction: each table embeds its own ``last_batch`` marker, the
    AGGREGATE is COMMITTED first, and its recompute reads the post-apply
    snapshot — never the possibly-stale published snapshot table. The
    post-apply snapshot is STAGED (data written to its next version dir,
    manifest flip deferred — ``TableStore.overwrite_staged``): the
    recompute reads those bytes back columnar instead of holding a
    second in-memory copy (round-13 opt: the former ``localCheckpoint``
    materialized the full snapshot into executor memory AND then wrote
    it again), and the snapshot's manifest flips only AFTER the
    aggregate committed. Commit order is therefore unchanged: the only
    possible tear is still "aggregate new, snapshot old" (a crash
    leaves the staged dir unpublished — torn output the versioned
    protocol already tolerates), and the at-least-once replay heals it:
    the aggregate skips on its marker while the snapshot re-applies the
    batch (``apply_cdc_versioned`` is idempotent), converging both
    tables. The reverse tear cannot exist.
    """
    from ..operators.cdc import apply_cdc_versioned, strip_versioned
    from ..operators.incremental import partial_agg

    # no localCheckpoint (round-13 opt): foreachBatch's frame is backed
    # by the batch's FIXED file list, so re-evaluation is deterministic,
    # the probe below reads only enough of it to find one row, and each
    # later consumer fuses the scan into its own job — the eager
    # checkpoint was a full extra materialization (plus pinned executor
    # memory for the whole batch) per micro-batch
    batch = batch_df
    # ONE probe job for batch emptiness + BOTH tables' markers (round-14
    # opt; the round-13 shape still paid three jobs per batch: take(1)
    # plus one max(last_batch) collect per maintained table)
    snap_df = (
        store.read(snapshot_table) if store.exists(snapshot_table) else None
    )
    state_df = store.read(state_table) if store.exists(state_table) else None
    nonempty, probes = _probe_batch_and_state(
        batch, {"snap": snap_df, "state": state_df}
    )
    if not nonempty:
        return False
    snap_marker = probes["snap"][0]
    state_marker = probes["state"][0]
    snap_marker = -(2**62) if snap_marker is None else snap_marker
    state_marker = -(2**62) if state_marker is None else state_marker
    snap_applied = snap_marker >= batch_id
    state_applied = state_marker >= batch_id
    if snap_applied and state_applied:
        return False  # clean replay of a fully-applied batch

    cur_vsnap = snap_df.drop("last_batch")
    if snap_applied:
        # the published snapshot already contains this batch (the healed
        # tear): it IS the post-apply frame — no re-apply, no staging
        new_vsnap = cur_vsnap
        commit_snap = None
    else:
        # stage the post-apply snapshot: ONE materialization, straight to
        # its final columnar home; the manifest flip waits until after
        # the aggregate commits (see docstring — commit order unchanged)
        staged_ver, commit_snap = store.overwrite_staged(
            snapshot_table,
            apply_cdc_versioned(
                cur_vsnap, batch, key_cols, seq_col, op_col
            ).withColumn("last_batch", F.lit(batch_id).cast("long")),
        )
        new_vsnap = store.read(snapshot_table, version=staged_ver).drop(
            "last_batch"
        )

    if not state_applied:
        changed_keys = batch.select(*key_cols).distinct()
        old_groups = (
            strip_versioned(cur_vsnap)
            .join(changed_keys, key_cols, "left_semi")
            .select(*group_cols)
            .distinct()
        )
        new_groups = (
            strip_versioned(new_vsnap)
            .join(changed_keys, key_cols, "left_semi")
            .select(*group_cols)
            .distinct()
        )
        affected = old_groups.unionByName(new_groups).distinct()

        # group keys can be NULL (a dirty dimension value is still a
        # group) — plain column-equality joins silently drop them, which
        # would leave the null group's aggregate stale forever. Null-safe
        # equality keeps the retraction exact for every group.
        #
        # Round-13 opt: the affected-group set is change-bounded by
        # construction, so COLLECT it once (one job) and filter both
        # consumers with a literal null-safe predicate — the previous
        # shape re-ran the whole distinct-groups subplan as TWO separate
        # broadcast builds (semi for the recompute, anti for the carried
        # state). Fallback to the broadcast joins only if a pathological
        # batch touches more groups than a sane expression tree holds.
        affected_rows = affected.limit(513).collect()
        if len(affected_rows) <= 512:

            def _pred():
                conds = []
                for row in affected_rows:
                    term = None
                    for c in group_cols:
                        t = F.col(c).eqNullSafe(F.lit(row[c]))
                        term = t if term is None else (term & t)
                    conds.append(term)
                out = F.lit(False)
                for cnd in conds:
                    out = out | cnd
                return out

            hit = _pred()
            recomputed = partial_agg(
                strip_versioned(new_vsnap).where(hit), group_cols, value_col
            )
            untouched = state_df.drop("last_batch").where(~hit)
        else:

            def _null_safe(left: DataFrame, how: str) -> DataFrame:
                aff = affected.alias("__aff")
                l = left.alias("__l")
                cond = None
                for c in group_cols:
                    term = F.col(f"__l.{c}").eqNullSafe(F.col(f"__aff.{c}"))
                    cond = term if cond is None else (cond & term)
                return l.join(F.broadcast(aff), cond, how)

            recomputed = partial_agg(
                _null_safe(strip_versioned(new_vsnap), "left_semi"),
                group_cols,
                value_col,
            )
            untouched = _null_safe(state_df.drop("last_batch"), "left_anti")
        new_state = untouched.unionByName(recomputed).withColumn(
            "last_batch", F.lit(batch_id).cast("long")
        )
        store.overwrite(state_table, new_state)

    if commit_snap is not None:
        commit_snap()  # manifest flip only — the data is already staged
    return True


def run_cdc_mv_maintenance(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    schema: str,
    key_cols: list[str],
    seq_col: str,
    group_cols: list[str],
    value_col: str,
    max_files_per_trigger: int | None = None,
):
    """Continuous CDC consumption with materialized-view co-maintenance:
    a file stream of change rows keeps BOTH the versioned snapshot and
    its group aggregate current via :func:`apply_cdc_mv_batch` — split-
    and order-invariant (versioned apply tolerates late sequences across
    batches), so the final state equals a whole-log batch apply no
    matter how the log lands in files. ``max_files_per_trigger``: see
    :func:`_backlog_file_stream` (None = whole backlog in one batch)."""
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_mv_batch(
            spark,
            store,
            batch_df,
            batch_id,
            key_cols,
            seq_col,
            group_cols,
            value_col,
        )

    stream = _backlog_file_stream(
        spark, schema, source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cdc_mv_maintenance_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: the CDC × MV maintenance loop END-TO-END under the
    oracle gate. A deterministic 3-sequence CDC log over orders — price
    updates (%89), deletes (%97), re-updates at higher seq (%89 ∧ odd),
    inserts of cloned keys (%101), and GROUP-MOVING priority updates
    (%53, the case that forces retraction from the old group) — is split
    into three stream files in arbitrary row order, drained through
    ``run_cdc_mv_maintenance`` (foreachBatch applies maintaining
    snapshot + aggregate together; the bench drain takes the backlog in
    one batch — multi-batch splits stay pinned by the pytest suite), and
    the finalized aggregate state is
    returned. Split-invariance of the versioned apply + the bounded
    group re-aggregate must reproduce the oracle's whole-log replay
    aggregated in one pass — grading the CDC fold, the affected-group
    retraction logic and the two-table exactly-once plumbing at once."""
    import os
    import shutil
    import tempfile

    from ..operators.incremental import finalize_aggs
    from ..sources.io import TableStore

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    snap = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    k = F.col("o_orderkey")

    def ch(df, seq, op, price, prio=F.col("o_orderpriority")):
        return df.select(
            "o_orderkey",
            prio.alias("o_orderpriority"),
            price.cast("double").alias("o_totalprice"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
        )

    p = F.col("o_totalprice")
    changes = (
        ch(o.where(k % 89 == 0), 1, "U", p + 1.5)
        .unionByName(ch(o.where(k % 97 == 0), 2, "D", p))
        .unionByName(
            ch(o.where((k % 89 == 0) & (k % 2 == 1)), 3, "U", p + 2.5)
        )
        .unionByName(
            ch(
                o.where(k % 101 == 0).withColumn(
                    "o_orderkey", k + 10_000_000
                ),
                1,
                "I",
                p,
            )
        )
        # group move: same key leaves its old priority group
        .unionByName(
            ch(o.where(k % 53 == 0), 2, "U", p, prio=F.lit("9-MOVED"))
        )
    )

    root = tempfile.mkdtemp(prefix="cdc_mv_")
    try:
        src = os.path.join(root, "src")
        changes.repartition(3).write.parquet(src)
        store = TableStore(spark, os.path.join(root, "wh"))
        init_cdc_mv(store, snap, ["o_orderpriority"], "o_totalprice")
        q = run_cdc_mv_maintenance(
            spark,
            src,
            os.path.join(root, "ckpt"),
            os.path.join(root, "wh"),
            "o_orderkey long, o_orderpriority string, "
            "o_totalprice double, seq long, op string",
            ["o_orderkey"],
            "seq",
            ["o_orderpriority"],
            "o_totalprice",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "cdc_mv_maintenance_state: AvailableNow query did not "
                "finish within 300s"
            )
        state = store.read("agg_state").drop("last_batch")
        return finalize_aggs(state).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


CDC_MV_MAINTENANCE_STATE_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 1.5 AS DOUBLE) AS o_totalprice,
         1 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE), 2, 'D'
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 2.5 AS DOUBLE), 3, 'U'
  FROM orders WHERE o_orderkey % 89 = 0 AND o_orderkey % 2 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderpriority,
         CAST(o_totalprice AS DOUBLE), 1, 'I'
  FROM orders WHERE o_orderkey % 101 = 0
  UNION ALL
  SELECT o_orderkey, '9-MOVED', CAST(o_totalprice AS DOUBLE), 2, 'U'
  FROM orders WHERE o_orderkey % 53 = 0
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC, (op = 'D') DESC) AS rn
    FROM changes
  ) WHERE rn = 1
),
final AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM last WHERE op <> 'D'
)
SELECT o_orderpriority,
       CAST(count(o_totalprice) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS value_sum,
       round(sum(o_totalprice) / count(o_totalprice), 2) AS value_avg,
       round(min(o_totalprice), 2) AS value_min,
       round(max(o_totalprice), 2) AS value_max
FROM final
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Streaming partitioned×versioned CDC warehouse (round-10; carried round-8
# verdict item 6): the complete Debezium-consumer shape — a change-log file
# stream maintaining a hive-PARTITIONED, tombstone-safe (versioned) snapshot
# with O(affected-partitions) writes per micro-batch, exactly-once via an
# in-table batch marker.
# ---------------------------------------------------------------------------


def init_cdc_partitioned_warehouse(
    store,
    snapshot: DataFrame,
    partition_col: str,
    table: str = "snapshot",
) -> None:
    """Bootstrap the partitioned versioned warehouse table from an
    initial snapshot: payload + ``__seq``/``__deleted`` (seq 0, live)
    plus ``last_batch = -1`` so batch 0 applies, hive-partitioned on
    ``partition_col`` (the layout ``apply_cdc_partitioned_versioned``
    prunes against)."""
    from ..operators.cdc import to_versioned

    vsnap = to_versioned(snapshot).withColumn(
        "last_batch", F.lit(-1).cast("long")
    )
    store.overwrite(table, vsnap, partition_by=[partition_col])


def apply_cdc_partitioned_warehouse_batch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    batch_id: int,
    key_cols: list[str],
    seq_col: str,
    partition_col: str,
    op_col: str = "op",
    table: str = "snapshot",
    keep_versions: int | None = None,
    compact_max_files: int | None = None,
) -> list:
    """Apply ONE micro-batch of a CDC log to the partitioned versioned
    warehouse, exactly-once. Returns the replaced partition dirs
    (empty on a skipped replay or an empty batch).

    Exactly-once is two independent layers, either of which suffices:

    - **marker skip** — ``max(last_batch)`` over the stored table (a
      column-pruned scan) names the latest applied batch; a replayed
      ``batch_id`` at or below it is skipped without a write. The
      marker lives IN the table and commits with the same version flip
      as the data (see ``apply_cdc_partitioned_versioned``), so unlike
      the two-table MV loop there is no torn state to heal — a crash
      between fold and flip leaves the OLD version current and the
      replay re-applies cleanly.
    - **idempotent fold** — even without the marker, re-applying a
      batch is a no-op: the versioned fold's total order (higher seq
      wins, delete-first at ties) resolves every replayed change
      against the stored row it itself produced, and the stored row
      keeps its seat (tests/test_cdc_apply.py pins L∘L == L).

    Cost per batch: O(changes + rows-in-affected-partitions + one
    pruned (key, partition) lookup scan); untouched partitions hardlink
    (zero bytes copied) — the write is proportional to the change
    locality, not the table (SCALEBENCH §partitioned-cdc).

    ``keep_versions``: an UNBOUNDED stream writes one table version per
    applied batch; without retention the version dirs (hardlinks, so
    cheap in bytes but not in inodes/metadata) grow forever. When set,
    a post-apply ``store.vacuum(table, keep_versions)`` bounds the
    history — hardlinked bytes stay alive until the LAST version
    referencing them goes, so the live table is never touched. Leave
    ``None`` when time travel across the full stream history matters.

    ``compact_max_files``: when set, partitions left holding more than
    this many parquet files after the apply are compacted to one file
    each (``TableStore.compact_partitions``) before the vacuum. The
    fold rewrites each affected partition with its shuffle layout —
    up to ``spark.sql.shuffle.partitions`` small files per touched
    partition per batch — so a long-running consumer's hot partitions
    degrade into small-file soup without this. Compaction runs AFTER
    the marker-carrying apply committed (the version flip), so a crash
    mid-compaction leaves a correct, merely-uncompacted table, and the
    replay skip still holds; cost is O(offending partitions), matching
    the apply's own cost shape. Exactly-once is unaffected: compaction
    preserves rows (including tombstones and the ``last_batch``
    marker), it only merges files.
    """
    from ..operators.cdc import apply_cdc_partitioned_versioned

    # no localCheckpoint (round-13 opt): foreachBatch's frame is backed
    # by the batch's FIXED file list, so re-evaluation is deterministic,
    # the probe below reads only enough of it to find one row, and each
    # later consumer fuses the scan into its own job — the eager
    # checkpoint was a full extra materialization (plus pinned executor
    # memory for the whole batch) per micro-batch
    batch = batch_df
    # ONE probe job for batch emptiness + the table's replay marker
    # (round-14 opt; was take(1) plus a separate max(last_batch) collect)
    t = store.read(table)
    nonempty, probes = _probe_batch_and_state(batch, {"t": t})
    if not nonempty:
        return []
    marker = probes["t"][0]
    if marker is not None and marker >= batch_id:
        return []  # clean replay of an already-applied batch
    replaced = apply_cdc_partitioned_versioned(
        store,
        table,
        batch,
        key_cols,
        seq_col,
        partition_col,
        op_col,
        batch_marker=("last_batch", batch_id),
    )
    if compact_max_files is not None and replaced:
        store.compact_partitions(
            table, partition_col, max_files=compact_max_files
        )
    if keep_versions is not None and replaced:
        store.vacuum(table, keep_versions)
    return replaced


def run_cdc_partitioned_warehouse(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    warehouse_root: str,
    schema: str,
    key_cols: list[str],
    seq_col: str,
    partition_col: str,
    table: str = "snapshot",
    keep_versions: int | None = None,
    compact_max_files: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous CDC consumption into a PARTITIONED versioned
    warehouse: a file stream of change rows (a Debezium-style log
    landing as files) drains through
    :func:`apply_cdc_partitioned_warehouse_batch` — each micro-batch
    rewrites only the partitions its changes touch, late lower-sequence
    changes never clobber or resurrect (tombstones persist), and the
    final table equals a whole-log fold no matter how the log is split
    across files (split-invariance of the versioned apply restricted to
    affected partitions). ``availableNow`` drains the backlog and
    stops; rerun with the same checkpoint to pick up only new files.
    ``keep_versions`` bounds on-disk version history and
    ``compact_max_files`` bounds per-partition small-file counts for
    long-running consumption (see the batch function)."""
    from ..sources.io import TableStore

    store = TableStore(spark, warehouse_root)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_partitioned_warehouse_batch(
            spark,
            store,
            batch_df,
            batch_id,
            key_cols,
            seq_col,
            partition_col,
            table=table,
            keep_versions=keep_versions,
            compact_max_files=compact_max_files,
        )

    stream = _backlog_file_stream(
        spark, schema, source_dir, max_files_per_trigger
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_cdc_partitioned_warehouse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog entry: the streaming partitioned×versioned CDC consumer
    END-TO-END under the oracle gate. A deterministic CDC log over
    orders — price updates (%31), deletes (%37), a LATE lower-sequence
    update to the %31 keys (must lose to the stored seq-2 row), a
    same-sequence D-vs-U tie (%41 — delete wins), PARTITION-MOVING
    priority updates (%53 — the row must leave its old hive partition),
    a post-delete lower-seq update (%37 ∧ odd — must NOT resurrect the
    tombstone), and inserts of cloned keys (%101) — lands as three
    stream files in arbitrary order, drains through
    :func:`run_cdc_partitioned_warehouse` (one pruned partition rewrite
    per micro-batch, exactly-once marker), and the LIVE rows of the
    final warehouse are aggregated per partition. The oracle replays
    the whole log in one pass — grading the versioned fold, tombstone
    persistence, partition-move handling and the streaming plumbing at
    once."""
    import os
    import shutil
    import tempfile

    from ..operators.cdc import strip_versioned
    from ..sources.io import TableStore

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    snap = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    k = F.col("o_orderkey")
    p = F.col("o_totalprice")

    def ch(df, seq, op, price, prio=F.col("o_orderpriority")):
        return df.select(
            "o_orderkey",
            prio.alias("o_orderpriority"),
            price.cast("double").alias("o_totalprice"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
        )

    # file 1: the "on-time" head of the log (plus a tie-breaking delete)
    f1 = (
        ch(o.where(k % 31 == 0), 2, "U", p + 1.0)
        .unionByName(ch(o.where(k % 41 == 0), 4, "D", p))
        .unionByName(
            ch(
                o.where(k % 101 == 0).withColumn(
                    "o_orderkey", k + 20_000_000
                ),
                1,
                "I",
                p,
            )
        )
    )
    # file 2: deletes + a partition-moving update. The move's seq (5) is
    # strictly above every other seq so no key ever sees two equal-seq
    # updates with DIFFERENT content — that pair has no defined winner
    # in either the fold or the oracle (both tie-break only D-over-U),
    # and the log must stay deterministic for the hash gate
    f2 = (
        ch(o.where(k % 37 == 0), 3, "D", p)
        .unionByName(
            ch(o.where(k % 53 == 0), 5, "U", p, prio=F.lit("9-MOVED"))
        )
    )
    # file 3: LATE arrivals — every row here must lose to a stored row
    # from an earlier batch (lower seq than the %31 update; lower seq
    # than the %37 tombstone; equal seq to the %41 delete, D wins tie).
    # The two seq-1 updates CAN collide on a %31∧%37∧odd key, but both
    # lose to that key's stored seq-3 tombstone, so the ambiguity never
    # reaches the table
    f3 = (
        ch(o.where(k % 31 == 0), 1, "U", p + 99.0)
        .unionByName(
            ch(o.where((k % 37 == 0) & (k % 2 == 1)), 1, "U", p + 77.0)
        )
        .unionByName(ch(o.where(k % 41 == 0), 4, "U", p + 55.0))
    )

    root = tempfile.mkdtemp(prefix="cdc_pw_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        for f in (f1, f2, f3):
            f.coalesce(1).write.mode("append").parquet(src)
        store = TableStore(spark, os.path.join(root, "wh"))
        init_cdc_partitioned_warehouse(store, snap, "o_orderpriority")
        q = run_cdc_partitioned_warehouse(
            spark,
            src,
            os.path.join(root, "ckpt"),
            os.path.join(root, "wh"),
            "o_orderkey long, o_orderpriority string, "
            "o_totalprice double, seq long, op string",
            ["o_orderkey"],
            "seq",
            "o_orderpriority",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_cdc_partitioned_warehouse: AvailableNow query "
                "did not finish within 300s"
            )
        live = strip_versioned(store.read("snapshot").drop("last_batch"))
        out = live.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_live"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


STREAMING_CDC_PARTITIONED_WAREHOUSE_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 1.0 AS DOUBLE) AS o_totalprice,
         2 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 31 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE), 4, 'D'
  FROM orders WHERE o_orderkey % 41 = 0
  UNION ALL
  SELECT o_orderkey + 20000000, o_orderpriority,
         CAST(o_totalprice AS DOUBLE), 1, 'I'
  FROM orders WHERE o_orderkey % 101 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE), 3, 'D'
  FROM orders WHERE o_orderkey % 37 = 0
  UNION ALL
  SELECT o_orderkey, '9-MOVED', CAST(o_totalprice AS DOUBLE), 5, 'U'
  FROM orders WHERE o_orderkey % 53 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 99.0 AS DOUBLE), 1, 'U'
  FROM orders WHERE o_orderkey % 31 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 77.0 AS DOUBLE), 1, 'U'
  FROM orders WHERE o_orderkey % 37 = 0 AND o_orderkey % 2 = 1
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice + 55.0 AS DOUBLE), 4, 'U'
  FROM orders WHERE o_orderkey % 41 = 0
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC, (op = 'D') DESC) AS rn
    FROM changes
  ) WHERE rn = 1
),
final AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM last WHERE op <> 'D'
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_live,
       round(sum(o_totalprice), 2) AS price_sum
FROM final
GROUP BY o_orderpriority
"""
