"""Streaming materialized-view maintenance (stream_pipeline.
apply_agg_state_batch / run_streaming_agg_maintenance).

Contracts under test:
- after draining N files, the finalized state equals a plain full
  aggregate over all ingested rows (streaming == batch semantics);
- restarting against the same checkpoint with new files applies ONLY
  the new files (no double counting across restarts);
- an at-least-once replay of an already-applied batch id is a no-op
  (the state-embedded marker skips it);
- a torn attempt (crash before the atomic overwrite) re-merges cleanly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.incremental import (
    finalize_aggs,
)
from ecommerce_full_etl_process_spark.sources.io import TableStore
from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
    apply_agg_state_batch,
    run_streaming_agg_maintenance,
)


def _write_file(spark, src, rows):
    # append a single part file into the stream source directory (file
    # streams list the dir itself, not nested dataset dirs)
    spark.createDataFrame(rows, "g string, v double").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _finalized(spark, wh):
    store = TableStore(spark, wh)
    return {
        r["g"]: (r["n_rows"], r["value_sum"], r["value_avg"])
        for r in finalize_aggs(
            store.read("agg_state").drop("last_batch")
        ).collect()
    }


def _expected(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    return {
        r["g"]: (r["n_rows"], r["value_sum"], r["value_avg"])
        for r in finalize_aggs(
            df.groupBy("g").agg(
                F.count("v").alias("cnt"),
                F.sum("v").alias("sum"),
                F.min("v").alias("min"),
                F.max("v").alias("max"),
            )
        ).collect()
    }


def test_stream_equals_full_recompute_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    os.makedirs(src)
    f1 = [("a", 1.0), ("b", 2.0)]
    f2 = [("a", 3.0), ("c", 4.0)]
    _write_file(spark, src, f1)
    _write_file(spark, src, f2)
    q = run_streaming_agg_maintenance(
        spark, src, ckpt, wh, ["g"], "v", max_files_per_trigger=1
    )
    q.awaitTermination()
    assert _finalized(spark, wh) == _expected(spark, f1 + f2)

    # restart with one more file: only the new file is applied
    f3 = [("b", 10.0), ("d", -1.0)]
    _write_file(spark, src, f3)
    q = run_streaming_agg_maintenance(
        spark, src, ckpt, wh, ["g"], "v", max_files_per_trigger=1
    )
    q.awaitTermination()
    assert _finalized(spark, wh) == _expected(spark, f1 + f2 + f3)


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    wh = str(tmp_path / "wh")
    store = TableStore(spark, wh)
    b = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "g string, v double")
    assert apply_agg_state_batch(spark, store, b, 0, ["g"], "v")
    before = sorted(map(tuple, store.read("agg_state").collect()))
    # at-least-once replay of batch 0, and an out-of-order stale id
    assert not apply_agg_state_batch(spark, store, b, 0, ["g"], "v")
    assert sorted(map(tuple, store.read("agg_state").collect())) == before
    # the NEXT id applies on top exactly once
    assert apply_agg_state_batch(spark, store, b, 1, ["g"], "v")
    assert _finalized(spark, wh)["a"] == (4, 8.0, 2.0)


def test_torn_attempt_replays_cleanly(spark, tmp_path):
    """Crash BEFORE the atomic overwrite = nothing happened: the replay
    merges from the old state and the result is single-application."""
    wh = str(tmp_path / "wh")
    store = TableStore(spark, wh)
    b0 = spark.createDataFrame([("a", 2.0)], "g string, v double")
    apply_agg_state_batch(spark, store, b0, 0, ["g"], "v")
    # simulate a torn batch-1 attempt: compute-but-crash = no overwrite,
    # so the on-disk state is untouched; then the replay applies batch 1
    b1 = spark.createDataFrame([("a", 4.0), ("b", 1.0)], "g string, v double")
    assert apply_agg_state_batch(spark, store, b1, 1, ["g"], "v")
    fin = _finalized(spark, wh)
    assert fin["a"] == (2, 6.0, 3.0) and fin["b"] == (1, 1.0, 1.0)


def test_empty_batch_skipped_without_marker_damage(spark, tmp_path):
    wh = str(tmp_path / "wh")
    store = TableStore(spark, wh)
    b = spark.createDataFrame([("a", 1.0)], "g string, v double")
    apply_agg_state_batch(spark, store, b, 0, ["g"], "v")
    empty = spark.createDataFrame([], "g string, v double")
    assert not apply_agg_state_batch(spark, store, empty, 1, ["g"], "v")
    # marker still reflects batch 0; batch 2 applies normally
    assert apply_agg_state_batch(spark, store, b, 2, ["g"], "v")
    assert _finalized(spark, wh)["a"] == (2, 2.0, 1.0)


# ---------------------------------------------------------------------------
# Streaming QUANTILE maintenance (histogram monoid state under the same
# state-embedded-marker protocol)
# ---------------------------------------------------------------------------

def _q_read(spark, wh, lo=0.0, hi=100.0, bins=10):
    from ecommerce_full_etl_process_spark.operators.incremental import (
        quantiles_from_histogram,
    )

    store = TableStore(spark, wh)
    return {
        (r["g"], r["q"]): r["q_value"]
        for r in quantiles_from_histogram(
            store.read("quantile_state").drop("last_batch"),
            ["g"], lo, hi, bins, [0.5, 0.9],
        ).collect()
    }


def _q_expected(spark, rows, lo=0.0, hi=100.0, bins=10):
    from ecommerce_full_etl_process_spark.operators.incremental import (
        histogram_partial,
        quantiles_from_histogram,
    )

    df = spark.createDataFrame(rows, "g string, v double")
    return {
        (r["g"], r["q"]): r["q_value"]
        for r in quantiles_from_histogram(
            histogram_partial(df, ["g"], "v", lo, hi, bins),
            ["g"], lo, hi, bins, [0.5, 0.9],
        ).collect()
    }


def test_quantile_stream_equals_one_pass_and_restart(spark, tmp_path):
    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        run_streaming_quantile_maintenance,
    )

    src = str(tmp_path / "qsrc")
    ckpt = str(tmp_path / "qckpt")
    wh = str(tmp_path / "qwh")
    os.makedirs(src)
    f1 = [("a", float(v)) for v in range(0, 60)] + [("b", 5.0)]
    f2 = [("a", float(v)) for v in range(60, 100)] + [("b", 95.0)]
    _write_file(spark, src, f1)
    _write_file(spark, src, f2)
    q = run_streaming_quantile_maintenance(
        spark, src, ckpt, wh, ["g"], "v", 0.0, 100.0, 10,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _q_read(spark, wh) == _q_expected(spark, f1 + f2)

    # restart: only the new file applies (no double counting shifts
    # the cumulative ranks)
    f3 = [("a", 99.0), ("c", 50.0)]
    _write_file(spark, src, f3)
    q = run_streaming_quantile_maintenance(
        spark, src, ckpt, wh, ["g"], "v", 0.0, 100.0, 10,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _q_read(spark, wh) == _q_expected(spark, f1 + f2 + f3)


def test_quantile_replay_of_applied_batch_is_noop(spark, tmp_path):
    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        apply_quantile_state_batch,
    )

    wh = str(tmp_path / "qwh2")
    store = TableStore(spark, wh)
    b = spark.createDataFrame(
        [("a", 10.0), ("a", 90.0)], "g string, v double"
    )
    args = (["g"], "v", 0.0, 100.0, 10)
    assert apply_quantile_state_batch(spark, store, b, 0, *args)
    before = sorted(map(tuple, store.read("quantile_state").collect()))
    assert not apply_quantile_state_batch(spark, store, b, 0, *args)
    assert sorted(
        map(tuple, store.read("quantile_state").collect())
    ) == before
    # next id applies exactly once: bins (1, 9) reach cnt 2 each
    assert apply_quantile_state_batch(spark, store, b, 1, *args)
    state = {
        (r["g"], r["bin"]): r["cnt"]
        for r in store.read("quantile_state").collect()
    }
    assert state == {("a", 1): 2, ("a", 9): 2}


# ---------------------------------------------------------------------------
# Range-free (adaptive width-doubling) streaming quantile maintenance
# (round 11) — the grid must coarsen mid-stream when a batch's values
# blow past everything seen so far
# ---------------------------------------------------------------------------

def _aq_read(spark, wh, lo=0.0):
    from ecommerce_full_etl_process_spark.operators.incremental import (
        quantiles_from_adaptive_histogram,
    )

    store = TableStore(spark, wh)
    return {
        (r["g"], r["q"]): r["q_value"]
        for r in quantiles_from_adaptive_histogram(
            store.read("adaptive_quantile_state").drop("last_batch"),
            ["g"], lo, [0.5, 0.9],
        ).collect()
    }


def _aq_expected(spark, rows, lo=0.0, bins=16, base_w=1.0):
    from ecommerce_full_etl_process_spark.operators.incremental import (
        adaptive_histogram_partial,
        quantiles_from_adaptive_histogram,
    )

    df = spark.createDataFrame(rows, "g string, v double")
    return {
        (r["g"], r["q"]): r["q_value"]
        for r in quantiles_from_adaptive_histogram(
            adaptive_histogram_partial(df, ["g"], "v", lo, bins, base_w),
            ["g"], lo, [0.5, 0.9],
        ).collect()
    }


def test_adaptive_quantile_stream_coarsens_grid_and_restarts(
    spark, tmp_path
):
    """Batch 2's values blow past batch 1's range by 100×: the persisted
    state must re-bin losslessly to the coarser grid, the finalized
    quantiles must equal a one-pass adaptive histogram over everything
    ingested, and a restart applies only new files."""
    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        run_streaming_adaptive_quantile_maintenance,
    )

    src = str(tmp_path / "aqsrc")
    ckpt = str(tmp_path / "aqckpt")
    wh = str(tmp_path / "aqwh")
    os.makedirs(src)
    f1 = [("a", float(v)) for v in range(0, 10)] + [("b", 5.0)]
    f2 = [("a", float(v) * 100) for v in range(1, 11)] + [("b", 9.0)]
    _write_file(spark, src, f1)
    _write_file(spark, src, f2)
    q = run_streaming_adaptive_quantile_maintenance(
        spark, src, ckpt, wh, ["g"], "v", 0.0, 16, 1.0,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _aq_read(spark, wh) == _aq_expected(spark, f1 + f2)
    # group a's state coarsened past the batch-1 grid; group b (values
    # ≤ 9 throughout) kept its fine base grid — widths are PER GROUP
    store = TableStore(spark, wh)
    widths = {
        r["g"]: r["width"]
        for r in store.read("adaptive_quantile_state")
        .select("g", "width")
        .distinct()
        .collect()
    }
    assert widths["a"] > widths["b"] == 1.0, widths

    # restart with one more range-blowing file: only the new file applies
    f3 = [("a", 5000.0), ("b", 1.0)]
    _write_file(spark, src, f3)
    q = run_streaming_adaptive_quantile_maintenance(
        spark, src, ckpt, wh, ["g"], "v", 0.0, 16, 1.0,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _aq_read(spark, wh) == _aq_expected(spark, f1 + f2 + f3)


def test_adaptive_quantile_replay_of_applied_batch_is_noop(spark, tmp_path):
    from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
        apply_adaptive_quantile_state_batch,
    )

    wh = str(tmp_path / "aqwh2")
    store = TableStore(spark, wh)
    b = spark.createDataFrame(
        [("a", 3.0), ("a", 12.0)], "g string, v double"
    )
    args = (["g"], "v", 0.0, 16, 1.0)
    assert apply_adaptive_quantile_state_batch(spark, store, b, 0, *args)
    before = sorted(
        map(tuple, store.read("adaptive_quantile_state").collect())
    )
    assert not apply_adaptive_quantile_state_batch(spark, store, b, 0, *args)
    assert sorted(
        map(tuple, store.read("adaptive_quantile_state").collect())
    ) == before
