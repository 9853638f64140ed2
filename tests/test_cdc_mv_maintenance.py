"""CDC × MV co-maintenance (stream_pipeline.apply_cdc_mv_batch /
run_cdc_mv_maintenance) — round 8.

Contracts under test:
- a group-MOVING update retracts from the old group and lands in the new
  one (the case blind partial merges cannot express);
- draining a split log equals a whole-log batch apply + full aggregate,
  including out-of-order sequences across batches;
- restart against the same checkpoint applies only new files;
- the one possible tear (aggregate advanced, snapshot not — the reverse
  cannot exist because the aggregate writes first) heals on replay;
- replay of a fully-applied batch is a no-op for both tables.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.cdc import (
    apply_cdc,
    strip_versioned,
)
from ecommerce_full_etl_process_spark.operators.incremental import (
    finalize_aggs,
    partial_agg,
)
from ecommerce_full_etl_process_spark.sources.io import TableStore
from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
    apply_cdc_mv_batch,
    init_cdc_mv,
    run_cdc_mv_maintenance,
)

CHG_SCHEMA = "k long, g string, v double, seq long, op string"


def _store(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "k long, g string, v double"
    )
    init_cdc_mv(store, snap, ["g"], "v")
    return store, snap


def _agg_of(snapshot_df):
    return {
        r["g"]: (r["n_rows"], r["value_sum"], r["value_min"], r["value_max"])
        for r in finalize_aggs(
            partial_agg(snapshot_df, ["g"], "v")
        ).collect()
    }


def _state_agg(store):
    return {
        r["g"]: (r["n_rows"], r["value_sum"], r["value_min"], r["value_max"])
        for r in finalize_aggs(
            store.read("agg_state").drop("last_batch")
        ).collect()
    }


def test_group_move_retracts_from_old_group(spark, tmp_path):
    store, _snap = _store(spark, tmp_path)
    # key 1 moves a→b AND changes value; group a must retract it
    chg = spark.createDataFrame([(1, "b", 11.0, 1, "U")], CHG_SCHEMA)
    assert apply_cdc_mv_batch(
        spark, store, chg, 0, ["k"], "seq", ["g"], "v"
    )
    assert _state_agg(store) == {
        "a": (1, 20.0, 20.0, 20.0),
        "b": (2, 41.0, 11.0, 30.0),
    }
    # snapshot agrees with its own aggregate
    live = strip_versioned(store.read("snapshot").drop("last_batch"))
    assert _state_agg(store) == _agg_of(live)


def test_delete_retracts_and_empty_group_vanishes(spark, tmp_path):
    store, _snap = _store(spark, tmp_path)
    chg = spark.createDataFrame([(3, "b", 0.0, 1, "D")], CHG_SCHEMA)
    apply_cdc_mv_batch(spark, store, chg, 0, ["k"], "seq", ["g"], "v")
    assert _state_agg(store) == {"a": (2, 30.0, 10.0, 20.0)}


def test_split_log_stream_equals_whole_log_apply(spark, tmp_path):
    """End-to-end through the real stream runner: a log whose batches
    arrive OUT of sequence order (file 1 carries seq 5, file 2 the late
    seq 3) must still converge to the whole-log fold."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    store, snap = _store(spark, tmp_path)
    f1 = [(1, "a", 100.0, 5, "U"), (2, "a", 0.0, 2, "D")]
    f2 = [(1, "a", 7.0, 3, "U"), (4, "c", 4.0, 1, "I")]  # seq 3 late: loses
    for rows in (f1, f2):
        spark.createDataFrame(rows, CHG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = run_cdc_mv_maintenance(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"),
        CHG_SCHEMA, ["k"], "seq", ["g"], "v",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    whole = apply_cdc(
        snap, spark.createDataFrame(f1 + f2, CHG_SCHEMA), ["k"], "seq"
    )
    assert _state_agg(store) == _agg_of(whole)
    live = strip_versioned(store.read("snapshot").drop("last_batch"))
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, whole.collect())
    )

    # restart with one more file: only the new file applies
    f3 = [(3, "b", 99.0, 9, "U")]
    spark.createDataFrame(f3, CHG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = run_cdc_mv_maintenance(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"),
        CHG_SCHEMA, ["k"], "seq", ["g"], "v",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    whole3 = apply_cdc(
        snap, spark.createDataFrame(f1 + f2 + f3, CHG_SCHEMA), ["k"], "seq"
    )
    assert _state_agg(store) == _agg_of(whole3)


def test_null_group_key_retracts_correctly(spark, tmp_path):
    """Round-8 review: a NULL group key is still a group; plain
    column-equality joins drop it from both the recompute (semi) and
    the state swap (anti), leaving its aggregate permanently stale.
    The null-safe joins must retract and recompute it like any other."""
    store = TableStore(spark, str(tmp_path / "wh"))
    snap = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "b", 30.0)],
        "k long, g string, v double",
    )
    init_cdc_mv(store, snap, ["g"], "v")
    assert _state_agg(store)[None] == (2, 30.0, 10.0, 20.0)
    chg = spark.createDataFrame(
        [(1, None, 100.0, 1, "U"), (2, None, 0.0, 1, "D")], CHG_SCHEMA
    )
    apply_cdc_mv_batch(spark, store, chg, 0, ["k"], "seq", ["g"], "v")
    assert _state_agg(store) == {
        None: (1, 100.0, 100.0, 100.0),
        "b": (1, 30.0, 30.0, 30.0),
    }
    # move the last null-group row to a real group: null group vanishes
    chg2 = spark.createDataFrame([(1, "b", 5.0, 2, "U")], CHG_SCHEMA)
    apply_cdc_mv_batch(spark, store, chg2, 1, ["k"], "seq", ["g"], "v")
    assert _state_agg(store) == {"b": (2, 35.0, 5.0, 30.0)}


def test_thirty_batch_soak_converges_every_checkpoint(spark, tmp_path):
    """30 sequential random batches (inserts/updates/deletes/group
    moves, out-of-order sequences) through apply_cdc_mv_batch; at three
    checkpoints the aggregate state and live snapshot must equal a
    whole-log apply_cdc + recompute of everything folded so far — the
    long-haul drift check for the two-table exactly-once machinery."""
    import random

    rng = random.Random(30)
    store, snap = _store(spark, tmp_path)
    folded = []
    seen = set()
    for b in range(30):
        batch = []
        for _ in range(rng.randrange(1, 6)):
            k = rng.randrange(12)
            seq = rng.randrange(1, 40)
            op = rng.choice(["U", "U", "U", "I", "D"])
            sig = (k, seq, op == "D")
            if sig in seen:
                continue
            seen.add(sig)
            g = rng.choice(["a", "b", "c"])
            batch.append((k, g, float(rng.randrange(100)), seq, op))
        if not batch:
            continue
        bdf = spark.createDataFrame(batch, CHG_SCHEMA)
        apply_cdc_mv_batch(spark, store, bdf, b, ["k"], "seq", ["g"], "v")
        folded.extend(batch)
        if b in (9, 19, 29):
            whole = apply_cdc(
                snap, spark.createDataFrame(folded, CHG_SCHEMA), ["k"], "seq"
            )
            assert _state_agg(store) == _agg_of(whole), f"batch {b}"
            live = strip_versioned(store.read("snapshot").drop("last_batch"))
            assert sorted(map(tuple, live.collect())) == sorted(
                map(tuple, whole.collect())
            ), f"batch {b}"


def test_torn_batch_agg_ahead_of_snapshot_heals(spark, tmp_path):
    """Simulate the only reachable tear: batch N's aggregate committed,
    snapshot crash before its overwrite. The replay must skip the
    aggregate (marker) and re-apply the snapshot, converging both."""
    store, snap = _store(spark, tmp_path)
    b0 = spark.createDataFrame([(1, "a", 50.0, 1, "U")], CHG_SCHEMA)
    apply_cdc_mv_batch(spark, store, b0, 0, ["k"], "seq", ["g"], "v")
    snap_before = store.read("snapshot")  # batch-0 content, marker 0

    b1 = spark.createDataFrame(
        [(2, "a", 0.0, 2, "D"), (3, "c", 33.0, 2, "U")], CHG_SCHEMA
    )
    apply_cdc_mv_batch(spark, store, b1, 1, ["k"], "seq", ["g"], "v")
    state_after = sorted(map(tuple, store.read("agg_state").collect()))
    # roll the SNAPSHOT back to its batch-0 version = the torn state
    store.overwrite("snapshot", snap_before.localCheckpoint(eager=True))

    # replay of batch 1: True (snapshot advances), aggregate untouched
    assert apply_cdc_mv_batch(
        spark, store, b1, 1, ["k"], "seq", ["g"], "v"
    )
    assert sorted(map(tuple, store.read("agg_state").collect())) == state_after
    whole = apply_cdc(
        snap,
        spark.createDataFrame(
            [(1, "a", 50.0, 1, "U"), (2, "a", 0.0, 2, "D"), (3, "c", 33.0, 2, "U")],
            CHG_SCHEMA,
        ),
        ["k"],
        "seq",
    )
    live = strip_versioned(store.read("snapshot").drop("last_batch"))
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, whole.collect())
    )
    assert _state_agg(store) == _agg_of(whole)

    # full replay of an applied batch: no-op for both tables
    snap_v = sorted(map(tuple, store.read("snapshot").collect()))
    assert not apply_cdc_mv_batch(
        spark, store, b1, 1, ["k"], "seq", ["g"], "v"
    )
    assert sorted(map(tuple, store.read("snapshot").collect())) == snap_v
    assert sorted(map(tuple, store.read("agg_state").collect())) == state_after
