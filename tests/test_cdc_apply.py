"""CDC apply (operators/cdc.py) unit + randomized differential tests.

Oracle: a driver-side Python fold of the log in sequence order — the
definitionally-correct (but undistributable) implementation. The Spark
plan (window winner + anti join + union) must agree on random logs with
multi-change keys, delete-then-reinsert at higher sequence, same-seq
delete/update ties, inserts of unseen keys, and untouched keys.
"""

from __future__ import annotations

import random

from ecommerce_full_etl_process_spark.operators.cdc import apply_cdc


def _python_fold(snapshot: dict, changes: list[tuple]) -> dict:
    # changes: (key, value, seq, op); apply per key in ascending
    # (seq, is-delete) order so at equal seq the delete applies LAST,
    # matching the operator's documented tie-break (a same-seq delete
    # wins and is never resurrected)
    state = dict(snapshot)
    for key, val, seq, op in sorted(
        changes, key=lambda c: (c[0], c[2], c[3] == "D")
    ):
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


def test_randomized_differential_vs_python_fold(spark):
    rng = random.Random(23)
    for trial in range(4):
        snapshot = {k: float(k * 10) for k in range(40)}
        changes = []
        for _ in range(120):
            key = rng.randrange(60)  # keys 40-59: inserts of unseen keys
            seq = rng.randrange(6)
            op = rng.choice(["U", "U", "I", "D"])
            changes.append((key, float(rng.randrange(1000)), seq, op))
        # force at least one same-seq D/U tie on one key
        changes.append((0, 111.0, 99, "U"))
        changes.append((0, 222.0, 99, "D"))
        # dedupe (key, seq, op) so the winner is well-defined both sides
        seen, uniq = set(), []
        for c in changes:
            if (c[0], c[2], c[3]) not in seen:
                seen.add((c[0], c[2], c[3]))
                uniq.append(c)
        # per (key, seq) keep at most one non-D change and one D: the
        # operator's tie-break only pins D vs non-D, so two distinct
        # non-D VALUES at the same seq would be ambiguous in any engine
        byks = {}
        for c in uniq:
            byks.setdefault((c[0], c[2], c[3] == "D"), c)
        log = list(byks.values())
        snap_df = spark.createDataFrame(
            list(snapshot.items()), "k long, v double"
        )
        chg_df = spark.createDataFrame(
            [(k, v, s, o) for k, v, s, o in log],
            "k long, v double, seq long, op string",
        )
        got = {
            r["k"]: r["v"]
            for r in apply_cdc(snap_df, chg_df, ["k"], "seq").collect()
        }
        want = _python_fold(snapshot, log)
        assert got == want, trial


def test_same_seq_delete_beats_update(spark):
    snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
    chg = spark.createDataFrame(
        [(1, 9.0, 5, "U"), (1, 1.0, 5, "D")],
        "k long, v double, seq long, op string",
    )
    assert apply_cdc(snap, chg, ["k"], "seq").collect() == []


def test_delete_then_reinsert_at_higher_seq(spark):
    snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
    chg = spark.createDataFrame(
        [(1, 0.0, 1, "D"), (1, 7.0, 2, "I")],
        "k long, v double, seq long, op string",
    )
    rows = apply_cdc(snap, chg, ["k"], "seq").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, 7.0)]


def test_untouched_keys_pass_through(spark):
    snap = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    chg = spark.createDataFrame(
        [(2, 5.0, 1, "U")], "k long, v double, seq long, op string"
    )
    got = {
        r["k"]: r["v"] for r in apply_cdc(snap, chg, ["k"], "seq").collect()
    }
    assert got == {1: 1.0, 2: 5.0}


# ---------------------------------------------------------------------------
# Versioned (cross-batch) apply — round-8: out-of-order sequences across
# batches + tombstone retention (verdict item 5)
# ---------------------------------------------------------------------------

from ecommerce_full_etl_process_spark.operators.cdc import (  # noqa: E402
    apply_cdc_versioned,
    compact_tombstones,
    strip_versioned,
    to_versioned,
)


def _rand_log(rng, n_changes=120, n_keys=60, n_seqs=8):
    changes = []
    for _ in range(n_changes):
        key = rng.randrange(n_keys)
        seq = rng.randrange(1, n_seqs)
        op = rng.choice(["U", "U", "I", "D"])
        changes.append((key, float(rng.randrange(1000)), seq, op))
    # force same-seq D/U ties
    changes.append((0, 111.0, 99, "U"))
    changes.append((0, 222.0, 99, "D"))
    # well-defined winners: one non-D value and at most one D per (key, seq)
    byks = {}
    for c in changes:
        byks.setdefault((c[0], c[2], c[3] == "D"), c)
    return list(byks.values())


def test_split_log_equals_whole_log_property(spark):
    """THE versioned-apply contract: for random logs randomly split into
    batches — assignment independent of sequence, so late/out-of-order
    arrivals are the norm — folding batch-by-batch through
    apply_cdc_versioned equals one whole-log apply_cdc, which equals the
    Python fold. Plain apply_cdc would fail this split (a late lower-seq
    change clobbers a newer row; a late update resurrects a delete)."""
    rng = random.Random(8)
    chg_schema = "k long, v double, seq long, op string"
    for trial in range(4):
        snapshot = {k: float(k * 10) for k in range(40)}
        log = _rand_log(rng)
        n_batches = rng.choice([2, 3, 4])
        batches = [[] for _ in range(n_batches)]
        for c in log:
            batches[rng.randrange(n_batches)].append(c)

        snap_df = spark.createDataFrame(
            list(snapshot.items()), "k long, v double"
        )
        vsnap = to_versioned(snap_df)
        for b in batches:
            if not b:
                continue
            chg_df = spark.createDataFrame(b, chg_schema)
            vsnap = apply_cdc_versioned(
                vsnap, chg_df, ["k"], "seq"
            ).localCheckpoint(eager=True)
        got = {
            r["k"]: r["v"] for r in strip_versioned(vsnap).collect()
        }
        whole = apply_cdc(
            snap_df, spark.createDataFrame(log, chg_schema), ["k"], "seq"
        )
        want_whole = {r["k"]: r["v"] for r in whole.collect()}
        want_fold = _python_fold(snapshot, log)
        assert want_whole == want_fold, trial  # oracle agreement
        assert got == want_fold, trial


def test_late_update_does_not_resurrect_delete(spark):
    vsnap = to_versioned(
        spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    d = spark.createDataFrame(
        [(1, 0.0, 5, "D")], "k long, v double, seq long, op string"
    )
    vsnap = apply_cdc_versioned(vsnap, d, ["k"], "seq")
    late_u = spark.createDataFrame(
        [(1, 9.0, 3, "U")], "k long, v double, seq long, op string"
    )
    vsnap = apply_cdc_versioned(vsnap, late_u, ["k"], "seq")
    assert strip_versioned(vsnap).collect() == []
    # the tombstone itself survives, carrying the delete's sequence
    tomb = vsnap.where("__deleted").collect()
    assert [(r["k"], r["__seq"]) for r in tomb] == [(1, 5)]


def test_replay_is_idempotent(spark):
    vsnap = to_versioned(
        spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    chg = spark.createDataFrame(
        [(1, 7.0, 4, "U")], "k long, v double, seq long, op string"
    )
    once = apply_cdc_versioned(vsnap, chg, ["k"], "seq")
    twice = apply_cdc_versioned(once, chg, ["k"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


# ---------------------------------------------------------------------------
# Partial-column (patch) apply — round-8
# ---------------------------------------------------------------------------

from ecommerce_full_etl_process_spark.operators.cdc import (  # noqa: E402
    apply_cdc_patch,
    evolve_snapshot_schema,
)


def _python_patch_fold(snapshot: dict, changes: list[tuple]) -> dict:
    """Definitionally-correct fold: per key ascending (seq, D-last),
    D removes, patches override exactly their set columns.
    snapshot: key -> (a, b); changes: (key, a, b, seq, op, set_cols)."""
    state = {k: dict(zip(("a", "b"), v)) for k, v in snapshot.items()}
    for key, a, b, seq, op, set_cols in sorted(
        changes, key=lambda c: (c[0], c[3], c[4] == "D")
    ):
        if op == "D":
            state.pop(key, None)
            continue
        row = state.setdefault(key, {"a": None, "b": None})
        vals = {"a": a, "b": b}
        for c in set_cols:
            row[c] = vals[c]
    return {k: (v["a"], v["b"]) for k, v in state.items()}


def test_patch_randomized_differential_vs_python_fold(spark):
    rng = random.Random(88)
    schema = "k long, a double, b double, seq long, op string, set_cols array<string>"
    for trial in range(4):
        snapshot = {k: (float(k), float(k * 100)) for k in range(30)}
        changes = []
        for _ in range(150):
            key = rng.randrange(45)
            seq = rng.randrange(1, 7)
            op = rng.choice(["U", "U", "U", "D"])
            sets = rng.choice([["a"], ["b"], ["a", "b"], []])
            changes.append(
                (key, float(rng.randrange(100)), float(rng.randrange(100)),
                 seq, op, sets)
            )
        # well-defined winners: one change per (key, seq, op) — and for
        # patches, at most one setter of a column per (key, seq)
        byks, taken = [], set()
        for c in changes:
            sig = (c[0], c[3], c[4] == "D")
            col_sigs = {(c[0], c[3], col) for col in c[5]}
            if sig in taken or (col_sigs & taken):
                continue
            taken.add(sig)
            taken.update(col_sigs)
            byks.append(c)
        chg_df = spark.createDataFrame(byks, schema)
        snap_df = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in snapshot.items()],
            "k long, a double, b double",
        )
        got = {
            r["k"]: (r["a"], r["b"])
            for r in apply_cdc_patch(snap_df, chg_df, ["k"], "seq").collect()
        }
        want = _python_patch_fold(snapshot, byks)
        assert got == want, trial


def test_patch_sets_column_to_null_explicitly(spark):
    snap = spark.createDataFrame([(1, 5.0, 6.0)], "k long, a double, b double")
    chg = spark.createDataFrame(
        [(1, None, 9.0, 2, "U", ["a", "b"])],
        "k long, a double, b double, seq long, op string, set_cols array<string>",
    )
    rows = apply_cdc_patch(snap, chg, ["k"], "seq").collect()
    assert [(r["k"], r["a"], r["b"]) for r in rows] == [(1, None, 9.0)]


def test_patch_after_delete_recreates_partial_row(spark):
    snap = spark.createDataFrame([(1, 5.0, 6.0)], "k long, a double, b double")
    chg = spark.createDataFrame(
        [(1, 0.0, 0.0, 3, "D", []), (1, 7.0, 0.0, 4, "U", ["a"])],
        "k long, a double, b double, seq long, op string, set_cols array<string>",
    )
    rows = apply_cdc_patch(snap, chg, ["k"], "seq").collect()
    # b's snapshot value was wiped by the delete; only a was re-set
    assert [(r["k"], r["a"], r["b"]) for r in rows] == [(1, 7.0, None)]


def test_schema_evolution_adds_and_drops_columns(spark):
    snap = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    # feed adds column 'w' and drops 'v'
    chg = spark.createDataFrame(
        [(2, 9.5, 1, "U"), (3, 3.5, 1, "I")],
        "k long, w double, seq long, op string",
    )
    snap2, chg2 = evolve_snapshot_schema(snap, chg, ["seq", "op"])
    assert set(snap2.columns) == {"k", "v", "w"}
    out = {
        r["k"]: (r["v"], r["w"])
        for r in apply_cdc(snap2, chg2, ["k"], "seq").collect()
    }
    # untouched key 1 keeps v; upserted key 2 nulls the dropped v and
    # gains w; inserted key 3 has only w
    assert out == {1: (1.0, None), 2: (None, 9.5), 3: (None, 3.5)}


def test_schema_evolution_rejects_type_change(spark):
    import pytest

    snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
    chg = spark.createDataFrame([(1, "x", 1, "U")], "k long, v string, seq long, op string")
    with pytest.raises(TypeError, match="changed type"):
        evolve_snapshot_schema(snap, chg, ["seq", "op"])


# ---------------------------------------------------------------------------
# Partition-scoped apply (round-8): rewrite only affected partitions
# ---------------------------------------------------------------------------

from ecommerce_full_etl_process_spark.operators.cdc import (  # noqa: E402
    apply_cdc_partitioned,
)


def test_partitioned_apply_rewrites_only_affected(spark, tmp_path):
    import os

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(k, k % 4, float(k)) for k in range(40)], "k long, p long, v double"
    )
    store.overwrite("snap", base, partition_by=["p"])
    v1 = store._current_version("snap")

    chg = spark.createDataFrame(
        [
            (1, 1, 999.0, 1, "U"),   # update in place (partition 1)
            (2, 3, 222.0, 1, "U"),   # MOVES from partition 2 to partition 3
            (100, 1, 100.0, 1, "I"), # insert into partition 1
        ],
        "k long, p long, v double, seq long, op string",
    )
    replaced = apply_cdc_partitioned(store, "snap", chg, ["k"], "seq", "p")
    # partitions 1 (update+insert), 2 (row left), 3 (row arrived)
    assert replaced == ["p=1", "p=2", "p=3"]
    got = {r["k"]: (r["p"], r["v"]) for r in store.read("snap").collect()}
    want = {k: (k % 4, float(k)) for k in range(40)}
    want[1] = (1, 999.0)
    want[2] = (3, 222.0)
    want[100] = (1, 100.0)
    assert got == want
    # partition 0 was untouched: its files are hardlinks of v1's
    d1, d2 = store._data_dir("snap", v1), store._data_dir("snap", v1 + 1)
    i1 = {os.stat(os.path.join(d1, "p=0", f)).st_ino
          for f in os.listdir(os.path.join(d1, "p=0")) if f.endswith(".parquet")}
    i2 = {os.stat(os.path.join(d2, "p=0", f)).st_ino
          for f in os.listdir(os.path.join(d2, "p=0")) if f.endswith(".parquet")}
    assert i1 and i1 == i2


def test_partitioned_apply_drops_fully_deleted_partition(spark, tmp_path):
    import os

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 2.0), (3, 1, 3.0)], "k long, p long, v double"
    )
    store.overwrite("snap", base, partition_by=["p"])
    # delete EVERY row of partition 0: the partition must vanish, not
    # carry over (the also_replace path)
    chg = spark.createDataFrame(
        [(1, 0, 0.0, 1, "D"), (2, 0, 0.0, 1, "D")],
        "k long, p long, v double, seq long, op string",
    )
    replaced = apply_cdc_partitioned(store, "snap", chg, ["k"], "seq", "p")
    assert "p=0" in replaced
    got = sorted((r["k"], r["p"], r["v"]) for r in store.read("snap").collect())
    assert got == [(3, 1, 3.0)]
    d2 = store._data_dir("snap", store._current_version("snap"))
    assert not os.path.exists(os.path.join(d2, "p=0"))


def test_partitioned_apply_null_partition_values(spark, tmp_path):
    """Round-8 review: NULL partition values live in Spark's
    __HIVE_DEFAULT_PARTITION__ dir; isin() never matches NULL, so
    without null-safe affected predicates an update to one null-
    partition key would drop the partition's OTHER rows, and a delete
    of a null-partition key would silently not happen."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, 1, 3.0)],
        "k long, p int, v double",
    )
    store.overwrite("snap", base, partition_by=["p"])
    # update k=1 (null partition): k=2 must survive
    chg = spark.createDataFrame(
        [(1, None, 99.0, 1, "U")], "k long, p int, v double, seq long, op string"
    )
    apply_cdc_partitioned(store, "snap", chg, ["k"], "seq", "p")
    got = {r["k"]: (r["p"], r["v"]) for r in store.read("snap").collect()}
    assert got == {1: (None, 99.0), 2: (None, 2.0), 3: (1, 3.0)}
    # delete k=2 (null partition): the delete must actually apply
    chg2 = spark.createDataFrame(
        [(2, None, 0.0, 2, "D")], "k long, p int, v double, seq long, op string"
    )
    apply_cdc_partitioned(store, "snap", chg2, ["k"], "seq", "p")
    got = {r["k"]: (r["p"], r["v"]) for r in store.read("snap").collect()}
    assert got == {1: (None, 99.0), 3: (1, 3.0)}


def test_overwrite_partitions_multilevel_carryover(spark, tmp_path):
    """Round-8 review: a table partitioned on TWO levels nests further
    key=value dirs inside each first-level partition; the carry-over
    must walk them (a flat listdir silently dropped every untouched
    first-level partition's data)."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(d, r, float(d * 10 + r)) for d in range(3) for r in range(2)],
        "d int, r int, v double",
    )
    store.overwrite("t", base, partition_by=["d", "r"])
    patch = spark.createDataFrame([(0, 0, 999.0), (0, 1, 888.0)], "d int, r int, v double")
    store.overwrite_partitions("t", patch, "d")
    got = sorted((r["d"], r["r"], r["v"]) for r in store.read("t").collect())
    want = sorted(
        [(0, 0, 999.0), (0, 1, 888.0)]
        + [(d, r, float(d * 10 + r)) for d in (1, 2) for r in range(2)]
    )
    assert got == want


def test_overwrite_partitions_wrong_column_guard(spark, tmp_path):
    """Round-8 review: a table partitioned on a DIFFERENT column must be
    rejected — writing df's partitions as the complete new version
    would silently drop every existing row."""
    import pytest

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame([(1, 0, 1.0)], "k long, q int, v double")
    store.overwrite("t", base, partition_by=["q"])
    patch = spark.createDataFrame([(2, 0, 2.0)], "k long, g int, v double")
    with pytest.raises(ValueError, match="not hive-partitioned on 'g'"):
        store.overwrite_partitions("t", patch, "g")


def test_partitioned_apply_no_changes_is_noop(spark, tmp_path):
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame([(1, 0, 1.0)], "k long, p long, v double")
    store.overwrite("snap", base, partition_by=["p"])
    v1 = store._current_version("snap")
    empty = spark.createDataFrame([], "k long, p long, v double, seq long, op string")
    assert apply_cdc_partitioned(store, "snap", empty, ["k"], "seq", "p") == []
    assert store._current_version("snap") == v1  # no version churn


def test_tombstone_compaction_respects_horizon(spark):
    vsnap = to_versioned(
        spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "k long, v double")
    )
    chg = spark.createDataFrame(
        [(1, 0.0, 3, "D"), (2, 0.0, 8, "D")],
        "k long, v double, seq long, op string",
    )
    vsnap = apply_cdc_versioned(vsnap, chg, ["k"], "seq")
    # horizon 5: seq-3 tombstone reclaimed, seq-8 retained, live rows kept
    compacted = compact_tombstones(vsnap, min_seq_to_keep=5)
    got = sorted(
        (r["k"], r["__deleted"]) for r in compacted.collect()
    )
    assert got == [(2, True), (3, False)]
    # post-compaction, an in-horizon late update still cannot resurrect 2
    late = spark.createDataFrame(
        [(2, 9.9, 6, "U")], "k long, v double, seq long, op string"
    )
    after = apply_cdc_versioned(compacted, late, ["k"], "seq")
    assert sorted(
        (r["k"], r["v"]) for r in strip_versioned(after).collect()
    ) == [(3, 3.0)]


# ---------------------------------------------------------------------------
# Partitioned × versioned composition — round-9 (round-8 verdict item 4):
# split-log == whole-log safety AT the O(affected-partitions) write layer
# ---------------------------------------------------------------------------

from ecommerce_full_etl_process_spark.operators.cdc import (  # noqa: E402
    apply_cdc_partitioned_versioned,
)


def _vp(v: float) -> int:
    """Partition derived from the VALUE, so updates move rows across
    partitions — the adversarial case for partition-scoped rewrites."""
    return int(v) % 3


def test_partitioned_versioned_split_log_property(spark, tmp_path):
    """THE composition contract: folding a random log split into random
    batches (assignment independent of sequence — late/out-of-order
    arrivals land in partitions earlier batches already rewrote) through
    apply_cdc_partitioned_versioned yields exactly the whole-log
    apply_cdc state, live rows AND partition homes, mirroring
    test_split_log_equals_whole_log_property at the partitioned layer."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    rng = random.Random(91)
    chg_schema = "k long, v double, p int, seq long, op string"
    for trial in range(3):
        snapshot = {k: float(k * 10) for k in range(40)}
        log = _rand_log(rng)
        n_batches = rng.choice([2, 3, 4])
        batches = [[] for _ in range(n_batches)]
        for c in log:
            batches[rng.randrange(n_batches)].append(c)

        snap_df = spark.createDataFrame(
            [(k, v, _vp(v)) for k, v in snapshot.items()],
            "k long, v double, p int",
        )
        store = TableStore(spark, str(tmp_path / f"wh{trial}"))
        store.overwrite("snap", to_versioned(snap_df), partition_by=["p"])
        for b in batches:
            if not b:
                continue
            chg_df = spark.createDataFrame(
                [(k, v, _vp(v), s, o) for k, v, s, o in b], chg_schema
            )
            apply_cdc_partitioned_versioned(
                store, "snap", chg_df, ["k"], "seq", "p"
            )
        got = {
            r["k"]: (r["v"], r["p"])
            for r in strip_versioned(store.read("snap")).collect()
        }
        whole = apply_cdc(
            snap_df,
            spark.createDataFrame(
                [(k, v, _vp(v), s, o) for k, v, s, o in log], chg_schema
            ),
            ["k"],
            "seq",
        )
        want = {r["k"]: (r["v"], r["p"]) for r in whole.collect()}
        assert got == want, trial


def test_partitioned_versioned_late_change_cannot_resurrect(spark, tmp_path):
    """A late lower-seq update arriving AFTER its key's delete — and
    landing in a partition the delete's rewrite never touched — must
    lose to the tombstone, not materialize a zombie row there."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    snap = spark.createDataFrame([(1, 1.0, 0)], "k long, v double, p int")
    store.overwrite("snap", to_versioned(snap), partition_by=["p"])
    schema = "k long, v double, p int, seq long, op string"
    apply_cdc_partitioned_versioned(
        store, "snap",
        spark.createDataFrame([(1, 0.0, 0, 5, "D")], schema),
        ["k"], "seq", "p",
    )
    apply_cdc_partitioned_versioned(
        store, "snap",
        spark.createDataFrame([(1, 9.0, 2, 3, "U")], schema),
        ["k"], "seq", "p",
    )
    cur = store.read("snap")
    assert strip_versioned(cur).collect() == []
    tomb = cur.where("__deleted").collect()
    assert [(r["k"], r["__seq"]) for r in tomb] == [(1, 5)]


def test_partitioned_versioned_row_move_vacates_old_partition(
    spark, tmp_path
):
    """An update that moves a row p=0 → p=2 must vacate the old
    partition in the SAME apply — and a later lower-seq update aimed
    back at p=0 must not re-materialize it there."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    snap = spark.createDataFrame(
        [(1, 0.0, 0), (2, 0.0, 0)], "k long, v double, p int"
    )
    store.overwrite("snap", to_versioned(snap), partition_by=["p"])
    schema = "k long, v double, p int, seq long, op string"
    apply_cdc_partitioned_versioned(
        store, "snap",
        spark.createDataFrame([(1, 5.0, 2, 4, "U")], schema),
        ["k"], "seq", "p",
    )
    got = sorted(
        (r["k"], r["v"], r["p"])
        for r in strip_versioned(store.read("snap")).collect()
    )
    assert got == [(1, 5.0, 2), (2, 0.0, 0)]
    # late lower-seq change targeting the vacated partition: loses
    apply_cdc_partitioned_versioned(
        store, "snap",
        spark.createDataFrame([(1, 7.0, 0, 2, "U")], schema),
        ["k"], "seq", "p",
    )
    got = sorted(
        (r["k"], r["v"], r["p"])
        for r in strip_versioned(store.read("snap")).collect()
    )
    assert got == [(1, 5.0, 2), (2, 0.0, 0)]


def test_partitioned_versioned_untouched_partitions_hardlinked(
    spark, tmp_path
):
    """Write-cost contract: a batch touching only p=1 must leave the
    other partitions' data files hardlinked (same inode), not copied."""
    import os

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    snap = spark.createDataFrame(
        [(k, float(k), k % 4) for k in range(40)], "k long, v double, p int"
    )
    store.overwrite("snap", to_versioned(snap), partition_by=["p"])
    v1 = store._current_version("snap")
    schema = "k long, v double, p int, seq long, op string"
    replaced = apply_cdc_partitioned_versioned(
        store, "snap",
        spark.createDataFrame([(1, 99.0, 1, 1, "U")], schema),
        ["k"], "seq", "p",
    )
    assert replaced == ["p=1"]
    v2 = store._current_version("snap")
    for part in ("p=0", "p=2", "p=3"):
        old_dir = os.path.join(store._data_dir("snap", v1), part)
        new_dir = os.path.join(store._data_dir("snap", v2), part)
        old_inodes = {
            os.stat(os.path.join(old_dir, f)).st_ino
            for f in os.listdir(old_dir)
            if f.endswith(".parquet")
        }
        new_inodes = {
            os.stat(os.path.join(new_dir, f)).st_ino
            for f in os.listdir(new_dir)
            if f.endswith(".parquet")
        }
        assert new_inodes == old_inodes, part
