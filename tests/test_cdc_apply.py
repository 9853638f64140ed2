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
