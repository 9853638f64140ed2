"""Crash-recovery property tests for the versioned-directory atomic swap
(SURVEY §7.4/§7.5 — the plain-parquet analogue of Delta's ACID commit).

The overwrite protocol has exactly three externally observable points a run
can die at:

  (1) after writing ``v=n+1`` data, before the manifest flip  → torn write
  (2) mid-manifest-write (temp file exists, ``os.replace`` never ran)
  (3) after the flip                                          → committed

The contract under test: at every crash point, readers of the store see one
complete, previously committed dataset (never a mix, never the torn data),
and simply re-running the same overwrite converges to the intended final
state. ``vacuum`` then removes the debris without touching the live version.
"""

from __future__ import annotations

import json
import os
import random
import tempfile

import pytest

from ecommerce_full_etl_process_spark.sources.io import TableStore


def _df(spark, tag: str, n: int = 3):
    return spark.createDataFrame(
        [(i, f"{tag}-{i}") for i in range(n)], "id long, v string"
    )


def _values(store: TableStore, table: str) -> set[str]:
    return {r["v"] for r in store.read(table).collect()}


def _torn_write(spark, store: TableStore, table: str, tag: str) -> None:
    """Simulate a run that died at crash point (1): data for the next
    version is fully on disk, manifest never flipped."""
    current = store._current_version(table)
    _df(spark, tag).write.mode("overwrite").parquet(
        store._data_dir(table, (current or 0) + 1)
    )


def test_torn_overwrite_invisible_and_rerun_converges(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("t", _df(spark, "committed"))

    _torn_write(spark, store, "t", "torn")

    # crash point (1): reader still sees the committed version, in full
    assert _values(store, "t") == {f"committed-{i}" for i in range(3)}

    # the retry overwrites the torn v=2 dir in place and flips the manifest
    store.overwrite("t", _df(spark, "retry"))
    assert _values(store, "t") == {f"retry-{i}" for i in range(3)}
    with open(store._manifest_path("t")) as f:
        assert json.load(f)["version"] == 2


def test_crash_mid_manifest_write_leaves_store_consistent(spark, tmp_path):
    """Crash point (2): a stray ``*.manifest`` temp file (mkstemp done,
    os.replace never ran) must not affect reads, appends, or the next
    overwrite."""
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("t", _df(spark, "a"))

    d = store._table_dir("t")
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": 999}, f)  # garbage a dying writer left behind

    assert _values(store, "t") == {f"a-{i}" for i in range(3)}
    store.overwrite("t", _df(spark, "b"))
    assert _values(store, "t") == {f"b-{i}" for i in range(3)}
    assert os.path.exists(tmp)  # debris is inert until vacuumed / cleaned


def test_append_after_torn_overwrite_lands_in_live_version(spark, tmp_path):
    """A torn overwrite must not divert subsequent appends: they belong to
    the live (manifest-pointed) version, not the orphaned higher dir."""
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("t", _df(spark, "live", n=1))
    _torn_write(spark, store, "t", "torn")

    store.append("t", _df(spark, "extra", n=1))
    assert _values(store, "t") == {"live-0", "extra-0"}


def test_vacuum_removes_torn_and_aged_versions_only(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    for tag in ("v1", "v2", "v3"):
        store.overwrite("t", _df(spark, tag, n=1))
    _torn_write(spark, store, "t", "torn")  # orphaned v=4

    removed = store.vacuum("t", keep_versions=2)
    names = sorted(os.path.basename(p) for p in removed)
    assert names == ["v=1", "v=4"]  # aged-out + torn; v=2 (retention) + v=3 live stay
    assert _values(store, "t") == {"v3-0"}
    old = spark.read.parquet(store._data_dir("t", 2))  # retained for time-travel
    assert [r["v"] for r in old.collect()] == ["v2-0"]
    assert store.vacuum("t", keep_versions=2) == []  # idempotent


def test_time_travel_read_and_vacuum_boundary(spark, tmp_path):
    """read(table, version=n) serves retained history; a vacuumed or
    never-written version raises loudly instead of returning garbage."""
    import pytest

    store = TableStore(spark, str(tmp_path / "wh"))
    for tag in ("v1", "v2", "v3"):
        store.overwrite("t", _df(spark, tag, n=1))

    assert _values(store, "t") == {"v3-0"}
    assert {r["v"] for r in store.read("t", version=1).collect()} == {"v1-0"}
    assert {r["v"] for r in store.read("t", version=2).collect()} == {"v2-0"}

    store.vacuum("t", keep_versions=2)  # drops v=1, keeps v=2 (retention)
    assert {r["v"] for r in store.read("t", version=2).collect()} == {"v2-0"}
    with pytest.raises(FileNotFoundError, match="no version 1"):
        store.read("t", version=1)
    with pytest.raises(FileNotFoundError, match="no version 9"):
        store.read("t", version=9)


def test_vacuum_on_missing_table_is_noop(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    assert store.vacuum("never_created") == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_crash_sequence_always_serves_committed_data(
    spark, tmp_path, seed
):
    """Property: across a random interleaving of committed overwrites and
    crashes at points (1)/(2), every read returns exactly the most recently
    COMMITTED dataset, and a final retry + vacuum converges to a clean
    single-live-version store."""
    rng = random.Random(seed)
    store = TableStore(spark, str(tmp_path / f"wh{seed}"))
    store.overwrite("t", _df(spark, "g0", n=2))
    committed = "g0"

    for step in range(1, 7):
        tag = f"g{step}"
        action = rng.choice(["commit", "torn", "manifest_tmp"])
        if action == "commit":
            store.overwrite("t", _df(spark, tag, n=2))
            committed = tag
        elif action == "torn":
            _torn_write(spark, store, "t", tag)
        else:
            fd, _ = tempfile.mkstemp(
                dir=store._table_dir("t"), suffix=".manifest"
            )
            os.close(fd)
        assert _values(store, "t") == {f"{committed}-0", f"{committed}-1"}

    store.overwrite("t", _df(spark, "final", n=2))  # the retry
    store.vacuum("t", keep_versions=1)
    assert _values(store, "t") == {"final-0", "final-1"}
    live = store._current_version("t")
    dirs = [n for n in os.listdir(store._table_dir("t")) if n.startswith("v=")]
    assert dirs == [f"v={live}"]  # no debris versions survive vacuum


# ---------------------------------------------------------------------------
# Writer lock (single-writer contract, now enforced)
# ---------------------------------------------------------------------------

def test_writer_lock_excludes_live_writer(spark, tmp_path):
    import json
    import os

    import pytest

    from ecommerce_full_etl_process_spark.sources.io import (
        ConcurrentWriteError,
        TableStore,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr("id AS k")
    store.overwrite("t", df)
    # simulate another LIVE writer holding the lock (this test's own pid)
    with open(store._lock_path("t"), "w") as f:
        json.dump({"pid": os.getpid(), "ts": 0}, f)
    with pytest.raises(ConcurrentWriteError):
        store.overwrite("t", df)
    with pytest.raises(ConcurrentWriteError):
        store.append("t", df)
    with pytest.raises(ConcurrentWriteError):
        store.vacuum("t")
    os.unlink(store._lock_path("t"))
    store.overwrite("t", df)  # lock gone -> writes proceed again


def test_writer_lock_reclaims_dead_pid(spark, tmp_path):
    import json

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr("id AS k")
    store.overwrite("t", df)
    # a crashed writer left its lock behind: pid that cannot exist
    with open(store._lock_path("t"), "w") as f:
        json.dump({"pid": 2 ** 22 + 1, "ts": 0}, f)
    store.overwrite("t", df)  # stale lock reclaimed, write succeeds
    assert store._current_version("t") == 2
    assert not os.path.exists(store._lock_path("t"))


def test_writer_lock_released_after_failed_write(spark, tmp_path):
    import pytest

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    bad = spark.range(5).selectExpr("CAST(raise_error('boom') AS STRING) AS k")
    with pytest.raises(Exception):
        store.overwrite("t", bad)
    assert not os.path.exists(store._lock_path("t"))
    store.overwrite("t", spark.range(3).selectExpr("id AS k"))
    assert store.read("t").count() == 3


def test_writer_lock_permission_error_means_alive(spark, tmp_path, monkeypatch):
    """os.kill(pid,0) -> PermissionError = live process owned by another
    user; the lock must NOT be stolen (round-6 ADVICE fix)."""
    import json

    import pytest

    from ecommerce_full_etl_process_spark.sources.io import (
        ConcurrentWriteError,
        TableStore,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr("id AS k")
    store.overwrite("t", df)
    with open(store._lock_path("t"), "w") as f:
        json.dump({"pid": 12345, "ts": 0}, f)

    def _kill(pid, sig):
        raise PermissionError("operation not permitted")

    monkeypatch.setattr(os, "kill", _kill)
    with pytest.raises(ConcurrentWriteError):
        store.overwrite("t", df)
    # the live writer's lock survived the failed steal attempt
    assert os.path.exists(store._lock_path("t"))


def test_writer_lock_reclaim_loser_retries(spark, tmp_path, monkeypatch):
    """Two contenders observe the same dead pid; the rename-loser must
    retry the normal acquire instead of unlinking the winner's fresh
    lock. Simulated by making the first rename vanish underneath us."""
    import json

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr("id AS k")
    store.overwrite("t", df)
    with open(store._lock_path("t"), "w") as f:
        json.dump({"pid": 2 ** 22 + 1, "ts": 0}, f)

    real_rename = os.rename
    calls = {"n": 0}

    def _rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            # the other contender's rename already claimed the stale lock
            real_rename(src, dst)
            os.unlink(dst)
            raise FileNotFoundError(src)
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", _rename)
    store.overwrite("t", df)  # loser retries and acquires cleanly
    assert store._current_version("t") == 2
    assert not os.path.exists(store._lock_path("t"))


def test_writer_lock_atomic_content_and_tmp_cleanup(spark, tmp_path):
    """Round-7 ADVICE fix: the lock is published via os.link of a
    pre-written payload, so (a) a corrupt/empty lock file can only be
    genuine corruption — reclaimed — and (b) no payload temp files leak,
    acquire success or failure."""
    import glob
    import json

    import pytest

    from ecommerce_full_etl_process_spark.sources.io import (
        ConcurrentWriteError,
        TableStore,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr("id AS k")
    store.overwrite("t", df)
    tdir = os.path.dirname(store._lock_path("t"))

    # empty lock file = corruption (the link protocol can never expose a
    # fresh lock without content) -> reclaimed, write proceeds
    open(store._lock_path("t"), "w").close()
    store.overwrite("t", df)
    assert store._current_version("t") == 2
    assert glob.glob(os.path.join(tdir, "_writer.lock.tmp.*")) == []

    # failed acquire (live holder) also leaves no payload temp behind
    with open(store._lock_path("t"), "w") as f:
        json.dump({"pid": os.getpid(), "ts": 0}, f)
    with pytest.raises(ConcurrentWriteError):
        store.overwrite("t", df)
    assert glob.glob(os.path.join(tdir, "_writer.lock.tmp.*")) == []


# ---------------------------------------------------------------------------
# staged-overwrite vs vacuum (round-14, r13 ADVICE medium): the lock is
# released between overwrite_staged's data write and commit(), so vacuum
# must spare the live writer's staged version via the _staged.json marker,
# and commit() must verify the dir before flipping.
# ---------------------------------------------------------------------------


def test_vacuum_spares_live_staged_version(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.overwrite("t", _df(spark, "v1"))
    staged_ver, commit = store.overwrite_staged("t", _df(spark, "v2"))
    # a vacuum inside the stage->commit window must NOT delete the staged
    # dir (this process is the live staging writer)
    removed = store.vacuum("t", keep_versions=1)
    assert store._data_dir("t", staged_ver) not in removed
    assert os.path.isdir(store._data_dir("t", staged_ver))
    commit()
    assert _values(store, "t") == {"v2-0", "v2-1", "v2-2"}
    # marker consumed by the commit; a later vacuum reclaims nothing new
    assert not os.path.exists(store._staged_path("t"))


def test_staged_commit_refuses_missing_dir(spark, tmp_path):
    import shutil

    store = TableStore(spark, str(tmp_path))
    store.overwrite("t", _df(spark, "v1"))
    staged_ver, commit = store.overwrite_staged("t", _df(spark, "v2"))
    shutil.rmtree(store._data_dir("t", staged_ver))
    with pytest.raises(FileNotFoundError):
        commit()
    # manifest untouched: readers still see v1
    assert _values(store, "t") == {"v1-0", "v1-1", "v1-2"}


def test_vacuum_reclaims_dead_writers_staged_version(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.overwrite("t", _df(spark, "v1"))
    staged_ver, _commit = store.overwrite_staged("t", _df(spark, "v2"))
    # forge the marker to a dead pid (a staging writer that crashed)
    with open(store._staged_path("t"), "w") as f:
        json.dump({"version": staged_ver, "pid": 2**22 + 12345}, f)
    removed = store.vacuum("t", keep_versions=1)
    assert store._data_dir("t", staged_ver) in removed
    assert not os.path.exists(store._staged_path("t"))
    assert _values(store, "t") == {"v1-0", "v1-1", "v1-2"}
