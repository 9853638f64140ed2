"""Readers / writers / table bootstrap (SURVEY §2.1, S1-S9).

The reference's scans are SQLite ``SELECT``s (``ETL/etl.py:146-168``) and its
sinks are row-at-a-time ``INSERT``s (``ETL/etl.py:183-373``). Here every
source is a parquet scan behind Catalyst (predicate pushdown + column pruning
+ partition pruning are free) and every sink is a partitioned bulk parquet
write.

Scale notes (100 TB design):
- Fact tables are written partitioned by ``date_id`` so the daily incremental
  read (reference ``WHERE t.date = ?``, ETL/etl.py:166) is partition pruning,
  not a scan.
- Dimension overwrites are atomic via versioned directories + a tiny manifest
  pointer (SURVEY §7.5): write ``<table>/v=<n+1>/`` then flip the manifest —
  readers never observe a half-written dim, and a failed run leaves the old
  version live. This is the plain-parquet analogue of Delta's ACID commit.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from contextlib import contextmanager
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted a locked table mutation (single-writer
    contract, SURVEY §7.5)."""


def _json_safe(v):
    """JSON-encodable, ORDER-PRESERVING rendering of a parquet stat value:
    dates/timestamps → ISO strings (lexicographic == chronological),
    Decimal → float; ints/floats/strs pass through. Both the stored stats
    and the probe bounds go through this, so range comparisons stay
    consistent."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, _Dec):
        return float(v)
    return v


def read_testdata(
    spark: SparkSession, sf_dir: str, tables: Iterable[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver corpus tables as DataFrames (TESTDATA.md)."""
    names = tuple(tables) if tables is not None else TESTDATA_TABLES
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in names
    }


def write_day_partitioned(
    df: DataFrame, path: str, date_col: str = "date", mode: str = "append"
) -> None:
    """Write an OLTP feed partitioned by day (``dt=YYYY-MM-DD`` dirs) so
    the daily incremental read is partition pruning (reference S3,
    ``WHERE t.date = ?`` at ETL/etl.py:166)."""
    df.withColumn("dt", F.col(date_col).cast("string")).write.mode(
        mode
    ).partitionBy("dt").parquet(path)


def export_jsonl(
    df: DataFrame,
    path: str,
    shards: int,
    order_col: str | None = None,
) -> None:
    """Training-data delivery sink: write the frame as ``shards``
    gzip-compressed JSONL files (the interchange format LLM training
    stacks consume). ``order_col`` sorts WITHIN each shard via
    repartition + sortWithinPartitions — a global sort would serialize on
    one reducer for no training benefit; per-shard order is what loaders
    that stream shard-by-shard actually see. Columns serialize with their
    Spark types (arrays → JSON arrays, timestamps → ISO strings)."""
    out = df.repartition(shards)
    if order_col is not None:
        out = out.sortWithinPartitions(order_col)
    out.write.mode("overwrite").option("compression", "gzip").json(path)


def read_day_slice(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Read exactly one day's partition — Catalyst turns the dt filter into
    PartitionFilters (no other day's files are listed or scanned)."""
    return spark.read.parquet(path).where(F.col("dt") == day).drop("dt")


class TableStore:
    """A directory-of-parquet-tables catalog with atomic overwrite.

    Plays the role of the reference's three SQLite files (OLTP/OLAP/ETL dbs).
    Layout per table::

        <root>/<table>/_manifest.json   -> {"version": n}
        <root>/<table>/v=<n>/*.parquet

    ``append`` tables (facts, logs) write straight into the current version
    directory; ``overwrite`` (dims, SCD2 rewrite) writes v=n+1 then flips the
    manifest, which is the atomicity story for re-runs (SURVEY §7.4/§7.5).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_manifest.json")

    def _current_version(self, table: str) -> int | None:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return int(json.load(f)["version"])

    def _set_version(self, table: str, version: int) -> None:
        # atomic flip: write temp file in same dir, then rename (POSIX atomic)
        d = self._table_dir(table)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._manifest_path(table))

    def _data_dir(self, table: str, version: int) -> str:
        return os.path.join(self._table_dir(table), f"v={version}")

    # -- public API ---------------------------------------------------------

    def exists(self, table: str) -> bool:
        return self._current_version(table) is not None

    def create_if_not_exists(self, table: str, schema: T.StructType) -> None:
        """Bootstrap an empty table (reference S7: CREATE TABLE IF NOT EXISTS,
        ETL/etl.py:44-56)."""
        if not self.exists(table):
            empty = self.spark.createDataFrame([], schema)
            self.overwrite(table, empty)

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Read the current version, or time-travel to an explicit
        ``version`` that retention (``vacuum``) has kept."""
        if version is None:
            version = self._current_version(table)
            if version is None:
                raise FileNotFoundError(
                    f"table {table!r} not found in {self.root}"
                )
        path = self._data_dir(table, version)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"table {table!r} has no version {version} on disk "
                "(vacuumed or never written)"
            )
        return self.spark.read.parquet(path)

    # -- writer lock --------------------------------------------------------

    def _lock_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_writer.lock")

    @contextmanager
    def _writer_lock(self, table: str):
        """Per-table advisory writer lock — the single-writer contract the
        vacuum docstring documents, now enforced instead of assumed.

        Acquire writes the pid+timestamp payload to a contender-unique
        temp file and publishes it with ``os.link`` — atomic on POSIX and
        failing with FileExistsError when a lock already exists, so the
        lock file is BORN with its content (a contender can never observe
        an empty/torn lock and mistake a fresh live lock for a stale one,
        which the earlier O_CREAT-then-write protocol allowed in the gap
        between create and write). A lock whose pid is dead (writer
        crashed between acquire and release) is reclaimed — the
        versioned-dir protocol already tolerates that writer's torn
        output (vacuum removes it).

        Liveness: only ``ProcessLookupError`` means dead. ``PermissionError``
        from ``os.kill(pid, 0)`` means the pid is ALIVE but owned by another
        user — treating it as dead would steal a live writer's lock.

        Reclaim is race-free: the stale lock is claimed via an atomic
        ``os.rename`` to a contender-unique name — exactly one renamer
        wins; the loser sees FileNotFoundError and retries the normal
        acquire path. Plain unlink+create would let two contenders both
        observe the dead pid, with the slower one unlinking the faster
        one's FRESH lock — two live writers despite the contract.

        Same-host scope only, like the store itself: a multi-node
        deployment needs a lock service or a table format with a commit
        protocol (Delta/Iceberg) — documented, not simulated."""
        d = self._table_dir(table)
        os.makedirs(d, exist_ok=True)
        path = self._lock_path(table)
        payload = os.path.join(
            d, f"_writer.lock.tmp.{os.getpid()}.{time.time_ns()}"
        )
        with open(payload, "w") as f:
            json.dump({"pid": os.getpid(), "ts": time.time()}, f)
        try:
            acquired = False
            for attempt in (1, 2, 3):
                try:
                    os.link(payload, path)  # atomic create WITH content
                    acquired = True
                    break
                except FileExistsError:
                    try:
                        with open(path) as f:
                            holder = json.load(f)
                        holder_pid = int(holder["pid"])
                    except FileNotFoundError:
                        continue  # holder released between link and read
                    except (OSError, ValueError, KeyError, TypeError):
                        # Unreadable content can no longer be a fresh lock
                        # mid-write (link publishes content atomically) —
                        # only genuine corruption lands here; reclaim below.
                        holder, holder_pid = {}, None
                alive = False
                if holder_pid is not None:
                    try:
                        os.kill(holder_pid, 0)
                        alive = True
                    except ProcessLookupError:
                        alive = False  # definitely dead
                    except PermissionError:
                        alive = True  # live process, other user
                    except OSError:
                        alive = True  # unknown — never steal on doubt
                if alive:
                    raise ConcurrentWriteError(
                        f"table {table!r} is locked by live writer "
                        f"pid={holder.get('pid')} since {holder.get('ts')}"
                    )
                # Stale lock: claim it atomically — exactly one contender's
                # rename succeeds; everyone else loops back to acquire.
                claimed = os.path.join(
                    d, f"_writer.lock.reclaim.{os.getpid()}.{time.time_ns()}"
                )
                try:
                    os.rename(path, claimed)
                    os.unlink(claimed)
                except FileNotFoundError:
                    pass  # another contender claimed it first — just retry
                if attempt == 3:
                    raise ConcurrentWriteError(
                        f"table {table!r}: lock contention while reclaiming"
                    )
        finally:
            try:
                os.unlink(payload)
            except FileNotFoundError:
                pass
        if not acquired:  # pragma: no cover — loop always breaks or raises
            raise ConcurrentWriteError(f"table {table!r}: lock not acquired")
        try:
            yield
        finally:
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass

    def overwrite(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        """Write a full new version then atomically flip the manifest."""
        with self._writer_lock(table):
            self._overwrite_unlocked(table, df, partition_by)

    def _overwrite_unlocked(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        current = self._current_version(table)
        new_version = (current or 0) + 1
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._data_dir(table, new_version))
        self._set_version(table, new_version)

    def overwrite_staged(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ):
        """Write the next version's DATA now, flip the manifest LATER:
        returns ``(staged_version, commit)`` where ``commit()`` performs
        the atomic manifest flip. Readers keep seeing the old version
        until ``commit()``; an abandoned staged dir is exactly the torn
        output the versioned protocol already tolerates (vacuum reclaims
        it, and a retry re-stages the same version number and overwrites
        it).

        This exists for multi-table maintenance loops (round-13 opt): a
        consumer that must derive something FROM the new version before
        publishing it previously had to materialize the frame twice —
        once into executor memory (``localCheckpoint``) to compute the
        derivation, once onto disk for the overwrite. Staging writes the
        bytes once to their final columnar home; the derivation reads
        them back with column pruning, and the commit point (the flip)
        stays exactly where the tear-healing protocol needs it.

        Single-writer contract (same as ``vacuum``): the writer lock is
        held for the data write and re-acquired for the flip; a SECOND
        writer overwriting between the two would reuse the staged
        version number — don't interleave writers on a staged table.

        Vacuum safety across the stage→commit window (r13 ADVICE fix):
        the lock is NOT held between the data write and ``commit()``, so
        a concurrent ``vacuum()`` would otherwise acquire it cleanly and
        delete the staged ``v=n+1`` dir as torn debris — and the later
        ``commit()`` would flip the manifest to a nonexistent dir,
        leaving the table unreadable. Two guards close that: a
        ``_staged.json`` marker (written under the SAME lock as the data,
        before any bytes land) names the staged version and its writer
        pid, and ``vacuum`` spares that version while the pid is alive
        (a dead pid's marker is debris and is reclaimed with the dir);
        ``commit()`` additionally verifies the staged dir still exists
        before flipping, so a lost race can only fail loudly, never
        publish a dangling manifest."""
        with self._writer_lock(table):
            current = self._current_version(table)
            new_version = (current or 0) + 1
            d = self._table_dir(table)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".staged")
            with os.fdopen(fd, "w") as f:
                json.dump({"version": new_version, "pid": os.getpid()}, f)
            os.replace(tmp, self._staged_path(table))
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self._data_dir(table, new_version))

        def commit() -> None:
            with self._writer_lock(table):
                if not os.path.isdir(self._data_dir(table, new_version)):
                    raise FileNotFoundError(
                        f"table {table!r}: staged version {new_version} "
                        "vanished before commit (vacuumed or removed) — "
                        "manifest NOT flipped"
                    )
                self._set_version(table, new_version)
                try:
                    os.unlink(self._staged_path(table))
                except FileNotFoundError:
                    pass

        return new_version, commit

    def _staged_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_staged.json")

    def _staged_live_version(self, table: str) -> int | None:
        """The version a LIVE writer has staged but not yet committed
        (``overwrite_staged``), or None. A marker whose pid is dead is a
        crashed writer's debris: removed here, and its dir falls back to
        the normal torn-output reclaim path."""
        path = self._staged_path(table)
        try:
            with open(path) as f:
                info = json.load(f)
            pid, ver = int(info["pid"]), int(info["version"])
        except FileNotFoundError:
            return None
        except (OSError, ValueError, KeyError, TypeError):
            return None  # corrupt marker: impossible via the atomic
            # replace protocol; treat as absent rather than pin forever
        try:
            os.kill(pid, 0)
            return ver  # live writer
        except ProcessLookupError:
            pass  # definitely dead — reclaim the marker
        except OSError:
            return ver  # alive under another user / unknown: never steal
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
        return None

    def overwrite_partitions(
        self,
        table: str,
        df: DataFrame,
        partition_col: str,
        also_replace: list | None = None,
    ) -> list[str]:
        """Dynamic partition overwrite (Delta ``replaceWhere`` / Spark
        ``partitionOverwriteMode=dynamic`` analogue): replace ONLY the
        hive partitions present in ``df``, carrying every untouched
        partition into the new version by HARDLINK — zero data copied,
        zero rows rewritten outside the touched partitions. Returns the
        replaced partition directory names.

        This is the 100 TB upsert shape the full :meth:`overwrite`
        cannot provide: a day's late fact corrections touch one
        ``date_id=...`` partition of a multi-year table, so the write
        cost must be O(changed partitions), not O(table). The versioned
        layout is preserved — the new version is a complete directory
        (readers never see a partial table), time travel to the prior
        version still works, and vacuum reclaims old versions without
        breaking the links (hardlinks keep the shared file bytes alive
        until the LAST version referencing them is removed).

        The table must already be hive-partitioned on ``partition_col``
        (written via ``overwrite(..., partition_by=[partition_col])`` or
        a prior call here); an unpartitioned layout raises. The
        incoming frame must carry the partition column.

        ``also_replace``: partition VALUES to replace even when ``df``
        carries no rows for them — i.e. delete the partition. A
        partition whose rows were all removed upstream (every key
        deleted by a CDC fold, a retention purge) never appears in the
        replacement frame, so without an explicit list it would wrongly
        carry over.
        """
        if partition_col not in df.columns:
            raise ValueError(
                f"overwrite_partitions: frame lacks partition column "
                f"{partition_col!r}"
            )
        with self._writer_lock(table):
            return self._overwrite_partitions_unlocked(
                table, df, partition_col, also_replace
            )

    def _overwrite_partitions_unlocked(
        self,
        table: str,
        df: DataFrame,
        partition_col: str,
        also_replace: list | None = None,
        max_records_per_file: int | None = None,
        pre_flip=None,
    ) -> list[str]:
        current = self._current_version(table)
        if current is None:
            raise FileNotFoundError(
                f"table {table!r} not found in {self.root}"
            )
        cur_dir = self._data_dir(table, current)
        prefix = f"{partition_col}="
        existing = {
            name
            for name in os.listdir(cur_dir)
            if name.startswith(prefix)
            and os.path.isdir(os.path.join(cur_dir, name))
        }
        # the guard must catch BOTH a flat table (top-level parquet)
        # and a table partitioned on a DIFFERENT column (foo=* dirs):
        # either way, writing df's partitions as the complete new
        # version would silently drop every existing row
        stray = [
            name
            for name in os.listdir(cur_dir)
            if (
                "=" in name
                and not name.startswith(prefix)
                and os.path.isdir(os.path.join(cur_dir, name))
            )
            or name.endswith(".parquet")
        ]
        if not existing and stray:
            raise ValueError(
                f"table {table!r} is not hive-partitioned on "
                f"{partition_col!r} (found {stray[:3]}) — rewrite it "
                f"with overwrite(..., partition_by=[{partition_col!r}"
                "]) first"
            )
        # a multi-level-partitioned table nests further key=value
        # dirs inside each first-level partition; the replacement
        # MUST be written with the same full partitioning or the
        # new version mixes layouts (partition column in one dir,
        # data column in another) and becomes unreadable
        nested_cols: list[str] = []
        probe = (
            os.path.join(cur_dir, next(iter(existing)))
            if existing
            else None
        )
        while probe:
            subs = [
                n
                for n in os.listdir(probe)
                if "=" in n and os.path.isdir(os.path.join(probe, n))
            ]
            if not subs:
                break
            col = subs[0].split("=", 1)[0]
            nested_cols.append(col)
            probe = os.path.join(probe, subs[0])
        missing = [c for c in nested_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"table {table!r} is also partitioned on "
                f"{nested_cols} — the replacement frame lacks "
                f"{missing}"
            )
        new_version = current + 1
        new_dir = self._data_dir(table, new_version)
        # 1. write the replacement partitions
        writer = df.write.mode("overwrite")
        if max_records_per_file is not None:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.partitionBy(partition_col, *nested_cols).parquet(new_dir)
        written = {
            name
            for name in os.listdir(new_dir)
            if name.startswith(prefix)
        }
        # 1b. explicit replacements (partitions deleted to empty):
        # match by decoded VALUE, not by re-encoding — Spark's dir
        # encoding (percent-escapes, lowercase booleans, the
        # __HIVE_DEFAULT_PARTITION__ null sentinel) does not
        # round-trip through str()/quote() for every type
        from urllib.parse import unquote

        def _wanted(v) -> set[str]:
            if v is None:
                return {"__HIVE_DEFAULT_PARTITION__"}
            if isinstance(v, float):
                # float partition values don't round-trip Spark's
                # dir encoding (Python str(1e-07) = '1e-07' vs
                # Java's '1.0E-7'), so a value-match could silently
                # no-op and carry a stale partition into the new
                # version — refuse loudly; int/string/date/bool/None
                # are the supported (and round-trippable) types
                raise TypeError(
                    "overwrite_partitions: float partition values in "
                    "also_replace don't round-trip Spark's partition-"
                    "path encoding; partition on int/string/date/bool "
                    f"instead (got {v!r})"
                )
            s = str(v)
            out = {s}
            if isinstance(v, bool):
                out.add(s.lower())
            return out

        targets: set[str] = set()
        for v in also_replace or []:
            targets |= _wanted(v)
        replaced = set(written)
        for name in existing:
            if unquote(name[len(prefix):]) in targets:
                replaced.add(name)
        # 2. carry untouched partitions over by hardlink (same bytes,
        #    no copy; falls back to copy on filesystems without
        #    links). os.walk, not a flat listdir: a multi-level
        #    partitioned table nests further key=value dirs inside,
        #    and skipping them would silently drop their data.
        import shutil

        for name in existing - replaced:
            src = os.path.join(cur_dir, name)
            dst = os.path.join(new_dir, name)
            for dirpath, _dirs, files in os.walk(src):
                rel = os.path.relpath(dirpath, src)
                ddir = dst if rel == "." else os.path.join(dst, rel)
                os.makedirs(ddir, exist_ok=True)
                for fn in files:
                    if fn.startswith((".", "_")):
                        continue  # _SUCCESS / checksums / hidden
                    try:
                        os.link(
                            os.path.join(dirpath, fn),
                            os.path.join(ddir, fn),
                        )
                    except OSError:
                        shutil.copy2(
                            os.path.join(dirpath, fn),
                            os.path.join(ddir, fn),
                        )
        # 2b. version-keyed side artifacts (e.g. the stats manifest) are
        # written BEFORE the flip: a crash after _set_version but before
        # a post-flip manifest write would leave the live version without
        # stats, silently disabling file skipping until the next
        # collect_stats. The stats path is keyed by version, so writing
        # for the not-yet-live new_version is safe — readers of the
        # current version never see it.
        if pre_flip is not None:
            pre_flip(new_version)
        # 3. atomic flip — readers switch whole-version, never partial
        self._set_version(table, new_version)
        # report real replacements: written dirs plus existing dirs
        # the explicit list removed
        return sorted(written | (replaced & existing))

    def append(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        """Append into the current version directory (facts / audit logs)."""
        with self._writer_lock(table):
            version = self._current_version(table)
            if version is None:
                self._overwrite_unlocked(table, df, partition_by=partition_by)
                return
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self._data_dir(table, version))

    # -- file-skipping stats (Delta-style data skipping on plain parquet) ---

    def _stats_path(self, table: str, version: int) -> str:
        return os.path.join(self._table_dir(table), f"_stats_v{version}.json")

    @staticmethod
    def _footer_stats(fpath: str) -> dict:
        """One file's stats entry (rows + per-column min/max/nulls) from
        the parquet footer — metadata-only, no data pages read."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fpath).metadata
        cols: dict[str, dict] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                st = c.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    continue  # no ordering contract for raw bytes
                name = c.path_in_schema
                prev = cols.get(name)
                if prev is None:
                    cols[name] = {
                        "min": mn,
                        "max": mx,
                        "nulls": st.null_count or 0,
                    }
                else:
                    prev["min"] = min(prev["min"], mn)
                    prev["max"] = max(prev["max"], mx)
                    prev["nulls"] += st.null_count or 0
        return {
            "rows": md.num_rows,
            "columns": {
                k: {
                    "min": _json_safe(v["min"]),
                    "max": _json_safe(v["max"]),
                    "nulls": v["nulls"],
                }
                for k, v in cols.items()
            },
        }

    def _write_stats(self, table: str, version: int, per_file: dict) -> dict:
        """Persist a stats manifest atomically (temp file + rename)."""
        stats = {"version": version, "files": per_file}
        fd, tmp = tempfile.mkstemp(dir=self._table_dir(table), suffix=".stats")
        with os.fdopen(fd, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, self._stats_path(table, version))
        return stats

    def collect_stats(self, table: str, version: int | None = None) -> dict:
        """Collect per-file column min/max/null stats from parquet footers
        and persist them next to the manifest (``_stats_v<n>.json``).

        Footer reads are metadata-only (no data pages); here they run
        driver-side because the container is one machine — at cluster scale
        this is either the write job's task-level stats (how Delta collects
        them at commit) or a small distributed metadata job. The stats file
        is what makes :meth:`read_where` prune whole files without a
        cluster-side listing.
        """
        if version is None:
            version = self._current_version(table)
        data_dir = self._data_dir(table, version)
        per_file: dict[str, dict] = {}
        for dirpath, _dirs, files in os.walk(data_dir):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(dirpath, fname)
                per_file[os.path.relpath(fpath, data_dir)] = (
                    self._footer_stats(fpath)
                )
        return self._write_stats(table, version, per_file)

    def prune_files(
        self, table: str, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[str], int]:
        """File-skipping decision for ``col BETWEEN lo AND hi``: returns
        (kept file paths, skipped count). Files without stats for ``col``
        are conservatively kept; no stats file at all keeps everything."""
        if version is None:
            version = self._current_version(table)
        data_dir = self._data_dir(table, version)
        spath = self._stats_path(table, version)
        if not os.path.exists(spath):
            all_files = [
                os.path.join(dp, f)
                for dp, _d, fs in os.walk(data_dir)
                for f in fs
                if f.endswith(".parquet")
            ]
            return all_files, 0
        with open(spath) as f:
            stats = json.load(f)
        lo_k, hi_k = _json_safe(lo), _json_safe(hi)
        kept, skipped = [], 0
        for rel, info in stats["files"].items():
            cstat = info["columns"].get(col)
            if cstat is None or cstat["min"] is None:
                kept.append(os.path.join(data_dir, rel))
                continue
            if cstat["max"] < lo_k or cstat["min"] > hi_k:
                skipped += 1
                continue
            kept.append(os.path.join(data_dir, rel))
        return kept, skipped

    def read_where(
        self, table: str, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Range read with file skipping: prune whole files via the stats
        manifest, then still apply the predicate (stats prune at file
        granularity; the filter handles row granularity and also pushes
        down to row-group skipping inside the kept files).

        ``basePath`` is pinned to the version directory so that on a
        ``partition_by`` table the hive-style partition columns survive a
        leaf-file read — without it the pruned-file read would drop them,
        diverging from :meth:`read`'s schema and breaking
        partition-column predicates. Note the stats manifest only covers
        footer columns; a predicate on a PARTITION column falls back to
        keep-everything pruning (no footer stats) and the directory
        value still filters correctly via the basePath-derived column."""
        if version is None:
            version = self._current_version(table)
        kept, _skipped = self.prune_files(table, col, lo, hi, version)
        if not kept:
            base = self.read(table, version)
            return base.where(F.lit(False))
        df = self.spark.read.option(
            "basePath", self._data_dir(table, version)
        ).parquet(*kept)
        return df.where(F.col(col).between(lo, hi))

    def compact(self, table: str, target_files: int) -> int:
        """Small-file compaction (OPTIMIZE file-count): rewrite the current
        version into ``target_files`` files, refresh stats, return the
        file count before compaction. Many appends → many small files →
        footer/listing overhead per read and tiny row groups; compaction
        restores the scan shape. Ordering within files is NOT preserved —
        run :meth:`cluster_by` instead when a clustered layout matters."""
        version = self._current_version(table)
        data_dir = self._data_dir(table, version)
        before = sum(
            1
            for _dp, _d, fs in os.walk(data_dir)
            for f in fs
            if f.endswith(".parquet")
        )
        self.overwrite(table, self.read(table).repartition(target_files))
        self.collect_stats(table)
        return before

    def compact_partitions(
        self,
        table: str,
        partition_col: str,
        max_files: int = 4,
        max_records_per_file: int | None = None,
    ) -> dict[str, int]:
        """Partition-scoped small-file compaction: rewrite ONLY the hive
        partitions holding more than ``max_files`` parquet files down to
        one file each, carrying every healthy partition into the new
        version by hardlink (zero bytes copied, zero rows rewritten).
        Returns ``{partition_dir: files_before}`` for the compacted
        partitions — ``{}`` (and NO new version) when every partition is
        already healthy, so calling it after every ingest batch is cheap.

        This is the maintenance shape a continuously-ingested partitioned
        warehouse needs at 100 TB: each micro-batch of the streaming CDC
        consumer (``streaming/stream_pipeline.py::
        run_cdc_partitioned_warehouse``) rewrites its affected partitions
        with the FOLD'S shuffle layout — up to ``spark.sql.shuffle.
        partitions`` files per touched partition per batch — and fact
        ``append``\\ s add files every batch; either way per-partition
        file counts decouple from data size, and scan cost grows with
        file count (listing, footer reads, tiny row groups).
        Whole-table :meth:`compact` is
        O(table); this is O(offending partitions) — the same asymmetry as
        :meth:`overwrite_partitions` vs :meth:`overwrite`. One file per
        compacted partition is right while partitions are small-file
        bound; once a single partition outgrows one healthy file, set
        ``max_records_per_file`` (forwarded to the writer's
        ``maxRecordsPerFile``) so the rewrite splits it into full-size
        files — and keep ``max_files`` ABOVE the resulting count per
        partition, or every call re-rewrites those partitions.

        If a data-skipping stats manifest exists for the current version,
        the new version's manifest is refreshed INCREMENTALLY: hardlinked
        carry-over files keep their stats entries verbatim (same relative
        path, same bytes); only the freshly written files get footer
        reads — stats maintenance stays O(offending partitions) too.
        """
        from urllib.parse import unquote

        with self._writer_lock(table):
            current = self._current_version(table)
            if current is None:
                raise FileNotFoundError(
                    f"table {table!r} not found in {self.root}"
                )
            cur_dir = self._data_dir(table, current)
            prefix = f"{partition_col}="
            counts: dict[str, int] = {}
            for name in os.listdir(cur_dir):
                pdir = os.path.join(cur_dir, name)
                if not (name.startswith(prefix) and os.path.isdir(pdir)):
                    continue
                counts[name] = sum(
                    1
                    for _dp, _d, fs in os.walk(pdir)
                    for f in fs
                    if f.endswith(".parquet")
                )
            if not counts:
                # mirror overwrite_partitions' layout guard: a flat table
                # (or one partitioned on a different column) must raise,
                # not silently report "nothing to compact"
                stray = [
                    n
                    for n in os.listdir(cur_dir)
                    if ("=" in n and os.path.isdir(os.path.join(cur_dir, n)))
                    or n.endswith(".parquet")
                ]
                if stray:
                    raise ValueError(
                        f"table {table!r} is not hive-partitioned on "
                        f"{partition_col!r} (found {stray[:3]})"
                    )
            offenders = {n: c for n, c in counts.items() if c > max_files}
            if not offenders:
                return {}
            # one job over ONLY the offending partitions; hashing on the
            # partition column puts each partition's rows in one task, so
            # the partitioned writer emits exactly one file per leaf dir
            df = (
                self.spark.read.option("basePath", cur_dir)
                .parquet(*[os.path.join(cur_dir, n) for n in sorted(offenders)])
                .repartition(len(offenders), F.col(partition_col))
            )
            # every offender goes through also_replace so a partition whose
            # files held zero live rows is DROPPED from the new version
            # rather than carried over stale (the replacement frame has no
            # rows for it, so the written dirs alone would miss it)
            decoded = [
                None if v == "__HIVE_DEFAULT_PARTITION__" else v
                for v in (unquote(n[len(prefix):]) for n in offenders)
            ]
            def _refresh_stats(new_version: int) -> None:
                # runs via pre_flip — after the new version's files are
                # fully written/hardlinked, BEFORE the flip — so a crash
                # anywhere leaves either (old version + old stats) or
                # (new version + new stats), never a live version whose
                # manifest is missing
                old_stats_path = self._stats_path(table, current)
                if not os.path.exists(old_stats_path):
                    return
                with open(old_stats_path) as f:
                    old_files = json.load(f)["files"]
                new_dir = self._data_dir(table, new_version)
                per_file: dict[str, dict] = {}
                for dirpath, _dirs, files in os.walk(new_dir):
                    for fname in files:
                        if not fname.endswith(".parquet"):
                            continue
                        fpath = os.path.join(dirpath, fname)
                        rel = os.path.relpath(fpath, new_dir)
                        per_file[rel] = old_files.get(rel) or (
                            self._footer_stats(fpath)
                        )
                self._write_stats(table, new_version, per_file)

            self._overwrite_partitions_unlocked(
                table,
                df,
                partition_col,
                also_replace=decoded,
                max_records_per_file=max_records_per_file,
                pre_flip=_refresh_stats,
            )
            return offenders

    def cluster_by(
        self, table: str, cols: list[str], num_files: int
    ) -> None:
        """OPTIMIZE-style layout rewrite: range-partition the table on
        ``cols[0]`` into ``num_files`` files, sort within files by all
        ``cols``, write as a new version, refresh stats. After clustering,
        each file owns a narrow disjoint range of the leading column, so
        :meth:`read_where` on it skips all but ~1/num_files of the data —
        the plain-parquet analogue of Delta OPTIMIZE ZORDER (single-column
        linear clustering; true multi-column locality would interleave key
        bits the same way before range-partitioning)."""
        df = (
            self.read(table)
            .repartitionByRange(num_files, *[F.col(c) for c in cols])
            .sortWithinPartitions(*cols)
        )
        self.overwrite(table, df)
        self.collect_stats(table)

    @staticmethod
    def _with_rank_bucket(
        df: DataFrame, out_col: str, col: str, edges: list[float], bits: int
    ) -> DataFrame:
        """Add ``out_col``: the equi-depth bucket id = count of quantile
        ``edges`` <= value, found by a ``bits``-step binary search
        (find-last-true over the monotone prefix ``edges[i] <= value``,
        duplicate-edge safe). Each step is STAGED as its own column —
        one ``element_at`` + compare + conditional add referencing the
        PREVIOUS step's column, never its expression tree. Inlining the
        steps instead multiplies the tree ~3× per step (the candidate
        index appears in the condition, the branch value and the
        otherwise), i.e. 3^bits copies of the edge-array literal — which
        OOMs the JVM at plan time before a single row moves. NULL values
        land in bucket 0 (the WHEN chain never fires on NULL compares)."""
        if not edges:
            return df.withColumn(out_col, F.lit(0).cast("long"))
        edges = sorted(float(e) for e in edges)
        arr = F.array(*[F.lit(e) for e in edges])
        n = len(edges)
        v = F.col(col).cast("double")
        df = df.withColumn(out_col, F.lit(0).cast("long"))
        for step in reversed(range(bits)):
            cand = F.col(out_col) + F.lit(1 << step)
            # clamp the probe index: SQL AND does not short-circuit, so
            # element_at(arr, cand) with cand > n would raise under ANSI
            # mode even though the guard is false
            probe = F.element_at(arr, F.least(cand, F.lit(n)).cast("int"))
            df = df.withColumn(
                out_col,
                F.when((cand <= F.lit(n)) & (v >= probe), cand)
                .otherwise(F.col(out_col))
                .cast("long"),
            )
        return df

    def cluster_by_zorder(
        self,
        table: str,
        cols: list[str],
        num_files: int,
        bits: int = 10,
        bucketing: str = "linear",
    ) -> None:
        """Multi-column layout rewrite (the Delta OPTIMIZE ZORDER
        analogue): interleave the bits of each column's scaled bucket id
        into one Z-order (Morton) key, range-partition on that key into
        ``num_files`` files, and refresh stats. Where :meth:`cluster_by`
        gives one column tight per-file ranges and leaves the others
        unclustered, the space-filling curve keeps EVERY listed column's
        per-file min/max narrow, so :meth:`read_where` prunes on any of
        them — the property that makes a single layout serve several
        query predicates at 100 TB.

        ``bucketing`` picks how values map to the ``bits``-wide bucket:

        - ``"linear"``: scale between table min/max, collected in one
          tiny aggregate (k scalars to the driver). Cheapest, but ONE
          outlier stretches the range until every real value collapses
          into a single bucket and pruning dies — the classic z-order
          caveat.
        - ``"rank"``: equi-DEPTH buckets from ``percentile_approx``
          edges (one aggregate, ``k × (2^bits - 1)`` doubles to the
          driver). Each bucket holds ~1/2^bits of the ROWS no matter
          how skewed the values, so outliers cost one bucket, not the
          whole layout. The per-row bucket id is a ``bits``-step binary
          search over the literal edge array (element_at + compare per
          step, all inside whole-stage codegen) — O(bits) per row, NOT
          a 2^bits-element scan.

        Either way the Morton key is a pure JVM column expression
        (``bits × k`` shift/mask terms), so the rewrite is scan → map →
        one range exchange — identical cost shape to linear clustering.
        """
        if bucketing not in ("linear", "rank"):
            raise ValueError(
                f"bucketing must be 'linear' or 'rank', got {bucketing!r}"
            )
        df = self.read(table)
        top = (1 << bits) - 1
        # bucket ids are STAGED as columns: the Morton interleave below
        # references each bucket ``bits`` times, and the rank-mode bucket
        # is itself a deep WHEN chain — inlining either multiplies the
        # expression tree until planning OOMs (see _with_rank_bucket)
        bnames = [f"__zb_{i}" for i in range(len(cols))]
        if bucketing == "rank":
            probs = [i / (1 << bits) for i in range(1, (1 << bits))]
            edge_rows = df.agg(
                *[
                    F.percentile_approx(
                        F.col(c).cast("double"), probs, 10_000
                    ).alias(c)
                    for c in cols
                ]
            ).collect()[0]
            for i, c in enumerate(cols):
                df = self._with_rank_bucket(
                    df, bnames[i], c, list(edge_rows[c] or []), bits
                )
        else:
            stats = df.agg(
                *[F.min(c).alias(f"mn_{c}") for c in cols],
                *[F.max(c).alias(f"mx_{c}") for c in cols],
            ).collect()[0]
            for i, c in enumerate(cols):
                mn = float(stats[f"mn_{c}"])
                mx = float(stats[f"mx_{c}"])
                if mx > mn:
                    scaled = (F.col(c).cast("double") - mn) * top / (mx - mn)
                    b = F.least(
                        F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)
                    ).cast("long")
                else:
                    b = F.lit(0).cast("long")
                df = df.withColumn(bnames[i], b)
        zkey = F.lit(0).cast("long")
        for bit in range(bits):
            for i, name in enumerate(bnames):
                zkey = zkey + F.shiftleft(
                    F.shiftright(F.col(name), bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + i,
                )
        out = (
            df.withColumn("__zkey", zkey)
            .repartitionByRange(num_files, F.col("__zkey"))
            .sortWithinPartitions("__zkey")
            .drop("__zkey", *bnames)
        )
        self.overwrite(table, out)
        self.collect_stats(table)

    def drop(self, table: str) -> None:
        import shutil

        d = self._table_dir(table)
        if os.path.exists(d):
            shutil.rmtree(d)

    def vacuum(self, table: str, keep_versions: int = 1) -> list[str]:
        """Remove crash debris and aged-out versions; returns removed dirs.

        Deletes (a) version dirs NEWER than the manifest pointer — torn
        writes from a run that died between data-write and manifest-flip —
        and (b) versions older than the newest ``keep_versions`` at or below
        the pointer (time-travel retention). Never touches the live version,
        so it is safe to run concurrently with readers of the current
        manifest (the same contract as Delta's VACUUM, SURVEY §7.5) — but
        NOT concurrently with a writer: an in-flight overwrite's v=n+1 dir
        looks exactly like torn debris until its manifest flip. That
        writer exclusion is ENFORCED: vacuum takes the same per-table
        writer lock as overwrite/append, so racing a live writer raises
        ConcurrentWriteError instead of deleting its in-flight version.
        The one writer state the lock does NOT cover is a staged-but-
        uncommitted ``overwrite_staged`` window (the lock is released
        between stage and commit); its ``_staged.json`` marker makes
        vacuum spare that version while the staging pid is alive.
        """
        import re
        import shutil

        with self._writer_lock(table):
            current = self._current_version(table)
            if current is None:
                return []
            d = self._table_dir(table)
            versions = sorted(
                int(m.group(1))
                for name in os.listdir(d)
                if (m := re.fullmatch(r"v=(\d+)", name))
            )
            keep_floor = current - max(keep_versions, 1) + 1
            # a LIVE writer's staged-but-uncommitted version looks exactly
            # like torn debris (v > current) — spare it (r13 ADVICE fix;
            # see overwrite_staged). Dead writers' staged dirs still
            # reclaim via the normal debris path.
            staged = self._staged_live_version(table)
            doomed = [
                v
                for v in versions
                if (v > current or v < keep_floor) and v != staged
            ]
            removed = []
            for v in doomed:
                path = self._data_dir(table, v)
                shutil.rmtree(path)
                removed.append(path)
            return removed
