"""Change-data-capture apply: fold an ordered CDC log into a snapshot.

Beyond-reference operator family (the reference's closest surface is its
full-snapshot SCD2 comparison, ``/root/reference/ETL/etl.py`` dim-load
section — it never consumes a change LOG). CDC-apply is how a 100 TB
warehouse ingests an OLTP binlog / Debezium feed: a stream of
(key, sequence, op, payload) rows where the HIGHEST sequence per key
wins — ``U``/``I`` upsert the payload, ``D`` deletes the key — applied
to the previous snapshot to produce the next one.

Scale shape: ONE exchange of the change log by key (window row_number
picks the per-key winner — last-writer-wins), one key-join against the
snapshot to drop superseded rows (broadcast when the change set is
day-sized, the common case; hash join otherwise), and a union. History
is never rescanned beyond that single join; the cost is
O(changes + snapshot), the minimum for a snapshot-producing apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["apply_cdc"]


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC log to ``snapshot`` and return the next snapshot.

    ``changes`` carries the snapshot's columns plus ``seq_col`` (a
    per-key-monotonic log sequence — an LSN; ties broken by op D > U > I
    so a same-sequence delete is never resurrected) and ``op_col`` with
    values ``'I'``/``'U'``/``'D'``. Per key, only the highest-sequence
    change matters: upserts replace (or insert) the whole row, deletes
    remove the key. Snapshot keys without changes pass through
    untouched. ``I`` vs ``U`` are deliberately synonymous on apply
    (idempotent upsert): distinguishing them would make replayed or
    compacted logs error, the classic CDC-consumer mistake.
    """
    payload_cols = snapshot.columns
    # tie-break is an explicit delete-first precedence, NOT op string
    # order (lexicographic 'U' > 'D' would resurrect a same-seq delete)
    win = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), (F.col(op_col) == "D").desc()
    )
    last = (
        changes.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    changed_keys = last.select(*key_cols)
    untouched = snapshot.join(changed_keys, key_cols, "left_anti")
    upserts = last.where(F.col(op_col) != "D").select(*payload_cols)
    return untouched.unionByName(upserts)
