"""Upsert / MERGE emulation (CDC onto a KB table without Delta/Iceberg).

The reference applies daily deltas onto the KB via epoch-versioned PUTs
(SLINGDB, db/dbprotocol.h). On a lake without a MERGE-capable format,
the same semantics compose from primitives:

    merged = updates ∪ (target ▷ updates)     -- anti-join keeps
                                                 non-updated rows

plus last-writer-wins compaction by a version column. On Iceberg/Delta
this is `MERGE INTO`; these helpers keep the semantics testable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``updates`` win on key collision; everything else kept."""
    survivors = target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(updates)


def latest_wins(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Compaction: keep the max-version row per key (deterministic —
    version ties broken by the version value itself being the order)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change feed with insert/update/delete ops (op column:
    'I'|'U'|'D'): deletes drop keys, upserts apply the rest.

    A feed can carry several ops for one key in one batch. With
    ``seq_col`` the feed is first reduced to each key's LATEST op, so
    update-then-delete deletes and delete-then-update re-inserts — pass
    it whenever the feed has in-batch ordering. Without it the batch is
    an unordered op SET: delete keys drop first, then every non-delete
    row (re-)upserts, so an update and a delete on the same key leaves
    the update in place."""
    if seq_col is not None:
        changes = latest_wins(changes, keys, seq_col)
    deletes = changes.filter(F.col(op_col) == "D").select(*keys).distinct()
    drop_cols = [op_col] + ([seq_col] if seq_col is not None else [])
    upserts = changes.filter(F.col(op_col) != "D").drop(*drop_cols)
    kept = target.join(deletes, on=keys, how="left_anti")
    return upsert(kept, upserts, keys)
