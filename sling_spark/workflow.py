"""Workflow-primitive facade (SURVEY.md §2.1).

SLING pipelines are built from a small algebra in
python/task/workflow.py — read/write/map/filter/shuffle/reduce/
mapreduce/collect (workflow.py:483-751). This module states that algebra
over DataFrames, both as executable helpers and as the explicit mapping
table the engine is organized around.

The value is NOT abstraction (Spark already has the algebra) — it is the
contract: each helper pins the scale-relevant plan shape (e.g. `shuffle`
= repartition by key hash, the sharder contract of task/sharder.cc:25-46;
`reduce` = groupBy + applyInPandas with partial-agg-friendly keys).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """workflow.read (workflow.py:483-537): format-dispatched scan."""
    return spark.read.format(fmt).options(**options).load(path)


def write(df: DataFrame, path: str, shards: int | None = None,
          fmt: str = "parquet", mode: str = "overwrite") -> None:
    """workflow.write (:539-585): inserts the 'sharder' when fan-out is
    requested — repartition(N) before the write."""
    if shards:
        df = df.repartition(shards)
    df.write.format(fmt).mode(mode).save(path)


def map_rows(df: DataFrame, fn: Callable, schema: str) -> DataFrame:
    """workflow.map (:667-689): 1→N transform as Arrow-batched
    mapInPandas (fn: iterator of pandas DataFrames → same)."""
    return df.mapInPandas(fn, schema=schema)


def filter_rows(df: DataFrame, predicate) -> DataFrame:
    """workflow.filter (:654-665)."""
    return df.filter(predicate)


def shuffle(df: DataFrame, key: str, shards: int | None = None) -> DataFrame:
    """workflow.shuffle (:691-713): hash-partition by key — the sharder
    contract Fingerprint(key) % N (task/sharder.cc:25-46). Spark's
    HashPartitioning provides the same placement invariant; the
    per-shard 'sorter' is subsumed by sort-based shuffle."""
    return df.repartition(shards, F.col(key)) if shards else df.repartition(F.col(key))


def reduce_groups(df: DataFrame, key: str | list[str], fn: Callable, schema: str) -> DataFrame:
    """workflow.reduce (:715-735): group-by-key reduce
    (sling/task/reducer.h:56-105 'all messages for one key meet in one
    Reduce()') as applyInPandas."""
    keys = [key] if isinstance(key, str) else key
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def mapreduce(df: DataFrame, key: str | list[str], mapper: Callable,
              map_schema: str, reducer: Callable, reduce_schema: str) -> DataFrame:
    """workflow.mapreduce (:737-751): map → shuffle → reduce."""
    return reduce_groups(df.mapInPandas(mapper, schema=map_schema), key, reducer, reduce_schema)


def collect(*dfs: DataFrame) -> DataFrame:
    """workflow.collect/bundle (:595-643): merge channels."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def identity(df: DataFrame) -> DataFrame:
    """identity-mapper/-reducer (sling/task/identity.cc:24-66): relay
    every message unchanged. Exists so reference pipelines that insert
    an identity stage port 1:1; in a DataFrame plan it is a no-op (no
    extra exchange, Catalyst elides it)."""
    return df


def sort_shards(df: DataFrame, key: str | list[str],
                order: str | list[str] | None = None,
                shards: int | None = None) -> DataFrame:
    """sorter (sling/task/sorter.cc:37-57, :254): each shard's messages
    leave in (key, serial) order — the external merge sort the reference
    runs between sharder and a sorted reducer.  Spark twin: hash-
    partition on the key (sharder placement, so equal keys stay in one
    shard) then sortWithinPartitions on (key, order); the sort itself is
    Spark's spill-aware UnsafeExternalSorter, so a shard larger than
    executor memory externally merge-sorts exactly like the reference's
    64 MB-spill design (sorter.cc:129-170) without any driver state."""
    keys = [key] if isinstance(key, str) else list(key)
    orders = ([order] if isinstance(order, str) else list(order or []))
    sharded = df.repartition(shards, *map(F.col, keys)) if shards \
        else df.repartition(*map(F.col, keys))
    return sharded.sortWithinPartitions(*keys, *orders)


def null_sink(df: DataFrame) -> None:
    """null sink (sling/task/null-sink.cc:22-28): execute the full plan
    and silently discard every row.  Spark's built-in `noop` format is
    exactly this processor — all scan/shuffle/compute work runs, nothing
    is materialized; the standard way to benchmark a plan end-to-end."""
    df.write.format("noop").mode("overwrite").save()


def printer_sink(df: DataFrame, limit: int = 20) -> int:
    """message printer (sling/task/message-printer.cc:25-35): log
    incoming messages for debugging.  The reference prints EVERY message
    to the task log; at engine scale that is only sane bounded, so this
    prints the first ``limit`` rows (driver log) and returns the number
    printed.  Pass ``limit=None`` to match the reference's print-all on
    small channels."""
    rows = df.collect() if limit is None else df.take(limit)
    for r in rows:
        print(f"[printer] {r.asDict()}")
    return len(rows)


def pipe_read(spark: SparkSession, commands: str | list[str],
              buffer_rows: int = 10_000) -> DataFrame:
    """pipe-reader (sling/task/pipe-reader.cc:28-67): run a shell
    command and emit one message per output line.  Spark twin: one task
    per command (a list of commands fans ingest out across executors —
    e.g. one `zcat shard-N.gz` per shard), the subprocess streams
    through an Arrow-batched mapInPandas in ``buffer_rows`` chunks so a
    multi-GB pipe never materializes in one Python list.  Returns
    DataFrame[command string, line string]; a non-zero exit status
    fails the task loudly (the reference only logs — silent partial
    ingest does not survive at scale)."""
    cmds = [commands] if isinstance(commands, str) else list(commands)
    if not cmds:
        return spark.createDataFrame([], "command string, line string")
    # parallelize with numSlices=len(cmds) puts EXACTLY one command per
    # partition/task — repartition() is round-robin with a random start
    # offset, which can stack two heavy pipes into one task
    seed = spark.createDataFrame(
        spark.sparkContext.parallelize([(c,) for c in cmds], len(cmds)),
        "command string",
    )

    def run(batches):
        import subprocess

        import pandas as pd

        for pdf in batches:
            for cmd in pdf["command"]:
                proc = subprocess.Popen(
                    cmd, shell=True, stdout=subprocess.PIPE,
                    encoding="utf-8", errors="replace",
                )
                lines: list[str] = []
                assert proc.stdout is not None
                for line in proc.stdout:
                    lines.append(line.rstrip("\n"))
                    if len(lines) >= buffer_rows:
                        yield pd.DataFrame(
                            {"command": cmd, "line": lines}
                        )
                        lines = []
                rc = proc.wait()
                if rc != 0:
                    raise RuntimeError(
                        f"pipe command failed with exit {rc}: {cmd}"
                    )
                if lines:
                    yield pd.DataFrame({"command": cmd, "line": lines})

    return seed.mapInPandas(run, schema="command string, line string")
