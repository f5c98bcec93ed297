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
