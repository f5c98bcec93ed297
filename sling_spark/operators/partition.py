"""Physical exchange operators (SURVEY.md §2.3 mapping).

| reference (sling/)             | here          |
|--------------------------------|---------------|
| task/sharder.cc:25-46          | shard         |
| task/rekey.cc:75               | rekey         |
| task/filter.cc:29-68 (discard) | discard       |
| nlp/silver/corpus-split.cc:60  | corpus_split  |
| identity / null sink           | trivial       |

Plus the two scale tools SLING never needed but 1000-executor Spark
does: heavy-key salting and an explicit skew report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard(df: DataFrame, key: str, n: int) -> DataFrame:
    """Hash-route rows to n shards (sharder contract: hash(key) % n)."""
    return df.repartition(n, F.col(key))


def rekey(df: DataFrame, new_key, key_col: str = "key") -> DataFrame:
    """Rewrite the message key (rekey task)."""
    return df.withColumn(key_col, new_key)


def discard(df: DataFrame, blacklist: DataFrame, on: str) -> DataFrame:
    """Drop rows whose key appears in the blacklist — broadcast
    LEFT ANTI join (the discard task loads its blacklist in Start();
    broadcast is the same placement)."""
    return df.join(F.broadcast(blacklist), on=on, how="left_anti")


def keep_only(df: DataFrame, whitelist: DataFrame, on: str) -> DataFrame:
    """Semi-join filter (document-item-filter analog,
    nlp/silver/filters.cc:57)."""
    return df.join(F.broadcast(whitelist), on=on, how="left_semi")


def corpus_split(df: DataFrame, key: str, ratio: int = 10,
                 split_col: str = "split") -> DataFrame:
    """Deterministic train/eval routing by key fingerprint modulo
    (corpus-split semantics): split = 'eval' for hash(key) % ratio == 0
    else 'train'."""
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(ratio))
    return df.withColumn(
        split_col, F.when(bucket == 0, F.lit("eval")).otherwise(F.lit("train"))
    )


def salt_heavy_keys(df: DataFrame, key: str, heavy: DataFrame,
                    salt_buckets: int = 16, salt_col: str = "salted_key") -> DataFrame:
    """Skew mitigation: rows whose key is in ``heavy`` (a small table of
    known-hot keys, e.g. mega-repos) get a composite key spreading them
    over ``salt_buckets`` partitions; the join/agg then runs on the
    salted key and re-merges. AQE skew-join handles the residual."""
    # distinct BEFORE the left join: a heavy table with a repeated key
    # (e.g. two concatenated skew reports) would otherwise fan out and
    # double-count every row of exactly the hottest keys
    heavy_marked = (
        heavy.select(F.col(key)).distinct().withColumn("__is_heavy", F.lit(True))
    )
    out = df.join(F.broadcast(heavy_marked), on=key, how="left")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    return out.withColumn(
        salt_col,
        F.when(
            F.col("__is_heavy").isNotNull(),
            F.concat_ws("#", F.col(key), salt.cast("string")),
        ).otherwise(F.col(key)),
    ).drop("__is_heavy")


def skew_report(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Per-key row counts + share of total: the measurement step before
    choosing salting targets."""
    counts = df.groupBy(key).agg(F.count("*").cast("long").alias("n_rows"))
    total = counts.agg(F.sum("n_rows")).collect()[0][0] or 1
    return (
        counts.withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )
