"""Final materialization: partitioned triple tables + extraction
metrics (SURVEY.md §7 stage 8; north rule: resumable checkpoints
carrying lineage and per-partition extraction metrics).

The reference's terminal artifact is the frame-store snapshot
(task/frame-store-writer.cc:126) plus per-processor counters
(task/task.h counter registry, e.g. wikipedia-documents.cc:77-103).
Ours is:

- ``triples``  — Parquet partitioned by ``source`` and hash-bucketed by
  subject (`pmod(xxhash64(subj), n_buckets)` as a physical column) so a
  downstream subject-keyed join/agg prunes to one bucket; at Iceberg
  deployment this is `bucket(subj)` partition transform.
- ``metrics``  — per-repo counter rows (docs, mentions, relations,
  triples, distinct entities), the counter-parity invariant source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_triples(triples: DataFrame, path: str, n_buckets: int = 64) -> None:
    bucketed = triples.withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
    )
    (
        bucketed.repartition("source", "subj_bucket")
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(path)
    )


def extraction_metrics(
    documents: DataFrame, mentions: DataFrame, relations: DataFrame
) -> DataFrame:
    """Per-repo counters (the processor-counter analog): one row per
    repo with document/mention/relation counts and entity diversity.
    Three partial-agg shuffles on the same key, merged by join."""
    d = documents.groupBy("repo").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    m = mentions.groupBy("repo").agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.countDistinct("entity").cast("long").alias("n_entities"),
    )
    r = relations.groupBy("repo").agg(
        F.count("*").cast("long").alias("n_relations")
    )
    out = (
        d.join(m, on="repo", how="left")
        .join(r, on="repo", how="left")
        .na.fill(0, ["n_mentions", "n_entities", "n_relations"])
    )
    return out


def counter_invariants(metrics: DataFrame) -> dict[str, int]:
    """Global counters (the sanity thresholds the reference keeps as
    informal counter checks, SURVEY.md §5.3)."""
    row = metrics.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_mentions").alias("mentions"),
        F.sum("n_relations").alias("relations"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("docs", "tokens", "mentions", "relations")}
