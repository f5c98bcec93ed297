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


# ---------------------------------------------------------------------------
# RDF serialization (frame reader/turtle analog — sling/frame/turtle.cc)
# ---------------------------------------------------------------------------

_NT_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _nt_escape_col(c):
    """N-Triples literal escaping as column expressions (JVM-side)."""
    out = c
    for raw, esc in _NT_ESCAPES.items():
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def triples_to_ntriples(
    triples: DataFrame,
    base_iri: str = "http://example.org/kb/",
    pred_iri: str = "http://example.org/prop/",
) -> DataFrame:
    """Render (subj, pred, obj) rows as N-Triples lines — the engine's
    analog of the reference's frame text/Turtle serialization
    (sling/frame/turtle.cc, reader.cc; SURVEY scopes frame wire formats
    out, but an RDF EXPORT is the interoperable shape a KB consumer
    expects). Entity ids become IRIs under ``base_iri``; literal objects
    (dates, numbers, measures, free text — anything not shaped like an
    id) render as escaped string literals. Pure column expressions: the
    export stays inside whole-stage codegen and writes with
    ``df.write.text`` at any scale."""
    is_ref = F.col("obj").rlike(r"^(Q\d+$|[a-z]+:)")
    subj = F.concat(F.lit(f"<{base_iri}"), F.col("subj"), F.lit(">"))
    pred = F.concat(F.lit(f"<{pred_iri}"), F.col("pred"), F.lit(">"))
    obj = F.when(
        is_ref, F.concat(F.lit(f"<{base_iri}"), F.col("obj"), F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), _nt_escape_col(F.col("obj")), F.lit('"')))
    return triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, **iri_kwargs) -> None:
    triples_to_ntriples(triples, **iri_kwargs).write.mode("overwrite").text(path)
