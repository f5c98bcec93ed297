"""Corpus-derived anchor aliases (the alias-extractor's corpus side).

Reference semantics: wikipedia-document-builder emits ALIASES from the
corpus itself — anchor texts whose target is known — on a side channel,
which the alias-selector then merges with curated aliases
(sling/nlp/wiki/wikipedia-documents.cc:46-424 alias emission,
wiki.h:48-64 AliasSource ANCHOR/LINK bits). Our analog: every RESOLVED
mention is an observed (surface form → entity) pair; aggregating them
yields anchor-alias rows with corpus counts that feed the next
phrase-table build — the standard two-pass alias bootstrap.

This stage is additive and idempotent: run the pipeline with curated
aliases → collect anchor aliases → rebuild the phrase table with
``aliases ∪ anchors`` → re-annotate. Counts from the corpus sharpen the
resolver prior exactly as the reference's anchor counts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.kb import SRC_ANCHOR

ALIAS_SCHEMA_COLS = ["entity", "alias", "fp", "count", "form", "sources"]


def corpus_anchor_aliases(mentions: DataFrame, min_count: int = 2) -> DataFrame:
    """mentions → anchor-alias rows (entity, alias, fp, count, form,
    sources=SRC_ANCHOR). One hash aggregation by (entity, fp); the
    surface form kept is the most frequent one (max_by), form likewise.
    Anaphors are excluded (a pronoun is not an alias), as are literal
    date/number/measure mentions (fp = 0 — a value is not an alias)."""
    base = mentions.filter(~F.col("anaphora") & (F.col("fp") != 0)).groupBy(
        "entity", "fp", F.col("phrase").alias("alias"), "form"
    ).agg(F.count("*").cast("int").alias("variant_count"))
    # ONE max_by over a struct: two independent max_by calls would
    # break a variant_count tie independently and could emit an
    # (alias, form) pair that never co-occurred; the struct ordering
    # key (count, alias, form) also makes ties deterministic
    per_alias = base.groupBy("entity", "fp").agg(
        F.max_by(
            F.struct("alias", "form"),
            F.struct(F.col("variant_count"), F.col("alias"), F.col("form")),
        ).alias("best"),
        F.sum("variant_count").cast("int").alias("count"),
    ).select(
        "entity", "fp",
        F.col("best.alias").alias("alias"),
        F.col("best.form").alias("form"),
        "count",
    )
    return (
        per_alias.filter(F.col("count") >= min_count)
        .withColumn("sources", F.lit(SRC_ANCHOR))
        .select(*ALIAS_SCHEMA_COLS)
    )


def merged_alias_table(curated: DataFrame, anchors: DataFrame) -> DataFrame:
    """Curated ∪ anchor aliases — input to the next select_aliases /
    build_phrase_table round (bootstrap iteration)."""
    return curated.select(*ALIAS_SCHEMA_COLS).unionByName(
        anchors.select(*ALIAS_SCHEMA_COLS)
    )
