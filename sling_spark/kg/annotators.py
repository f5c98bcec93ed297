"""Annotator-chain utilities (SURVEY.md §2.7 remainder + §2.11).

The reference runs a per-document annotator chain registered by name
(REGISTER_ANNOTATOR, sling/nlp/document/annotator.h; chain order
python/nlp/silver.py:105-169). Our chain is a list of DataFrame stage
functions; this module holds the small annotators not covered by the
dedicated stage modules:

| reference (sling/)                    | here                 |
|----------------------------------------|----------------------|
| nlp/silver/types.cc:28-67 (types)      | annotate_types       |
| nlp/silver/types.cc:104 (clear-refs)   | clear_references     |
| nlp/silver/nominal-pruning.cc:74       | prune_low_score      |
| nlp/parser/parser-annotator.cc:62      | mention_names        |
| wikidata-importer.cc:482 (pruner)      | prune_statements     |
| wikidata-importer.cc:251 (splitter)    | split_by_kind        |
| REGISTER_ANNOTATOR registry            | ANNOTATORS + register|
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANNOTATORS: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        ANNOTATORS[name] = fn
        return fn

    return deco


@register("types")
def annotate_types(mentions: DataFrame, items: DataFrame) -> DataFrame:
    """Copy the KB item's types onto each resolved mention (isa
    annotation) — broadcast join against the dimension table."""
    dim = items.select(F.col("id").alias("entity"), F.col("types").alias("types"))
    return mentions.join(F.broadcast(dim), on="entity", how="left").withColumn(
        "types", F.coalesce("types", F.array().cast("array<string>"))
    )


@register("clear-references")
def clear_references(mentions: DataFrame) -> DataFrame:
    """Keep only local annotation columns (projection — clearing external
    store references is a no-op in a columnar world)."""
    keep = [c for c in mentions.columns if not c.startswith("__")]
    return mentions.select(*keep)


@register("prune-low-score")
def prune_low_score(mentions: DataFrame, min_score: float = 0.0) -> DataFrame:
    """Drop weakly-resolved mentions (nominal-pruning analog)."""
    return mentions.filter(F.col("score") > min_score)


@register("mention-names")
def mention_names(mentions: DataFrame, items: DataFrame) -> DataFrame:
    """Attach the canonical entity name to each mention."""
    dim = items.select(F.col("id").alias("entity"), F.col("name").alias("entity_name"))
    return mentions.join(F.broadcast(dim), on="entity", how="left")


def prune_statements(items: DataFrame, drop_pids: set[str]) -> DataFrame:
    """KB slimming: drop statements with the given properties
    (wikidata-pruner) — JVM-side array filter, no explode."""
    pids = F.array(*[F.lit(p) for p in sorted(drop_pids)])
    return items.withColumn(
        "statements",
        F.filter("statements", lambda st: ~F.array_contains(pids, st["pid"])),
    )


def split_by_kind(df: DataFrame, kind_col: str, kinds: list[str]) -> dict[str, DataFrame]:
    """Route one stream into per-kind outputs (wikidata-splitter): one
    filter per output — a single scan serves all when cached."""
    return {k: df.filter(F.col(kind_col) == k) for k in kinds}


@register("document-prologue")
def document_prologue(documents: DataFrame, content_col: str = "content") -> DataFrame:
    """Truncate each document to its first section — everything before
    the first markdown heading line (DocumentPrologueAnnotator,
    sling/nlp/silver/filters.cc:60-83: keep tokens up to the first
    HEADING_BEGIN; our corpus marks sections with '## ' lines). Pure
    Catalyst: one split, no Python. A heading on the document's FIRST
    line truncates to empty (the reference keeps tokens strictly before
    the first heading), hence the (^|\\n) anchor."""
    prologue = F.element_at(F.split(F.col(content_col), r"(^|\n)#{1,6} ", 2), 1)
    return documents.withColumn(content_col, prologue)


def run_chain(df: DataFrame, chain: list[tuple[str, dict]]) -> DataFrame:
    """Execute a named annotator chain (the silver.py:105-169 analog):
    chain = [("types", {"items": items_df}), ("prune-low-score", {})].
    Tables/params travel INSIDE each stage's kwargs dict."""
    out = df
    for name, kwargs in chain:
        fn = ANNOTATORS[name]
        out = fn(out, **kwargs)
    return out


# ---------------------------------------------------------------------------
# span taxonomy (SpanTaxonomy, reference sling/nlp/silver/mentions.h:173-205)
# ---------------------------------------------------------------------------

#: span type flags (the SPAN_* flag analog, chart.h) — bits OR-able
SPAN_PERSON = 1
SPAN_ORG = 2
SPAN_SOFTWARE = 4
SPAN_FORMAT = 8
SPAN_LICENSE = 16
SPAN_CLASS = 32

#: default taxonomy: KB type string → span flag (the type_flags_ map the
#: reference loads from its taxonomy config)
TYPE_FLAGS: dict[str, int] = {
    "person": SPAN_PERSON,
    "organization": SPAN_ORG,
    "language": SPAN_SOFTWARE,
    "framework": SPAN_SOFTWARE,
    "library": SPAN_SOFTWARE,
    "system": SPAN_SOFTWARE,
    "package": SPAN_SOFTWARE,
    "repository": SPAN_SOFTWARE,
    "artifact": SPAN_SOFTWARE,
    "format": SPAN_FORMAT,
    "license": SPAN_LICENSE,
    "class": SPAN_CLASS,
}


def entity_flags(
    items: DataFrame, type_flags: dict[str, int] | None = None,
    depth: int | None = None,
) -> DataFrame:
    """Per-entity span-flag bitmask from the item's types plus types
    inherited through up to ``depth`` hops of P279 — the taxonomy
    classification SpanTaxonomy::Classify performs per candidate item
    (mentions.cc:330-400). Dimension-sized: two broadcast self-joins +
    one hash agg. ``depth`` defaults to the SHARED taxonomy-closure
    depth (kb.FACTS_CLOSURE_DEPTH) so the flag view and the facts view
    traverse the same horizon."""
    if depth is None:
        from ..sources.kb import FACTS_CLOSURE_DEPTH

        depth = FACTS_CLOSURE_DEPTH
    type_flags = type_flags or TYPE_FLAGS
    base = items.select("id", F.explode("types").alias("t"))
    p279 = (
        items.select("id", F.explode("statements").alias("st"))
        .filter(F.col("st.pid") == "P279")
        .select("id", F.col("st.object").alias("parent"))
    )
    all_types = base
    reach = p279
    for _ in range(depth):
        inherited = reach.join(
            F.broadcast(base.withColumnRenamed("id", "parent")), on="parent"
        ).select("id", "t")
        all_types = all_types.unionByName(inherited)
        reach = (
            reach.join(
                F.broadcast(
                    p279.withColumnRenamed("id", "mid").withColumnRenamed(
                        "parent", "gp"
                    )
                ),
                reach["parent"] == F.col("mid"),
            )
            .select("id", F.col("gp").alias("parent"))
        )
    flag = F.lit(0)
    for t, fl in sorted(type_flags.items()):
        flag = F.when(F.col("t") == t, F.lit(fl)).otherwise(flag)
    return (
        all_types.withColumn("flag", flag)
        .groupBy("id")
        .agg(F.expr("bit_or(flag)").cast("int").alias("flags"))
    )


@register("span-taxonomy")
def span_taxonomy(
    mentions: DataFrame, items: DataFrame, type_flags: dict[str, int] | None = None
) -> DataFrame:
    """Annotate resolved mentions with type-based span flags (the
    SpanTaxonomy chart flags, adapted post-resolution: our chart prunes
    lowercase spam via IDF, so the flags here serve downstream filtering
    and typed exports rather than cover-time pruning). Literal and
    unknown-entity mentions get flags = 0. Broadcast join on the
    dimension-sized flag table."""
    ef = entity_flags(items, type_flags)
    return (
        mentions.join(
            F.broadcast(ef.withColumnRenamed("id", "entity")), on="entity", how="left"
        )
        .withColumn("flags", F.coalesce("flags", F.lit(0)))
    )
