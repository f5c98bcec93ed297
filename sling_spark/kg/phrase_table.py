"""Alias selection + phrase-table build.

Reference semantics:
- alias-selector groups alias variants per item, folds near-duplicate
  variants (edit distance bounded) transferring their counts, applies
  count/form thresholds (sling/nlp/wiki/aliases.cc:246-624).
- phrase-table-builder groups selected aliases by phrase fingerprint and
  stores, per fp, entity entries sorted for lookup
  (sling/nlp/kb/phrase-table-builder.cc:36-237); the table records its
  normalization ("lcn", builder :105-107) and is memory-mapped by every
  annotator worker — our analog is a Spark broadcast dict.

Plan shape: one applyInPandas per entity (tiny groups) for variant
folding, then one hash aggregation by fp. Both shuffles are on keys with
KB-sized cardinality (items / phrases), far below corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_phrase

SELECTED_SCHEMA = (
    "entity string, alias string, fp long, count int, form int, "
    "sources int, reliable boolean"
)


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if abs(len(a) - len(b)) > 1:
        return 2  # caller only cares about <=1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _select_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Variant folding + selection for one entity.

    Deterministic: variants ordered by (count desc, alias asc); a lower
    variant whose normalized text is within edit distance 1 of an
    already-kept variant folds its count into that variant
    (aliases.cc transfer-counts semantics, :505-560).
    """
    min_count = int(pdf["min_count"].iloc[0])
    rows = pdf.sort_values(
        ["count", "alias"], ascending=[False, True], kind="mergesort"
    ).to_dict("records")
    kept: list[dict] = []
    for r in rows:
        norm = normalize_phrase(r["alias"])
        target = None
        for k in kept:
            if _levenshtein(norm, k["_norm"]) <= 1:
                target = k
                break
        if target is not None and target["_norm"] != norm:
            target["count"] += r["count"]
            target["sources"] |= r["sources"]
        elif target is not None:
            # same normalized phrase (case variant): merge counts, keep
            # majority form (already sorted by count, so first wins form)
            target["count"] += r["count"]
            target["sources"] |= r["sources"]
        else:
            r = dict(r)
            r["_norm"] = norm
            kept.append(r)
    out = [
        {
            "entity": k["entity"],
            "alias": k["alias"],
            "fp": k["fp"],
            "count": k["count"],
            "form": k["form"],
            "sources": k["sources"],
            "reliable": bool(k["sources"] & 3),  # SRC_NAME|SRC_ALIAS
        }
        for k in kept
        if k["count"] >= min_count
    ]
    return pd.DataFrame(
        out,
        columns=["entity", "alias", "fp", "count", "form", "sources", "reliable"],
    )


def select_aliases(aliases: DataFrame, min_count: int = 2) -> DataFrame:
    """Per-entity alias variant folding + thresholding (aliases.cc
    Reduce semantics)."""
    return (
        aliases.withColumn("min_count", F.lit(min_count))
        .groupBy("entity")
        .applyInPandas(_select_group, schema=SELECTED_SCHEMA)
    )


def build_phrase_table(selected: DataFrame) -> DataFrame:
    """fp → sorted candidate list. Entries per (fp, entity) are merged
    (counts summed, majority form), then sorted by (count desc, entity)
    as the lookup order (phrase-table-builder.cc:100-170 Flush)."""
    per_entity = selected.groupBy("fp", "entity").agg(
        F.sum("count").cast("int").alias("count"),
        F.max_by("form", "count").alias("form"),
        F.max("reliable").alias("reliable"),
    )
    entry = F.struct(
        (-F.col("count")).alias("neg_count"),  # sort key: count desc
        F.col("entity"),  # then entity asc
        F.col("count"),
        F.col("form"),
        F.col("reliable"),
    )
    return (
        per_entity.groupBy("fp")
        .agg(F.array_sort(F.collect_list(entry)).alias("entries"))
        .select(
            "fp",
            F.transform(
                "entries",
                lambda e: F.struct(
                    e["entity"].alias("entity"),
                    e["count"].alias("count"),
                    e["form"].alias("form"),
                    e["reliable"].alias("reliable"),
                ),
            ).alias("entries"),
        )
    )


def build_name_table(selected: DataFrame) -> DataFrame:
    """Sorted (normalized name → entities) table for prefix search —
    the name-table-builder analog (sling/nlp/kb/name-table-builder.cc:
    34-240). Serving-side artifact: ORDER BY makes the parquet row
    groups range-prunable on the name prefix."""
    norm = F.lower(F.col("alias"))
    return (
        selected.select(
            norm.alias("name"),
            F.struct(
                F.col("entity"), F.col("count"), F.col("form")
            ).alias("entry"),
        )
        .groupBy("name")
        .agg(F.array_sort(F.collect_list("entry")).alias("entries"))
        .orderBy("name")
    )


def phrase_table_dict(phrase_table: DataFrame) -> dict[int, list[tuple]]:
    """Collect the phrase table into a broadcastable dict
    {fp: [(entity, count, form, reliable), ...]} — the analog of
    memory-mapping the phrase-table repository on every worker
    (sling/nlp/kb/phrase-table.h:60-62 Acquire).

    The KB-side tables are dimension-sized (items/aliases), not
    corpus-sized; at 100 TB corpus the phrase table is still ~GBs.
    A table that outgrows driver collect/broadcast uses the Parquet-
    backed worker-side store instead (assets.build_asset_store /
    AssetStore): no driver materialization at all — workers lazily read
    the Parquet per process, the repository memory-map analog.
    """
    rows = phrase_table.collect()
    out: dict[int, list[tuple]] = {}
    for r in rows:
        entries = [
            (e["entity"], e["count"], e["form"], e["reliable"]) for e in r["entries"]
        ]
        # deterministic lookup order: count desc, entity asc
        entries.sort(key=lambda t: (-t[1], t[0]))
        out[r["fp"]] = entries
    return out
