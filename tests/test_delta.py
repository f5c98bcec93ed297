"""Incremental KB delta maintenance tests (wikidaily analog,
round-3 verdict item 8): apply-delta must equal a full rebuild while
re-reconciling only the touched canonical ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from sling_spark.kg.assets import ITEMS_DDL, seed_dataframes
from sling_spark.kg.delta import (
    apply_kb_delta,
    delta_triples,
    demo_sources,
    full_rebuild,
)
from sling_spark.kg.xref import build_clusters


def _item_rows(df):
    out = set()
    for r in df.collect():
        sts = tuple(
            sorted(
                (s["pid"], s["object"], tuple(sorted((s["qualifiers"] or {}).items())))
                for s in (r["statements"] or [])
            )
        )
        out.add((r["id"], r["name"], tuple(sorted(r["types"] or [])), sts))
    return out


def test_delta_equals_full_rebuild(spark):
    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, delta = demo_sources(spark)
    base = full_rebuild(sources, clusters)

    res = apply_kb_delta(spark, sources, delta, clusters, base)
    expected = full_rebuild(res["sources"], clusters)
    assert _item_rows(res["kb_items"]) == _item_rows(expected)

    # the incremental claim: touched is a strict subset of the KB
    n_touched = res["touched"].count()
    n_all = base.count()
    assert 0 < n_touched < n_all

    # the delta actually changed things: new item present, P4 retracted
    # from Q1 (revision dropped it AND the github fragment tombstone
    # removed the duplicate), new inverse P108 flowed to Q3's item
    triples = {tuple(r) for r in delta_triples(res["kb_items"]).collect()}
    base_triples = {tuple(r) for r in delta_triples(base).collect()}
    assert ("Q99", "P1", "Q2") in triples
    assert ("Q99", "P6", "2020-01-01") in triples
    assert ("Q1", "P4", "Q60") in base_triples
    assert ("Q1", "P4", "Q60") not in triples
    assert ("Q3", "P108", "Q1") in triples          # inverse of new P7→Q3
    assert ("Q3", "P108", "Q1") not in base_triples
    assert ("Q2", "P101", "Q99") in triples         # inverse from the new item


def test_delta_deletion_removes_vanished_item(spark):
    """A canonical id whose only source row is tombstoned disappears
    from the maintained table (anti-join removal, nothing re-adds)."""
    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, _ = demo_sources(spark)
    base = full_rebuild(sources, clusters)

    lone = spark.createDataFrame(
        [{"id": "Q77", "source_priority": 1, "deleted": False,
          "name": "Ephemeral", "types": [],
          "statements": [{"pid": "P2", "object": "Q15", "qualifiers": {}}]}],
        schema=ITEMS_DDL + ", source_priority int, deleted boolean",
    )
    res1 = apply_kb_delta(spark, sources, lone, clusters, base)
    assert ("Q77", "P2", "Q15") in {
        tuple(r) for r in delta_triples(res1["kb_items"]).collect()
    }
    tomb = lone.withColumn("deleted", F.lit(True))
    res2 = apply_kb_delta(
        spark, res1["sources"], tomb, clusters, res1["kb_items"]
    )
    ids = {r["id"] for r in res2["kb_items"].select("id").collect()}
    assert "Q77" not in ids
    assert _item_rows(res2["kb_items"]) == _item_rows(
        full_rebuild(res2["sources"], clusters)
    )
