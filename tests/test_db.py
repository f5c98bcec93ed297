"""SLINGDB-analog store tests (reference semantics: sling/db/db.cc
PUT/DELETE/NEXT, sling/db/dbprotocol.h modes/results,
sling/db/dbserver.cc HTTP surface)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from sling_spark.db import (
    DBADD,
    DBEXISTS,
    DBNEW,
    DBNEWER,
    DBORDERED,
    DBOVERWRITE,
    DBSTALE,
    DBUNCHANGED,
    DBUPDATED,
    RecordDatabase,
    db_to_dataframe,
    load_dataframe,
    make_db_service,
)


def test_put_modes_matrix():
    db = RecordDatabase()
    # new record is DBNEW in every mode
    assert db.put("a", "1", version=5)[1] == DBNEW
    # identical value -> DBUNCHANGED, version NOT re-stamped (db.cc:479)
    assert db.put("a", "1", version=9)[1] == DBUNCHANGED
    assert db.get("a").version == 5
    # plain overwrite
    assert db.put("a", "2", version=3)[1] == DBUPDATED
    # ADD refuses existing keys
    assert db.put("a", "3", mode=DBADD)[1] == DBEXISTS
    assert db.get("a").value == b"2"
    # ORDERED: lower version than stored nonzero version -> DBSTALE
    assert db.put("a", "4", version=2, mode=DBORDERED)[1] == DBSTALE
    assert db.put("a", "4", version=7, mode=DBORDERED)[1] == DBUPDATED
    # NEWER: lower -> DBSTALE, equal -> DBUNCHANGED even if value differs
    assert db.put("a", "5", version=6, mode=DBNEWER)[1] == DBSTALE
    assert db.put("a", "5", version=7, mode=DBNEWER)[1] == DBUNCHANGED
    assert db.get("a").value == b"4"
    assert db.put("a", "5", version=8, mode=DBNEWER)[1] == DBUPDATED
    # ORDERED against stored version 0 never refuses (db.cc:459)
    db.put("z", "zz", version=0)
    assert db.put("z", "z2", version=0, mode=DBORDERED)[1] == DBUPDATED
    # empty value is reserved for tombstones
    assert db.put("a", "")[0] == -1


def test_delete_and_readd():
    db = RecordDatabase()
    db.put("k", "v", version=4)
    assert db.head("k") == (4, 1)
    assert db.delete("k")
    assert db.get("k") is None
    assert db.head("k") == (0, 0)
    assert not db.delete("k")  # double delete misses (index removed)
    # re-add after delete is NEW even in ADD mode (index was cleared in
    # the reference, db.cc Delete -> index_->Delete)
    assert db.put("k", "v2", mode=DBADD)[1] == DBNEW
    assert db.get("k").value == b"v2"


def test_epoch_monotone_and_next_cursor():
    db = RecordDatabase()
    for i in range(5):
        db.put(f"k{i}", f"v{i}", version=i)
    e1 = db.epoch()
    assert e1 == 5
    db.put("k1", "v1b")      # supersedes recid 1
    db.delete("k3")          # tombstone
    assert db.epoch() == 7   # every mutation advances the epoch
    # full scan sees only latest live versions
    recs, nxt = db.next(0, num=100)
    assert nxt is None
    assert {(r.key, r.value) for r in recs} == {
        (b"k0", b"v0"), (b"k2", b"v2"), (b"k4", b"v4"), (b"k1", b"v1b")}
    # tail-read from a remembered epoch sees exactly the new mutations
    recs, _ = db.next(e1, num=100, deletions=True)
    assert [(r.key, r.deleted) for r in recs] == [
        (b"k1", False), (b"k3", True)]
    # batched iteration with cursor hand-back covers the same set
    out, it = [], 0
    while it is not None:
        recs, it = db.next(it, num=2)
        out.extend(recs)
    assert {r.key for r in out} == {b"k0", b"k1", b"k2", b"k4"}
    # deletion-aware readers always see tombstones, even superseded ones
    db.put("k3", "back")
    recs, _ = db.next(0, num=100, deletions=True)
    assert sum(r.deleted for r in recs) == 1


def test_persistence_roundtrip(tmp_path):
    db = RecordDatabase()
    db.put("x", b"\x00\xffbinary", version=2)
    db.put("y", "text", version=1)
    db.delete("y")
    path = str(tmp_path / "state" / "db.log")
    epoch = db.flush(path)
    db2 = RecordDatabase.open(path)
    assert db2.epoch() == epoch == 3
    assert db2.get("x").value == b"\x00\xffbinary"
    assert db2.get("x").version == 2
    assert db2.get("y") is None
    # resumed store keeps appending at the persisted epoch
    db2.put("z", "new")
    assert db2.epoch() == 4
    # missing file opens an empty store (fresh start)
    db3 = RecordDatabase.open(str(tmp_path / "absent.log"))
    assert db3.epoch() == 0


def test_flush_is_atomic(tmp_path, monkeypatch):
    """A crash mid-flush never leaves a torn log at the final name and
    never litters the state dir with temp files."""
    path = str(tmp_path / "db.log")
    db = RecordDatabase()
    db.put("x", "v1")
    db.flush(path)
    assert [f.name for f in tmp_path.iterdir()] == ["db.log"]

    db.put("y", "v2")
    monkeypatch.setattr(RecordDatabase, "_serialize",
                        lambda self: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(OSError):
        db.flush(path)
    # the previous complete log survives, the temp file is cleaned up
    assert [f.name for f in tmp_path.iterdir()] == ["db.log"]
    db2 = RecordDatabase.open(path)
    assert db2.epoch() == 1 and db2.get("x").value == b"v1"


def test_read_only():
    db = RecordDatabase(read_only=True)
    assert db.put("a", "1")[1] == 5  # DBFAULT
    assert not db.delete("a")


@pytest.fixture()
def http_db():
    db = RecordDatabase()
    server = make_db_service({"test": db})
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield db, f"http://{host}:{port}"
    server.shutdown()


def _req(url, method="GET", data=None, headers=None):
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_http_surface(http_db):
    db, base = http_db
    # PUT with Mode/Version headers -> Result/RecordID reply headers
    st, body, hdrs = _req(f"{base}/db/test/alpha", "PUT", b"hello",
                          {"Version": "3", "Mode": "ordered"})
    assert st == 200 and hdrs["Result"] == "new"
    st, _, hdrs = _req(f"{base}/db/test/alpha", "PUT", b"bye",
                       {"Version": "1", "Mode": "ordered"})
    assert hdrs["Result"] == "stale"
    # GET single record returns value + Version header
    st, body, hdrs = _req(f"{base}/db/test/alpha")
    assert (st, body, hdrs["Version"]) == (200, b"hello", "3")
    # HEAD reports existence without a body
    st, body, hdrs = _req(f"{base}/db/test/alpha", "HEAD")
    assert st == 200 and hdrs["Version"] == "3" and body == b""
    # cursor batch fetch with Next handoff
    _req(f"{base}/db/test/beta", "PUT", b"b2")
    st, body, hdrs = _req(f"{base}/db/test?id=0&n=1")
    batch = json.loads(body)
    assert len(batch) == 1 and batch[0]["key"] == "alpha"
    st, body, _ = _req(f"{base}/db/test?id={hdrs['Next']}&n=10")
    assert [r["key"] for r in json.loads(body)] == ["beta"]
    # OPTIONS -> database info incl. epoch
    st, body, _ = _req(f"{base}/db/test", "OPTIONS")
    info = json.loads(body)
    assert info["epoch"] == db.epoch() == 2 and info["records"] == 2
    # DELETE then 404 on fetch
    st, _, _ = _req(f"{base}/db/test/alpha", "DELETE")
    assert st == 200
    st, _, _ = _req(f"{base}/db/test/alpha")
    assert st == 404
    # unknown database 404s
    st, _, _ = _req(f"{base}/db/nope/k")
    assert st == 404
    # clear
    st, _, _ = _req(f"{base}/db/test?clear=1", "POST")
    assert st == 200 and db.epoch() == 0


def test_spark_bulk_interface(spark):
    db = RecordDatabase()
    df = spark.createDataFrame(
        [("q1", b"frame1", 2), ("q2", b"frame2", 1), ("q3", b"", 9)],
        "key string, value binary, version long")
    counts = load_dataframe(db, df, mode=DBORDERED)
    assert counts["new"] == 2
    assert db.get("q3") is None  # empty value rows arrive as deletions
    # second ordered load with a stale and a newer row
    df2 = spark.createDataFrame(
        [("q1", b"frame1-old", 1), ("q2", b"frame2-new", 5)],
        "key string, value binary, version long")
    counts = load_dataframe(db, df2, mode=DBORDERED)
    assert counts["stale"] == 1 and counts["updated"] == 1
    out = {(r["key"], bytes(r["value"]), r["version"])
           for r in db_to_dataframe(spark, db).collect()}
    assert out == {("q1", b"frame1", 2), ("q2", b"frame2-new", 5)}


def test_db_as_delta_transport(spark):
    """The SLINGDB role in the wikidaily loop (reference:
    python/crawl/wikidaily.py PUTs revisions into SLINGDB; downstream
    readers pull the tail since their last epoch): delta revisions are
    PUT into the epoch store (ordered mode, revision as version),
    tombstones as deletions; the consumer reads the epoch TAIL via
    next(deletions=True), reconstructs the delta batch, and
    apply_kb_delta over it equals a full rebuild. Replaying the same
    batch is all-unchanged and yields an empty tail (idempotent
    ingest)."""
    import json as _json

    from sling_spark.db import DBORDERED, DBUNCHANGED, RecordDatabase
    from sling_spark.kg.assets import ITEMS_DDL, seed_dataframes
    from sling_spark.kg.delta import (
        apply_kb_delta,
        demo_delta_rows,
        demo_sources,
        full_rebuild,
    )
    from sling_spark.kg.xref import build_clusters

    db = RecordDatabase()
    epoch0 = db.epoch()

    # producer side: one PUT/DELETE per revision row
    for row in demo_delta_rows():
        key = f"{row['id']}@{row['source_priority']}"
        if row["deleted"]:
            db.put(key, "__seed__")  # simulate a pre-existing row
            db.delete(key)
        else:
            version = 1
            rec = {k: v for k, v in row.items() if k != "deleted"}
            _, res = db.put(key, _json.dumps(rec, sort_keys=True),
                            version=version, mode=DBORDERED)
    epoch1 = db.epoch()
    assert epoch1 > epoch0

    # consumer side: tail since epoch0 -> delta DataFrame
    recs, _ = db.next(epoch0, num=1 << 30, deletions=True)
    rows = []
    for r in recs:
        rid, prio = r.key.decode().rsplit("@", 1)
        if r.deleted:
            rows.append({"id": rid, "source_priority": int(prio),
                         "deleted": True, "name": None, "types": [],
                         "statements": []})
        else:
            rows.append(dict(_json.loads(r.value), deleted=False))
    delta = spark.createDataFrame(
        rows, schema=ITEMS_DDL + ", source_priority int, deleted boolean")

    seed = seed_dataframes(spark)
    clusters = build_clusters(seed["same_as"])
    sources, direct_delta = demo_sources(spark)
    base = full_rebuild(sources, clusters)
    via_db = apply_kb_delta(spark, sources, delta, clusters, base)
    direct = apply_kb_delta(spark, sources, direct_delta, clusters, base)
    assert _kb_rows(via_db["kb_items"]) == _kb_rows(direct["kb_items"])
    assert _kb_rows(via_db["kb_items"]) == _kb_rows(
        full_rebuild(via_db["sources"], clusters))

    # replay: every live row unchanged, no new tail for the consumer
    for row in demo_delta_rows():
        if not row["deleted"]:
            rec = {k: v for k, v in row.items() if k != "deleted"}
            _, res = db.put(f"{row['id']}@{row['source_priority']}",
                            _json.dumps(rec, sort_keys=True),
                            version=1, mode=DBORDERED)
            assert res == DBUNCHANGED
    recs2, _ = db.next(epoch1, num=1 << 30, deletions=True)
    assert recs2 == []


def _kb_rows(df):
    out = set()
    for r in df.collect():
        sts = tuple(sorted(
            (s["pid"], s["object"],
             tuple(sorted((s["qualifiers"] or {}).items())))
            for s in (r["statements"] or [])))
        out.add((r["id"], r["name"], tuple(sorted(r["types"] or [])), sts))
    return out


def test_http_keepalive_exhausted_cursor(http_db):
    """An exhausted batch cursor must answer 200 with a JSON body, never
    204-with-body: the handler speaks keep-alive HTTP/1.1, and a body on
    a 204 would desynchronize the next request on the same connection."""
    import http.client

    db, base = http_db
    db.put("k1", "v1", version=1)
    host, port = base.rsplit("://", 1)[1].rsplit(":", 1)
    conn = http.client.HTTPConnection(host, int(port))
    try:
        # drain the log, then poll the exhausted cursor on the SAME
        # connection and make a third request after it
        conn.request("GET", "/db/test?id=0&n=10")
        r1 = conn.getresponse()
        batch = json.loads(r1.read())
        assert [b["key"] for b in batch] == ["k1"]
        nxt = db.epoch()
        conn.request("GET", f"/db/test?id={nxt}&n=10")
        r2 = conn.getresponse()
        assert r2.status == 200 and json.loads(r2.read()) == []
        assert r2.getheader("Next") is None  # DBDONE analog
        conn.request("GET", "/db/test/k1")
        r3 = conn.getresponse()
        assert (r3.status, r3.read()) == (200, b"v1")
    finally:
        conn.close()


def test_head_has_size_without_body(http_db):
    db, base = http_db
    db.put("big", "x" * 4096, version=7)
    st, body, hdrs = _req(f"{base}/db/test/big", "HEAD")
    assert st == 200 and body == b""
    assert hdrs["Content-Length"] == "4096" and hdrs["Version"] == "7"


def test_bulk_load_null_version_tombstone(spark):
    """A delta tombstone row (value NULL, version NULL — the natural
    shape, whose version is meaningless) must delete, not crash on
    int(None); deletions are counted."""
    db = RecordDatabase()
    df = spark.createDataFrame(
        [("q1", b"frame1", 2), ("q2", b"frame2", 1)],
        "key string, value binary, version long")
    load_dataframe(db, df, mode=DBORDERED)
    delta = spark.createDataFrame(
        [("q1", None, None), ("q3", b"frame3", None)],
        "key string, value binary, version long")
    counts = load_dataframe(db, delta, mode=DBORDERED)
    assert counts["deleted"] == 1 and counts["new"] == 1
    assert db.get("q1") is None
    assert db.get("q3").version == 0  # NULL version on a live row -> 0
    assert db.get("q2").version == 1  # untouched


def test_relative_path_persistence(tmp_path, monkeypatch):
    """flush/open accept RELATIVE paths: 'file://rel' would parse the
    first segment as a hostname and raise ArrowInvalid."""
    from sling_spark.db import RecordDatabase

    monkeypatch.chdir(tmp_path)
    db = RecordDatabase()
    db.put("k1", "v1", version=1)
    db.flush("ckpt/db.log")
    back = RecordDatabase.open("ckpt/db.log")
    assert back.get("k1").value == b"v1"


def test_load_dataframe_noop_tombstone_counts_unchanged(spark):
    """A tombstone for an absent key is a no-op: it must count as
    'unchanged', not 'deleted' — the epoch did not advance and NEXT
    readers will never see a deletion, so reporting it applied would
    hide a lost retraction."""
    from sling_spark.db import RecordDatabase, load_dataframe

    db = RecordDatabase()
    db.put("present", "v", version=1)
    df = spark.createDataFrame(
        [("present", None, None), ("absent", None, None)],
        "key string, value string, version long",
    )
    counts = load_dataframe(db, df)
    assert counts["deleted"] == 1 and counts["unchanged"] == 1
    assert db.get("present") is None
