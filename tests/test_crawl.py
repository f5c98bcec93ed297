"""Crawl/monitor service tests (wikidaily + wikimonitor analogs).

The reference behaviors pinned here:
  * wikidaily.py:88-113 — stub-page scan: non-Q titles skipped, QID
    range filter, latest revision WITHIN the revision range.
  * wikidaily.py:116-156 — current-version skip, redirect frames,
    fetch+convert+ordered PUT with Version=revision.
  * wikimonitor.py:154-226 — edit/new/log-delete handling, redirect
    comment detection, checkpoint every N changes.
  * sse.py:74-106 — SSE message framing.
"""

from __future__ import annotations

import json

import pytest

from sling_spark import crawl
from sling_spark.db import DBORDERED, RecordDatabase


def _entity(qid, label, claims=()):
    return {
        "id": qid,
        "labels": {"en": {"language": "en", "value": label}},
        "claims": {
            pid: [{"mainsnak": {"datavalue": {
                "type": "wikibase-entityid",
                "value": {"entity-type": "item", "id": obj}}},
                "rank": "normal"}]
            for pid, obj in claims
        },
    }


STUB_XML = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
<page>
  <title>Q1</title><ns>0</ns><id>101</id>
  <revision><id>5</id></revision>
  <revision><id>9</id></revision>
  <revision><id>7</id></revision>
</page>
<page>
  <title>Q2</title><ns>0</ns><id>102</id>
  <revision><id>50</id></revision>
  <revision><id>120</id></revision>
</page>
<page>
  <title>Q3</title><ns>0</ns><id>103</id>
  <redirect title="Q1" />
  <revision><id>8</id></revision>
</page>
<page>
  <title>Help:Editing</title><ns>12</ns><id>104</id>
  <revision><id>77</id></revision>
</page>
<page>
  <title>Q900</title><ns>0</ns><id>105</id>
  <revision><id>6</id></revision>
</page>
</mediawiki>
"""


@pytest.fixture()
def stub_path(tmp_path):
    p = tmp_path / "stubs.xml"
    p.write_text(STUB_XML)
    return str(p)


@pytest.fixture()
def fetch_dir(tmp_path):
    d = tmp_path / "fetches"
    d.mkdir()
    # Q1 archived at the exact revision, wrapped Special:EntityData style
    (d / "Q1@9.json").write_text(json.dumps(
        {"entities": {"Q1": _entity("Q1", "alpha", [("P31", "Q5")])}}))
    # bare latest-fetch files (no @revision)
    (d / "Q1.json").write_text(json.dumps(_entity("Q1", "alpha latest")))
    (d / "Q2.json").write_text(json.dumps(_entity("Q2", "beta")))
    return str(d)


def test_stub_revision_selection(spark, stub_path):
    rows = {r["qid"]: r for r in crawl.stub_revisions(
        spark, stub_path, max_qid=899, max_rev=100).collect()}
    # Help: page and out-of-range Q900 dropped entirely
    assert set(rows) == {"Q1", "Q2", "Q3"}
    assert rows["Q1"]["revision"] == 9          # latest of 5/9/7
    assert rows["Q2"]["revision"] == 50         # 120 is beyond max_rev
    assert rows["Q3"]["redirect"] == "Q1"
    assert rows["Q1"]["redirect"] is None


def test_stub_parse_is_splittable(spark, stub_path):
    # Tiny chunk size → >1 byte-range task, identical selection
    whole = {(r["qid"], r["revision"]) for r in
             crawl.stub_revisions(spark, stub_path).collect()}
    split = {(r["qid"], r["revision"]) for r in
             crawl.stub_revisions(spark, stub_path,
                                  chunk_bytes=200).collect()}
    assert whole == split and len(whole) == 4  # Q900 in range here


def test_wikidaily_ingest_roundtrip(spark, stub_path, fetch_dir):
    db = RecordDatabase()
    cand = crawl.stub_revisions(spark, stub_path, max_qid=899, max_rev=100)
    fetcher = crawl.DirectoryFetcher(fetch_dir)
    counts = crawl.wikidaily_ingest(db, cand, fetcher)
    assert counts["new"] == 3 and counts["redirects"] == 1
    assert counts["not_found"] == 0 and counts["errors"] == 0

    item = json.loads(db.get("Q1").value)
    assert item["name"] == "alpha"
    assert item["statements"][0]["pid"] == "P31"
    assert db.get("Q1").version == 9
    assert json.loads(db.get("Q3").value) == {"id": "Q3", "redirect": "Q1"}

    # replay with the version check: everything already current
    counts2 = crawl.wikidaily_ingest(
        db, crawl.pending_updates(cand, db), fetcher, check_revision=True)
    assert sum(counts2.values()) == 0  # pending_updates drained them all

    # a stale candidate (lower revision) is refused by ordered PUT
    counts3 = crawl.wikidaily_ingest(db, [("Q1", 4, None)], fetcher)
    assert counts3["not_found"] == 1 or counts3["stale"] == 1


def test_pending_updates_filter(spark, stub_path, fetch_dir):
    db = RecordDatabase()
    db.put("Q1", "cached", version=9, mode=DBORDERED)   # already current
    db.put("Q2", "cached", version=10, mode=DBORDERED)  # behind (50 > 10)
    cand = crawl.stub_revisions(spark, stub_path, max_qid=899, max_rev=100)
    left = {r["qid"] for r in crawl.pending_updates(cand, db).collect()}
    assert left == {"Q2", "Q3"}


def test_sse_parsing():
    raw = (b": comment to ignore\n"
           b"id: 77\nevent: message\ndata: {\"a\": 1,\ndata:  \"b\": 2}\n\n"
           b"retry: 5000\nevent: message\ndata: tail\n\n")
    events = list(crawl.parse_sse([raw[:25], raw[25:]]))
    assert len(events) == 2
    assert events[0]["id"] == "77"
    # field values are stripped per message line (sse.py:91)
    assert events[0]["data"] == b"{\"a\": 1,\n\"b\": 2}"
    assert events[1]["retry"] == 5000 and events[1]["data"] == b"tail"


def test_recent_changes_filtering():
    def ev(data):
        return {"event": "message", "data": json.dumps(data).encode()}

    stream = [
        {"event": "ping", "data": b"x"},                      # not message
        ev({"wiki": "enwiki", "title": "Q1"}),                # wrong wiki
        ev({"wiki": "wikidatawiki", "title": "Talk:Q1"}),     # wrong ns
        ev({"wiki": "wikidatawiki", "title": "Q1", "type": "edit"}),
        ev({"wiki": "wikidatawiki", "title": "Property:P6", "type": "edit"}),
        {"event": "message", "data": b"{broken json wikidatawiki"},
    ]
    got = [c["title"] for c in crawl.recent_changes(stream)]
    assert got == ["Q1", "Property:P6"]


def test_monitor_changes_and_checkpoint(tmp_path, fetch_dir):
    db = RecordDatabase()
    ckpt = str(tmp_path / "state" / "ckpt")
    fetcher = crawl.DirectoryFetcher(fetch_dir)

    def change(title, kind="edit", rev=0, ts=0, **kw):
        c = {"wiki": "wikidatawiki", "title": title, "type": kind,
             "timestamp": ts, "comment": "", **kw}
        if kind in ("edit", "new"):
            c["revision"] = {"new": rev}
        return c

    changes = [
        change("Q1", "new", rev=9, ts=1000),
        change("Q2", "edit", rev=12, ts=1010),
        change("Q3", "edit", rev=3, ts=1020,
               comment="/* wbcreateredirect:0||Q3|Q1 */"),
        change("Q2", "edit", rev=11, ts=1030),          # stale revision
        change("Q1", "log", ts=1040, log_action="delete"),
        change("Q77", "edit", rev=2, ts=1050),          # no fetch file
    ]
    counts = crawl.monitor_changes(db, changes, fetcher,
                                   checkpoint=ckpt, checkpoint_interval=2)
    assert counts == {"new": 3, "stale": 1, "deleted": 1, "not_found": 1}
    assert db.get("Q1") is None                  # deleted after ingest
    assert db.get("Q2").version == 12            # stale 11 refused
    assert json.loads(db.get("Q3").value)["redirect"] == "Q1"
    assert crawl.read_checkpoint(ckpt) == 1050   # final checkpoint
    assert crawl.read_checkpoint(str(tmp_path / "nope")) is None


def test_monitor_threaded_matches_serial(tmp_path):
    # one fetch file per (qid, revision) with revision-dependent content,
    # so ordered PUTs resolve any worker interleaving to max-revision
    d = tmp_path / "revfetches"
    d.mkdir()
    for i in range(40):
        qid, rev = f"Q{1 + (i % 2)}", 100 + i
        (d / f"{qid}@{rev}.json").write_text(
            json.dumps(_entity(qid, f"label r{rev}")))
    fetcher = crawl.DirectoryFetcher(str(d))

    def changes():
        return [{"wiki": "wikidatawiki", "title": f"Q{1 + (i % 2)}",
                 "type": "edit", "timestamp": i, "comment": "",
                 "revision": {"new": 100 + i}} for i in range(40)]

    serial, threaded = RecordDatabase(), RecordDatabase()
    crawl.monitor_changes(serial, changes(), fetcher)
    crawl.monitor_changes(threaded, changes(), fetcher, threads=4)
    for db in (serial, threaded):
        assert db.get("Q1").version == 138 and db.get("Q2").version == 139
        assert json.loads(db.get("Q2").value)["name"] == "label r139"


def test_db_tail_items_bridge(spark, fetch_dir):
    """Crawled tail → the apply_kb_delta input shape + redirect edges."""
    db = RecordDatabase()
    fetcher = crawl.DirectoryFetcher(fetch_dir)
    epoch0 = db.epoch()
    crawl.wikidaily_ingest(
        db, [("Q1", 9, None), ("Q2", 12, None), ("Q3", 8, "Q1")], fetcher)
    db.put("Q9", "junk", version=1, mode=DBORDERED)
    db.delete("Q9")

    items, redirects = crawl.db_tail_items(spark, db, epoch0)
    rows = {r["id"]: r.asDict(recursive=True) for r in items.collect()}
    assert rows["Q1"]["deleted"] is False
    assert rows["Q1"]["statements"][0]["pid"] == "P31"
    assert rows["Q9"]["deleted"] is True and rows["Q9"]["statements"] == []
    assert redirects.collect()[0].asDict() == {"from_id": "Q3", "to_id": "Q1"}
    # the shape is exactly the delta input: columns + nested struct
    from sling_spark.kg.assets import ITEMS_DDL

    expect = spark.createDataFrame([], ITEMS_DDL +
                                   ", source_priority int, deleted boolean")
    assert items.schema == expect.schema


def test_wikidaily_cli(tmp_path, stub_path, fetch_dir):
    """The service entrypoint end-to-end: daily ingest then a monitor
    replay against the persisted store."""
    import subprocess
    import sys as _sys

    dbfile = str(tmp_path / "kb.db")
    out = subprocess.run(
        [_sys.executable, "tools/wikidaily.py", "daily", "--db", dbfile,
         "--stubs", stub_path, "--fetch-dir", fetch_dir,
         "--maxqid", "899", "--maxrev", "100"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["counts"]["new"] == 3
    assert summary["counts"]["redirects"] == 1

    import pathlib

    pathlib.Path(fetch_dir, "Q2@500.json").write_text(
        json.dumps(_entity("Q2", "beta v500")))
    events = tmp_path / "changes.jsonl"
    events.write_text(json.dumps(
        {"wiki": "wikidatawiki", "title": "Q2", "type": "edit",
         "timestamp": 2000, "comment": "", "revision": {"new": 500}}) + "\n")
    out2 = subprocess.run(
        [_sys.executable, "tools/wikidaily.py", "monitor", "--db", dbfile,
         "--events", str(events), "--fetch-dir", fetch_dir,
         "--checkpoint", str(tmp_path / "ckpt")],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    summary2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert summary2["counts"] == {"updated": 1}
    assert summary2["epoch"] > summary["epoch"]

    db = RecordDatabase.open(dbfile)
    assert db.get("Q2").version == 500


def test_sse_crlf_framing():
    """SSE allows CRLF (and CR) line terminators; a CRLF-framed capture
    must still frame — including when the CRLF pair is split across
    chunk boundaries."""
    raw = b"event: message\r\ndata: one\r\n\r\nevent: message\rdata: two\r\r"
    # split INSIDE the first \r\n\r\n so a held CR crosses a chunk edge
    cut = raw.find(b"\r\n\r\n") + 1
    events = list(crawl.parse_sse([raw[:cut], raw[cut:]]))
    assert [e["data"] for e in events] == [b"one", b"two"]
    # single-byte chunks: every CR/LF straddles a boundary
    events = list(crawl.parse_sse([bytes([b]) for b in raw]))
    assert [e["data"] for e in events] == [b"one", b"two"]


def test_monitor_threaded_checkpoint_is_prefix_safe(tmp_path):
    """With threads>1, the interval checkpoint must never record a
    timestamp ahead of a still-unfinished earlier event: a crash after
    that write would make the ?since= restart skip the earlier event
    forever. The fetcher below stalls the FIRST event until the second
    has completed, so a last-completed-wins checkpoint would record
    ts=2000 while ts=1000 is still in flight.

    The two titles MUST route to different workers (checked below) or
    the stall never overlaps anything: with both on one worker the
    second change just queues behind the first, the stall only releases
    via the watcher's fallback timeout, and the test (a) burns the full
    timeout every run, (b) races the fetcher's own guard timeout —
    flaky under host load — and (c) never exercises the out-of-order
    scenario it exists for (Q1 and Q2 both crc32-route to worker 0 at
    threads=2, which is exactly how it used to pass vacuously)."""
    import threading as _threading
    import zlib as _zlib

    first_may_finish = _threading.Event()
    second_done = _threading.Event()
    ckpt = str(tmp_path / "ckpt")

    class StallFirstFetcher:
        def fetch(self, qid, revision):
            if qid == "Q1":
                # wait until the second change is fully processed (incl.
                # its checkpoint opportunity); guard with a timeout so a
                # bug fails the test instead of hanging it
                assert first_may_finish.wait(timeout=60)
            return json.dumps(_entity(qid, f"{qid} r{revision}"))

    db = RecordDatabase()

    def change(title, rev, ts):
        return {"wiki": "wikidatawiki", "title": title, "type": "edit",
                "timestamp": ts, "comment": "", "revision": {"new": rev}}

    # Q1 -> worker 0, Q7 -> worker 1 under the monitor's crc32 routing;
    # pin that so a routing change cannot silently make this vacuous.
    assert _zlib.crc32(b"Q1") % 2 != _zlib.crc32(b"Q7") % 2
    changes = [change("Q1", 5, 1000), change("Q7", 6, 2000)]

    orig_process = crawl.process_change
    orig_write = crawl._write_checkpoint
    q1_done = _threading.Event()
    writes: list[tuple[int, bool]] = []  # (ts written, was Q1 done?)

    def tracking_process(db_, ch, fetcher, **kw):
        out = orig_process(db_, ch, fetcher, **kw)
        if ch["title"] == "Q7":
            second_done.set()
        else:
            q1_done.set()
        return out

    def tracking_write(path, ts):
        writes.append((ts, q1_done.is_set()))
        orig_write(path, ts)

    # releases the stall as soon as the second change has completed; the
    # timeout is only a deadlock guard (shorter than the fetcher's 60 s
    # assert guard so a genuine deadlock fails on the fetcher side with
    # the monitor still completing)
    watcher = _threading.Thread(
        target=lambda: (second_done.wait(timeout=30),
                        first_may_finish.set()),
        daemon=True,
    )
    watcher.start()
    try:
        crawl.process_change = tracking_process
        crawl._write_checkpoint = tracking_write
        crawl.monitor_changes(db, changes, StallFirstFetcher(),
                              checkpoint=ckpt, checkpoint_interval=1,
                              threads=2)
    finally:
        crawl.process_change = orig_process
        crawl._write_checkpoint = orig_write
    # the at-least-once invariant: ts=2000 may only be checkpointed once
    # Q1 (ts=1000) has completed — a crash at any earlier write must
    # leave Q1 replayable
    for ts, q1_was_done in writes:
        assert ts < 2000 or q1_was_done, f"checkpointed {ts} before Q1 done"
    # final checkpoint (all done) is the full prefix
    assert crawl.read_checkpoint(ckpt) == 2000
    # and the store holds both events — nothing was skipped
    assert db.get("Q1").version == 5 and db.get("Q7").version == 6


def test_monitor_threaded_survives_fetcher_errors(tmp_path):
    """A per-change failure must be logged-and-skipped (counted 'error',
    wikimonitor.py:198-202), NOT kill the worker thread — dead workers
    deadlock the bounded queue / queue.join() forever."""
    d = tmp_path / "errfetches"
    d.mkdir()
    for rev in range(100, 120):
        (d / f"Q1@{rev}.json").write_text(json.dumps(_entity("Q1", f"r{rev}")))

    class FlakyFetcher:
        def __init__(self, inner):
            self.inner = inner

        def fetch(self, qid, revision):
            if qid == "Q666":
                raise RuntimeError("boom")
            return self.inner.fetch(qid, revision)

    fetcher = FlakyFetcher(crawl.DirectoryFetcher(str(d)))
    changes = []
    for i in range(20):
        title = "Q666" if i % 3 == 0 else "Q1"
        changes.append({"wiki": "wikidatawiki", "title": title,
                        "type": "edit", "timestamp": 2000 + i, "comment": "",
                        "revision": {"new": 100 + i}})
    ckpt = str(tmp_path / "errs" / "ckpt")
    counts = crawl.monitor_changes(
        RecordDatabase(), changes, fetcher, threads=2,
        checkpoint=ckpt, checkpoint_interval=4)
    assert counts["error"] == 7
    # the loop completed (no deadlock) and checkpointed through the end
    assert crawl.read_checkpoint(ckpt) == 2019


def test_checkpoint_write_is_atomic(tmp_path):
    """Tmp-write+move: a crash mid-write (torn/partial tmp file) must
    leave the previous checkpoint readable, or restart loses every
    change since it."""
    import os

    ckpt = str(tmp_path / "ck" / "ts")
    crawl._write_checkpoint(ckpt, 111)
    assert crawl.read_checkpoint(ckpt) == 111
    assert not os.path.exists(ckpt + ".tmp")  # published, not left over

    # simulate a crash after the tmp write started but before the move:
    # the published checkpoint must be untouched and a later write must
    # recover (overwrite the stray tmp and publish)
    with open(ckpt + ".tmp", "w") as f:
        f.write("2")  # torn partial write
    assert crawl.read_checkpoint(ckpt) == 111
    crawl._write_checkpoint(ckpt, 333)
    assert crawl.read_checkpoint(ckpt) == 333
    assert not os.path.exists(ckpt + ".tmp")


def test_http_fetcher_retries_and_raises(monkeypatch):
    """429-exhaustion and transport failures must raise, not return the
    None that callers file as not_found (deletion-equivalent); URLError
    is retried like 429."""
    import urllib.error
    import urllib.request

    calls = {"n": 0}

    def flaky_urlopen(req, *a, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise urllib.error.URLError("connection reset")

        class R:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def read(self):
                return b'{"entities": {}}'

        return R()

    monkeypatch.setattr(urllib.request, "urlopen", flaky_urlopen)
    f = crawl.HTTPFetcher(throttle_sleep=0.0, max_retries=5)
    assert f.fetch("Q1", 7) == '{"entities": {}}'
    assert calls["n"] == 3  # two URLError retries, then success

    def always_throttled(req, *a, **kw):
        raise urllib.error.HTTPError(req.full_url, 429, "slow down", {}, None)

    monkeypatch.setattr(urllib.request, "urlopen", always_throttled)
    with pytest.raises(RuntimeError, match="failed after"):
        f.fetch("Q2", 8)

    def gone(req, *a, **kw):
        raise urllib.error.HTTPError(req.full_url, 404, "gone", {}, None)

    monkeypatch.setattr(urllib.request, "urlopen", gone)
    assert f.fetch("Q3", 9) is None  # 404 stays the only true not-found


def test_monitor_threaded_delete_edit_ordering(tmp_path):
    """Per-key hash routing: a log-delete AFTER the last edit of a key
    must leave the key deleted even with threads>1 — on a shared queue
    the delete could finish before a queued edit, whose ordered-mode
    PUT then finds a tombstone (stale check resets) and resurrects the
    item. A slow fetcher widens the race window; hash routing removes
    it entirely (all Q1 events run on one worker, in stream order)."""
    import time as _t

    d = tmp_path / "delfetches"
    d.mkdir()
    for rev in (100, 101):
        (d / f"Q1@{rev}.json").write_text(
            json.dumps(_entity("Q1", f"label r{rev}")))
    base = crawl.DirectoryFetcher(str(d))

    class SlowFetcher:
        def fetch(self, qid, revision):
            _t.sleep(0.05)  # delete event would overtake on a shared queue
            return base.fetch(qid, revision)

    changes = [
        {"wiki": "wikidatawiki", "title": "Q1", "type": "edit",
         "timestamp": 1, "comment": "", "revision": {"new": 100}},
        {"wiki": "wikidatawiki", "title": "Q1", "type": "edit",
         "timestamp": 2, "comment": "", "revision": {"new": 101}},
        {"wiki": "wikidatawiki", "title": "Q1", "type": "log",
         "log_action": "delete", "timestamp": 3, "comment": ""},
    ]
    for threads in (1, 4):
        db = RecordDatabase()
        crawl.monitor_changes(db, list(changes), SlowFetcher(),
                              threads=threads)
        assert db.get("Q1") is None, f"threads={threads} resurrected Q1"
