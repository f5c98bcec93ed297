"""Live crawl/monitor services: the wikidaily + wikimonitor analogs.

Reference parity (semantics re-derived, not ported):
  * ``python/crawl/wikidaily.py:88-156`` — daily incremental stub dump
    → QID/revision range filters → latest revision per page → optional
    current-version check (HEAD) → redirect frames / item fetch →
    ordered PUT with Version=revision into the record store.
  * ``python/crawl/wikimonitor.py:140-313`` — recentchange stream →
    wikidatawiki edit/new/log-delete events → worker pool → fetch at
    the event revision → ordered PUT; timestamp checkpoint every N
    changes; restart from the checkpoint (``?since=``).
  * ``python/crawl/sse.py:74-106`` — SSE message framing (id / event /
    data / retry fields, ``\\n\\n`` message boundary, comment lines
    ignored).

Spark-first split: the BULK leg — the multi-GB daily stub dump — is a
DataFrame job (:func:`stub_revisions` splits the single file into
byte-range tasks via sources/dumpsplit and selects the latest
in-range revision per page as an aggregation), while the
fetch-and-PUT leg is a service-side worker loop beside the store —
exactly the reference's deployment shape, where the crawler is a
separate process feeding SLINGDB and the workflow engine consumes the
epoch tail in bulk.  :func:`db_tail_items` is that bulk bridge: it
turns the crawled epoch tail into the delta DataFrame shape
``kg/delta.apply_kb_delta`` maintains the KB from (see
tests/test_db.py::test_db_as_delta_transport for the full loop).

No network access is required anywhere in the tests: fetching is a
pluggable protocol (``fetch(qid, revision) -> json text | None``) with
a filesystem-backed :class:`DirectoryFetcher` (works on file:// and
object stores via pyarrow.fs) and an :class:`HTTPFetcher` for real
deployments (Special:EntityData, 429 throttle handling — the
reference's retry loop at wikimonitor.py:180-196).
"""

from __future__ import annotations

import json
import logging
import re
import threading
import time
import xml.etree.ElementTree as ET
from queue import Queue
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .db import DBORDERED, RESULT_NAMES, RecordDatabase

_LOG = logging.getLogger(__name__)

MAX_ID = 999_999_999_999  # reference flag defaults (wikidaily.py:20-39)

# wikimonitor.py:142 — a wbcreateredirect edit comment names old/new.
_REDIR_COMMENT = re.compile(r"/\* wbcreateredirect:\d+\|\|(Q\d+)\|(Q\d+) \*/")

# ---------------------------------------------------------------------------
# daily stub dump → (qid, revision, redirect) candidates (Spark job)
# ---------------------------------------------------------------------------


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_stub_page(text: str, min_rev: int, max_rev: int,
                     min_qid: int, max_qid: int):
    """One ``<page>`` stub record → (qid, revision, redirect) or None,
    with the reference's filters (wikidaily.py:92-113): non-Q titles
    skipped, QID range, latest revision within the revision range."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return None
    title = None
    redirect = None
    best = None
    for child in root:
        name = _localname(child.tag)
        if name == "title":
            title = (child.text or "").strip()
        elif name == "redirect":
            redirect = child.get("title")
        elif name == "revision":
            for sub in child:
                if _localname(sub.tag) == "id":
                    try:
                        revid = int((sub.text or "").strip())
                    except ValueError:
                        continue
                    if revid < min_rev or revid > max_rev:
                        continue
                    if best is None or revid > best:
                        best = revid
                    break
    if not title or not title.startswith("Q"):
        return None
    try:
        idnum = int(title[1:])
    except ValueError:
        return None
    if idnum < min_qid or idnum > max_qid or best is None:
        return None
    return (title, best, redirect)


def stub_revisions(spark: SparkSession, path: str, *,
                   min_rev: int = 0, max_rev: int = MAX_ID,
                   min_qid: int = 0, max_qid: int = MAX_ID,
                   chunk_bytes: int | None = None) -> DataFrame:
    """Daily incremental stub dump (one giant XML file) → DataFrame
    ``(qid string, revision long, redirect string)`` with one row per
    QID at its latest in-range revision — the distributed twin of the
    reference's sequential page scan (wikidaily.py:88-113).  The dump
    is split into byte-range tasks (sources/dumpsplit), so a multi-GB
    stub file parses in parallel."""
    from .sources.dumpsplit import DEFAULT_CHUNK, xml_dump_records

    recs = xml_dump_records(
        spark, path, "page", chunk_bytes=chunk_bytes or DEFAULT_CHUNK
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            qids, revs, redirs = [], [], []
            for text in pdf["record"]:
                row = _parse_stub_page(text, min_rev, max_rev,
                                       min_qid, max_qid)
                if row is not None:
                    qids.append(row[0])
                    revs.append(row[1])
                    redirs.append(row[2])
            yield pd.DataFrame(
                {"qid": pd.Series(qids, dtype="object"),
                 "revision": pd.Series(revs, dtype="int64"),
                 "redirect": pd.Series(redirs, dtype="object")}
            )

    pages = recs.mapInPandas(
        run, schema="qid string, revision long, redirect string"
    )
    # A dump can restate a page; keep the newest revision (ordered PUT
    # would resolve it anyway — this keeps one fetch per QID).
    return pages.groupBy("qid").agg(
        F.max("revision").alias("revision"),
        F.max_by("redirect", "revision").alias("redirect"),
    )


def pending_updates(candidates: DataFrame, db: RecordDatabase) -> DataFrame:
    """The ``--check_revision`` HEAD filter (wikidaily.py:116-121) in
    bulk: drop candidates whose stored version is already >= the dump
    revision.  The store's live epoch joins as the (small, driver-side)
    version table; the candidate set is the day's delta."""
    from .db import db_to_dataframe

    spark = candidates.sparkSession
    current = db_to_dataframe(spark, db).select(
        F.col("key").alias("qid"), F.col("version").alias("_stored")
    )
    return (
        candidates.join(current, "qid", "left")
        .where(F.col("_stored").isNull() | (F.col("_stored") < F.col("revision")))
        .drop("_stored")
    )


# ---------------------------------------------------------------------------
# fetchers (pluggable transport; wikidaily.py:47-50, wikimonitor.py:180-196)
# ---------------------------------------------------------------------------


class DirectoryFetcher:
    """Item JSON from a directory of ``<qid>@<revision>.json`` (exact
    revision) or ``<qid>.json`` (latest) files — the sandbox/test
    transport, and the natural shape for replaying archived fetches.
    Goes through pyarrow.fs so the directory may be file:// or an
    object store."""

    def __init__(self, root: str):
        from pyarrow import fs as pafs

        from .db import _with_scheme

        self._fs, self._root = pafs.FileSystem.from_uri(_with_scheme(root))

    def fetch(self, qid: str, revision: int) -> str | None:
        from pyarrow import fs as pafs

        for name in (f"{qid}@{revision}.json", f"{qid}.json"):
            path = f"{self._root}/{name}"
            info = self._fs.get_file_info(path)
            if info.type == pafs.FileType.File:
                with self._fs.open_input_stream(path) as f:
                    return f.read().decode("utf-8")
        return None  # 404 analog (wikidaily.py:133-135)


class HTTPFetcher:
    """Special:EntityData fetch for real deployments
    (wikidaily.py:47-50; 429-throttle retry per wikimonitor.py:184-189).
    Not exercised by the test suite — this sandbox has no network —
    but it is the production transport, not a stub."""

    def __init__(self, url: str = "https://www.wikidata.org/wiki/Special:EntityData",
                 user_agent: str = "sling-spark-crawler/1.0",
                 throttle_sleep: float = 60.0, max_retries: int = 5):
        self.url = url
        self.user_agent = user_agent
        self.throttle_sleep = throttle_sleep
        self.max_retries = max_retries

    def fetch(self, qid: str, revision: int) -> str | None:
        import urllib.error
        import urllib.request

        url = f"{self.url}?id={qid}&revision={revision}&format=json"
        last: Exception | None = None
        for attempt in range(self.max_retries):
            final = attempt == self.max_retries - 1
            req = urllib.request.Request(
                url, headers={"User-Agent": self.user_agent}
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.read().decode("utf-8")
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return None  # the only true not-found
                if e.code == 429:  # throttle down (wikimonitor.py:185)
                    last = e
                    if not final:  # no point sleeping before the raise
                        time.sleep(self.throttle_sleep)
                    continue
                raise
            except urllib.error.URLError as e:
                # transient transport failure (DNS, connection reset):
                # retry with a SHORT backoff (it is not a server
                # throttle signal) instead of crashing the ingest loop
                last = e
                if not final:
                    time.sleep(min(2.0 * (attempt + 1), self.throttle_sleep))
        # Exhausted retries on throttle/transport errors: raise rather
        # than return None — None means "entity does not exist" to
        # callers (counted not_found / skipped), and misfiling a
        # transient outage as a deletion-equivalent would silently
        # drop the item from the crawl.
        raise RuntimeError(
            f"fetch {qid}@{revision} failed after {self.max_retries} "
            f"retries: {last}"
        )


# ---------------------------------------------------------------------------
# item/record encoding (the store's value format)
# ---------------------------------------------------------------------------


def item_value(json_text: str, qid: str, lang: str = "en") -> str | None:
    """Fetched entity JSON → the canonical stored value: the engine
    item row (sources/wikidata.parse_item — the wikiconv analog,
    wikidaily.py:139) as sorted-key JSON.  Accepts both the bare
    entity object and the Special:EntityData ``{"entities": {qid: …}}``
    wrapper.  None on any malformed payload (the reference logs and
    skips, wikimonitor.py:198-202)."""
    from .sources.wikidata import parse_item

    try:
        obj = json.loads(json_text)
    except (ValueError, TypeError):
        return None
    if isinstance(obj, dict) and "entities" in obj:
        obj = obj["entities"].get(qid) if isinstance(obj["entities"], dict) else None
    parsed = parse_item(obj, lang=lang)
    if parsed is None:
        return None
    item, _aliases = parsed
    return json.dumps(item, sort_keys=True)


def redirect_value(qid: str, target: str) -> str:
    """The ``{=Q<old> +Q<new>}`` redirect frame analog
    (wikidaily.py:126-128) as a store value."""
    return json.dumps({"id": qid, "redirect": target}, sort_keys=True)


# ---------------------------------------------------------------------------
# wikidaily: ingest the day's candidates into the store
# ---------------------------------------------------------------------------


def wikidaily_ingest(db: RecordDatabase, updates, fetcher, *,
                     lang: str = "en", check_revision: bool = False) -> dict:
    """Apply one day's update candidates to the record store — the
    reference's main loop (wikidaily.py:88-156): per candidate, skip if
    the store already holds >= revision (optional HEAD check), store a
    redirect frame for redirect pages, otherwise fetch + convert + PUT
    with ``Version=revision, Mode=ordered``.  ``updates`` is the
    :func:`stub_revisions` DataFrame or any (qid, revision, redirect)
    iterable; a DataFrame streams through ``toLocalIterator`` (the
    candidate set is delta-sized — the KB itself never leaves the
    store/Spark side).  Returns the result matrix."""
    counts = {name: 0 for name in RESULT_NAMES}
    counts.update(redirects=0, not_found=0, skipped=0, errors=0)
    if isinstance(updates, DataFrame):
        rows: Iterable = (
            (r["qid"], r["revision"], r["redirect"])
            for r in updates.toLocalIterator()
        )
    else:
        rows = updates
    for qid, revision, redirect in rows:
        revision = int(revision)
        if check_revision:
            stored, size = db.head(qid)
            if size > 0 and stored >= revision:
                counts["skipped"] += 1
                continue
        if redirect:
            value = redirect_value(qid, redirect)
            counts["redirects"] += 1
        else:
            text = fetcher.fetch(qid, revision)
            if text is None:
                counts["not_found"] += 1
                continue
            value = item_value(text, qid, lang=lang)
            if value is None:
                counts["errors"] += 1
                continue
        _, res = db.put(qid, value, version=revision, mode=DBORDERED)
        counts[RESULT_NAMES[res]] += 1
    return counts


# ---------------------------------------------------------------------------
# SSE framing + recentchange filtering (sse.py, wikimonitor.py:277-297)
# ---------------------------------------------------------------------------


def parse_sse(chunks: Iterable[bytes]) -> Iterator[dict]:
    """SSE byte stream → event dicts ``{id, event, data, retry}``
    (sse.py:74-106): messages end at a blank line, ``:``-prefixed
    comment lines are ignored, multiple ``data:`` lines concatenate
    with newlines."""
    buf = b""
    held = b""  # a trailing CR may be half of a CRLF split across chunks

    def _chunks_then_eof():
        yield from chunks
        yield None  # end-of-stream marker: flush a held final CR

    for chunk in _chunks_then_eof():
        if chunk is None:
            raw, held = held, b""  # a last lone CR is a terminator
            if not raw:
                break
        else:
            raw = held + chunk
            if raw.endswith(b"\r"):
                raw, held = raw[:-1], b"\r"
            else:
                held = b""
        # the SSE spec allows CRLF, LF or CR line terminators —
        # normalize to LF so the blank-line message boundary is always
        # b"\n\n" (a CRLF-framed capture would otherwise never frame)
        buf += raw.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
        while True:
            n = buf.find(b"\n\n")
            if n == -1:
                break
            msg, buf = buf[:n], buf[n + 2:]
            event = {"id": None, "event": None, "data": None, "retry": None}
            for line in msg.split(b"\n"):
                colon = line.find(b":")
                if colon <= 0:
                    continue  # comments and non-field lines
                name = line[:colon].strip()
                value = line[colon + 1:].strip()
                if name == b"id":
                    event["id"] = value.decode("utf-8", "replace")
                elif name == b"event":
                    event["event"] = value.decode("utf-8", "replace")
                elif name == b"data":
                    if event["data"] is None:
                        event["data"] = value
                    else:
                        event["data"] = event["data"] + b"\n" + value
                elif name == b"retry":
                    try:
                        event["retry"] = int(value)
                    except ValueError:
                        pass
            yield event


def recent_changes(events: Iterable[dict]) -> Iterator[dict]:
    """SSE events → decoded wikidatawiki change dicts with the
    reference's filter chain (wikimonitor.py:277-297): only ``message``
    events with data mentioning wikidatawiki, JSON-decode tolerant,
    wiki == wikidatawiki, title Q… or Property:…"""
    for ev in events:
        if ev.get("event") != "message" or not ev.get("data"):
            continue
        data = ev["data"]
        if isinstance(data, bytes):
            if b"wikidatawiki" not in data:
                continue
            data = data.decode("utf-8", "replace")
        elif "wikidatawiki" not in data:
            continue
        try:
            change = json.loads(data)
        except ValueError:
            continue  # ignore JSON parse errors (wikimonitor.py:286)
        if change.get("wiki") != "wikidatawiki":
            continue
        title = change.get("title", "")
        if not (title.startswith("Q") or title.startswith("Property:")):
            continue
        yield change


# ---------------------------------------------------------------------------
# wikimonitor: live change-stream consumer with checkpointing
# ---------------------------------------------------------------------------


def read_checkpoint(path: str) -> int | None:
    """Restart timestamp from a checkpoint file (wikimonitor.py:259-266);
    None when absent/garbled."""
    from pyarrow import fs as pafs

    from .db import _with_scheme

    filesystem, p = pafs.FileSystem.from_uri(_with_scheme(path))
    try:
        with filesystem.open_input_stream(p) as f:
            return int(f.read().decode("utf-8").strip())
    except (FileNotFoundError, OSError, ValueError):
        return None


def _write_checkpoint(path: str, ts: int) -> None:
    from pyarrow import fs as pafs

    from .db import _with_scheme

    filesystem, p = pafs.FileSystem.from_uri(_with_scheme(path))
    parent = p.rsplit("/", 1)[0]
    if parent:
        filesystem.create_dir(parent, recursive=True)
    # write-tmp-then-move (the RecordDatabase.flush discipline): an
    # in-place truncate+write torn by a crash would leave an unreadable
    # checkpoint, and a restart without ?since= permanently skips every
    # change since the last good one
    tmp = p + ".tmp"
    with filesystem.open_output_stream(tmp) as f:
        f.write(str(ts).encode("utf-8"))
    filesystem.move(tmp, p)


def process_change(db: RecordDatabase, change: dict, fetcher, *,
                   lang: str = "en") -> str:
    """One recentchange event → store mutation, the reference's
    process_change (wikimonitor.py:154-226): log/delete → DELETE;
    edit/new → redirect-comment frame or fetch at the event revision →
    ordered PUT.  Returns the outcome label."""
    qid = change.get("title", "")
    if qid.startswith("Property:"):
        qid = qid[9:]
    kind = change.get("type")
    if kind == "log" and change.get("log_action") == "delete":
        db.delete(qid)
        return "deleted"
    if kind not in ("edit", "new"):
        return "ignored"
    rev = change.get("revision") or {}
    revision = int(rev.get("new") or 0)
    m = _REDIR_COMMENT.fullmatch(change.get("comment") or "")
    if m is not None:
        value = redirect_value(qid, m.group(2))
    else:
        text = fetcher.fetch(qid, revision)
        if text is None:
            return "not_found"
        value = item_value(text, qid, lang=lang)
        if value is None:
            return "error"
    _, res = db.put(qid, value, version=revision, mode=DBORDERED)
    return RESULT_NAMES[res]


def monitor_changes(db: RecordDatabase, changes: Iterable[dict], fetcher, *,
                    lang: str = "en", checkpoint: str | None = None,
                    checkpoint_interval: int = 1000,
                    threads: int = 1, qsize: int = 1024) -> dict:
    """Consume a recentchange iterable (live SSE via
    ``recent_changes(parse_sse(...))`` or a replay file) into the
    store — the reference's monitor loop with its worker pool and
    timestamp checkpoint (wikimonitor.py:240-257, 218-226).  The store
    serializes writes internally; with ``threads>1`` fetches overlap
    while per-key hash routing (one worker owns all events of a title)
    plus ordered-mode PUTs keep per-key revision order.  Returns the
    outcome matrix."""
    counts: dict[str, int] = {}
    # The checkpoint must be PREFIX-SAFE under out-of-order completion:
    # with threads>1 a later-timestamped change can finish while earlier
    # ones are still queued or mid-fetch, and checkpointing that later
    # timestamp would make a crash-restart (?since=) skip the earlier
    # events permanently. So changes get stream-order sequence numbers
    # and the recorded timestamp is that of the longest DONE prefix —
    # restart then re-sees at most in-flight work (at-least-once, and
    # ordered-mode PUTs make the replay idempotent).
    state = {"n": 0, "done": {}, "prefix": 0, "prefix_ts": None}
    lock = threading.Lock()

    def handle(change: dict, seq: int) -> None:
        # The reference logs-and-skips per-change failures
        # (wikimonitor.py:198-202). Containing the exception HERE is
        # also what keeps the worker pool alive: an escaping error
        # would kill the thread after task_done, and once every worker
        # is dead the bounded queue.put / queue.join deadlock forever.
        try:
            label = process_change(db, change, fetcher, lang=lang)
        except Exception as e:
            _LOG.warning("process_change failed for %r: %s",
                         change.get("title"), e)
            label = "error"
        ts = change.get("timestamp")
        with lock:
            counts[label] = counts.get(label, 0) + 1
            state["n"] += 1
            state["done"][seq] = ts
            while state["prefix"] in state["done"]:
                pts = state["done"].pop(state["prefix"])
                state["prefix"] += 1
                if pts is not None:
                    state["prefix_ts"] = int(pts)
            if (checkpoint and state["prefix_ts"] is not None
                    and state["n"] % checkpoint_interval == 0):
                # contained like process_change errors: an escaping
                # checkpoint-write failure would kill the worker and,
                # once every worker died at its next boundary, the
                # bounded queue.put/join would deadlock forever
                try:
                    _write_checkpoint(checkpoint, state["prefix_ts"])
                except Exception as e:
                    _LOG.warning("checkpoint write failed: %s", e)

    if threads <= 1:
        for seq, change in enumerate(changes):
            handle(change, seq)
    else:
        # per-KEY ordering: all events for one title route to the SAME
        # worker (stable hash). A single shared queue would let a
        # log-delete and an edit for one key race across workers —
        # db.delete ignores versions and a tombstone resets db.put's
        # DBORDERED stale check, so out-of-order completion could
        # resurrect a deleted item or delete a newer revision.
        import zlib

        queues: list[Queue] = [
            Queue(max(1, qsize // threads)) for _ in range(threads)
        ]

        def worker(q: Queue) -> None:
            while True:
                item = q.get()
                if item is None:
                    q.task_done()
                    return
                try:
                    handle(item[1], item[0])
                finally:
                    q.task_done()

        pool = [
            threading.Thread(target=worker, args=(q,), daemon=True)
            for q in queues
        ]
        for t in pool:
            t.start()
        for seq, change in enumerate(changes):
            key = str(change.get("title") or "")
            queues[zlib.crc32(key.encode()) % threads].put((seq, change))
        for q in queues:
            q.put(None)
        for q in queues:
            q.join()
    # final checkpoint so a clean shutdown never replays the whole tail
    if checkpoint and state["prefix_ts"] is not None:
        _write_checkpoint(checkpoint, state["prefix_ts"])
    return counts


# ---------------------------------------------------------------------------
# consumer bridge: crawled epoch tail → KB delta DataFrames
# ---------------------------------------------------------------------------


def db_tail_items(spark: SparkSession, db: RecordDatabase,
                  since_epoch: int = 0, *, source_priority: int = 1):
    """The Spark-side consumer of the crawl store: the epoch tail since
    the last drained position → ``(items_delta, redirects)`` where
    ``items_delta`` has exactly the ``kg/delta.apply_kb_delta`` input
    shape (ITEMS_DDL + source_priority + deleted; deletions are
    tombstone rows) and ``redirects (from_id, to_id)`` carries the
    redirect frames for the xref/same-as edge set.  This is the bulk
    hand-off the reference runs between SLINGDB and its workflow jobs."""
    from .kg.assets import ITEMS_DDL

    recs, _ = db.next(since_epoch, num=1 << 62, deletions=True)
    item_rows, redir_rows = [], []
    for r in recs:
        qid = r.key.decode("utf-8")
        if r.deleted:
            item_rows.append({"id": qid, "name": None, "types": [],
                              "statements": [],
                              "source_priority": source_priority,
                              "deleted": True})
            continue
        obj = json.loads(r.value.decode("utf-8"))
        target = obj.get("redirect")
        if target:
            redir_rows.append({"from_id": qid, "to_id": target})
            continue
        obj.setdefault("types", [])
        obj.setdefault("statements", [])
        item_rows.append(dict(obj, source_priority=source_priority,
                              deleted=False))
    schema = ITEMS_DDL + ", source_priority int, deleted boolean"
    items = spark.createDataFrame(item_rows, schema=schema)
    redirects = spark.createDataFrame(
        redir_rows, schema="from_id string, to_id string"
    )
    return items, redirects
