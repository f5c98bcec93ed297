"""SLINGDB analog: an epoch-versioned key/value record store with the
reference's update-mode semantics and cursor iteration, plus an HTTP
surface and Spark bulk import/export.

Reference parity (semantics re-derived, not ported):
  * record store + PUT modes/results — sling/db/db.cc:394-560,
    sling/db/dbprotocol.h:27-147 (DBOVERWRITE/DBADD/DBORDERED/DBNEWER,
    DBNEW/DBUPDATED/DBUNCHANGED/DBEXISTS/DBSTALE; deletions are records
    with an empty value; the epoch is the record id one past the end of
    the log, so any mutation advances it).
  * cursor iteration — db.cc:551 Database::Next (skips stale versions
    of re-written keys and tombstones unless deletions are requested).
  * HTTP surface — sling/db/dbserver.cc:147-600 (GET/HEAD/PUT/DELETE on
    /db/<name>/<key>, batch GET with ?id=&n= returning a Next cursor,
    Version/Mode request headers, Result/Version reply headers, OPTIONS
    for database info incl. epoch).

Design notes for the Spark engine:
  * The store itself is driver/edge-side state (like SLINGDB, which is a
    separate server process beside the workflow engine); Spark jobs talk
    to it in bulk via :func:`db_to_dataframe` / :func:`load_dataframe`,
    which move whole epochs as DataFrames — the wikidaily-style delta
    jobs in kg/delta.py consume exactly that shape.
  * Persistence goes through ``pyarrow.fs`` so a checkpoint dir can be
    ``file://``, ``hdfs://`` or ``s3://`` — same discipline as the
    streaming state pointer (kg/delta.py).  The log is replayed on open,
    so a crashed process resumes at the persisted epoch.
"""

from __future__ import annotations

import io
import json
import os
import struct
import threading
from typing import Iterator

# -- update modes (dbprotocol.h:56-61) --------------------------------------
DBOVERWRITE = 0  # overwrite existing records
DBADD = 1        # only add new records
DBORDERED = 2    # do not overwrite records with a higher version
DBNEWER = 3      # only overwrite if version is strictly newer

# -- update results (dbprotocol.h:69-76) ------------------------------------
DBNEW = 0        # new record added
DBUPDATED = 1    # existing record updated
DBUNCHANGED = 2  # value identical (or same version in NEWER mode)
DBEXISTS = 3     # record exists and overwrite not allowed (ADD mode)
DBSTALE = 4      # incoming version is lower than the stored one
DBFAULT = 5      # write error

RESULT_NAMES = ["new", "updated", "unchanged", "exists", "stale", "fault"]

_MAGIC = b"SSDB1\n"


class Record:
    """One stored record; ``value == b''`` marks a deletion (db.cc:425)."""

    __slots__ = ("key", "value", "version", "recid")

    def __init__(self, key: bytes, value: bytes, version: int = 0,
                 recid: int = 0):
        self.key = key
        self.value = value
        self.version = version
        self.recid = recid

    @property
    def deleted(self) -> bool:
        return len(self.value) == 0

    def __repr__(self) -> str:  # pragma: no cover
        return f"Record({self.key!r}, {len(self.value)}B, v{self.version})"


def _as_bytes(x) -> bytes:
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return x.encode("utf-8")
    raise TypeError(f"key/value must be str or bytes, got {type(x)}")


class RecordDatabase:
    """Append-only record log + key index with SLINGDB epoch semantics.

    The log assigns each mutation a monotonically increasing record id;
    ``epoch()`` is the id one past the last record, so a reader that
    remembers an epoch can fetch exactly the tail written since then via
    :meth:`next` — the contract the wikidaily-style incremental jobs
    rely on (reference: db.cc:357-372, python/crawl/wikidaily usage).
    """

    def __init__(self, read_only: bool = False):
        self._log: list[Record] = []
        self._index: dict[bytes, int] = {}  # key -> position in _log
        self._lock = threading.RLock()
        self.read_only = read_only

    # -- core verbs ---------------------------------------------------------

    def epoch(self) -> int:
        with self._lock:
            return len(self._log)

    def get(self, key, novalue: bool = False) -> Record | None:
        """DBGET for one key; returns None for absent or deleted keys."""
        k = _as_bytes(key)
        with self._lock:
            pos = self._index.get(k)
            if pos is None:
                return None
            rec = self._log[pos]
            if rec.deleted:
                return None
            if novalue:
                return Record(rec.key, b"?", rec.version, rec.recid)
            return rec

    def head(self, key) -> tuple[int, int]:
        """DBHEAD: (version, value size); size 0 when absent
        (dbprotocol.h:124-133)."""
        rec = self.get(key)
        if rec is None:
            return (0, 0)
        return (rec.version, len(rec.value))

    def put(self, key, value, version: int = 0,
            mode: int = DBOVERWRITE) -> tuple[int, int]:
        """DBPUT: returns (recid, result).  Semantics follow
        db.cc:421-509 mode-by-mode; an empty value is rejected because
        empty marks deletions."""
        k, v = _as_bytes(key), _as_bytes(value)
        if self.read_only:
            return (-1, DBFAULT)
        if len(v) == 0:
            return (-1, DBFAULT)
        if mode not in (DBOVERWRITE, DBADD, DBORDERED, DBNEWER):
            raise ValueError(f"invalid DB mode {mode}")
        with self._lock:
            pos = self._index.get(k)
            if pos is not None:
                rec = self._log[pos]
                exists = not rec.deleted
                if exists and mode == DBADD:
                    return (rec.recid, DBEXISTS)
                if exists and mode == DBORDERED:
                    if rec.version != 0 and version < rec.version:
                        return (rec.recid, DBSTALE)
                if exists and mode == DBNEWER:
                    if version < rec.version:
                        return (rec.recid, DBSTALE)
                    if version == rec.version:
                        return (rec.recid, DBUNCHANGED)
                # Identical value is a no-op regardless of version —
                # the reference does not re-stamp versions (db.cc:479).
                if exists and rec.value == v:
                    return (rec.recid, DBUNCHANGED)
                result = DBUPDATED if exists else DBNEW
            else:
                result = DBNEW
            recid = len(self._log)
            self._log.append(Record(k, v, version, recid))
            self._index[k] = recid
            return (recid, result)

    def delete(self, key) -> bool:
        """DBDELETE: appends a tombstone (empty value) so the deletion
        itself advances the epoch and is visible to NEXT readers with
        the deletions flag (db.cc:511-549)."""
        k = _as_bytes(key)
        if self.read_only:
            return False
        with self._lock:
            pos = self._index.get(k)
            if pos is None or self._log[pos].deleted:
                return False
            recid = len(self._log)
            self._log.append(Record(k, b"", self._log[pos].version, recid))
            self._index[k] = recid
            return True

    def next(self, iterator: int, num: int = 1, deletions: bool = False,
             novalue: bool = False) -> tuple[list[Record], int | None]:
        """DBNEXT/DBNEXT2: up to ``num`` records with recid >= iterator,
        skipping superseded versions of a key (only the latest position
        for each key is live) and tombstones unless ``deletions``.
        Returns (records, next_iterator); next_iterator is None when the
        log is exhausted (DBDONE)."""
        out: list[Record] = []
        with self._lock:
            n = len(self._log)
            pos = max(0, iterator)
            while pos < n and len(out) < num:
                rec = self._log[pos]
                if rec.deleted:
                    # Tombstones are always surfaced to deletion-aware
                    # readers, even if the key was later re-added
                    # (db.cc:598-600 skips the stale check for them).
                    if deletions:
                        out.append(rec)
                elif self._index.get(rec.key) == pos:  # latest live version
                    if novalue:
                        out.append(Record(rec.key, b"?", rec.version,
                                          rec.recid))
                    else:
                        out.append(rec)
                pos += 1
            return (out, pos if pos < n else None)

    def clear(self) -> None:
        """DBCLEAR (dbprotocol.h:38)."""
        if self.read_only:
            return
        with self._lock:
            self._log.clear()
            self._index.clear()

    def keys(self) -> list[bytes]:
        with self._lock:
            return [k for k, p in self._index.items()
                    if not self._log[p].deleted]

    def __len__(self) -> int:
        return len(self.keys())

    def scan(self, deletions: bool = False) -> Iterator[Record]:
        recs, it = self.next(0, num=1 << 62, deletions=deletions)
        yield from recs

    # -- persistence (pyarrow.fs so hdfs/s3 state dirs work) ----------------

    def _serialize(self) -> bytes:
        buf = io.BytesIO()
        buf.write(_MAGIC)
        with self._lock:
            for rec in self._log:
                buf.write(struct.pack("<IQI", len(rec.key), rec.version,
                                      len(rec.value)))
                buf.write(rec.key)
                buf.write(rec.value)
        return buf.getvalue()

    def flush(self, path: str) -> int:
        """Persist the full log; returns the persisted epoch.  The write
        goes through pyarrow.fs (file://, hdfs://, s3://) and lands via
        a temp-name move, so a crash mid-flush never leaves a torn log
        at the final name — :meth:`open` either sees the previous
        complete log or the new one."""
        import os

        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(_with_scheme(path))
        parent = p.rsplit("/", 1)[0]
        if parent:
            filesystem.create_dir(parent, recursive=True)
        tmp = f"{p}.tmp-{os.getpid()}"
        try:
            with filesystem.open_output_stream(tmp) as f:
                f.write(self._serialize())
            filesystem.move(tmp, p)
        except Exception:
            # Unlike the model-artifact cache (bit-identical racers),
            # a dropped db flush silently loses mutations — clean the
            # temp file up but surface the failure.
            try:
                filesystem.delete_file(tmp)
            except OSError:
                pass
            raise
        return self.epoch()

    @classmethod
    def open(cls, path: str, read_only: bool = False) -> "RecordDatabase":
        """Replay a persisted log; resumes at the stored epoch."""
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(_with_scheme(path))
        db = cls()
        try:
            with filesystem.open_input_stream(p) as f:
                blob = f.read()
        except FileNotFoundError:
            db.read_only = read_only
            return db
        if not blob.startswith(_MAGIC):
            raise ValueError(f"{path}: not a sling_spark db log")
        off = len(_MAGIC)
        while off < len(blob):
            ksize, version, vsize = struct.unpack_from("<IQI", blob, off)
            off += 16
            key = blob[off:off + ksize]; off += ksize
            value = blob[off:off + vsize]; off += vsize
            recid = len(db._log)
            db._log.append(Record(key, value, version, recid))
            db._index[key] = recid
        db.read_only = read_only
        return db


def _with_scheme(path: str) -> str:
    # absolute path required: 'file://rel/path' parses the first
    # segment as a HOSTNAME and pyarrow raises ArrowInvalid
    return path if "://" in path else "file://" + os.path.abspath(path)


# -- Spark bulk interface ----------------------------------------------------

DB_SCHEMA = ("key string, value binary, version long, recid long, "
             "deleted boolean")


def db_to_dataframe(spark, db: RecordDatabase, deletions: bool = False):
    """Current live epoch (or full change view) as a DataFrame — the
    bulk read path Spark jobs use instead of the record-at-a-time
    protocol; shape matches kg/delta.py's delta input (key, value,
    version, deleted)."""
    rows = [(r.key.decode("utf-8", "replace"), bytes(r.value), r.version,
             r.recid, r.deleted)
            for r in db.scan(deletions=deletions)]
    return spark.createDataFrame(rows, DB_SCHEMA)


def load_dataframe(db: RecordDatabase, df, mode: int = DBORDERED,
                   value_col: str = "value", key_col: str = "key",
                   version_col: str | None = "version") -> dict[str, int]:
    """Bulk-load a DataFrame into the store (DBBULK analog).  Rows
    arrive via toLocalIterator so only one partition is resident at a
    time; the epoch advances once per mutated row, preserving SLINGDB's
    every-mutation-has-a-recid contract.  Returns result counts."""
    counts = dict.fromkeys(RESULT_NAMES + ["deleted"], 0)
    cols = [key_col, value_col] + ([version_col] if version_col else [])
    for row in df.select(*cols).toLocalIterator():
        value = row[value_col]
        if value is None or (isinstance(value, (bytes, str)) and
                             len(value) == 0):
            # tombstones first: their version is meaningless and often
            # NULL, which must not crash the int() below. A tombstone
            # for an absent/already-deleted key is a no-op — count it
            # as unchanged, not deleted, so the result matrix audits
            # against the delta size honestly (a lost retraction must
            # not read as applied).
            if db.delete(row[key_col]):
                counts["deleted"] += 1
            else:
                counts["unchanged"] += 1
            continue
        version = (int(row[version_col])
                   if version_col and row[version_col] is not None else 0)
        _, result = db.put(row[key_col], value, version=version, mode=mode)
        counts[RESULT_NAMES[result]] += 1
    return counts


# -- HTTP surface (dbserver.cc:147-600 analog) -------------------------------


def make_db_service(databases: dict[str, RecordDatabase]):
    """Build a ThreadingHTTPServer serving the SLINGDB REST surface:

      GET    /db/<name>/<key>        -> body=value, Version header
      GET    /db/<name>?id=N&n=M     -> JSON batch + Next header (cursor)
      HEAD   /db/<name>/<key>        -> Version + Content-Length, no body
      PUT    /db/<name>/<key>        -> body=value; Mode/Version headers;
                                        reply has Result + RecordID
      DELETE /db/<name>/<key>
      OPTIONS /db/<name>             -> JSON info incl. epoch
      POST   /db/<name>?clear=1      -> DBCLEAR

    Bind with server.server_address; run via a daemon thread in tests.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, unquote, urlparse

    _MODES = {"overwrite": DBOVERWRITE, "add": DBADD,
              "ordered": DBORDERED, "newer": DBNEWER}

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet in tests
            pass

        def _route(self):
            u = urlparse(self.path)
            parts = [unquote(x) for x in u.path.split("/") if x]
            if len(parts) < 2 or parts[0] != "db":
                return None, None, {}
            name = parts[1]
            key = "/".join(parts[2:]) if len(parts) > 2 else None
            return databases.get(name), key, parse_qs(u.query)

        def _reply(self, code: int, body: bytes = b"",
                   headers: dict | None = None, head_only: bool = False,
                   content_length: int | None = None):
            self.send_response(code)
            for k, v in (headers or {}).items():
                self.send_header(k, str(v))
            # head_only may pass the entity size explicitly so a HEAD on
            # a large record never materializes a value-sized buffer
            self.send_header(
                "Content-Length",
                str(len(body) if content_length is None else content_length),
            )
            self.end_headers()
            if not head_only:
                self.wfile.write(body)

        def do_GET(self):
            db, key, q = self._route()
            if db is None:
                return self._reply(404, b"no such database")
            if key:  # single-record fetch (dbserver.cc:224-246)
                rec = db.get(key)
                if rec is None:
                    return self._reply(404, b"record not found")
                return self._reply(200, rec.value,
                                   {"Version": rec.version})
            # batch cursor fetch (dbserver.cc:247-303); malformed
            # numbers answer 400 instead of dropping the connection
            # with an uncaught ValueError (no status line at all)
            try:
                it = int(q.get("id", ["0"])[0])
                num = int(q.get("n", ["1"])[0])
            except ValueError:
                return self._reply(400, b"invalid cursor parameter")
            deletions = q.get("deletions", ["0"])[0] == "1"
            recs, nxt = db.next(it, num, deletions=deletions)
            body = json.dumps([
                {"key": r.key.decode("utf-8", "replace"),
                 "value": r.value.decode("utf-8", "replace"),
                 "version": r.version, "recid": r.recid,
                 "deleted": r.deleted} for r in recs]).encode()
            hdrs = {"Content-Type": "application/json"}
            if nxt is not None:
                hdrs["Next"] = nxt
            # always 200: a 204 must carry no body (RFC 7230), and this
            # handler speaks keep-alive HTTP/1.1 — a 204 with "[]" in the
            # socket would desynchronize the next request on the
            # connection. An exhausted cursor is simply 200 + [] with no
            # Next header (the DBDONE analog).
            return self._reply(200, body, hdrs)

        def do_HEAD(self):
            db, key, _ = self._route()
            if db is None or not key:
                return self._reply(404, head_only=True)
            version, vsize = db.head(key)
            if vsize == 0:
                return self._reply(404, head_only=True)
            return self._reply(200, b"", {"Version": version},
                               head_only=True, content_length=vsize)

        def do_PUT(self):
            db, key, _ = self._route()
            if db is None or not key:
                return self._reply(404, b"no such database")
            try:
                size = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                size = -1
            if size < 0:
                # malformed OR negative: the body length is unknowable
                # (rfile.read(-1) would block until socket EOF), so the
                # unread bytes would desynchronize — or the read hang —
                # the next request on this keep-alive connection; close
                # it after replying
                self.close_connection = True
                return self._reply(400, b"invalid Content-Length")
            value = self.rfile.read(size)
            try:
                version = int(self.headers.get("Version", "0"))
            except ValueError:
                return self._reply(400, b"invalid Version header")
            mode = _MODES.get(
                (self.headers.get("Mode") or "overwrite").lower())
            if mode is None:
                return self._reply(400, b"invalid mode")
            recid, result = db.put(key, value, version=version, mode=mode)
            code = 500 if result == DBFAULT else 200
            return self._reply(code, RESULT_NAMES[result].encode(),
                               {"Result": RESULT_NAMES[result],
                                "RecordID": recid})

        def do_DELETE(self):
            db, key, _ = self._route()
            if db is None or not key:
                return self._reply(404, b"no such database")
            ok = db.delete(key)
            return self._reply(200 if ok else 404,
                               b"deleted" if ok else b"record not found")

        def do_OPTIONS(self):
            db, _, _ = self._route()
            if db is None:
                return self._reply(404, b"no such database")
            body = json.dumps({"epoch": db.epoch(), "records": len(db),
                               "read_only": db.read_only}).encode()
            return self._reply(200, body,
                               {"Content-Type": "application/json"})

        def do_POST(self):
            db, _, q = self._route()
            if db is None:
                return self._reply(404, b"no such database")
            if q.get("clear", ["0"])[0] == "1":
                db.clear()
                return self._reply(200, b"cleared")
            return self._reply(400, b"unknown command")

    return ThreadingHTTPServer(("127.0.0.1", 0), Handler)
