"""Giant-dump record splitter — the wikipedia-importer streaming-input
analog (sling/nlp/wiki/wikipedia-importer.cc:322: the reference gives
each input task a byte range of the single ~70 GB XML dump and lets it
scan forward to the first record boundary).

Same recipe, Spark-first: the driver plans fixed byte ranges over the
file (the FileSourceScan ``maxPartitionBytes`` discipline), the ranges
become a small DataFrame, and each task opens the file through
``pyarrow.fs`` (so ``file://``, ``hdfs://`` and ``s3://`` all work —
no driver-local POSIX assumption), seeks to its range start, scans to
the first record boundary AT or AFTER the range start, and emits every
record that STARTS inside its range, reading past the range end for
the tail record. That is standard Hadoop RecordReader ownership: both
the task ending at offset X and the task starting at X derive the same
boundary by scanning forward from X, so every record is owned by
exactly one task and the union over tasks is exactly the file.

Two boundary dialects:

- **XML** (``<page>…</page>``-shaped dumps): a record opens at
  ``<tag`` followed by a name delimiter and closes at the matching
  ``</tag>`` with same-tag nesting counted. Assumes the close tag
  never appears inside a CDATA section or comment (true of MediaWiki
  dumps, which escape text content).
- **Turtle** (wikidata ``.ttl`` dumps): directives (``@prefix`` /
  ``@base``) live in the file head — the driver reads the header once
  and ships it to every task — and a statement boundary is a newline
  whose line ends with ``.`` (optionally followed by a comment). A
  ``.``-terminated line inside a long literal would desynchronize the
  scan, but then the segment no longer parses and the task raises
  loudly instead of dropping data; a directive past the header raises
  too (chunk-local prefix scope would silently change semantics).

Blank nodes are salted with the record's absolute byte offset
(globally unique and deterministic), mirroring the per-file salt of
the file-per-task readers.
"""

from __future__ import annotations

import re

DEFAULT_CHUNK = 64 << 20  # 64 MiB, the usual maxPartitionBytes


# ---------------------------------------------------------------------------
# filesystem plumbing (pyarrow.fs: file:// hdfs:// s3:// alike)
# ---------------------------------------------------------------------------


def _fs_path(path: str):
    """(pyarrow FileSystem, in-filesystem path) for a URI or local path."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def plan_ranges(path: str, chunk_bytes: int = DEFAULT_CHUNK) -> list[tuple[int, int]]:
    """Driver-side split plan: [(start, end) byte ranges) covering the
    file. One task per range."""
    fs, p = _fs_path(path)
    size = fs.get_file_info(p).size
    if size is None:
        raise FileNotFoundError(path)
    chunk = max(int(chunk_bytes), 1 << 10)
    return [(o, min(o + chunk, size)) for o in range(0, size, chunk)] or [(0, 0)]


class _ByteScanner:
    """Forward byte scanner over a pyarrow input file with buffered
    refill — each task reads only [start, last record end), never the
    whole file."""

    def __init__(self, f, pos: int, size: int, io_bytes: int = 4 << 20):
        self.f = f
        self.size = size
        self.base = pos          # absolute offset of buf[0]
        self.buf = b""
        self.io = io_bytes

    def _fill_to(self, abs_end: int) -> None:
        """Extend the buffer to cover absolute offset ``abs_end``."""
        want = min(max(abs_end, self.base + len(self.buf) + self.io), self.size)
        have = self.base + len(self.buf)
        if want > have:
            self.buf += self.f.read_at(want - have, have)

    def find(self, pattern: bytes, abs_from: int) -> int:
        """Absolute offset of the next ``pattern`` at/after
        ``abs_from``; -1 at EOF. Refills in io-sized steps."""
        pos = max(abs_from, self.base)
        while True:
            self._fill_to(pos + self.io)
            i = self.buf.find(pattern, pos - self.base)
            if i >= 0:
                return self.base + i
            nxt = self.base + len(self.buf)
            if nxt >= self.size:
                return -1
            # overlap by the pattern length so a straddling match is seen
            pos = nxt - len(pattern) + 1

    def slice(self, abs_start: int, abs_end: int) -> bytes:
        self._fill_to(abs_end)
        return self.buf[abs_start - self.base:abs_end - self.base]


# ---------------------------------------------------------------------------
# XML record extraction
# ---------------------------------------------------------------------------

_NAME_DELIMS = b" \t\r\n/>"


def iter_xml_records(f, size: int, start: int, end: int, tag: str):
    """Yield (abs_offset, record_text) for every ``<tag>…</tag>``
    record STARTING in [start, end). ``f``: pyarrow input file."""
    open_pat = b"<" + tag.encode()
    close_pat = b"</" + tag.encode() + b">"
    sc = _ByteScanner(f, start, size)
    pos = start
    while True:
        o = sc.find(open_pat, pos)
        if o < 0 or o >= end:
            return
        # the match must be a real start tag, not a prefix of a longer
        # name (<pageprops>) — check the delimiter byte
        nxt = sc.slice(o + len(open_pat), min(o + len(open_pat) + 1, size))
        if nxt and nxt not in (bytes([b]) for b in _NAME_DELIMS):
            pos = o + 1
            continue
        # find the end of the start tag; '/>' means self-closing
        gt = sc.find(b">", o)
        if gt < 0:
            raise ValueError(f"unterminated start tag at byte {o}")
        if sc.slice(gt - 1, gt) == b"/":
            yield o, sc.slice(o, gt + 1).decode("utf-8", "replace")
            pos = gt + 1
            continue
        # scan for the matching close tag, counting same-tag nesting
        depth, p = 1, gt + 1
        while depth:
            c = sc.find(close_pat, p)
            if c < 0:
                raise ValueError(
                    f"record at byte {o}: no closing </{tag}> before EOF"
                )
            # count intervening same-tag opens between p and c — but a
            # nested self-closing <tag/> has no matching close, so
            # counting it would desynchronize the depth counter and
            # swallow the next record's close tag
            q = p
            while True:
                oo = sc.find(open_pat, q)
                if oo < 0 or oo >= c:
                    break
                d = sc.slice(oo + len(open_pat), oo + len(open_pat) + 1)
                if d in (bytes([b]) for b in _NAME_DELIMS):
                    g2 = sc.find(b">", oo)
                    if g2 < 0:
                        raise ValueError(
                            f"unterminated nested start tag at byte {oo}"
                        )
                    if sc.slice(g2 - 1, g2) != b"/":
                        depth += 1
                q = oo + 1
            depth -= 1
            p = c + len(close_pat)
        yield o, sc.slice(o, p).decode("utf-8", "replace")
        pos = p


def xml_dump_records(spark, path: str, record_tag: str,
                     chunk_bytes: int = DEFAULT_CHUNK):
    """One giant XML dump → DataFrame[offset long, record string], one
    byte range per task (>1 task for any dump larger than
    ``chunk_bytes``)."""
    ranges = plan_ranges(path, chunk_bytes)
    rdf = spark.createDataFrame(
        [(path, s, e) for s, e in ranges], "path string, start long, end long"
    ).repartition(len(ranges))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            offs, recs = [], []
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                fs, fp = _fs_path(p)
                size = fs.get_file_info(fp).size
                with fs.open_input_file(fp) as f:
                    for o, text in iter_xml_records(
                        f, size, int(s), int(e), record_tag
                    ):
                        offs.append(o)
                        recs.append(text)
            yield pd.DataFrame({"offset": offs, "record": recs})

    return rdf.mapInPandas(run, schema="offset long, record string")


def read_xml_dump(spark, path: str, record_tag: str,
                  chunk_bytes: int = DEFAULT_CHUNK):
    """Giant single-file XML dump → (subj, pred, obj) triples with the
    xml.cc slot algebra — the parallel-ingest twin of
    sources.xmlframes.read_xml (which is file-per-task). Blank nodes
    are salted per record byte offset."""
    import pandas as pd

    from .xmlframes import xml_to_triples

    recs = xml_dump_records(spark, path, record_tag, chunk_bytes)

    def run(batches):
        for pdf in batches:
            rows = {"subj": [], "pred": [], "obj": []}
            for off, text in zip(pdf["offset"], pdf["record"]):
                def salt(term: str) -> str:
                    return (
                        term.replace("_:", f"_:o{off}.", 1)
                        if term.startswith("_:")
                        else term
                    )

                for s, p, o in xml_to_triples(text):
                    rows["subj"].append(salt(s))
                    rows["pred"].append(p)
                    rows["obj"].append(salt(o))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return recs.mapInPandas(run, schema="subj string, pred string, obj string")


# ---------------------------------------------------------------------------
# Turtle statement-block extraction
# ---------------------------------------------------------------------------

# Directive-line detector, tokenizer-accurate: '@prefix'/'@base' in any
# case (no legal statement starts with '@'), or the SPARQL form
# case-insensitively — but only when followed by whitespace or '<'
# (inter-token whitespace is optional in Turtle), so pname subjects
# like 'prefix:s0' or 'base:x' are NOT directives. A case-insensitive
# \b-only match would swallow those subject lines into the header.
_DIRECTIVE_SRC = r"^\s*(@(?i:prefix|base)\b|(?i:prefix|base)(?=[\s<]))"
_DIRECTIVE_RE = re.compile(_DIRECTIVE_SRC.encode("ascii"))
# end-of-statement: a line whose content ends with '.' (optional
# trailing whitespace/comment)
_STMT_END_RE = re.compile(rb"\.[ \t\r]*(#[^\n]*)?\n")


def turtle_header(path: str, max_bytes: int = 4 << 20) -> tuple[str, int]:
    """(directive header text, header end offset): the leading
    ``@prefix``/``@base`` lines of the dump (blank/comment lines
    included). Read once on the driver, shipped to every task."""
    fs, p = _fs_path(path)
    with fs.open_input_file(p) as f:
        head = f.read_at(max_bytes, 0)
    end = 0
    for m in re.finditer(rb"[^\n]*\n?", head):
        line = m.group()
        if not line:
            break
        stripped = line.strip()
        if stripped and not stripped.startswith(b"#") and not _DIRECTIVE_RE.match(line):
            break
        end = m.end()
    return head[:end].decode("utf-8"), end


def _next_boundary(sc: _ByteScanner, abs_from: int) -> int:
    """First statement boundary (offset just past a '.'-terminated
    line) at/after ``abs_from``; file size at EOF."""
    pos = abs_from
    while True:
        sc._fill_to(pos + sc.io)
        m = _STMT_END_RE.search(sc.buf, max(pos - sc.base, 0))
        if m:
            return sc.base + m.end()
        nxt = sc.base + len(sc.buf)
        if nxt >= sc.size:
            return sc.size
        # A match never spans a newline (the '.'-to-'\n' span contains
        # no '\n'), so everything up to the buffer's LAST newline is
        # decided; only the trailing partial line can still hold a
        # pending match start. Resuming there keeps boundary(X) a pure
        # function of the bytes at/after X — a fixed-size overlap would
        # let two neighbor tasks with different refill histories skip
        # a straddling match (e.g. a '.'-line with a very long trailing
        # comment) and disagree on statement ownership.
        last_nl = sc.buf.rfind(b"\n")
        if last_nl >= 0:
            pos = max(pos, sc.base + last_nl + 1)
        # no newline in buffer yet: keep pos; _fill_to grows the buffer
        # by at least one io step per iteration, so the loop advances


def read_turtle_dump(spark, path: str, base_iri: str = "",
                     chunk_bytes: int = DEFAULT_CHUNK):
    """Giant single-file Turtle dump → (subj, pred, obj) triples — the
    parallel-ingest twin of sources.turtle.read_turtle. Each task owns
    the statements starting in its byte range (boundary = the first
    '.'-terminated line end at/after the range edge — both neighbors
    compute the same split point); the directive header parses in every
    task; segments re-parse with the FULL Turtle grammar, so a
    mis-split (e.g. a '.'-line inside a long literal) fails loudly
    rather than dropping triples. Directives past the header raise:
    chunk-local prefix scope would silently change meaning."""
    import pandas as pd

    header, header_end = turtle_header(path)
    ranges = [
        (s, e) for s, e in plan_ranges(path, chunk_bytes) if e > header_end
    ] or [(header_end, header_end)]
    rdf = spark.createDataFrame(
        [(path, max(s, header_end), e) for s, e in ranges],
        "path string, start long, end long",
    ).repartition(len(ranges))

    from .turtle import parse_turtle_full

    def run(batches):
        for pdf in batches:
            rows = {"subj": [], "pred": [], "obj": []}
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                fs, fp = _fs_path(p)
                size = fs.get_file_info(fp).size
                with fs.open_input_file(fp) as f:
                    sc = _ByteScanner(f, int(s), size)
                    lo = int(s) if int(s) == header_end else _next_boundary(sc, int(s))
                    hi = _next_boundary(sc, int(e)) if int(e) < size else size
                    if lo >= hi:
                        continue
                    seg = sc.slice(lo, hi).decode("utf-8")
                # same detector as the header scan, case-insensitive
                # like the parser itself (Turtle 1.1 SPARQL-form
                # directives are case-insensitive — a mid-file
                # 'prefix p: <...>' must raise, not silently rebind p:
                # in one chunk only)
                for m in re.finditer("(?m)" + _DIRECTIVE_SRC, seg):
                    raise ValueError(
                        f"directive past the header at byte {lo + m.start()}: "
                        "giant-dump Turtle splitting needs all directives in "
                        "the file head (use read_turtle for file-per-task)"
                    )
                for s3, p3, o3 in parse_turtle_full(header + seg, base_iri):
                    rows["subj"].append(
                        s3.replace("_:", f"_:o{lo}.", 1)
                        if s3.startswith("_:") else s3
                    )
                    rows["pred"].append(p3)
                    rows["obj"].append(
                        o3.replace("_:", f"_:o{lo}.", 1)
                        if o3.startswith("_:") else o3
                    )
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return rdf.mapInPandas(run, schema="subj string, pred string, obj string")
