"""XML frame I/O — the sling/frame/xml.cc reader analog (the last
round-3 "missing" row).

Reference semantics (xml.cc:30-86 XMLReader): every element becomes a
slot named by its tag; attributes become slots of the element's frame;
text chunks become slots under the ``is`` role; an element whose only
content is one text chunk collapses to that string; an empty element's
value is nil; nested elements become nested frames. We reproduce that
slot algebra with the same mark-stack construction over an expat SAX
scan, then flatten the frame tree to (subj, pred, obj) triples so the
result lands in the engine's uniform triple representation: frame
nodes get ``_:e<n>`` ids in document order (or their ``id`` attribute
when present, matching the reader's id-slot special case), text-only
values stay literals, and the ``is`` role carries mixed text.

Whitespace-only text between elements is skipped (the XML
pretty-printing artifact; element-content whitespace inside mixed
content is preserved).

Scale shape: like Turtle, an XML document is not splittable mid-file,
so the distributed reader parses one file per task
(spark.read.text(wholetext) → mapInPandas) with per-file blank-node
salting — the many-file dump layout parallelizes. For a single giant
record-structured dump (the 70 GB Wikipedia case), use
sources.dumpsplit.read_xml_dump: byte-range tasks that scan to record
boundaries, the wikipedia-importer.cc:322 recipe.
"""

from __future__ import annotations

import xml.parsers.expat

# The text role (Handle::is analog). A unique sentinel OBJECT, not the
# string "is": the collapse/merge checks compare slot names with `is`,
# and a literal XML attribute named "is" must never be mistaken for a
# text chunk (CPython may intern the expat-returned attribute name to
# the same string object). The sentinel maps to the string "is" only at
# triple-rendering time.
IS = object()
IS_NAME = "is"


class XmlFrameError(ValueError):
    pass


class _Frame:
    __slots__ = ("slots",)

    def __init__(self, slots):
        self.slots = slots  # list[(name, value)] — value: None | str | _Frame


def parse_xml_frame(text: str) -> tuple[str, object]:
    """Parse one XML document → (root_tag, value) where value is a
    string (single-text element), None (empty element) or a _Frame
    (attribute + child + text slots in document order) — the exact
    xml.cc slot construction."""
    slots: list[list] = []  # [name, value] cells (mutable)
    marks: list[int] = []

    def start(name, attrs):
        slots.append([name, None])
        marks.append(len(slots))
        for k, v in attrs.items():
            slots.append([k, v])

    def end(name):
        begin = marks.pop()
        size = len(slots) - begin
        if size == 0:
            return  # empty tag keeps nil value
        if size == 1 and slots[-1][0] is IS:
            text_val = slots.pop()[1]
            slots[-1][1] = text_val
        else:
            frame = _Frame([tuple(s) for s in slots[begin:]])
            del slots[begin:]
            slots[-1][1] = frame

    def chardata(data):
        # merge BEFORE the whitespace skip: expat delivers character
        # references and CDATA boundaries as separate chunks, so a
        # whitespace chunk inside an open text run ('hello&#32;world')
        # is real text — only inter-element whitespace (no run open)
        # is layout and skipped
        if slots and slots[-1][0] is IS:
            slots[-1][1] += data
            return
        if not data.strip():
            return
        slots.append([IS, data])

    p = xml.parsers.expat.ParserCreate()
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chardata
    try:
        p.Parse(text, True)
    except xml.parsers.expat.ExpatError as e:
        raise XmlFrameError(str(e)) from e
    if len(slots) != 1:
        raise XmlFrameError("document must have exactly one root element")
    name, value = slots[0]
    return name, value


def xml_to_triples(text: str) -> list[tuple[str, str, str]]:
    """Flatten the frame tree to (subj, pred, obj): frame nodes get
    ``_:e<n>`` ids in document order, or their ``id`` attribute when
    present (the reader's id-slot special case); literal slot values
    stay literals; nested frames link by node id."""
    counter = [0]
    triples: list[tuple[str, str, str]] = []

    def node_id(frame: _Frame) -> str:
        for name, value in frame.slots:
            if name == "id" and isinstance(value, str):
                return value
        nid = f"_:e{counter[0]}"
        counter[0] += 1
        return nid

    def walk(frame: _Frame) -> str:
        nid = node_id(frame)
        for name, value in frame.slots:
            pred = IS_NAME if name is IS else name
            if isinstance(value, _Frame):
                triples.append((nid, pred, walk(value)))
            elif value is None:
                triples.append((nid, pred, ""))
            else:
                triples.append((nid, pred, value))
        return nid

    root_name, value = parse_xml_frame(text)
    if isinstance(value, _Frame):
        walk(value)
        # keep the root element name reachable (the root slot analog)
        triples.insert(0, (node_id_of_root(value), "xml:root", root_name))
    else:
        triples.append(("_:e0", root_name, value or ""))
    return triples


def node_id_of_root(frame: _Frame) -> str:
    for name, value in frame.slots:
        if name == "id" and isinstance(value, str):
            return value
    return "_:e0"


def parse_xml_column(df, id_col: str, text_col: str):
    """Parse an XML-document string column → (doc_id, subj, pred, obj)
    rows, blank nodes salted per document id — for XML payloads already
    in a table (the usual lakehouse landing shape)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "subj": [], "pred": [], "obj": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                def salt(term: str) -> str:
                    return (
                        term.replace("_:", f"_:d{did}.", 1)
                        if term.startswith("_:")
                        else term
                    )

                for s, p, o in xml_to_triples(text):
                    rows["doc_id"].append(did)
                    rows["subj"].append(salt(s))
                    rows["pred"].append(p)
                    rows["obj"].append(salt(o))
            yield pd.DataFrame(rows, columns=["doc_id", "subj", "pred", "obj"])

    return df.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, subj string, pred string, obj string"
    )


def read_xml(spark, path: str):
    """Distributed XML import: one file per task, per-file blank-node
    salting (same contract as sources.turtle.read_turtle)."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = {"subj": [], "pred": [], "obj": []}
            for file, text in zip(pdf["file"], pdf["value"]):
                tag = hashlib.blake2b(file.encode(), digest_size=4).hexdigest()

                def salt(term: str) -> str:
                    return (
                        term.replace("_:", f"_:f{tag}.", 1)
                        if term.startswith("_:")
                        else term
                    )

                for s, p, o in xml_to_triples(text):
                    rows["subj"].append(salt(s))
                    rows["pred"].append(p)
                    rows["obj"].append(salt(o))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return files.mapInPandas(run, schema="subj string, pred string, obj string")
