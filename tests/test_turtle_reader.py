"""Full-grammar Turtle reader tests (reference sling/frame/turtle.cc;
round-3 verdict item 6: the reader must handle external Turtle the
engine's own emitter never produces)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sling_spark.sources.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    TurtleError,
    parse_turtle_full,
)

FOREIGN_DOC = """
@base <http://ex.org/> .
@prefix : <http://ex.org/ns#> .
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
# external-style document: constructs our emitter never writes
:alice a foaf:Person ;
    foaf:name "Alice \\"A\\""@en ;
    foaf:age 42 ;
    foaf:height 1.75 ;
    foaf:knows [ foaf:name 'Bob' ; foaf:nick \"\"\"multi
line\"\"\" ] ;
    :tags ( "x" "y" ) ;
    :active true ;
    :score "7"^^<http://www.w3.org/2001/XMLSchema#int> ;
    :ref <relative/path> .
_:ext foaf:knows :alice .
"""


def test_foreign_document_constructs():
    triples = set(parse_turtle_full(FOREIGN_DOC))
    ns = "http://ex.org/ns#"
    foaf = "http://xmlns.com/foaf/0.1/"
    assert (ns + "alice", RDF_TYPE, foaf + "Person") in triples
    assert (ns + "alice", foaf + "name", 'Alice "A"@en') in triples
    assert (ns + "alice", foaf + "age", "42") in triples
    assert (ns + "alice", foaf + "height", "1.75") in triples
    assert (ns + "alice", ns + "active", "true") in triples
    assert (
        ns + "alice", ns + "score",
        "7^^<http://www.w3.org/2001/XMLSchema#int>",
    ) in triples
    # relative IRI resolved against @base
    assert (ns + "alice", ns + "ref", "http://ex.org/relative/path") in triples
    # blank-node property list
    bnode = next(o for s, p, o in triples
                 if p == foaf + "knows" and s == ns + "alice")
    assert bnode.startswith("_:")
    assert (bnode, foaf + "name", "Bob") in triples
    assert (bnode, foaf + "nick", "multi\nline") in triples
    # collection expands to rdf:first/rest
    head = next(o for s, p, o in triples if p == ns + "tags")
    assert (head, RDF_FIRST, "x") in triples
    rest = next(o for s, p, o in triples if s == head and p == RDF_REST)
    assert (rest, RDF_FIRST, "y") in triples
    assert (rest, RDF_REST, RDF_NIL) in triples
    # labeled external blank node
    assert ("_:ext", foaf + "knows", ns + "alice") in triples


def test_errors_are_loud():
    for bad in ["x:y z:w .", "<a> <b> .", '<a> <b> "unterminated .',
                "@prefix p <http://x> ."]:
        with pytest.raises(TurtleError):
            parse_turtle_full(bad)


def test_read_turtle_distributed(spark, tmp_path):
    """One file per task; blank-node labels salted per file so ids
    never collide across files."""
    (tmp_path / "a.ttl").write_text(
        '@prefix : <http://x/> .\n:s :p [ :q "v1" ] .\n'
    )
    (tmp_path / "b.ttl").write_text(
        '@prefix : <http://x/> .\n:s :p [ :q "v2" ] .\n'
    )
    from sling_spark.sources.turtle import read_turtle

    rows = {tuple(r) for r in read_turtle(spark, str(tmp_path)).collect()}
    vals = {o for s, p, o in rows if p == "http://x/q"}
    assert vals == {"v1", "v2"}
    bnodes = {o for s, p, o in rows if p == "http://x/p"}
    assert len(bnodes) == 2 and all(b.startswith("_:f") for b in bnodes)


# --------------------------------------------------------------------------
# hypothesis round-trip over the extended constructs
# --------------------------------------------------------------------------

_LOCAL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789_", min_size=1, max_size=8
).filter(lambda s: not s[0].isdigit() and s[0] != "_")

_LITERAL_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\ud800"
    ),
    max_size=12,
)


def _quote(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    out = out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    return f'"{out}"'


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            _LOCAL,  # subject local name
            _LOCAL,  # predicate local name
            st.one_of(
                _LOCAL.map(lambda x: ("iri", x)),
                _LITERAL_TEXT.map(lambda x: ("lit", x)),
                _LITERAL_TEXT.map(lambda x: ("lang", x)),
                st.integers(-10**6, 10**6).map(lambda x: ("num", x)),
                st.booleans().map(lambda x: ("bool", x)),
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_hypothesis_roundtrip(rows):
    """Render arbitrary triples with the writer-side quoting rules over
    the EXTENDED constructs (lang tags, numbers, booleans) and parse
    them back exactly."""
    ns = "http://h.test/"
    lines = ["@prefix h: <http://h.test/> ."]
    expected = set()
    for s, p, (kind, v) in rows:
        if kind == "iri":
            obj_txt, obj_val = f"h:{v}", ns + v
        elif kind == "lit":
            obj_txt, obj_val = _quote(v), v
        elif kind == "lang":
            obj_txt, obj_val = _quote(v) + "@en-US", v + "@en-US"
        elif kind == "num":
            obj_txt, obj_val = str(v), str(v)
        else:
            obj_txt, obj_val = str(v).lower(), str(v).lower()
        lines.append(f"h:{s} h:{p} {obj_txt} .")
        expected.add((ns + s, ns + p, obj_val))
    got = set(parse_turtle_full("\n".join(lines)))
    assert got == expected


def test_xml_frame_reader(spark, tmp_path):
    """sling/frame/xml.cc slot algebra: elements -> slots, attributes ->
    frame slots, single-text collapse, 'is' text role, empty -> nil;
    distributed file reader salts blank nodes per file."""
    from sling_spark.sources.xmlframes import (
        XmlFrameError,
        parse_xml_frame,
        read_xml,
        xml_to_triples,
    )

    doc = ('<library id="lib1"><book isbn="1"><title>T</title></book>'
           "<empty/><note>a <b>x</b> b</note></library>")
    triples = set(xml_to_triples(doc))
    assert ("lib1", "xml:root", "library") in triples
    book = next(o for s, p, o in triples if p == "book")
    assert (book, "title", "T") in triples       # single-text collapse
    assert ("lib1", "empty", "") in triples      # empty element -> nil
    note = next(o for s, p, o in triples if p == "note")
    assert (note, "is", "a ") in triples and (note, "is", " b") in triples
    assert (note, "b", "x") in triples
    assert parse_xml_frame("<x>plain</x>") == ("x", "plain")
    import pytest as _pytest
    with _pytest.raises(XmlFrameError):
        xml_to_triples("<a><b></a>")

    (tmp_path / "a.xml").write_text("<r><v>1</v></r>")
    (tmp_path / "b.xml").write_text("<r><v>2</v></r>")
    rows = {tuple(r) for r in read_xml(spark, str(tmp_path)).collect()}
    assert {o for s, p, o in rows if p == "v"} == {"1", "2"}
    subs = {s for s, p, o in rows}
    assert len(subs) == 2 and all(s.startswith("_:f") for s in subs)


def test_parser_edge_cases_from_review():
    """Regression fixtures for grammar corners: integer followed
    directly by the statement dot ('1.' is int 1 + terminator, not a
    number), subjects whose pname STARTS with a directive keyword,
    'a' keyword before quoted objects, and dangling escapes."""
    ns = "http://x/"
    t = parse_turtle_full("@prefix h: <http://x/> .\nh:s h:p 1.\nh:s h:q -3.5 .")
    assert (ns + "s", ns + "p", "1") in t
    assert (ns + "s", ns + "q", "-3.5") in t
    # pname subjects that begin with 'prefix'/'base' are NOT directives
    t = parse_turtle_full(
        "@prefix prefix: <http://p/> .\n@prefix based: <http://b/> .\n"
        "prefix:x based:y prefix:z .\nbased:a a based:T ."
    )
    assert ("http://p/x", "http://b/y", "http://p/z") in t
    assert ("http://b/a", RDF_TYPE, "http://b/T") in t
    # 'a' keyword directly before a quoted object / blank node
    t = parse_turtle_full('@prefix h: <http://x/> .\nh:s a"T" .')
    assert (ns + "s", RDF_TYPE, "T") in t
    with pytest.raises(TurtleError):
        parse_turtle_full('<a> <b> "x\\')


def test_compact_statement_terminator():
    """W3C PN_LOCAL must not END with an unescaped dot, so the compact
    form ':s :p :o.' (no space before '.') is legal Turtle — the pname
    is ':o' and the dot terminates the statement (ADVICE r4). Interior
    and escaped dots stay part of the local name."""
    ns = "http://x/"
    t = parse_turtle_full(
        "@prefix : <http://x/> .\n"
        ":s :p :o.\n"
        ":x a :t.\n"
        ":z :p :o.b.\n"
        ":w :p :o\\.e.\n"
        ":m.n :p.q :r.s.\n"
    )
    assert (ns + "s", ns + "p", ns + "o") in t
    assert (ns + "x", RDF_TYPE, ns + "t") in t
    assert (ns + "z", ns + "p", ns + "o.b") in t        # interior dot kept
    assert (ns + "w", ns + "p", ns + "o.e") in t        # escaped dot kept
    assert (ns + "m.n", ns + "p.q", ns + "r.s") in t    # subject/predicate too
