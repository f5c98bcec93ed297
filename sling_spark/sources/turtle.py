"""General Turtle reader — full-grammar RDF import (round-3 verdict
item 6).

Reference semantics: sling/frame/turtle.cc implements a complete
Turtle tokenizer/parser for importing external RDF into the frame
store (directives, prefixed names, blank nodes, collections, typed and
language-tagged literals, numeric/boolean literals, long strings).
Round 3 shipped only the emitter-subset reader
(kg/materialize.py::parse_turtle); this module parses ARBITRARY
external Turtle — the first thing a user needs when importing an RDF
KB that this engine did not itself produce.

Supported grammar (W3C Turtle):

- ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``
- IRIs ``<...>`` (resolved against the base for relative IRIs),
  prefixed names incl. the empty prefix (``:local``), the ``a``
  keyword (rdf:type)
- string literals: ``"..."``, ``'...'``, long ``\"\"\"...\"\"\"`` /
  ``'''...'''`` forms; ``\\t \\n \\r \\" \\' \\\\ \\uXXXX \\UXXXXXXXX``
  escapes; language tags ``@en`` and typed literals ``^^<iri>`` /
  ``^^xsd:int`` (suffix preserved on the returned object term)
- numeric literals (integer / decimal / double) and booleans
- blank nodes ``_:label``, anonymous ``[]`` and blank-node property
  lists ``[ p o ; ... ]`` (stable generated ids ``_:b0``, ``_:b1``, …
  in encounter order)
- collections ``( a b c )`` → rdf:first / rdf:rest / rdf:nil triples
- predicate (``;``) and object (``,``) lists, ``#`` comments

Returned terms: IRIs as plain strings (no angle brackets), blank nodes
as ``_:<label>``, literals as their unescaped lexical value with any
``@lang`` / ``^^<datatype-iri>`` suffix appended verbatim — a lossless
flat encoding of the RDF term in one string column.

Scale shape: a Turtle document is not splittable mid-file (prefix
state), so the distributed reader (:func:`read_turtle`) parses one
FILE per task — ``spark.read.text(wholetext)`` → one mapInPandas —
which is exactly how a many-file RDF dump (the usual 100 TB layout)
parallelizes. A single giant header-directive dump (the wikidata
``latest-all.ttl`` shape) splits by byte range instead:
sources.dumpsplit.read_turtle_dump.
"""

from __future__ import annotations

import re

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

#: decimal/double forms REQUIRE digits after the dot — ``1.`` is the
#: integer 1 followed by the statement terminator, never a number
#: (matching the W3C INTEGER/DECIMAL/DOUBLE productions)
_NUM_RE = re.compile(
    r"[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+[eE][+-]?\d+|\d+)"
)
_PNAME_RE = re.compile(r"(?:[A-Za-z_][\w.-]*)?:(?:[\w.%-]|\\[-_~.!$&'()*+,;=/?#@%])*")
_BLANK_RE = re.compile(r"_:[\w-]+")
_LANG_RE = re.compile(r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*")
_KEYWORD_RE = re.compile(r"(?:@?prefix|@?base|a|true|false)\b", re.IGNORECASE)

_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


class TurtleError(ValueError):
    pass


class TurtleParser:
    """Recursive-descent parser over one Turtle document."""

    def __init__(self, text: str, base_iri: str = ""):
        self.text = text
        self.pos = 0
        self.base = base_iri
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[str, str, str]] = []
        self._blank = 0

    # -- scanner ----------------------------------------------------------

    def _skip_ws(self) -> None:
        t, n = self.text, len(self.text)
        while self.pos < n:
            c = t[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif c == "#":
                while self.pos < n and t[self.pos] != "\n":
                    self.pos += 1
            else:
                return

    def _peek(self) -> str:
        self._skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _expect(self, s: str) -> None:
        self._skip_ws()
        if not self.text.startswith(s, self.pos):
            raise TurtleError(
                f"expected {s!r} at offset {self.pos}: "
                f"{self.text[self.pos:self.pos + 24]!r}"
            )
        self.pos += len(s)

    def _match(self, s: str) -> bool:
        self._skip_ws()
        if self.text.startswith(s, self.pos):
            self.pos += len(s)
            return True
        return False

    def _match_re(self, rx: re.Pattern) -> str | None:
        self._skip_ws()
        m = rx.match(self.text, self.pos)
        if m is None:
            return None
        self.pos = m.end()
        return m.group(0)

    def _match_pname(self) -> str | None:
        """Match a prefixed name, honoring the W3C rule that PN_LOCAL
        may contain but not END with an unescaped '.' — so the compact
        form ``:s :p :o.`` (no space before the statement terminator)
        parses as the pname ``:o`` followed by '.'. Trailing unescaped
        dots are stripped from the match and the scanner rewound."""
        tok = self._match_re(_PNAME_RE)
        if tok is None:
            return None
        while tok.endswith(".") and not tok.endswith("\\."):
            tok = tok[:-1]
            self.pos -= 1
        return tok

    # -- terms ------------------------------------------------------------

    def _iriref(self) -> str:
        self._expect("<")
        end = self.text.find(">", self.pos)
        if end < 0:
            raise TurtleError("unterminated IRI")
        iri = self.text[self.pos:end]
        self.pos = end + 1
        iri = re.sub(
            r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})",
            lambda m: chr(int(m.group(1) or m.group(2), 16)),
            iri,
        )
        if self.base and not re.match(r"^[A-Za-z][\w+.-]*:", iri):
            return self.base + iri
        return iri

    def _pname(self, tok: str) -> str:
        ns, _, local = tok.partition(":")
        if ns not in self.prefixes:
            raise TurtleError(f"undeclared prefix {ns!r}")
        local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL_ESC
        return self.prefixes[ns] + local

    def _string(self) -> str:
        t = self.text
        for q in ('"""', "'''", '"', "'"):
            if t.startswith(q, self.pos):
                break
        else:
            raise TurtleError("expected string literal")
        self.pos += len(q)
        out = []
        n = len(t)
        while self.pos < n:
            if t.startswith(q, self.pos):
                self.pos += len(q)
                return "".join(out)
            c = t[self.pos]
            if c == "\\":
                if self.pos + 1 >= n:
                    raise TurtleError("dangling escape at end of input")
                e = t[self.pos + 1]
                if e == "u":
                    out.append(chr(int(t[self.pos + 2:self.pos + 6], 16)))
                    self.pos += 6
                elif e == "U":
                    out.append(chr(int(t[self.pos + 2:self.pos + 10], 16)))
                    self.pos += 10
                elif e in _ESCAPES:
                    out.append(_ESCAPES[e])
                    self.pos += 2
                else:
                    raise TurtleError(f"bad escape \\{e}")
            else:
                if len(q) == 1 and c == "\n":
                    raise TurtleError("newline in short string")
                out.append(c)
                self.pos += 1
        raise TurtleError("unterminated string")

    def _literal(self) -> str:
        value = self._string()
        lang = self._match_re(_LANG_RE)
        if lang:
            return value + lang
        if self._match("^^"):
            if self._peek() == "<":
                dt = self._iriref()
            else:
                tok = self._match_pname()
                if tok is None:
                    raise TurtleError("expected datatype after ^^")
                dt = self._pname(tok)
            return f"{value}^^<{dt}>"
        return value

    def _new_blank(self) -> str:
        b = f"_:b{self._blank}"
        self._blank += 1
        return b

    def _collection(self) -> str:
        """( o1 o2 ... ) → rdf:first/rest chain; returns the head."""
        self._expect("(")
        items = []
        while not self._match(")"):
            if self._peek() == "":
                raise TurtleError("unterminated collection")
            items.append(self._object())
        if not items:
            return RDF_NIL
        head = self._new_blank()
        node = head
        for i, it in enumerate(items):
            self.triples.append((node, RDF_FIRST, it))
            nxt = self._new_blank() if i + 1 < len(items) else RDF_NIL
            self.triples.append((node, RDF_REST, nxt))
            node = nxt
        return head

    def _blank_node_property_list(self) -> str:
        self._expect("[")
        node = self._new_blank()
        if not self._match("]"):
            self._predicate_object_list(node)
            self._expect("]")
        return node

    def _subject(self) -> str:
        c = self._peek()
        if c == "<":
            return self._iriref()
        if c == "(":
            return self._collection()
        if c == "[":
            return self._blank_node_property_list()
        tok = self._match_re(_BLANK_RE)
        if tok:
            return tok
        tok = self._match_pname()
        if tok:
            return self._pname(tok)
        raise TurtleError(f"expected subject at offset {self.pos}")

    def _predicate(self) -> str:
        self._skip_ws()
        # the 'a' keyword: a lone 'a' followed by anything that can
        # start an object (whitespace, IRI, string, collection, blank
        # node, comment) — but not a pname like 'a:x' or 'ab:x'
        if re.match(r"a[\s<#(\[\"'_]", self.text[self.pos:self.pos + 2] or ""):
            self.pos += 1
            return RDF_TYPE
        if self._peek() == "<":
            return self._iriref()
        tok = self._match_pname()
        if tok:
            return self._pname(tok)
        raise TurtleError(f"expected predicate at offset {self.pos}")

    def _object(self) -> str:
        c = self._peek()
        if c == "<":
            return self._iriref()
        if c in ('"', "'"):
            return self._literal()
        if c == "(":
            return self._collection()
        if c == "[":
            return self._blank_node_property_list()
        tok = self._match_re(_BLANK_RE)
        if tok:
            return tok
        self._skip_ws()
        if self.text.startswith("true", self.pos) and not re.match(
            r"[\w:]", self.text[self.pos + 4:self.pos + 5] or " "
        ):
            self.pos += 4
            return "true"
        if self.text.startswith("false", self.pos) and not re.match(
            r"[\w:]", self.text[self.pos + 5:self.pos + 6] or " "
        ):
            self.pos += 5
            return "false"
        m = _NUM_RE.match(self.text, self.pos)
        pm = _PNAME_RE.match(self.text, self.pos)
        # a pname like "v1.2:x" could start with digits after ns; prefer
        # pname when it extends past the number and contains ':'
        if m and (pm is None or pm.end() <= m.end()):
            self.pos = m.end()
            return m.group(0)
        tok = self._match_pname()
        if tok:
            return self._pname(tok)
        raise TurtleError(f"expected object at offset {self.pos}")

    # -- statements -------------------------------------------------------

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            pred = self._predicate()
            while True:
                self.triples.append((subj, pred, self._object()))
                if not self._match(","):
                    break
            if not self._match(";"):
                return
            # trailing ';' before '.' or ']' is legal
            if self._peek() in (".", "]", ""):
                return

    def parse(self) -> list[tuple[str, str, str]]:
        while True:
            self._skip_ws()
            if self.pos >= len(self.text):
                return self.triples
            low = self.text[self.pos:self.pos + 8].lower()

            def _kw(word: str) -> bool:
                # keyword match with a boundary check: a SUBJECT pname
                # like ``prefix:x`` or ``based:y`` must NOT be taken for
                # a directive — the keyword must be followed by
                # whitespace/comment (or '<' for the SPARQL BASE form)
                if not low.startswith(word):
                    return False
                nxt = self.text[self.pos + len(word):self.pos + len(word) + 1]
                return nxt in ("", " ", "\t", "\r", "\n", "#", "<")

            if _kw("@prefix") or _kw("prefix"):
                self.pos += 7 if low.startswith("@prefix") else 6
                self._skip_ws()
                tok = self._match_re(_PNAME_RE)
                if tok is None or not tok.endswith(":"):
                    raise TurtleError("malformed prefix directive")
                self.prefixes[tok[:-1]] = self._iriref()
                self._match(".")  # '.' required after '@prefix' only
                continue
            if _kw("@base") or _kw("base"):
                self.pos += 5 if low.startswith("@base") else 4
                self.base = self._iriref()
                self._match(".")
                continue
            subj = self._subject()
            # a lone blank-node property list may omit the
            # predicate-object list ("[] ." or "[ p o ] .")
            if self._peek() != ".":
                self._predicate_object_list(subj)
            self._expect(".")


def parse_turtle_full(text: str, base_iri: str = "") -> list[tuple[str, str, str]]:
    """Parse one Turtle document → (subj, pred, obj) triples."""
    return TurtleParser(text, base_iri).parse()


def read_turtle(spark, path: str, base_iri: str = ""):
    """Distributed Turtle import: one file per task (prefix state is
    file-scoped, so files are the parallel unit), each parsed by the
    full-grammar parser in an Arrow batch pass. Blank-node labels are
    prefixed with a per-file hash so ids never collide across files."""
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
                for s, p, o in parse_turtle_full(text, base_iri):
                    rows["subj"].append(
                        s.replace("_:", f"_:f{tag}.", 1) if s.startswith("_:") else s
                    )
                    rows["pred"].append(p)
                    rows["obj"].append(
                        o.replace("_:", f"_:f{tag}.", 1) if o.startswith("_:") else o
                    )
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    return files.mapInPandas(run, schema="subj string, pred string, obj string")
