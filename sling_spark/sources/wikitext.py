"""Wikitext (MediaWiki markup) parsing → AST + structured extraction.

Reference semantics: the wikipedia importer parses article markup into an
AST of typed nodes — templates, links, categories, headings, tables,
font markup, refs/comments stripped — and then extracts plain text,
anchored links and infobox templates from it (reference
sling/nlp/wiki/wiki-parser.cc / wiki-annotator.cc). This module is an
ORIGINAL recursive-descent implementation of the public MediaWiki
syntax, producing:

- a flat node table (Spark-friendly: one row per AST node with parent
  links and [begin, end) source spans),
- scalar extractors (plain text, links, categories, templates,
  headings) used both by the Spark wrapper and by tests,
- an Arrow-batched DataFrame wrapper ``parse_articles`` emitting one
  row per article with the extracted structure as typed columns.

Scope: the node classes the KB pipeline consumes. Parsing is TOTAL on
garbage: it never raises. Unclosed templates and strip tags swallow to
EOF exactly like the reference stack parser (wiki-parser.cc leaves the
open node on the stack and EOF drops its children); other unbalanced
markup degrades to literal text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# node types (string enum — readable in DataFrames)
DOCUMENT = "document"
TEXT = "text"
TEMPLATE = "template"
ARG = "arg"
LINK = "link"
CATEGORY = "category"
MEDIA = "media"
URL = "url"
COMMENT = "comment"
REF = "ref"
NOWIKI = "nowiki"
MATH = "math"
FONT = "font"
HEADING = "heading"
LIST_ITEM = "list_item"
INDENT = "indent"
TERM = "term"
HR = "hr"
TABLE = "table"
ROW = "row"
CELL = "cell"
HEADER = "header"
CAPTION = "caption"

_MEDIA_PREFIXES = {"file", "image", "media"}
_STRIP_TAGS = {"ref", "math", "nowiki", "timeline", "gallery", "mapframe"}


@dataclass
class Node:
    """One AST node; ``param`` carries the heading level, list depth or
    font weight; ``name`` the template/link target."""

    id: int
    parent: int
    type: str
    param: int
    begin: int
    end: int
    name: str = ""


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.n = len(text)
        self.pos = 0
        self.nodes: list[Node] = [Node(0, -1, DOCUMENT, 0, 0, self.n)]

    def add(self, parent: int, type_: str, param: int, begin: int, end: int,
            name: str = "") -> int:
        nid = len(self.nodes)
        self.nodes.append(Node(nid, parent, type_, param, begin, end, name))
        return nid

    # -- top level ----------------------------------------------------------

    def parse(self) -> list[Node]:
        while self.pos < self.n:
            line_start = self.pos == 0 or self.text[self.pos - 1] == "\n"
            if line_start and self.parse_line_element():
                continue
            # inline run to end of line — ALWAYS consumes or terminates,
            # also when control returns mid-line (e.g. after a table)
            self.parse_inline_until(0, ("\n",))
            if self.pos < self.n and self.text[self.pos] == "\n":
                self.pos += 1
        return self.nodes

    def parse_line_element(self) -> bool:
        """Elements that must start a line. Returns True if consumed."""
        t, p = self.text, self.pos
        if t.startswith("=", p):
            return self.parse_heading()
        if t.startswith("----", p):
            e = p
            while e < self.n and t[e] == "-":
                e += 1
            self.add(0, HR, 0, p, e)
            self.pos = e
            self._skip_newline()
            return True
        if t.startswith("{|", p):
            return self.parse_table(0)
        for marker, type_ in (("*", LIST_ITEM), ("#", LIST_ITEM),
                              (":", INDENT), (";", TERM)):
            if t.startswith(marker, p):
                depth = 0
                while p + depth < self.n and t[p + depth] == marker:
                    depth += 1
                nid = self.add(0, type_, depth, p, p)  # end patched below
                self.pos = p + depth
                self.parse_inline_until(nid, ("\n",))
                self.nodes[nid].end = self.pos
                self._skip_newline()
                return True
        return False

    def _skip_newline(self):
        if self.pos < self.n and self.text[self.pos] == "\n":
            self.pos += 1

    def parse_heading(self) -> bool:
        t, p = self.text, self.pos
        level = 0
        while p + level < self.n and t[p + level] == "=" and level < 6:
            level += 1
        eol = t.find("\n", p)
        if eol == -1:
            eol = self.n
        line = t[p:eol].rstrip()
        if not line.endswith("=" * level) or len(line) < 2 * level + 1:
            return False  # not a well-formed heading: fall through to text
        nid = self.add(0, HEADING, level, p, eol)
        inner_begin = p + level
        inner_end = p + len(line) - level
        inner_src = t[inner_begin:inner_end]
        sub = _Parser(inner_src)
        sub_nodes = sub.parse()
        # rendered heading text (links → anchors, markup stripped), not
        # the raw inner markup — computed before offsets are rebased
        sub_bp: dict[int, list[Node]] = {}
        for node in sub_nodes:
            sub_bp.setdefault(node.parent, []).append(node)
        rendered = _plain(sub_nodes, sub_bp, 0, inner_src).strip()
        for node in sub_nodes[1:]:
            node.id = len(self.nodes)
            node.parent = nid if node.parent == 0 else node.parent + nid
            node.begin += inner_begin
            node.end += inner_begin
            self.nodes.append(node)
        self.nodes[nid].name = rendered or inner_src.strip()
        self.pos = eol
        self._skip_newline()
        return True

    # -- tables -------------------------------------------------------------

    def parse_table(self, parent: int) -> bool:
        t = self.text
        start = self.pos
        tid = self.add(parent, TABLE, 0, start, start)
        self.pos += 2
        self._skip_to_eol()
        row = -1
        while self.pos < self.n:
            if t.startswith("|}", self.pos):
                self.pos += 2
                break
            if t.startswith("{|", self.pos):
                # nested table: recurse so the inner |} cannot
                # terminate the outer table
                self.parse_table(tid)
                continue
            if t.startswith("|-", self.pos):
                row = self.add(tid, ROW, 0, self.pos, self.pos)
                self.pos += 2
                self._skip_to_eol()
                continue
            if t.startswith("|+", self.pos):
                nid = self.add(tid, CAPTION, 0, self.pos, self.pos)
                self.pos += 2
                self.parse_inline_until(nid, ("\n",))
                self.nodes[nid].end = self.pos
                self._skip_newline()
                continue
            if t.startswith("!", self.pos) or t.startswith("|", self.pos):
                header = t[self.pos] == "!"
                sep = "!!" if header else "||"
                self.pos += 1
                while True:
                    cid = self.add(row if row != -1 else tid,
                                   HEADER if header else CELL, 0,
                                   self.pos, self.pos)
                    self.parse_inline_until(cid, ("\n", sep))
                    self.nodes[cid].end = self.pos
                    if t.startswith(sep, self.pos):
                        self.pos += 2
                        continue
                    break
                self._skip_newline()
                continue
            # garbage inside table: consume the line as text
            nid = self.add(tid, TEXT, 0, self.pos, self.pos)
            self.parse_inline_until(nid, ("\n",))
            self.nodes[nid].end = self.pos
            self._skip_newline()
        self.nodes[tid].end = self.pos
        return True

    def _skip_to_eol(self):
        eol = self.text.find("\n", self.pos)
        self.pos = self.n if eol == -1 else eol + 1

    # -- inline -------------------------------------------------------------

    def parse_inline_until(self, parent: int, stops: tuple) -> None:
        t = self.text
        text_start = self.pos

        def flush(end: int):
            if end > text_start:
                self.add(parent, TEXT, 0, text_start, end)

        while self.pos < self.n:
            for s in stops:
                if t.startswith(s, self.pos):
                    flush(self.pos)
                    return
            c = t[self.pos]
            if c == "{" and t.startswith("{{", self.pos):
                flush(self.pos)
                self.parse_template(parent)
                text_start = self.pos
            elif c == "[" and t.startswith("[[", self.pos):
                flush(self.pos)
                self.parse_link(parent)
                text_start = self.pos
            elif c == "[" and self._url_ahead():
                flush(self.pos)
                self.parse_url(parent)
                text_start = self.pos
            elif c == "<" and t.startswith("<!--", self.pos):
                flush(self.pos)
                end = t.find("-->", self.pos)
                end = self.n if end == -1 else end + 3
                self.add(parent, COMMENT, 0, self.pos, end)
                self.pos = end
                text_start = self.pos
            elif c == "<" and self._strip_tag_ahead():
                flush(self.pos)
                self.parse_strip_tag(parent)
                text_start = self.pos
            elif c == "'" and t.startswith("''", self.pos):
                flush(self.pos)
                q = 2
                while self.pos + q < self.n and t[self.pos + q] == "'" and q < 5:
                    q += 1
                self.add(parent, FONT, q, self.pos, self.pos + q)
                self.pos += q
                text_start = self.pos
            else:
                self.pos += 1
        flush(self.pos)

    def _url_ahead(self) -> bool:
        m = re.match(r"\[(https?|ftp)://", self.text[self.pos:self.pos + 12])
        return m is not None

    def _strip_tag_ahead(self) -> bool:
        m = re.match(r"<(\w+)", self.text[self.pos:self.pos + 16])
        return bool(m and m.group(1).lower() in _STRIP_TAGS)

    def parse_strip_tag(self, parent: int) -> None:
        t = self.text
        m = re.match(r"<(\w+)[^>]*?(/?)>", t[self.pos:self.pos + 256])
        if not m:
            self.pos += 1
            return
        tag = m.group(1).lower()
        type_ = {"ref": REF, "math": MATH, "nowiki": NOWIKI}.get(tag, REF)
        start = self.pos
        if m.group(2) == "/":  # self-closing
            self.add(parent, type_, 0, start, start + m.end())
            self.pos = start + m.end()
            return
        close = t.find(f"</{tag}", start + m.end())
        if close == -1:
            end = self.n
        else:
            gt = t.find(">", close)
            end = self.n if gt == -1 else gt + 1
        self.add(parent, type_, 0, start, end)
        self.pos = end

    def parse_template(self, parent: int) -> None:
        t = self.text
        start = self.pos
        self.pos += 2
        # name runs to | or }} at depth 0; a nested {{...}} inside the
        # name (e.g. {{outer {{inner}}|...}}) is consumed whole
        depth = 0
        name_end = self.pos
        while name_end < self.n:
            if t.startswith("}}", name_end):
                if depth == 0:
                    break
                depth -= 1
                name_end += 2
                continue
            if t[name_end] == "|" and depth == 0:
                break
            if t.startswith("{{", name_end):
                depth += 1
                name_end += 2
                continue
            name_end += 1
        name = t[self.pos:name_end].strip()
        nid = self.add(parent, TEMPLATE, 0, start, start, name=name)
        self.pos = name_end
        while self.pos < self.n and not t.startswith("}}", self.pos):
            if t[self.pos] == "|":
                self.pos += 1
                aid = self.add(nid, ARG, 0, self.pos, self.pos)
                self.parse_inline_until(aid, ("|", "}}"))
                self.nodes[aid].end = self.pos
            else:
                self.pos += 1
        if t.startswith("}}", self.pos):
            self.pos += 2
        self.nodes[nid].end = self.pos

    def parse_link(self, parent: int) -> None:
        t = self.text
        start = self.pos
        self.pos += 2
        bar = -1
        end = self.pos
        depth = 0
        while end < self.n:
            if t.startswith("]]", end) and depth == 0:
                break
            if t.startswith("[[", end):
                depth += 1
                end += 2
                continue
            if t.startswith("]]", end):
                depth -= 1
                end += 2
                continue
            if t[end] == "|" and bar == -1 and depth == 0:
                bar = end
            end += 1
        target = t[self.pos:(bar if bar != -1 else end)].strip()
        ns = target.partition(":")[0].strip().lower()
        if ns == "category":
            type_ = CATEGORY
        elif ns in _MEDIA_PREFIXES:
            type_ = MEDIA
        else:
            type_ = LINK
        close = end + 2 if t.startswith("]]", end) else end
        nid = self.add(parent, type_, 0, start, close, name=target)
        if bar != -1:
            aid = self.add(nid, ARG, 0, bar + 1, end)
            # anchor text may itself contain markup
            sub = _Parser(t[bar + 1:end])
            for node in sub.parse()[1:]:
                node.id = len(self.nodes)
                node.parent = aid if node.parent == 0 else node.parent + aid
                node.begin += bar + 1
                node.end += bar + 1
                self.nodes.append(node)
        self.pos = close

    def parse_url(self, parent: int) -> None:
        t = self.text
        start = self.pos
        end = t.find("]", start)
        end = self.n if end == -1 else end
        inner = t[start + 1:end]
        url, _, _anchor = inner.partition(" ")
        self.add(parent, URL, 0, start, min(end + 1, self.n), name=url)
        self.pos = min(end + 1, self.n)


def parse_wikitext(text: str) -> list[Node]:
    """Parse wikitext into a flat AST node list (node 0 = document).
    Total: malformed markup degrades to TEXT, never raises."""
    return _Parser(text or "").parse()


# ---------------------------------------------------------------------------
# extractors
# ---------------------------------------------------------------------------


def extract_links(nodes: list[Node], text: str) -> list[tuple[str, str]]:
    """(target, anchor) pairs for content links (LINK nodes). The anchor
    is the piped text (markup-stripped) or the target itself."""
    out = []
    by_parent: dict[int, list[Node]] = {}
    for n in nodes:
        by_parent.setdefault(n.parent, []).append(n)
    for n in nodes:
        if n.type != LINK:
            continue
        args = [c for c in by_parent.get(n.id, []) if c.type == ARG]
        if args:
            anchor = _plain(nodes, by_parent, args[0].id, text).strip()
            anchor = anchor or n.name
        else:
            anchor = n.name
        out.append((n.name, anchor))
    return out


def extract_categories(nodes: list[Node]) -> list[str]:
    return [n.name.partition(":")[2].strip() for n in nodes if n.type == CATEGORY]


def extract_templates(nodes: list[Node], text: str) -> list[dict]:
    """[{name, args: {key_or_index: value}}] — positional args keyed by
    1-based index, named args split on the first '='."""
    by_parent: dict[int, list[Node]] = {}
    for n in nodes:
        by_parent.setdefault(n.parent, []).append(n)
    out = []
    for n in nodes:
        if n.type != TEMPLATE:
            continue
        args: dict[str, str] = {}
        pos_i = 0
        for a in by_parent.get(n.id, []):
            if a.type != ARG:
                continue
            raw = _plain(nodes, by_parent, a.id, text)
            key, eq, val = raw.partition("=")
            if eq and re.fullmatch(r"[\w\- ]+", key.strip() or "_"):
                args[key.strip()] = val.strip()
            else:
                pos_i += 1
                args[str(pos_i)] = raw.strip()
        out.append({"name": n.name, "args": args})
    return out


def extract_headings(nodes: list[Node]) -> list[tuple[int, str]]:
    return [(n.param, n.name) for n in nodes if n.type == HEADING]


def _plain(nodes, by_parent, nid: int, text: str) -> str:
    parts = []
    for c in by_parent.get(nid, []):
        if c.type == TEXT:
            parts.append(text[c.begin:c.end])
        elif c.type in (LINK,):
            args = [a for a in by_parent.get(c.id, []) if a.type == ARG]
            if args:
                parts.append(_plain(nodes, by_parent, args[0].id, text))
            else:
                parts.append(c.name)
        elif c.type in (ARG, LIST_ITEM, INDENT, TERM, CELL, HEADER, CAPTION,
                        ROW, TABLE, HEADING):
            parts.append(_plain(nodes, by_parent, c.id, text))
        # templates, refs, comments, media, categories, fonts: dropped
    return "".join(parts)


def extract_emphasis(
    nodes: list[Node],
    text: str,
    max_length: int = 20,
    intro_max_offset: int = 5,
) -> list[tuple[str, str, bool]]:
    """Bold/italic phrase extraction — the EmphasisAnnotator +
    IntroAnnotator analogs over the wikitext AST (reference
    sling/nlp/silver/mentions.cc:185-252; limits mentions.h:144,163-166:
    phrases longer than ``max_length`` words are skipped, the intro
    phrase must begin within the first ``intro_max_offset`` words).

    Walks the tree in document order tracking font state (FONT nodes:
    param 2 = italic toggle, 3/4 = bold toggle, 5 = both): the plain
    text (TEXT pieces + link anchors; templates/refs/comments dropped)
    between a begin marker and its matching end marker — or the block
    end, as the reference scans to the chart end — is the emphasized
    phrase. The FIRST bold phrase that starts before any heading and
    within ``intro_max_offset`` words of the article start is flagged
    ``intro`` (IntroAnnotator: the bolded first-sentence phrase names
    the page topic). Returns (phrase, style, intro) tuples in order."""
    by_parent: dict[int, list[Node]] = {}
    for n in nodes:
        by_parent.setdefault(n.parent, []).append(n)
    out: list[tuple[str, str, bool]] = []
    st: dict = {"bold": None, "italic": None, "words": 0,
                "heading": False, "intro_used": False}

    def begin(style: str) -> None:
        st[style] = ([], st["words"], not st["heading"])

    def close(style: str) -> None:
        pieces, start_words, pre_heading = st[style]
        st[style] = None
        phrase = re.sub(r"\s+", " ", "".join(pieces)).strip()
        if not phrase or len(phrase.split()) > max_length:
            return
        intro = (
            style == "bold"
            and pre_heading
            and start_words < intro_max_offset
            and not st["intro_used"]
        )
        if intro:
            st["intro_used"] = True
        out.append((phrase, style, intro))

    def add_text(s: str) -> None:
        for style in ("bold", "italic"):
            if st[style] is not None:
                st[style][0].append(s)
        st["words"] += len(s.split())

    def walk(nid: int) -> None:
        for c in by_parent.get(nid, []):
            t = c.type
            if t == TEXT:
                add_text(text[c.begin:c.end])
            elif t == FONT:
                q = c.param
                if q >= 5:
                    toggles = ("bold", "italic")
                elif q >= 3:
                    toggles = ("bold",)
                else:
                    toggles = ("italic",)
                for style in toggles:
                    close(style) if st[style] is not None else begin(style)
            elif t == HEADING:
                st["heading"] = True
                for style in ("bold", "italic"):  # block boundary closes
                    if st[style] is not None:
                        close(style)
                walk(c.id)
            elif t == LINK:
                args = [a for a in by_parent.get(c.id, []) if a.type == ARG]
                if args:
                    walk(args[0].id)
                else:
                    add_text(c.name)
            elif t in (ARG, LIST_ITEM, INDENT, TERM, CELL, HEADER, CAPTION,
                       ROW, TABLE):
                walk(c.id)
            # templates, refs, comments, media, categories: dropped

    walk(0)
    for style in ("bold", "italic"):  # unclosed at EOF → scan-to-end
        if st[style] is not None:
            close(style)
    return out


def extract_plain_text(text: str, nodes: list[Node] | None = None) -> str:
    """Markup-stripped article text: templates/refs/comments/media/
    categories dropped, links replaced by their anchor text, font
    markers removed, headings kept on their own lines. Line breaks
    between top-level parts follow the reference text sink
    (wiki-extractor.cc:366-399 Content): a single source newline
    renders as a space, a blank line (paragraph) as a newline — so
    consecutive text lines never fuse word-to-word."""
    nodes = nodes or parse_wikitext(text)
    by_parent: dict[int, list[Node]] = {}
    for n in nodes:
        by_parent.setdefault(n.parent, []).append(n)
    parts: list[str] = []
    prev_end = -1

    def sep(begin: int) -> None:
        # separator implied by the source gap between rendered parts
        # (the gap holds consumed newlines plus any dropped markup)
        if 0 <= prev_end < begin:
            nl = text.count("\n", prev_end, begin)
            if nl >= 2:
                parts.append("\n")
            elif nl == 1:
                parts.append(" ")

    for c in by_parent.get(0, []):
        if c.type == HEADING:
            sep(c.begin)
            parts.append("\n" + _plain(nodes, by_parent, c.id, text).strip() + "\n")
        elif c.type == TEXT:
            sep(c.begin)
            parts.append(text[c.begin:c.end])
        elif c.type == LINK:
            args = [a for a in by_parent.get(c.id, []) if a.type == ARG]
            sep(c.begin)
            parts.append(
                _plain(nodes, by_parent, args[0].id, text) if args else c.name
            )
        elif c.type in (LIST_ITEM, INDENT, TERM, TABLE):
            sep(c.begin)
            parts.append(_plain(nodes, by_parent, c.id, text) + "\n")
        else:
            continue
        prev_end = c.end
    out = re.sub(r"[ \t]+", " ", "".join(parts))
    out = re.sub(r" ?\n ?", "\n", out)
    return re.sub(r"\n+", "\n", out).strip()


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

ARTICLE_SCHEMA = (
    "title string, plain string, "
    "links array<struct<target string, anchor string>>, "
    "categories array<string>, "
    "templates array<struct<name string, args map<string,string>>>, "
    "headings array<struct<level int, text string>>, "
    "emphasis array<struct<phrase string, style string, intro boolean>>"
)


def parse_articles(articles, title_col: str = "title", text_col: str = "wikitext"):
    """Arrow-batched wikitext parsing: one row per article with the
    extracted structure as typed columns (wikitext crosses into Python
    once; the emitted structure is orders of magnitude smaller)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for title, wt in zip(pdf[title_col], pdf[text_col]):
                nodes = parse_wikitext(wt)
                rows.append(
                    {
                        "title": title,
                        "plain": extract_plain_text(wt, nodes),
                        "links": [
                            {"target": t, "anchor": a}
                            for t, a in extract_links(nodes, wt)
                        ],
                        "categories": extract_categories(nodes),
                        "templates": [
                            {"name": t["name"], "args": t["args"]}
                            for t in extract_templates(nodes, wt)
                        ],
                        "headings": [
                            {"level": lv, "text": tx}
                            for lv, tx in extract_headings(nodes)
                        ],
                        "emphasis": [
                            {"phrase": ph, "style": sty, "intro": intro}
                            for ph, sty, intro in extract_emphasis(nodes, wt)
                        ],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["title", "plain", "links", "categories",
                         "templates", "headings", "emphasis"],
            )

    return articles.select(title_col, text_col).mapInPandas(
        run, schema=ARTICLE_SCHEMA
    )


def wikipedia_alias_rows(parsed, mapping, lang: str = "en"):
    """Anchor-alias extraction from parsed articles (the alias-extractor
    corpus side, reference sling/nlp/wiki/aliases.cc:40-240): every
    content link is an observed (anchor text → target page) pair;
    aggregate counts per (target, anchor), resolve targets to QIDs via
    the wikipedia_mapping dimension (articles only), and emit alias rows
    (entity, alias, fp, count, form, sources=SRC_ANCHOR) ready for
    select_aliases. Counting is one hash aggregation; the mapping join
    is broadcast-sized."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..sources.kb import SRC_ANCHOR

    anchors = (
        parsed.select(F.explode("links").alias("l"))
        .select(F.col("l.target").alias("target"), F.col("l.anchor").alias("anchor"))
        .filter((F.length("anchor") > 0) & (F.length("target") > 0))
        .groupBy("target", "anchor")
        .agg(F.count("*").cast("int").alias("count"))
    )
    articles = mapping.filter(F.col("kind") == "article").select(
        F.col("wiki_id"), F.col("qid")
    )
    from ..sources.wikidata import wiki_title_norm

    resolved = anchors.withColumn(
        "wiki_id", F.concat(F.lit(f"/wp/{lang}/"), wiki_title_norm(F.col("target")))
    ).join(F.broadcast(articles), on="wiki_id")

    def finish(batches):
        from ..functions.tokenize import phrase_fingerprint, phrase_form

        for pdf in batches:
            rows = []
            for qid, anchor, count in zip(pdf["qid"], pdf["anchor"], pdf["count"]):
                rows.append(
                    {
                        "entity": qid,
                        "alias": anchor,
                        "fp": phrase_fingerprint(anchor),
                        "count": int(count),
                        "form": phrase_form(anchor),
                        "sources": SRC_ANCHOR,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["entity", "alias", "fp", "count", "form", "sources"]
            )

    return resolved.select("qid", "anchor", "count").mapInPandas(
        finish,
        schema="entity string, alias string, fp long, count int, form int, sources int",
    )


def wikipedia_intro_alias_rows(parsed, mapping, lang: str = "en"):
    """Intro-phrase alias emission — the IntroAnnotator's topic binding
    re-expressed for the alias table (reference
    sling/nlp/silver/mentions.cc:218-252: the bolded span in the first
    sentence evokes the page's own topic item). Each article's
    intro-flagged bold phrase becomes an alias row for the article's OWN
    QID (title resolved through the wikipedia_mapping dimension, same
    normalization as link targets), so later plain-text mentions of the
    bolded name resolve to the topic. One explode + one broadcast join +
    one Arrow pass; counts are 1 per article (the phrase was asserted
    once, by the article itself).

    Source class is SRC_ALIAS (trusted): the reference IntroAnnotator
    binds the topic DIRECTLY on the chart, bypassing anchor-count
    thresholds entirely — the article declaring its own bolded name is
    authoritative, so the alias-table re-expression must survive the
    selector the same way curated aliases do (aliases.cc:557-561 only
    thresholds PURE corpus anchors)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..sources.kb import SRC_ALIAS
    from ..sources.wikidata import wiki_title_norm

    intros = (
        parsed.select("title", F.explode("emphasis").alias("em"))
        .filter(F.col("em.intro"))
        .select("title", F.col("em.phrase").alias("anchor"))
    )
    articles = mapping.filter(F.col("kind") == "article").select(
        F.col("wiki_id"), F.col("qid")
    )
    resolved = intros.withColumn(
        "wiki_id", F.concat(F.lit(f"/wp/{lang}/"), wiki_title_norm(F.col("title")))
    ).join(F.broadcast(articles), on="wiki_id")

    def finish(batches):
        from ..functions.tokenize import phrase_fingerprint, phrase_form

        for pdf in batches:
            rows = []
            for qid, anchor in zip(pdf["qid"], pdf["anchor"]):
                rows.append(
                    {
                        "entity": qid,
                        "alias": anchor,
                        "fp": phrase_fingerprint(anchor),
                        "count": 1,
                        "form": phrase_form(anchor),
                        "sources": SRC_ALIAS,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["entity", "alias", "fp", "count", "form", "sources"]
            )

    return resolved.select("qid", "anchor").mapInPandas(
        finish,
        schema="entity string, alias string, fp long, count int, form int, sources int",
    )
