"""Deterministic tokenizer for source code + prose.

Reference semantics: sling/nlp/document/text-tokenizer.cc tokenizes UTF-8
text into tokens carrying [begin,end) offsets, break level (none/space/
sentence/paragraph — token-properties.h) and a cached fingerprint + case
form (document.h:62-123). For source code (our corpus per
BASELINE.json input_hint), the analog of "sentence" is a LINE (SURVEY.md
§1.3: sentences are lines/declaration units) and tokens are lexer tokens.

This module is pure Python (regex-based) and is called from Arrow-batched
pandas UDFs (one call per document, batched per RecordBatch) and from the
oracle. Offsets are Unicode codepoint offsets into ``content``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .fingerprint import token_fp
from .normalize import case_form

# identifiers | numbers | any single non-space symbol char
_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?|[^\sA-Za-z0-9_]")

BREAK_NONE = 0
BREAK_SPACE = 1
BREAK_SENTENCE = 2  # start of a new line
BREAK_PARAGRAPH = 3  # line preceded by >=1 blank line


@dataclass(frozen=True)
class Token:
    begin: int  # codepoint offset into content
    end: int
    word: str
    brk: int
    fp: int
    form: int


def tokenize(content: str) -> list[Token]:
    """Tokenize a document. Line = sentence unit (code semantics)."""
    tokens: list[Token] = []
    offset = 0
    pending_break = BREAK_NONE  # break level carried to next line's first token
    first_line = True
    for line in content.split("\n"):
        line_break = BREAK_NONE if first_line else pending_break
        if line.strip() == "":
            # blank line upgrades the next line's break to paragraph
            pending_break = BREAK_PARAGRAPH
            offset += len(line) + 1
            first_line = False
            continue
        pending_break = BREAK_SENTENCE
        first_in_line = True
        for m in _TOKEN_RE.finditer(line):
            word = m.group(0)
            begin = offset + m.start()
            if first_in_line:
                # the document's very first token carries no break
                brk = line_break if tokens else BREAK_NONE
                first_in_line = False
            else:
                prev_end = tokens[-1].end
                brk = BREAK_SPACE if begin > prev_end else BREAK_NONE
            tokens.append(
                Token(
                    begin=begin,
                    end=offset + m.end(),
                    word=word,
                    brk=brk,
                    fp=token_fp(word),
                    form=case_form(word),
                )
            )
        offset += len(line) + 1
        first_line = False
    return tokens


def phrase_fingerprint(text: str) -> int:
    """Phrase fingerprint of free text under THIS tokenizer — the alias
    table must fingerprint phrases exactly as corpus spans are
    fingerprinted or lookups never match (phrase-tokenizer.h:27-44
    FingerprintAndForm invariant). E.g. "Node.js" is three code tokens;
    its fp is cat(fp("node"), fp("js")) with the "." skipped."""
    from .fingerprint import FP_INVALID, FP_SKIPPED, fingerprint_cat

    fp = FP_INVALID
    for t in tokenize(text):
        if t.fp == FP_SKIPPED:
            continue
        fp = t.fp if fp == FP_INVALID else fingerprint_cat(fp, t.fp)
    return fp if fp != FP_INVALID else FP_SKIPPED


def phrase_form(text: str) -> int:
    """Case form of a phrase under this tokenizer (alpha tokens only)."""
    from .normalize import CASE_NONE

    forms = [t.form for t in tokenize(text) if any(c.isalpha() for c in t.word)]
    if not forms:
        return CASE_NONE
    return forms[0] if all(f == forms[0] for f in forms) else CASE_NONE


def sentences(tokens: list[Token]) -> list[tuple[int, int]]:
    """Half-open [begin, end) token-index ranges of sentence units
    (separated by BREAK_SENTENCE/BREAK_PARAGRAPH)."""
    if not tokens:
        return []
    bounds: list[tuple[int, int]] = []
    start = 0
    for i in range(1, len(tokens)):
        if tokens[i].brk >= BREAK_SENTENCE:
            bounds.append((start, i))
            start = i
    bounds.append((start, len(tokens)))
    return bounds
