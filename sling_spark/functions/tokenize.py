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
from functools import lru_cache
from typing import NamedTuple

from .fingerprint import token_fp
from .normalize import PRONOUN_GENDER, case_form

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


_LIT_START: frozenset | None = None


def _lit_start_words() -> frozenset:
    """Lowercased words that can OPEN a literal mention span without a
    leading digit: month names/abbreviations and spelled numbers. A
    strict superset of the starts `_literal_candidates` can accept for
    alpha tokens (month_of_word only narrows by capitalization), so the
    per-token `lit0` flag below is a sound pre-filter."""
    global _LIT_START
    if _LIT_START is None:
        from .dates import _ALL_MONTHS
        from .numbers import SPELLED

        _LIT_START = frozenset(_ALL_MONTHS) | frozenset(SPELLED)
    return _LIT_START


@lru_cache(maxsize=1 << 20)
def word_attrs(word: str) -> tuple[int, int, bool, bool, bool, int]:
    """(fp, case form, has-alpha, is-lower, literal-start, pronoun
    gender) of one token — cached per unique word: corpus vocabularies
    are tiny relative to token counts, so inside a long-lived executor
    worker these per-word classifiers run once per vocabulary entry,
    not once per token occurrence. ``literal-start`` is True iff the
    token COULD open a date/number/measure span (digit-led, month name,
    or spelled number): the literal annotator visits only flagged
    tokens. ``pronoun gender`` is the PRONOUN_GENDER code or -1: the
    anaphora stage visits only flagged positions."""
    return (
        token_fp(word),
        case_form(word),
        any(c.isalpha() for c in word),
        word.islower(),
        word[0].isdigit() or word.lower() in _lit_start_words(),
        PRONOUN_GENDER.get(word.casefold(), -1),
    )


def tokenize(content: str) -> list[Token]:
    """Tokenize a document. Line = sentence unit (code semantics).

    Single regex pass over the whole document (the token classes exclude
    whitespace, so no match spans a newline); break levels come from the
    inter-token gap: same line → NONE/SPACE, one newline → SENTENCE,
    two or more newlines (≥1 blank line between tokens — any non-blank
    line would itself have produced a token) → PARAGRAPH. Equivalence
    with the per-line formulation is property-tested."""
    tokens: list[Token] = []
    append = tokens.append
    count = content.count
    prev_end = -1  # <0 marks the document's first token (break NONE)
    for m in _TOKEN_RE.finditer(content):
        word = m.group(0)
        begin = m.start()
        if prev_end < 0:
            brk = BREAK_NONE
        else:
            nl = count("\n", prev_end, begin)
            if nl == 0:
                brk = BREAK_SPACE if begin > prev_end else BREAK_NONE
            elif nl == 1:
                brk = BREAK_SENTENCE
            else:
                brk = BREAK_PARAGRAPH
        fp, form = word_attrs(word)[:2]
        prev_end = m.end()
        append(Token(begin=begin, end=prev_end, word=word, brk=brk, fp=fp, form=form))
    return tokens


class TokenArrays(NamedTuple):
    """Parallel primitive token columns for one document — the batched/
    NumPy twin of ``tokenize()`` (no per-token objects). Consumed by the
    annotation hot path and doc_stats; same fields, same semantics."""

    words: list[str]
    begins: "np.ndarray"  # int32 codepoint offsets
    ends: "np.ndarray"  # int32
    brks: "np.ndarray"  # int8 break levels
    fps: "np.ndarray"  # uint64 token fingerprints
    forms: "np.ndarray"  # int8 case forms
    alpha: "np.ndarray"  # bool: token contains a letter
    lower: "np.ndarray"  # bool: word.islower()
    lit0: "np.ndarray"  # bool: token can open a literal (date/number) span
    pron: "np.ndarray"  # int8: pronoun gender code, -1 for non-pronouns


def tokenize_arrays(content: str) -> TokenArrays:
    """``tokenize()`` emitting parallel NumPy arrays instead of Token
    objects — the Arrow-batch-friendly layout the vectorized annotator
    consumes. Token identity/order/offsets/breaks are identical to
    ``tokenize()`` (shared regex + break rule; parity-tested).

    (Measured: a fully NumPy-side break computation — match spans into
    an array + searchsorted over newline positions — loses to this loop
    by ~1.4x because materializing 2-tuples per match costs more than
    the break arithmetic it saves; the cached ``word_attrs`` map is
    what makes this cheap.)"""
    import numpy as np

    words: list[str] = []
    begins: list[int] = []
    ends: list[int] = []
    brks: list[int] = []
    count = content.count
    prev_end = -1
    for m in _TOKEN_RE.finditer(content):
        begin = m.start()
        if prev_end < 0:
            brk = BREAK_NONE
        else:
            nl = count("\n", prev_end, begin)
            if nl == 0:
                brk = BREAK_SPACE if begin > prev_end else BREAK_NONE
            elif nl == 1:
                brk = BREAK_SENTENCE
            else:
                brk = BREAK_PARAGRAPH
        words.append(m.group(0))
        begins.append(begin)
        prev_end = m.end()
        ends.append(prev_end)
        brks.append(brk)
    n = len(words)
    if n == 0:
        z = np.zeros(0, dtype=np.int32)
        zb = np.zeros(0, dtype=bool)
        return TokenArrays(
            words, z, z, np.zeros(0, np.int8), np.zeros(0, np.uint64),
            np.zeros(0, np.int8), zb, zb, zb, np.zeros(0, np.int8),
        )
    fp_a, form_a, alpha_a, lower_a, lit0_a, pron_a = zip(*map(word_attrs, words))
    return TokenArrays(
        words=words,
        begins=np.array(begins, dtype=np.int32),
        ends=np.array(ends, dtype=np.int32),
        brks=np.array(brks, dtype=np.int8),
        fps=np.array(fp_a, dtype=np.uint64),
        forms=np.array(form_a, dtype=np.int8),
        alpha=np.array(alpha_a, dtype=bool),
        lower=np.array(lower_a, dtype=bool),
        lit0=np.array(lit0_a, dtype=bool),
        pron=np.array(pron_a, dtype=np.int8),
    )


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
    """Case form of a phrase under this tokenizer — delegates the fold
    to normalize.phrase_case_form so the shared-form-else-NONE rule
    lives in one place (token forms come from the same case_form, so
    the fold is identical)."""
    from .normalize import phrase_case_form

    return phrase_case_form([t.word for t in tokenize(text)])


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
