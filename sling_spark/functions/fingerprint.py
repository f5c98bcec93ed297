"""64-bit token/phrase fingerprints.

Reference semantics (NOT the reference algorithm — SURVEY.md §2.9: "exact
algorithm irrelevant; consistency within our system is what matters"):

- a token fingerprint is a 64-bit hash of the *normalized* token text
  (sling/nlp/document/fingerprinter.h:29-83);
- fingerprints are never 0; tokens that are "skipped" for phrase matching
  (pure punctuation) fingerprint to 1 (sling/nlp/document/document.h:94-100);
- multi-token phrase fingerprints mix token fingerprints left-to-right via
  FingerprintCat (fingerprinter.h:67-71) — order-sensitive, so "new york"
  != "york new"; skipped tokens do not contribute.

We use blake2b (seedless, stable across processes — unlike Python's
built-in ``hash``) truncated to 63 bits so values are non-negative in a
Spark ``LongType`` column, and a splitmix-style multiply-xor for the cat
mix. Both the Spark UDFs and the oracle import exactly these functions.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from .normalize import normalize_phrase

_MASK63 = (1 << 63) - 1
_MIX_MULT = 0x9E3779B97F4A7C15  # 2^64 / golden ratio

FP_INVALID = 0
FP_SKIPPED = 1  # punctuation-only tokens (document.h:94-100 semantics)


def hash64(text: str) -> int:
    """Stable 63-bit hash of a string; never 0 or 1."""
    h = int.from_bytes(hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(), "big")
    h &= _MASK63
    if h in (FP_INVALID, FP_SKIPPED):
        h = 2
    return h


@lru_cache(maxsize=1 << 20)
def token_fp(word: str) -> int:
    """Fingerprint of one token: hash of normalized text; punctuation-only
    tokens return FP_SKIPPED. Cached: corpus vocabularies are tiny
    relative to token counts, so the normalize+hash path hits the cache
    ~99% of the time inside a long-lived executor worker."""
    norm = normalize_phrase(word)
    if not norm or not any(ch.isalnum() for ch in norm):
        return FP_SKIPPED
    return hash64(norm)


def fingerprint_cat(fp1: int, fp2: int) -> int:
    """Order-sensitive mix of two fingerprints (FingerprintCat
    semantics). Only 0 is remapped (to 2): a mix landing on exactly 1
    (probability ~2^-63 per phrase) would read as FP_SKIPPED — accepted,
    because the reference's Mix remaps NEITHER sentinel and the
    vectorized twin (mentions.py span enumeration, `np.where(cat == 0,
    2, cat)`) must stay bit-identical to this scalar; remapping 1 here
    without re-deriving the trained-model artifacts would break that
    parity for no practical gain."""
    return (((fp1 * _MIX_MULT) & _MASK63) ^ fp2) & _MASK63 or 2


def phrase_fp(words: list[str]) -> int:
    """Fingerprint of a token sequence: cat-mix of non-skipped token fps.

    Returns FP_SKIPPED when no token contributes (all punctuation), and
    the bare token fp for single-token phrases — so a one-word phrase
    matches the token's own fingerprint (phrase-table lookup invariant,
    sling/nlp/document/phrase-tokenizer.h:27-44).
    """
    fp = FP_INVALID
    for w in words:
        tfp = token_fp(w)
        if tfp == FP_SKIPPED:
            continue
        fp = tfp if fp == FP_INVALID else fingerprint_cat(fp, tfp)
    return fp if fp != FP_INVALID else FP_SKIPPED


def phrase_fp_text(text: str) -> int:
    """Fingerprint of a free-text phrase (whitespace tokenized)."""
    return phrase_fp(text.split())
