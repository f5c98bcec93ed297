"""Phrase/token normalization.

Reference semantics: sling/util/unicode.h:136-150 defines normalization
flags (case, letters-only-after-diacritic-strip, digits->9, punctuation,
name punctuation, quotes, whitespace); phrase tables record their
normalization string, default "lcn" = lowercase + diacritic strip +
name-punctuation removal (sling/nlp/kb/phrase-table-builder.cc:105-107).

We reproduce the "lcn" pipeline (the only one the wikiflow uses) plus the
case-form classifier (sling/util/unicode.h CaseForm, consumed by
document.h:97 and the alias `form` field, wiki.h:48-64).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# Case forms — matches the reference's 4-valued CaseForm enum semantics:
# NONE (mixed/unknown), LOWER, UPPER, TITLE.
CASE_INVALID = 0
CASE_NONE = 0  # alias: mixed case maps to "none"
CASE_LOWER = 1
CASE_UPPER = 2
CASE_TITLE = 3

# Name punctuation stripped under the "n" flag (periods and apostrophes
# inside names: "J.F.K.", "O'Neill").
_NAME_PUNCT = {".", "'", "’"}

# Pronoun descriptors with grammatical gender (anaphora.cc:45-55 English
# inventory; it/this are the code-corpus neuter triggers with UNKNOWN
# gender — they agree with genderless markables, exactly the reference's
# `m.gender == markable.gender` rule). Lives here (a per-word lexical
# attribute) so the tokenizer's cached word_attrs can flag pronoun
# tokens without importing the annotator layer.
G_UNKNOWN, G_MASC, G_FEM = 0, 1, 2
PRONOUN_GENDER = {
    "it": G_UNKNOWN, "this": G_UNKNOWN,
    "he": G_MASC, "his": G_MASC, "him": G_MASC,
    "she": G_FEM, "her": G_FEM, "hers": G_FEM,
}


def normalize_phrase(text: str) -> str:
    """Apply "lcn" normalization: case-fold, strip diacritics, drop name
    punctuation, collapse whitespace runs to single spaces. Full Unicode
    case folding (casefold, not lower) so e.g. 'ß' and 'SS' normalize
    identically — the reference's Unicode-aware lowercasing semantics.

    Iterated to a fixpoint: NFKD compatibility decomposition can emit
    cased characters (e.g. U+1D756 MATHEMATICAL SANS-SERIF BOLD CAPITAL
    ALPHA decomposes to capital Α *after* casefold ran), so a single
    fold→decompose pass is not idempotent on exotic Unicode."""
    prev = None
    while text != prev:
        prev = text
        text = text.casefold()
        # diacritic strip: NFKD decompose, drop combining marks
        text = "".join(
            ch
            for ch in unicodedata.normalize("NFKD", text)
            if not unicodedata.combining(ch)
        )
        text = "".join(ch for ch in text if ch not in _NAME_PUNCT)
        text = " ".join(text.split())
    return text


def _case_form_uncached(word: str) -> int:
    """Classify the case form of a token (LOWER/UPPER/TITLE/NONE)."""
    letters = [ch for ch in word if ch.isalpha()]
    if not letters:
        return CASE_NONE
    if all(ch.islower() for ch in letters):
        return CASE_LOWER
    if all(ch.isupper() for ch in letters):
        return CASE_UPPER
    if letters[0].isupper() and all(ch.islower() for ch in letters[1:]):
        return CASE_TITLE
    return CASE_NONE


case_form = lru_cache(maxsize=1 << 20)(_case_form_uncached)


def phrase_case_form(words: list[str]) -> int:
    """Case form of a multi-token phrase: the shared form of its word
    tokens, or NONE when they disagree (reference folds per-token forms
    the same way when building alias forms)."""
    forms = [case_form(w) for w in words if any(ch.isalpha() for ch in w)]
    if not forms:
        return CASE_NONE
    first = forms[0]
    # TITLE followed by LOWER words (e.g. "Spark streaming") degrades to
    # NONE; all-TITLE stays TITLE.
    return first if all(f == first for f in forms) else CASE_NONE
