"""Lexical-feature channel tests (reference lexicon.cc:25-110
WordShape::Extract + features.cc:23-46 context rules)."""

from __future__ import annotations

import numpy as np

from sling_spark.kg.lexical import (
    ALL_DIGIT,
    ALL_PUNCTUATION,
    CAPITALIZED,
    CLOSE_QUOTE,
    HAS_HYPHEN,
    INITIAL,
    LOWERCASE,
    NON_ALPHABETIC,
    NO_DIGIT,
    NO_HYPHEN,
    NO_PUNCTUATION,
    NO_QUOTE,
    OPEN_QUOTE,
    SOME_DIGIT,
    SOME_PUNCTUATION,
    UNKNOWN_QUOTE,
    UPPERCASE,
    encode_tokens,
    shape_features,
    word_shape,
)


def test_word_shape_inventory():
    # (hyphen, caps, punct, quote, digit) per lexicon.cc:25-110
    assert word_shape("spark") == (NO_HYPHEN, LOWERCASE, NO_PUNCTUATION, NO_QUOTE, NO_DIGIT)
    assert word_shape("Spark")[1] == CAPITALIZED
    assert word_shape("NASA")[1] == UPPERCASE
    assert word_shape("pySpark")[1] == CAPITALIZED  # mixed case
    assert word_shape("a-b") == (HAS_HYPHEN, LOWERCASE, SOME_PUNCTUATION, NO_QUOTE, NO_DIGIT)
    assert word_shape("--") == (HAS_HYPHEN, NON_ALPHABETIC, ALL_PUNCTUATION, NO_QUOTE, NO_DIGIT)
    assert word_shape("123")[1] == NON_ALPHABETIC
    assert word_shape("123")[4] == ALL_DIGIT
    assert word_shape("a1")[4] == SOME_DIGIT
    # Penn Treebank multi-char quotes override the per-char scan
    assert word_shape("``")[3] == OPEN_QUOTE
    assert word_shape("''")[3] == CLOSE_QUOTE
    # ASCII straight quotes / backtick are UNKNOWN until the context pass
    assert word_shape('"')[3] == UNKNOWN_QUOTE
    assert word_shape("'s")[3] == UNKNOWN_QUOTE
    assert word_shape("`")[3] == UNKNOWN_QUOTE
    # typographic quotes are directional on their own (Pi / Pf)
    assert word_shape("“")[3] == OPEN_QUOTE
    assert word_shape("”")[3] == CLOSE_QUOTE


def test_context_pass_initial_and_quotes():
    words = ["Spark", "said", '"', "Hello", '"', "Next", "Stage"]
    brks = [0, 0, 0, 0, 0, 2, 0]
    feats = shape_features(words, brks)
    # CAPITALIZED -> INITIAL only at sentence-initial tokens
    assert feats[0][1] == INITIAL          # document start
    assert feats[5][1] == INITIAL          # brk>=2 opens a sentence
    assert feats[3][1] == CAPITALIZED      # mid-sentence stays CAPITALIZED
    assert feats[6][1] == CAPITALIZED
    # straight quotes alternate OPEN/CLOSE through the document
    assert feats[2][3] == OPEN_QUOTE and feats[4][3] == CLOSE_QUOTE
    # doc_starts resets the alternation (batch calls over many docs)
    two_docs = shape_features(['"', "a", '"', "b"], [0, 0, 0, 0], doc_starts=[0, 2])
    assert two_docs[0][3] == OPEN_QUOTE and two_docs[2][3] == OPEN_QUOTE


def test_encode_tokens_features_change_encoding():
    fps = np.array([11, 22], dtype=np.uint64)
    plain = encode_tokens(fps)
    lex_a = encode_tokens(fps, ["Spark", "run"], [0, 0])
    lex_b = encode_tokens(fps, ["spark", "run"], [0, 0])
    # lexical channel adds signal on top of the fp-only word channel,
    # and differing shapes/affixes produce different encodings even at
    # identical fingerprints
    assert not np.allclose(plain, lex_a)
    assert not np.allclose(lex_a, lex_b)
    assert np.allclose(
        encode_tokens(fps, ["Spark", "run"], [0, 0]), lex_a
    )  # deterministic


def test_batch_encoding_equals_per_sentence():
    """Boundary-aware mix contract: per-sentence slices of one batched
    call equal separate per-sentence calls (quote-free fixture — quote
    alternation is per-document by design, tested above)."""
    words = ["Alpha", "beta", "gamma", "Delta", "eps"]
    fps = np.array([3, 5, 7, 11, 13], dtype=np.uint64)
    brks = [0, 0, 0, 2, 0]
    whole = encode_tokens(fps, words, brks)
    s1 = encode_tokens(fps[:3], words[:3], brks[:3])
    s2 = encode_tokens(fps[3:], words[3:], brks[3:])
    assert np.allclose(whole, np.vstack([s1, s2]))


def test_bio_batch_matmul_matches_per_sentence_decode():
    """verdict r3 item 5: the batched logits path must decode exactly
    like per-sentence logits calls."""
    from sling_spark.kg.biaffine import sentence_bounds
    from sling_spark.kg.bio import BioTagger

    tagger = BioTagger()
    words = ["One", "two", "three", "Four", "five", "six", "seven"]
    fps = np.array([17, 19, 23, 29, 31, 37, 41], dtype=np.uint64)
    brks = [0, 0, 0, 2, 0, 0, 0]
    lg = tagger.logits_from_encodings(
        encode_tokens(fps, words, brks, dim=tagger.dim)
    )
    for sb, se in sentence_bounds(brks):
        assert tagger.decode_logits(lg[sb:se]) == tagger.decode(
            fps[sb:se], words[sb:se], brks[sb:se]
        )
