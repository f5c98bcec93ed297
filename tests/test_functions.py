"""Unit tests for the shared scalar semantics (no Spark needed)."""

from sling_spark.functions.fingerprint import (
    FP_SKIPPED,
    fingerprint_cat,
    phrase_fp,
    token_fp,
)
from sling_spark.functions.normalize import (
    CASE_LOWER,
    CASE_NONE,
    CASE_TITLE,
    CASE_UPPER,
    case_form,
    normalize_phrase,
)
from sling_spark.functions.tokenize import (
    BREAK_PARAGRAPH,
    BREAK_SENTENCE,
    phrase_fingerprint,
    sentences,
    tokenize,
)


def test_normalize_case_and_diacritics():
    assert normalize_phrase("Érdekes") == "erdekes"
    assert normalize_phrase("J.F.K.") == "jfk"
    assert normalize_phrase("O'Neill") == "oneill"
    assert normalize_phrase("  a\t b ") == "a b"


def test_case_forms():
    assert case_form("spark") == CASE_LOWER
    assert case_form("SPARK") == CASE_UPPER
    assert case_form("Spark") == CASE_TITLE
    assert case_form("PySpark") == CASE_NONE
    assert case_form("123") == CASE_NONE


def test_token_fp_never_zero_and_case_insensitive():
    assert token_fp("Spark") == token_fp("SPARK") == token_fp("spark")
    assert token_fp(".") == FP_SKIPPED
    assert token_fp("...") == FP_SKIPPED
    assert token_fp("x") not in (0, 1)


def test_fingerprint_cat_order_sensitive():
    a, b = token_fp("new"), token_fp("york")
    assert fingerprint_cat(a, b) != fingerprint_cat(b, a)
    assert phrase_fp(["new", "york"]) != phrase_fp(["york", "new"])
    # single-token phrase == token fp (phrase-table lookup invariant)
    assert phrase_fp(["Spark"]) == token_fp("spark")


def test_tokenizer_offsets_and_breaks():
    text = "# uses Spark\n\ndef f(x):\n    return x\n"
    toks = tokenize(text)
    words = [t.word for t in toks]
    assert words == ["#", "uses", "Spark", "def", "f", "(", "x", ")", ":", "return", "x"]
    # offsets point back into the text
    for t in toks:
        assert text[t.begin : t.end] == t.word
    # paragraph break after the blank line
    d = {t.word: t for t in toks}
    assert d["def"].brk == BREAK_PARAGRAPH
    assert d["return"].brk == BREAK_SENTENCE
    assert toks[0].brk == 0
    # line-based sentence units
    assert sentences(toks) == [(0, 3), (3, 9), (9, 11)]


def test_phrase_fingerprint_matches_span_fp():
    # "Node.js" under the code tokenizer = [Node][.][js]; the alias fp
    # must equal the fp a corpus span computes token-by-token
    toks = tokenize("uses Node.js here")
    node = [t for t in toks if t.word == "Node"][0]
    js = [t for t in toks if t.word == "js"][0]
    assert phrase_fingerprint("Node.js") == fingerprint_cat(node.fp, js.fp)
    assert phrase_fingerprint("Apache Spark") == phrase_fp(["apache", "spark"])
