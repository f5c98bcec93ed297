"""Subword / wordpiece tokenization (greedy longest-prefix matching).

Reference semantics (sling/nlp/document/subword-tokenizer.cc:22-118):
the vocabulary distinguishes LEADING subwords from TRAILING subwords
(prefixed ``##``); a word tokenizes by the fast whole-word path or by
repeatedly taking the longest vocabulary prefix of the remaining
suffix (leading lexicon first, trailing after the first piece), with
optional punctuation splitting (the BERT convention). A word that
cannot be segmented yields the OOV id and a -1 return.

This is the trained-parser input path; in this engine it is also the
token-count primitive for LLM-data pipelines (a BPE-ish subword count
beats whitespace counts for budgeting). The Spark wrapper broadcasts
the vocabulary and emits counts/ids via a vectorized pandas pass.
"""

from __future__ import annotations

import unicodedata

UNK = "[UNK]"


def _is_punct(ch: str) -> bool:
    return unicodedata.category(ch).startswith("P")


class SubwordTokenizer:
    """Greedy longest-prefix wordpiece tokenizer."""

    def __init__(self, vocabulary: list[str], split_on_punctuation: bool = True):
        self.subwords = list(vocabulary)
        self.leading: dict[str, int] = {}
        self.trailing: dict[str, int] = {}
        for i, sw in enumerate(self.subwords):
            if len(sw) >= 2 and sw.startswith("##"):
                self.trailing[sw[2:]] = i
            else:
                self.leading[sw] = i
        self.oov = self.leading.get(UNK, -1)
        self.split_on_punctuation = split_on_punctuation

    def lookup(self, piece: str, leading: bool) -> int:
        return (self.leading if leading else self.trailing).get(piece, -1)

    def tokenize(self, word: str) -> tuple[int, list[int]]:
        """Returns (num_subwords or -1 on OOV, subword ids). Mirrors the
        reference contract: an unsegmentable word appends the OOV id
        (when nothing matched yet) and returns -1."""
        subwords: list[int] = []
        whole = self.leading.get(word, -1)
        if whole != -1:
            return 1, [whole]
        p, n = 0, len(word)
        num = 0
        leading = True
        while p < n:
            if self.split_on_punctuation and _is_punct(word[p]):
                idx = self.lookup(word[p], True)
                if idx != -1:
                    subwords.append(idx)
                    leading = True
                    num += 1
                    p += 1
                    continue
            q = n
            matched = -1
            while q > p:
                matched = self.lookup(word[p:q], leading)
                if matched != -1:
                    break
                q -= 1
            if q > p:
                subwords.append(matched)
                leading = False
                num += 1
                p = q
            else:
                if num == 0:
                    subwords.append(self.oov)
                return -1, subwords
        return num, subwords

    def tokenized_word(self, word: str) -> str:
        """The word with ## subword markers (TokenizedWord)."""
        _, ids = self.tokenize(word)
        return "".join(self.subwords[i] for i in ids if i != -1)


def subword_counts(documents, vocab: list[str], text_col: str = "content",
                   split_on_punctuation: bool = True):
    """Per-document subword statistics: (n_subwords, n_oov) over
    whitespace-split words — the LLM-token-budget shape, one Arrow pass,
    vocabulary broadcast once per executor via closure capture."""
    import pandas as pd

    def run(batches):
        tok = SubwordTokenizer(vocab, split_on_punctuation)
        for pdf in batches:
            out = {"n_subwords": [], "n_oov": []}
            for text in pdf[text_col]:
                total = oov = 0
                for w in (text or "").split():
                    n, ids = tok.tokenize(w)
                    total += len(ids)
                    if n < 0:
                        oov += 1
                out["n_subwords"].append(total)
                out["n_oov"].append(oov)
            pdf = pdf.drop(columns=[text_col])
            for k, v in out.items():
                pdf[k] = v
            yield pdf

    keep = [c for c in documents.columns if c != text_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in documents.schema.fields
        if f.name != text_col
    ) + ", n_subwords int, n_oov int"
    return documents.select(*keep, text_col).mapInPandas(run, schema=schema)
