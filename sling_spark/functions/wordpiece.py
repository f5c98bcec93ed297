"""Wordpiece vocabulary BUILDER — byte-pair-encoding induction over
corpus word frequencies (round-3 verdict item 3).

Reference semantics (sling/nlp/document/wordpiece-builder.cc:37-185):
start from the [UNK] symbol plus character unigrams (leading vs
trailing position distinguished — a word-initial 'a' and a word-inner
'a' are different symbols), count every adjacent symbol bigram
weighted by word frequency, then repeatedly select the best unselected
bigram and merge it everywhere until the lexicon reaches ``max_size``.
Best = highest frequency; ties broken by LONGER text, then
lexicographically smaller text, then leading before trailing (the
reference's code — its comment says "shorter", the comparison actually
prefers longer; we reproduce the code's behavior). Merging rescans
each word left-to-right, restarting after every replacement, and
incrementally adjusts the neighbor-bigram counts exactly as
AdjustBigram does.

Symbols are identified by STRUCTURE (which merge produced them), not
by surface text — two different merge paths can render the same text
and keep separate counts, as in the reference where symbols are
distinct heap objects.

Scale split (the 100 TB architecture): the corpus-side work — word
frequency counting over billions of documents — is a distributed
hash aggregation (:func:`word_frequencies`); the induction itself runs
over the DISTINCT-WORD table, which frequency thresholding bounds
(Heaps-law sublinear in corpus size) exactly as the reference's
single-process builder consumes a vocabulary iterator, not the corpus.
For vocabularies too large to collect, :func:`distributed_merge_rounds`
runs the same induction as iterative DataFrame rounds (adjacent-pair
aggregation → global best pair → re-encode only the words containing
it), parity-tested against the in-memory builder.

The induced lexicon feeds functions.subword.SubwordTokenizer (leading
pieces verbatim, trailing pieces "##"-prefixed, [UNK] first) — the
builder + tokenizer round-trip is test-enforced: every vocabulary word
re-tokenizes with full coverage.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


class Symbol:
    """A character unigram or a merged bigram (wordpiece-builder.h:33).

    Identity is the object, not the text — mirroring the reference's
    heap-object symbols."""

    __slots__ = ("left", "right", "code", "trailing", "selected", "freq",
                 "_text")

    def __init__(self, code: str = "", trailing: bool = False,
                 left: "Symbol | None" = None,
                 right: "Symbol | None" = None):
        self.left = left
        self.right = right
        self.code = code
        self.trailing = trailing
        self.selected = False
        self.freq = 0
        self._text: str | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            if self.left is not None:
                self._text = self.left.text + self.right.text
            else:
                self._text = self.code if self.code else UNK
        return self._text

    def piece(self) -> str:
        """Lexicon rendering: trailing symbols carry the ## marker
        (the SubwordTokenizer convention for non-initial pieces)."""
        if self.code == "" and self.left is None:
            return UNK
        return ("##" + self.text) if self.trailing else self.text


def _better(a: Symbol, b: Symbol) -> bool:
    """Is ``a`` a better merge candidate than ``b``?
    (wordpiece-builder.cc:88-112 — freq, then LONGER text, then
    lexicographic, then leading.)"""
    if a.freq != b.freq:
        return a.freq > b.freq
    at, bt = a.text, b.text
    if len(at) != len(bt):
        return len(at) > len(bt)
    if at != bt:
        return at < bt
    return not a.trailing and b.trailing


def build_wordpiece_vocab(
    word_freqs: Iterable[tuple[str, int]], max_size: int = 256
) -> list[tuple[str, int]]:
    """BPE induction over (word, freq) pairs → [(piece, freq), ...] in
    emission order ([UNK], unigrams as first encountered, then merges).
    ``freq`` is the symbol's frequency at emission time (occurrence-
    weighted for unigrams, exactly like the reference's sym->freq).

    When ``max_size`` exceeds the real merge supply, the tail of the
    lexicon is zero-frequency stale bigrams (pairs merged AWAY by
    earlier selections) — reference behavior, reproduced deliberately:
    wordpiece-builder.cc:88-115 selects any unselected symbol with no
    freq>0 guard. Size the vocab to the corpus (or drop freq==0 pieces
    downstream) if phantom pieces are unwanted."""
    out: list[Symbol] = []
    unigrams: dict[tuple[str, bool], Symbol] = {}
    bigrams: dict[tuple[int, int], Symbol] = {}
    all_syms: list[Symbol] = []

    oov = Symbol()
    oov.selected = True
    out.append(oov)
    size = 1

    def unigram(ch: str, trailing: bool) -> Symbol:
        key = (ch, trailing)
        s = unigrams.get(key)
        if s is None:
            s = Symbol(code=ch, trailing=trailing)
            unigrams[key] = s
            all_syms.append(s)
        return s

    def bigram(left: Symbol, right: Symbol) -> Symbol:
        key = (id(left), id(right))
        s = bigrams.get(key)
        if s is None:
            s = Symbol(left=left, right=right, trailing=left.trailing)
            bigrams[key] = s
            all_syms.append(s)
        return s

    # initial encoding: character unigrams, emitted on first sight
    words: list[tuple[list[Symbol], int]] = []
    for word, freq in word_freqs:
        syms: list[Symbol] = []
        for i, ch in enumerate(word):
            s = unigram(ch, trailing=i > 0)
            s.freq += freq
            if not s.selected:
                s.selected = True
                size += 1
                out.append(s)
            syms.append(s)
        words.append((syms, freq))

    # initial bigram counts
    for syms, freq in words:
        for i in range(len(syms) - 1):
            bigram(syms[i], syms[i + 1]).freq += freq

    def adjust(a: Symbol, b: Symbol, delta: int) -> None:
        bigram(a, b).freq += delta

    while size < max_size:
        best: Symbol | None = None
        for s in all_syms:
            if s.selected:
                continue
            if best is None or _better(s, best):
                best = s
        if best is None:
            break
        best.selected = True
        size += 1
        out.append(best)
        left, right = best.left, best.right
        for syms, freq in words:
            again = True
            while again:
                again = False
                for i in range(len(syms) - 1):
                    if syms[i] is left and syms[i + 1] is right:
                        if i > 0:
                            adjust(syms[i - 1], left, -freq)
                            adjust(syms[i - 1], best, freq)
                        if i + 2 < len(syms):
                            adjust(right, syms[i + 2], -freq)
                            adjust(best, syms[i + 2], freq)
                        syms[i] = best
                        del syms[i + 1]
                        again = True
                        break
    return [(s.piece(), s.freq) for s in out]


# ---------------------------------------------------------------------------
# distributed pieces
# ---------------------------------------------------------------------------


def word_frequencies(
    documents: DataFrame, min_freq: int = 1
) -> DataFrame:
    """(word, freq) over a tokens-layout documents table — the
    corpus-scale half of the builder: one explode + hash aggregation
    with map-side combine; ``min_freq`` is the lexicon threshold
    (lexical-features.h:39) that bounds the vocabulary the induction
    consumes."""
    wf = (
        documents.select(F.explode("t_word").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    return wf


def distributed_merge_rounds(
    word_freqs: DataFrame, n_merges: int, checkpoint_every: int = 8
) -> list[tuple[str, int]]:
    """The SAME induction as iterative DataFrame rounds, for
    vocabularies too large to collect: per round, (a) aggregate
    adjacent symbol-id pairs weighted by word frequency, (b) pick the
    globally best pair (max-freq filter collects only the tie set; the
    exact reference tie-break runs driver-side over the tiny symbol
    table), (c) re-encode ONLY the words containing both halves
    (leftmost-rescan merge in an Arrow batch pass; the rest of the
    table is untouched). Returns the merge pieces [(piece, freq), ...]
    in selection order — prepend the unigram inventory from
    :func:`build_wordpiece_vocab` semantics for a full lexicon; the
    parity test drives both paths end-to-end.

    Pair counts are RECOMPUTED from the current encodings each round
    rather than incrementally adjusted — identical values for every
    unselected pair (AdjustBigram maintains exactly this invariant),
    in exchange for a stateless MapReduce round.

    Exhaustion boundary: when no adjacent pair remains (every word is a
    single symbol), this path STOPS and returns fewer than ``n_merges``
    merges. The in-memory builder — like the reference, which has no
    freq>0 guard either (wordpiece-builder.cc:88-115) — keeps emitting
    stale zero-frequency bigram symbols past that point; recomputed
    counts cannot see those (they no longer occur in any word), so the
    two paths agree exactly up to the last real merge and the parity
    test sizes its vocab accordingly."""
    import pandas as pd

    # symbol ids: unigrams are "L<ch>" / "T<ch>" (leading/trailing —
    # an explicit role byte, NOT a '#' prefix, so words that CONTAIN
    # '#' never collide with the marker); merges get "m<k>". The
    # driver-side table maps id -> (text, trailing) for tie-breaking
    # and final rendering.
    def encode(batches):
        for pdf in batches:
            pieces = [
                [("T" if i > 0 else "L") + ch for i, ch in enumerate(w)]
                for w in pdf["word"]
            ]
            yield pd.DataFrame(
                {"pieces": pieces, "freq": pdf["freq"]}
            )

    words = word_freqs.select("word", "freq").mapInPandas(
        encode, schema="pieces array<string>, freq long"
    ).localCheckpoint()

    symtab: dict[str, tuple[str, bool]] = {}
    for row in words.select(F.explode("pieces").alias("p")).distinct().collect():
        p = row["p"]
        symtab[p] = (p[1:], p[0] == "T")

    merges: list[tuple[str, int]] = []
    for k in range(n_merges):
        pairs = (
            words.select(
                F.posexplode(F.slice("pieces", 1, F.size("pieces") - 1))
                .alias("i", "l"),
                F.col("pieces"),
                F.col("freq"),
            )
            .select(
                "l",
                F.expr("pieces[i + 1]").alias("r"),
                "freq",
            )
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("freq"))
        )
        mx = pairs.agg(F.max("freq").alias("m")).collect()[0]["m"]
        if mx is None:
            break
        ties = pairs.filter(F.col("freq") == mx).collect()
        best = None
        for row in ties:
            lt, ltr = symtab[row["l"]]
            rt, _ = symtab[row["r"]]
            cand = (lt + rt, ltr, row["l"], row["r"])
            if best is None:
                best = cand
            else:
                bt = best[0]
                # freq equal by construction: longer text, then
                # lexicographic, then leading-before-trailing, then —
                # for FULL ties (two structurally different pairs
                # rendering the same text with the same role) — the
                # smaller (l, r) id pair. The ids are deterministic
                # functions of structure, so the selection never
                # depends on collect()/shuffle order across runs.
                if (
                    len(cand[0]) > len(bt)
                    or (len(cand[0]) == len(bt) and cand[0] < bt)
                    or (cand[0] == bt and cand[1] == best[1]
                        and cand[2:] < best[2:])
                    or (cand[0] == bt and not cand[1] and best[1])
                ):
                    best = cand
        text, trailing, lid, rid = best
        mid = f"m{k}"
        symtab[mid] = (text, trailing)
        merges.append((("##" + text) if trailing else text, int(mx)))

        def merge(batches, lid=lid, rid=rid, mid=mid):
            for pdf in batches:
                out = []
                for pieces in pdf["pieces"]:
                    syms = list(pieces)
                    again = True
                    while again:
                        again = False
                        for i in range(len(syms) - 1):
                            if syms[i] == lid and syms[i + 1] == rid:
                                syms[i] = mid
                                del syms[i + 1]
                                again = True
                                break
                    out.append(syms)
                yield pd.DataFrame({"pieces": out, "freq": pdf["freq"]})

        hit = words.filter(
            F.array_contains("pieces", lid) & F.array_contains("pieces", rid)
        )
        rest = words.filter(
            ~(F.array_contains("pieces", lid) & F.array_contains("pieces", rid))
        )
        words = rest.unionByName(
            hit.mapInPandas(merge, schema="pieces array<string>, freq long")
        )
        if (k + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges
