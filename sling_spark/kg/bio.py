"""Batched BIO sequence-tagging decoder analog (SURVEY.md §2.8).

Reference semantics: SLING's BIO decoder tags every token with one of
1 + 4*n_types OBIES labels — index 0 = OUTSIDE; for index i >= 1,
tag = (i-1) % 4 + 1 (BEGIN/INSIDE/END/SINGLE) and type = (i-1) // 4
(sling/nlp/parser/bio-decoder.cc:38-106) — picking, per token, the
highest-scoring label ALLOWED after the previous one (bio-decoder.cc
BIOLabel::CanFollow :72-84: after OUTSIDE/END/SINGLE only
OUTSIDE/BEGIN/SINGLE may follow; after BEGIN/INSIDE only INSIDE/END of
the SAME type), then reads spans off the tag sequence
(bio-decoder.cc:261-289: SINGLE → one-token span; BEGIN → scan to the
first END tag, or the sentence end).

Here the same computation runs as batched NumPy inside an Arrow-fed
pandas UDF, over the SAME shared token encodings as the biaffine
scorer (the reference decoders share the lexical encoder channel):
logits for all tokens of a sentence come from one matmul; the
constrained argmax is precomputed vectorized for both automaton states
(free: argmax over the O/B/S columns; forced(T): I(T) vs E(T)
comparison), leaving only an O(1)-per-token state walk — the
transition constraint is inherently sequential (same boundary as the
resolver stage, SURVEY.md §4 risk #4).

Weights are deterministic pseudo-random (seeded) — this reproduces the
*execution shape* (scoring + constrained decode + batching), not a
trained model; the silver pipeline remains the correctness path for
triples, exactly as in the reference where the parser is trained FROM
that silver data. The transition/caspar decoders' shift/mark action
system is NOT reproduced (documented scope boundary, SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .biaffine import DIM, PROJ, _rng, token_encodings

OUTSIDE, BEGIN, INSIDE, END, SINGLE = range(5)

BIO_SPANS_SCHEMA = (
    "repo string, path string, commit string, sentence int, "
    "begin int, end int, type int, score double"
)


class BioTagger:
    """Deterministic OBIES sequence tagger over token fingerprints."""

    def __init__(self, n_types: int = 4, dim: int = DIM, hidden: int = PROJ):
        self.n_types = n_types
        self.n_labels = 1 + 4 * n_types
        self.dim = dim
        g = _rng("bio-weights")
        self.w1 = (g.standard_normal((dim, hidden)) / np.sqrt(dim)).astype(np.float32)
        self.b1 = (g.standard_normal(hidden) * 0.1).astype(np.float32)
        self.w2 = (
            g.standard_normal((hidden, self.n_labels)) / np.sqrt(hidden)
        ).astype(np.float32)
        # allowed-label column sets per automaton state (ascending index
        # order — np.argmax's first-match tie-break then reproduces the
        # reference's ascending scan with strict '>', bio-decoder.cc:248)
        self._free_cols = np.array(
            [0] + [c for t in range(n_types) for c in (1 + 4 * t, 4 + 4 * t)]
        )
        self._icols = np.array([2 + 4 * t for t in range(n_types)])
        self._ecols = np.array([3 + 4 * t for t in range(n_types)])

    def logits(self, fps: np.ndarray) -> np.ndarray:
        """(n, n_labels) token logits: shared encodings → one hidden
        tanh layer → label scores. All-batch matmuls."""
        h = token_encodings(fps, self.dim)
        z = np.tanh(h @ self.w1 + self.b1)
        return z @ self.w2

    def decode(self, fps: np.ndarray) -> list[tuple[int, int, int, float]]:
        """Constrained greedy decode of one sentence → (begin, end,
        type, score) spans; score = sum of the chosen label logits over
        the span tokens (rounded by the caller)."""
        n = len(fps)
        if n == 0:
            return []
        lg = self.logits(fps)
        # vectorized per-state argmaxes (reference tie-break: lowest
        # index wins a tie; I(T) beats E(T) on equal logits because the
        # ascending scan only replaces on strictly greater)
        free_pick = self._free_cols[np.argmax(lg[:, self._free_cols], axis=1)]
        forced_pick = np.where(
            lg[:, self._icols] >= lg[:, self._ecols], self._icols, self._ecols
        )
        labels = np.empty(n, np.int64)
        forced_type = -1
        for t in range(n):
            if forced_type < 0:
                lab = int(free_pick[t])
                if lab != 0 and (lab - 1) % 4 + 1 == BEGIN:
                    forced_type = (lab - 1) // 4
            else:
                lab = int(forced_pick[t, forced_type])
                if (lab - 1) % 4 + 1 == END:
                    forced_type = -1
            labels[t] = lab
        chosen = lg[np.arange(n), labels]
        tags = np.where(labels == 0, 0, (labels - 1) % 4 + 1)
        types = np.where(labels == 0, -1, (labels - 1) // 4)
        # span extraction (bio-decoder.cc:261-289)
        out: list[tuple[int, int, int, float]] = []
        t = 0
        while t < n:
            if tags[t] == SINGLE:
                out.append((t, t + 1, int(types[t]), float(chosen[t])))
            elif tags[t] == BEGIN:
                b = t
                t += 1
                while t < n and tags[t] != END:
                    t += 1
                e = t + 1 if t < n else n
                out.append((b, e, int(types[b]), float(chosen[b:e].sum())))
            t += 1
        return out


def bio_spans(documents: DataFrame, tagger: BioTagger | None = None) -> DataFrame:
    """documents (tokens layout, see build_documents) → (doc, sentence,
    begin, end, type, score) BIO span rows. One mapInPandas pass;
    logits/argmaxes are numpy-batched per sentence."""
    tagger = tagger or BioTagger()

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                brks = list(r.t_brk)
                all_fps = list(r.t_fp)
                bounds, start = [], 0
                for i in range(1, len(brks)):
                    if brks[i] >= 2:
                        bounds.append((start, i))
                        start = i
                if brks:
                    bounds.append((start, len(brks)))
                for s_idx, (sb, se) in enumerate(bounds):
                    fps = np.array(all_fps[sb:se], dtype=np.uint64)
                    for b, e, typ, score in tagger.decode(fps):
                        rows.append(
                            {
                                "repo": r.repo,
                                "path": r.path,
                                "commit": r.commit,
                                "sentence": s_idx,
                                "begin": sb + b,
                                "end": sb + e,
                                "type": typ,
                                "score": round(score, 6),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "sentence",
                         "begin", "end", "type", "score"],
            )

    return documents.select("repo", "path", "commit", "t_brk", "t_fp").mapInPandas(
        run, schema=BIO_SPANS_SCHEMA
    )
