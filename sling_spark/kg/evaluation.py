"""FrameEvaluation-style P/R scoring.

Reference semantics (sling/nlp/parser/frame-evaluation.h:48-150): golden
and predicted document annotations are aligned and precision/recall/F1
is reported per aspect (SPAN, FRAME, ROLE, TYPE, SLOT, TOTAL). Our
aspects:

- SPAN    — mention spans:      (doc, begin, end)
- FRAME   — linked mentions:    (doc, begin, end, entity)
- ROLE    — document triples:   (doc, begin, end, subj, pred, obj)
- SLOT    — KB statements:      (subj, pred, obj)
- CLUSTER — canonicalization:   (member_id, canonical_id)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PRF:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int

    @staticmethod
    def score(pred: set, gold: set) -> "PRF":
        tp = len(pred & gold)
        p = tp / len(pred) if pred else 1.0
        r = tp / len(gold) if gold else 1.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return PRF(p, r, f, len(pred), len(gold))


def mention_span_set(rows) -> set:
    return {(r["repo"], r["path"], r["commit"], r["begin"], r["end"]) for r in rows}


def mention_frame_set(rows) -> set:
    return {
        (r["repo"], r["path"], r["commit"], r["begin"], r["end"], r["entity"])
        for r in rows
    }


def relation_set(rows) -> set:
    return {
        (r["repo"], r["path"], r["commit"], r["begin"], r["end"],
         r["subj"], r["pred"], r["obj"])
        for r in rows
    }


def triple_set(rows) -> set:
    """Final triple rows (provenance-aware for doc relations)."""
    out = set()
    for r in rows:
        prov = r.get("provenance") if isinstance(r, dict) else r["provenance"]
        if prov is not None and not isinstance(prov, tuple):
            prov = (prov["repo"], prov["path"], prov["commit"],
                    prov["content_sha"], prov["begin"], prov["end"])
        out.add((r["subj"], r["pred"], r["obj"], prov, r["source"]))
    return out


def evaluate_aspects(pred: dict[str, set], gold: dict[str, set]) -> dict[str, PRF]:
    # union of aspect keys: a gold-only aspect must show recall 0 in
    # the per-aspect report (not vanish into TOTAL), and a pred-only
    # aspect scores precision against an empty gold set (no KeyError)
    scores = {
        k: PRF.score(pred.get(k, set()), gold.get(k, set()))
        for k in sorted(set(pred) | set(gold))
    }
    all_pred = {(k, v) for k, s in pred.items() for v in s}
    all_gold = {(k, v) for k, s in gold.items() for v in s}
    scores["TOTAL"] = PRF.score(all_pred, all_gold)
    return scores
