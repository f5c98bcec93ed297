"""Mention detection + entity linking.

Reference semantics (sling/nlp/silver/mentions.cc + sling/nlp/kb/
resolver.cc), reproduced per sentence unit:

1. **Span enumeration** (SpanPopulator, mentions.cc:45-100): every token
   span up to ``max_span`` whose phrase fingerprint hits the phrase
   table is a candidate. Spans must start/end on non-skipped tokens.
2. **Common-word pruning** (CommonWordPruner, mentions.h:126): a
   single-token candidate whose surface form is all-lowercase and whose
   token IDF is below threshold is pruned (stop-symbol guard — in code
   corpora these are ubiquitous identifiers).
3. **Span cover** (SpanChart::Solve, sling/nlp/silver/chart.cc:52-98):
   dynamic-programming minimum-cost cover of the sentence — skipping a
   token costs 2, any matched span costs 1, so matches beat skips and
   longer matches beat chains of shorter ones. Ties are broken toward
   the longer (earlier-starting) span, deterministically.
4. **Resolution** (ResolverContext, resolver.cc:31-151): candidates for
   the selected span are scored ``(base + context[entity]) * count``
   with base 1e-3; a case-form mismatch multiplies by 0.1; an entity
   already mentioned in this document multiplies by 30 (resolver.h:50-54
   weights). Winning entity feeds the context: itself with weight
   500/popularity, its outbound link targets with count/popularity —
   sequential *within* a document (SURVEY.md §4 risk #4), embarrassingly
   parallel across documents.

Execution shape: ONE Arrow-batched mapInPandas over the documents table;
the phrase table / IDF / links / popularity ride along as Spark
broadcast variables (the analog of SLING memory-mapping its repository
files in every worker, sling/file/repository.h:30-60). No shuffle is
introduced: mention rows inherit the documents partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.fingerprint import FP_SKIPPED, fingerprint_cat
from ..functions.normalize import CASE_NONE

MENTIONS_SCHEMA = (
    "repo string, path string, commit string, content_sha string, "
    "sentence int, begin int, end int, phrase string, fp long, "
    "entity string, score double, form int"
)

# resolver weights — resolver.h:50-54 semantics
BASE_CONTEXT = 1e-3
MENTION_WEIGHT = 500.0
CASE_PENALTY = 0.1
LOCAL_BOOST = 30.0
TOKEN_SKIP_COST = 2.0
SPAN_COST = 1.0
DEFAULT_MIN_IDF = 1.2
DEFAULT_MAX_SPAN = 5


@dataclass
class KbAssets:
    """Broadcast-side lookup structures (all dimension-sized)."""

    phrase_table: dict[int, list[tuple]]  # fp -> [(entity, count, form, reliable)]
    idf: dict[int, float]  # token fp -> idf
    popularity: dict[str, int]  # entity -> popularity count
    links: dict[str, list[tuple[str, int]]]  # src -> [(dst, count)]
    statements: dict[str, list[tuple[str, str]]]  # subj -> [(pid, obj)]


def _phrase_case_form_tokens(forms: list[int], words: list[str]) -> int:
    alpha_forms = [f for f, w in zip(forms, words) if any(c.isalpha() for c in w)]
    if not alpha_forms:
        return CASE_NONE
    first = alpha_forms[0]
    return first if all(f == first for f in alpha_forms) else CASE_NONE


def annotate_document(
    tokens: list[dict],
    sentence_bounds: list[tuple[int, int]],
    assets: KbAssets,
    min_idf: float = DEFAULT_MIN_IDF,
    max_span: int = DEFAULT_MAX_SPAN,
) -> list[dict]:
    """Run the annotator chain on one document; returns mention dicts
    with sentence index and resolver score. Sequential context accretion
    across the document's sentences (resolver.cc:57-69)."""
    context: dict[str, float] = {}
    mentioned: set[str] = set()
    out: list[dict] = []

    for s_idx, (s_begin, s_end) in enumerate(sentence_bounds):
        n = s_end - s_begin
        if n <= 0:
            continue
        # ---- 1/2: candidate spans ------------------------------------
        # matches[e_rel] = list of (b_rel, fp, form) for spans ending at e_rel
        matches: dict[int, list[tuple[int, int, int]]] = {}
        for b in range(n):
            tb = tokens[s_begin + b]
            if tb["fp"] == FP_SKIPPED:
                continue
            fp = 0
            words: list[str] = []
            forms: list[int] = []
            for l in range(1, min(max_span, n - b) + 1):
                te = tokens[s_begin + b + l - 1]
                if te["fp"] != FP_SKIPPED:
                    fp = te["fp"] if fp == 0 else fingerprint_cat(fp, te["fp"])
                words.append(te["word"])
                forms.append(te["form"])
                if fp == 0 or te["fp"] == FP_SKIPPED:
                    # span ending on a skipped token is not a candidate,
                    # but longer spans through it still are
                    continue
                if fp not in assets.phrase_table:
                    continue
                # common-word pruning for single lowercase tokens
                if l == 1:
                    idf = assets.idf.get(te["fp"])
                    all_lower = words[0].islower()
                    if all_lower and idf is not None and idf < min_idf:
                        continue
                form = _phrase_case_form_tokens(forms, words)
                matches.setdefault(b + l, []).append((b, fp, form))

        # ---- 3: DP minimum-cost cover ---------------------------------
        INF = float("inf")
        dp = [0.0] + [INF] * n
        back: list[tuple[int, int, int] | None] = [None] * (n + 1)  # (b, fp, form)
        for e in range(1, n + 1):
            cost = dp[e - 1] + TOKEN_SKIP_COST
            choice = None
            # matches sorted by begin asc => longest first wins ties
            for b, fp, form in sorted(matches.get(e, [])):
                c = dp[b] + SPAN_COST
                if c < cost:
                    cost, choice = c, (b, fp, form)
            dp[e] = cost
            back[e] = choice
        # reconstruct selected spans left-to-right (resolver order)
        spans: list[tuple[int, int, int, int]] = []  # (b_rel, e_rel, fp, form)
        e = n
        while e > 0:
            ch = back[e]
            if ch is None:
                e -= 1
            else:
                b, fp, form = ch
                spans.append((b, e, fp, form))
                e = b
        spans.reverse()

        # ---- 4: resolve, left to right --------------------------------
        for b_rel, e_rel, fp, form in spans:
            cands = assets.phrase_table[fp]
            best = None
            best_key = None
            for entity, count, alias_form, _reliable in cands:
                score = (BASE_CONTEXT + context.get(entity, 0.0)) * count
                if (
                    form != CASE_NONE
                    and alias_form != CASE_NONE
                    and form != alias_form
                ):
                    score *= CASE_PENALTY
                if entity in mentioned:
                    score *= LOCAL_BOOST
                key = (-score, -count, entity)
                if best_key is None or key < best_key:
                    best, best_key = (entity, score), key
            entity, score = best
            # context update (resolver.cc:133-151 AddEntity semantics)
            pop = max(1, assets.popularity.get(entity, 1))
            context[entity] = context.get(entity, 0.0) + MENTION_WEIGHT / pop
            for dst, cnt in assets.links.get(entity, ()):
                dpop = max(1, assets.popularity.get(dst, 1))
                context[dst] = context.get(dst, 0.0) + cnt / dpop
            mentioned.add(entity)
            b_tok = tokens[s_begin + b_rel]
            e_tok = tokens[s_begin + e_rel - 1]
            out.append(
                {
                    "sentence": s_idx,
                    "begin": s_begin + b_rel,
                    "end": s_begin + e_rel,
                    "phrase": " ".join(
                        tokens[i]["word"] for i in range(s_begin + b_rel, s_begin + e_rel)
                    ),
                    "fp": fp,
                    "entity": entity,
                    "score": score,
                    "form": form,
                    "char_begin": b_tok["begin"],
                    "char_end": e_tok["end"],
                }
            )
    return out


def _sentence_bounds(tokens: list[dict]) -> list[tuple[int, int]]:
    if not tokens:
        return []
    bounds = []
    start = 0
    for i in range(1, len(tokens)):
        if tokens[i]["brk"] >= 2:  # BREAK_SENTENCE
            bounds.append((start, i))
            start = i
    bounds.append((start, len(tokens)))
    return bounds


def detect_mentions(
    documents: DataFrame,
    assets_bc,
    min_idf: float = DEFAULT_MIN_IDF,
    max_span: int = DEFAULT_MAX_SPAN,
) -> DataFrame:
    """documents → mentions. ``assets_bc`` is a Spark broadcast of
    :class:`KbAssets`. Narrow transformation — no shuffle."""

    def run(batches):
        assets = assets_bc.value
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                toks = [dict(t) if not isinstance(t, dict) else t for t in row.tokens]
                for m in annotate_document(
                    toks, _sentence_bounds(toks), assets, min_idf, max_span
                ):
                    rows.append(
                        {
                            "repo": row.repo,
                            "path": row.path,
                            "commit": row.commit,
                            "content_sha": row.content_sha,
                            "sentence": m["sentence"],
                            "begin": m["begin"],
                            "end": m["end"],
                            "phrase": m["phrase"],
                            "fp": m["fp"],
                            "entity": m["entity"],
                            "score": m["score"],
                            "form": m["form"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "repo", "path", "commit", "content_sha", "sentence",
                    "begin", "end", "phrase", "fp", "entity", "score", "form",
                ],
            )

    cols = [c for c in documents.columns if c != "lang" and c != "n_tokens"]
    return documents.select(*cols).mapInPandas(run, schema=MENTIONS_SCHEMA)
