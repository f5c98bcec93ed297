"""Mention detection + entity linking + (fused) relation extraction.

Reference semantics (sling/nlp/silver/mentions.cc, sling/nlp/kb/
resolver.cc, sling/nlp/silver/relations.cc), per sentence unit:

1. **Span enumeration** (SpanPopulator, mentions.cc:45-100): every token
   span up to ``max_span`` whose phrase fingerprint hits the phrase
   table is a candidate; spans start/end on non-skipped tokens.
2. **Common-word pruning** (CommonWordPruner, mentions.h:126): a
   single-token candidate whose surface is all-lowercase and whose IDF
   is below threshold is pruned.
3. **Span cover** (SpanChart::Solve, chart.cc:52-98): DP minimum-cost
   cover — skip costs 2, any span costs 1; ties prefer the longer span.
4. **Resolution** (ResolverContext, resolver.cc:31-151): score =
   ``(base + context[entity]) * count``; case-form mismatch x0.1;
   locally-mentioned x30 (resolver.h:50-54). The winner feeds the
   context (500/popularity for itself, count/popularity per outbound
   link) — sequential within a document, parallel across documents.
5. **Relations** (relations.cc:28-227): per sentence, subjects left to
   right, each subject's KB facts in property-priority order, closest
   unused target mention wins, one incoming relation per target.

The reference runs these as ONE annotator chain per document
(silver.py:105-169); we do the same: ONE Arrow-batched mapInPandas pass
emits mention rows and relation rows together (a `kind` column splits
them), with the phrase table / IDF / links / popularity / facts
broadcast — the analog of SLING memory-mapping its repository files per
worker (sling/file/repository.h:30-60). No shuffle anywhere in the
annotation path; order-dependent logic stays inside the per-document
call (SURVEY.md §4 risk #4).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fingerprint import FP_SKIPPED, fingerprint_cat
from ..functions.normalize import CASE_NONE
from ..sources.kb import BLOCKED_PROPERTIES, PROPERTY_PRIORITY

ANNOTATIONS_SCHEMA = (
    "kind string, repo string, path string, commit string, "
    "content_sha string, sentence int, begin int, end int, "
    "phrase string, fp long, entity string, score double, form int, "
    "anaphora boolean, pred string, obj string"
)

MENTION_COLS = [
    "repo", "path", "commit", "content_sha", "sentence",
    "begin", "end", "phrase", "fp", "entity", "score", "form", "anaphora",
]
RELATION_COLS = [
    "repo", "path", "commit", "content_sha", "sentence",
    "subj", "pred", "obj", "begin", "end",
]

# resolver weights — resolver.h:50-54 semantics
BASE_CONTEXT = 1e-3
MENTION_WEIGHT = 500.0
CASE_PENALTY = 0.1
LOCAL_BOOST = 30.0
TOKEN_SKIP_COST = 2.0
SPAN_COST = 1.0
DEFAULT_MIN_IDF = 1.2
DEFAULT_MAX_SPAN = 5
ANAPHORA_WINDOW = 3  # sentences an antecedent may be away (anaphora.cc)

# pronoun descriptors with grammatical gender (anaphora.cc:45-55 English
# inventory; it/this are the code-corpus neuter triggers with UNKNOWN
# gender — they agree with genderless markables, exactly the reference's
# `m.gender == markable.gender` rule)
G_UNKNOWN, G_MASC, G_FEM = 0, 1, 2
PRONOUN_GENDER = {
    "it": G_UNKNOWN, "this": G_UNKNOWN,
    "he": G_MASC, "his": G_MASC, "him": G_MASC,
    "she": G_FEM, "her": G_FEM, "hers": G_FEM,
}
PRONOUNS = set(PRONOUN_GENDER)


@dataclass
class KbAssets:
    """Broadcast-side lookup structures (all dimension-sized)."""

    phrase_table: dict[int, list[tuple]]  # fp -> [(entity, count, form, reliable)]
    idf: dict[int, float]  # token fp -> idf
    popularity: dict[str, int]  # entity -> popularity count
    links: dict[str, list[tuple[str, int]]]  # src -> [(dst, count)]
    statements: dict[str, list[tuple[str, str]]]  # subj -> [(pid, obj)]
    gender: dict[str, int] | None = None  # entity -> G_* (anaphora agreement)


def _sentence_bounds(brks: list[int]) -> list[tuple[int, int]]:
    n = len(brks)
    if n == 0:
        return []
    bounds = []
    start = 0
    for i in range(1, n):
        if brks[i] >= 2:  # BREAK_SENTENCE
            bounds.append((start, i))
            start = i
    bounds.append((start, n))
    return bounds


def annotate_document(
    words: list[str],
    brks: list[int],
    fps: list[int],
    forms: list[int],
    assets: KbAssets,
    min_idf: float = DEFAULT_MIN_IDF,
    max_span: int = DEFAULT_MAX_SPAN,
) -> tuple[list[dict], list[dict]]:
    """Annotator chain for one document over parallel token arrays.
    Returns (mentions, relations); span offsets are token indices."""
    phrase_table = assets.phrase_table
    idf_tab = assets.idf
    popularity = assets.popularity
    links = assets.links
    statements = assets.statements
    prio = {p: i for i, p in enumerate(PROPERTY_PRIORITY)}

    context: dict[str, float] = {}
    mentioned: set[str] = set()
    mentions: list[dict] = []
    relations: list[dict] = []
    # per-token alpha flags once (each token is otherwise re-scanned up to
    # max_span times in the span loop — ~30% of annotation CPU, profiled)
    has_alpha = [any(c.isalpha() for c in w) for w in words]
    ordered_facts: dict[str, list] = {}  # per-doc cache of sorted statements

    for s_idx, (sb, se) in enumerate(_sentence_bounds(brks)):
        n = se - sb
        # ---- 1/2: candidate spans ------------------------------------
        ends: dict[int, list[tuple[int, int, int]]] = {}
        for b in range(n):
            if fps[sb + b] == FP_SKIPPED:
                continue
            fp = 0
            has_alpha_mixed = 0  # 0 unset, else running shared form or -1
            for l in range(1, min(max_span, n - b) + 1):
                i = sb + b + l - 1
                tfp = fps[i]
                w = words[i]
                if has_alpha[i]:
                    f = forms[i]
                    if has_alpha_mixed == 0:
                        has_alpha_mixed = f if f != CASE_NONE else -1
                    elif has_alpha_mixed != f:
                        has_alpha_mixed = -1
                if tfp == FP_SKIPPED:
                    continue
                fp = tfp if fp == 0 else fingerprint_cat(fp, tfp)
                if fp not in phrase_table:
                    continue
                if l == 1 and w.islower():
                    v = idf_tab.get(tfp)
                    if v is not None and v < min_idf:
                        continue
                form = has_alpha_mixed if has_alpha_mixed > 0 else CASE_NONE
                ends.setdefault(b + l, []).append((b, fp, form))

        # ---- 3: DP minimum-cost cover ---------------------------------
        INF = float("inf")
        dp = [0.0] + [INF] * n
        back: list[tuple | None] = [None] * (n + 1)
        for e in range(1, n + 1):
            cost = dp[e - 1] + TOKEN_SKIP_COST
            choice = None
            cands = ends.get(e)
            if cands:
                for b, fp, form in sorted(cands):
                    c = dp[b] + SPAN_COST
                    if c < cost:
                        cost, choice = c, (b, fp, form)
            dp[e] = cost
            back[e] = choice
        spans: list[tuple[int, int, int, int]] = []
        e = n
        while e > 0:
            ch = back[e]
            if ch is None:
                e -= 1
            else:
                spans.append((ch[0], e, ch[1], ch[2]))
                e = ch[0]
        spans.reverse()

        # ---- 4: resolve, left to right --------------------------------
        sent_mentions: list[tuple[int, int, str]] = []  # (begin_abs, end_abs, entity)
        for b_rel, e_rel, fp, form in spans:
            best = None
            best_key = None
            for entity, count, aform, _rel in phrase_table[fp]:
                score = (BASE_CONTEXT + context.get(entity, 0.0)) * count
                if form != CASE_NONE and aform != CASE_NONE and form != aform:
                    score *= CASE_PENALTY
                if entity in mentioned:
                    score *= LOCAL_BOOST
                key = (-score, -count, entity)
                if best_key is None or key < best_key:
                    best, best_key = (entity, score), key
            entity, score = best
            pop = popularity.get(entity) or 1
            context[entity] = context.get(entity, 0.0) + MENTION_WEIGHT / max(1, pop)
            for dst, cnt in links.get(entity, ()):
                dpop = max(1, popularity.get(dst) or 1)
                context[dst] = context.get(dst, 0.0) + cnt / dpop
            mentioned.add(entity)
            b_abs, e_abs = sb + b_rel, sb + e_rel
            sent_mentions.append((b_abs, e_abs, entity))
            mentions.append(
                {
                    "sentence": s_idx,
                    "begin": b_abs,
                    "end": e_abs,
                    "phrase": " ".join(words[b_abs:e_abs]),
                    "fp": fp,
                    "entity": entity,
                    "score": score,
                    "form": form,
                    "anaphora": False,
                }
            )

        # ---- 4b: anaphora (anaphora.cc:120-145 semantics) --------------
        # a pronoun token resolves to the EARLIEST gender-agreeing
        # NON-anaphor mention in the NEAREST sentence that has one (own
        # sentence included, only mentions before the pronoun), searching
        # back at most ANAPHORA_WINDOW sentences. Gender comes from the
        # entity's P21 fact (anaphora.cc:178-190); genderless entities are
        # UNKNOWN and agree with it/this. Anaphors then act as relation
        # SUBJECTS only (never as targets).
        gender_of = assets.gender or {}
        anaphors: list[tuple[int, int, str]] = []
        covered = {i for b, e, _ent in sent_mentions for i in range(b, e)}
        for i in range(sb, se):
            w = words[i].casefold()
            if i in covered or w not in PRONOUN_GENDER:
                continue
            pgender = PRONOUN_GENDER[w]
            antecedent = None
            prev_sent = s_idx
            for m in reversed(mentions):
                if m["anaphora"]:
                    continue
                if m["sentence"] == s_idx and m["begin"] >= i:
                    continue  # only markables before the pronoun
                if m["sentence"] != prev_sent:
                    if antecedent is not None:
                        break
                    if s_idx - m["sentence"] > ANAPHORA_WINDOW:
                        break
                    prev_sent = m["sentence"]
                if gender_of.get(m["entity"], G_UNKNOWN) == pgender:
                    antecedent = m
            if antecedent is None:
                continue
            anaphors.append((i, i + 1, antecedent["entity"]))
            mentions.append(
                {
                    "sentence": s_idx,
                    "begin": i,
                    "end": i + 1,
                    "phrase": words[i],
                    "fp": fps[i],
                    "entity": antecedent["entity"],
                    "score": 0.0,
                    "form": forms[i],
                    "anaphora": True,
                }
            )

        # ---- 5: relations (relations.cc greedy) ------------------------
        subjects = sorted(sent_mentions + anaphors)
        if subjects and sent_mentions:
            used: set[int] = set()
            for s_begin, s_end, s_entity in subjects:
                ordered = ordered_facts.get(s_entity)
                if ordered is None:
                    facts = statements.get(s_entity)
                    ordered = sorted(
                        {f for f in facts if f[0] not in BLOCKED_PROPERTIES},
                        key=lambda f: (prio.get(f[0], 99), f[0], f[1]),
                    ) if facts else []
                    ordered_facts[s_entity] = ordered
                if not ordered:
                    continue
                for pid, obj in ordered:
                    cands = [
                        ob
                        for ob, _oe, oent in sent_mentions  # targets: real mentions only
                        if oent == obj and ob != s_begin and ob not in used
                    ]
                    if not cands:
                        continue
                    o_begin = min(cands, key=lambda ob: (abs(ob - s_begin), ob))
                    used.add(o_begin)
                    relations.append(
                        {
                            "sentence": s_idx,
                            "subj": s_entity,
                            "pred": pid,
                            "obj": obj,
                            "begin": s_begin,
                            "end": s_end,
                        }
                    )
    return mentions, relations


def annotate(
    documents: DataFrame,
    assets_bc,
    min_idf: float = DEFAULT_MIN_IDF,
    max_span: int = DEFAULT_MAX_SPAN,
) -> DataFrame:
    """documents → unified annotation rows (kind = mention | relation).
    Narrow transformation — no shuffle; split with mentions_of/
    relations_of (one cached pass serves both)."""

    cols = ["kind", "repo", "path", "commit", "content_sha",
            "sentence", "begin", "end", "phrase", "fp",
            "entity", "score", "form", "anaphora", "pred", "obj"]

    def run(batches):
        from ..functions.tokenize import tokenize

        assets = assets_bc.value
        for pdf in batches:
            data = {c: [] for c in cols}
            for row in pdf.itertuples(index=False):
                # tokenize in-process (0.8ms/doc) instead of shipping
                # token arrays through Arrow (~2ms/doc measured) — the
                # tokenizer is deterministic, so the documents table's
                # n_tokens/fp_unique stay consistent with this pass
                toks = tokenize(row.content)
                words = [t.word for t in toks]
                ms, rs = annotate_document(
                    words,
                    [t.brk for t in toks],
                    [t.fp for t in toks],
                    [t.form for t in toks],
                    assets,
                    min_idf,
                    max_span,
                )
                n = len(ms) + len(rs)
                data["repo"].extend([row.repo] * n)
                data["path"].extend([row.path] * n)
                data["commit"].extend([row.commit] * n)
                data["content_sha"].extend([row.content_sha] * n)
                data["kind"].extend(["mention"] * len(ms) + ["relation"] * len(rs))
                for m in ms:
                    data["sentence"].append(m["sentence"])
                    data["begin"].append(m["begin"])
                    data["end"].append(m["end"])
                    data["phrase"].append(m["phrase"])
                    data["fp"].append(m["fp"])
                    data["entity"].append(m["entity"])
                    data["score"].append(m["score"])
                    data["form"].append(m["form"])
                    data["anaphora"].append(m["anaphora"])
                    data["pred"].append(None)
                    data["obj"].append(None)
                for r in rs:
                    data["sentence"].append(r["sentence"])
                    data["begin"].append(r["begin"])
                    data["end"].append(r["end"])
                    data["phrase"].append(None)
                    data["fp"].append(None)
                    data["entity"].append(r["subj"])
                    data["score"].append(None)
                    data["form"].append(None)
                    data["anaphora"].append(None)
                    data["pred"].append(r["pred"])
                    data["obj"].append(r["obj"])
            # fp/form carry None on relation rows; explicit nullable
            # integer dtypes prevent pandas' float64 coercion (which
            # silently destroys 63-bit fingerprint precision)
            data["fp"] = pd.array(data["fp"], dtype="Int64")
            data["form"] = pd.array(data["form"], dtype="Int32")
            yield pd.DataFrame(data, columns=cols)

    needed = ["repo", "path", "commit", "content_sha", "content"]
    return documents.select(*needed).mapInPandas(run, schema=ANNOTATIONS_SCHEMA)


def mentions_of(annotations: DataFrame) -> DataFrame:
    return annotations.filter(F.col("kind") == "mention").select(*MENTION_COLS)


def relations_of(annotations: DataFrame) -> DataFrame:
    return annotations.filter(F.col("kind") == "relation").select(
        "repo", "path", "commit", "content_sha", "sentence",
        F.col("entity").alias("subj"), "pred", "obj", "begin", "end",
    )


def detect_mentions(
    documents: DataFrame,
    assets_bc,
    min_idf: float = DEFAULT_MIN_IDF,
    max_span: int = DEFAULT_MAX_SPAN,
) -> DataFrame:
    """Mentions only (the standalone stage used by tests/queries)."""
    return mentions_of(annotate(documents, assets_bc, min_idf, max_span))


def annotate_text(text: str, assets: KbAssets) -> dict:
    """Per-record entry point (SURVEY.md §3.2 — the reference's
    ``parser.parse(text)`` / ``analyzer.annotate(doc)`` one-shot API,
    doc/guide/pyapi.md): tokenize one string and run the full annotator
    chain in-process, no Spark. Returns {tokens, mentions, relations,
    lex} — the same dict shapes the distributed path emits, so callers
    can switch between one document and 10^12 without code changes."""
    from ..functions.lex import to_lex
    from ..functions.tokenize import tokenize

    toks = tokenize(text)
    mentions, relations = annotate_document(
        [t.word for t in toks],
        [t.brk for t in toks],
        [t.fp for t in toks],
        [t.form for t in toks],
        assets,
    )
    lex = to_lex(
        [t.word for t in toks],
        [t.brk for t in toks],
        [(m["begin"], m["end"], m["entity"]) for m in mentions],
    )
    return {"tokens": toks, "mentions": mentions, "relations": relations, "lex": lex}
