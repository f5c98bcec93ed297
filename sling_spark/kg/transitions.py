"""Gold transition generation — the transition-system analog
(SURVEY.md §2.8).

Reference semantics: the caspar/knolex decoders are trained on GOLD
ACTION SEQUENCES produced by the transition generator from annotated
documents — the action inventory and field layout are
sling/nlp/parser/parser-action.h:29-185 (SHIFT / MARK / EVOKE / REFER
/ CONNECT / ASSIGN with length/source/target/role/label fields), and
the generation algorithm is transition-generator.cc:93-185: per token,
MARK for every multi-token span starting there; for every span ending
there, REFER through the attention buffer when the frame is already
attended (moving it to the center) else EVOKE (new center) followed by
the frame's slots — CONNECT when the slot value's frame is in
attention (value moves to position 1), DEFERRED CONNECT when the value
frame exists but is not yet attended (emitted right after that frame's
EVOKE, source moves to position 1), ASSIGN otherwise; then SHIFT.
This module reproduces that generator exactly; the learned
transition-scoring networks (caspar-decoder.cc's FF cascade) are NOT
reproduced — the generator IS the data-producing semantics the
reference trains from, and stays the documented scope boundary.

Frame-graph mapping for this engine's silver annotations:

- one frame per (document, entity): the first mention EVOKEs it with
  ``label = entity`` (the resolved item is the frame type analog),
  later mentions — including anaphors — REFER;
- frame slots = the document's extracted relations with the entity as
  subject, deduped and sorted by (role, value) for determinism;
- a slot value mentioned SOMEWHERE in the document is a frame:
  CONNECT if already attended, deferred CONNECT otherwise (the
  anonymous-frame deferral analog — literal date/number frames
  participate, so a P6 release-date relation CONNECTs to the date
  span's frame exactly like the reference's date frames);
- other values (out-of-document items, unmentioned literals) ASSIGN.

Execution shape: the per-document generator is pure sequential Python
by necessity (the attention buffer is an order-dependent automaton —
same boundary as the resolver, SURVEY.md §4 risk #4) but documents are
independent, so the Spark op runs it as one cogrouped-pandas pass
keyed by document: mentions ⟂ relations co-partitioned in a single
shuffle, no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSITIONS_SCHEMA = (
    "repo string, path string, commit string, idx int, action string, "
    "length int, source int, target int, role string, label string"
)

SHIFT, MARK, EVOKE, REFER, CONNECT, ASSIGN = (
    "SHIFT", "MARK", "EVOKE", "REFER", "CONNECT", "ASSIGN"
)


def generate_transitions(
    spans: list[tuple[int, int, str]],
    slots: dict[str, list[tuple[str, str]]],
    n_tokens: int,
) -> list[tuple[str, int, int, int, str, str]]:
    """Gold action sequence for one document (transition-generator.cc
    Generate, :93-185). ``spans``: disjoint (begin, end, entity)
    mention spans; ``slots``: entity → [(role, value)] sorted;
    ``n_tokens``: document length (one SHIFT per token). Returns
    (action, length, source, target, role, label) tuples.

    Spans MUST be disjoint (validated below): the mark stack is LIFO,
    so two multi-token spans ending on the same token would pop each
    other's marks and silently swap boundaries on replay. This engine's
    mention merger emits disjoint spans by construction; the check
    turns a violated precondition into a loud error."""
    prev_end = 0
    for b, e, _ in sorted(spans):
        if b < prev_end:
            raise ValueError(
                f"generate_transitions requires disjoint spans; got overlap "
                f"at ({b}, {e}) after a span ending at {prev_end}"
            )
        prev_end = e
    attention: list[str] = []  # last element = center of attention

    def index(h: str) -> int:
        # attention index: 0 = center (slot() in transition-generator.cc)
        n = len(attention)
        for i in range(n):
            if attention[n - 1 - i] == h:
                return i
        return -1

    def move(idx: int, pos: int) -> None:
        # move toward the center only (Attention::move DCHECKs
        # index > position; parser-state Connect never moves when
        # source == target, so a SELF-SLOT — value == the frame itself,
        # giving move(0, 1) — must be a no-op, not a buffer corruption)
        if idx <= pos:
            return
        n = len(attention)
        start = n - idx - 1
        end = n - pos - 1
        h = attention[start]
        for i in range(start, end):
            attention[i] = attention[i + 1]
        attention[end] = h

    starts: dict[int, list[tuple[int, int, str]]] = {}
    ends: dict[int, list[tuple[int, int, str]]] = {}
    mentioned = {s[2] for s in spans}
    for sp in sorted(spans):
        starts.setdefault(sp[0], []).append(sp)
        ends.setdefault(sp[1] - 1, []).append(sp)

    out: list[tuple[str, int, int, int, str, str]] = []
    deferred: list[tuple[str, str, str]] = []  # (source, role, target)
    for t in range(n_tokens):
        for b, e, _ent in starts.get(t, ()):
            if e - b > 1:  # multi-token spans push the mark stack
                out.append((MARK, 0, 0, 0, "", ""))
        for b, e, ent in ends.get(t, ()):
            length = e - b
            if length > 1:
                length = 0  # zero-length EVOKE/REFER uses the mark stack
            i = index(ent)
            if i != -1:
                out.append((REFER, length, 0, i, "", ""))
                move(i, 0)
                continue
            out.append((EVOKE, length, 0, 0, "", ent))
            attention.append(ent)
            # deferred CONNECTs whose target just got evoked (emitted in
            # insertion order, erase-as-you-scan like the reference)
            remaining = []
            for src, role, tgt in deferred:
                if tgt == ent:
                    si = index(src)
                    out.append((CONNECT, 0, si, 0, role, ""))
                    move(si, 1)
                else:
                    remaining.append((src, role, tgt))
            deferred = remaining
            # slots of the newly evoked frame
            for role, value in slots.get(ent, ()):
                j = index(value)
                if j != -1:
                    out.append((CONNECT, 0, 0, j, role, ""))
                    move(j, 1)
                elif value in mentioned:
                    deferred.append((ent, role, value))
                else:
                    out.append((ASSIGN, 0, 0, 0, role, value))
        out.append((SHIFT, 0, 0, 0, "", ""))
    return out


def _doc_slots(rel_rows: list[dict]) -> dict[str, list[tuple[str, str]]]:
    """Deduped, (role, value)-sorted slot lists per subject entity."""
    by_subj: dict[str, set[tuple[str, str]]] = {}
    for r in rel_rows:
        by_subj.setdefault(r["subj"], set()).add((r["pred"], r["obj"]))
    return {s: sorted(v) for s, v in by_subj.items()}


def gold_transitions(
    mentions: DataFrame, relations: DataFrame, doc_stats: DataFrame
) -> DataFrame:
    """Document-keyed gold action sequences: (doc, idx, action, length,
    source, target, role, label) rows. One cogrouped-pandas pass —
    mentions and relations shuffle ONCE on the document key; n_tokens
    rides along on the mentions side (broadcast-sized doc_stats join).
    Documents with no mentions emit nothing (transitions exist for
    annotated parts, as in the reference's document-part Generate)."""
    key = ["repo", "path", "commit"]
    # rename the stats-side keys: mentions/doc_stats share lineage (both
    # derive from the documents scan), so a bare equi-join is ambiguous
    ds = doc_stats.select(
        F.col("repo").alias("_sr"), F.col("path").alias("_sp"),
        F.col("commit").alias("_sc"), "n_tokens",
    )
    m = (
        mentions.select(*key, "begin", "end", "entity")
        .join(
            F.broadcast(ds),
            (F.col("repo") == F.col("_sr"))
            & (F.col("path") == F.col("_sp"))
            & (F.col("commit") == F.col("_sc")),
        )
        .drop("_sr", "_sp", "_sc")
    )
    # relations shares the annotations lineage with mentions, so its
    # grouping keys are renamed too (cogroup matches keys by position)
    r = relations.select(
        F.col("repo").alias("_rr"), F.col("path").alias("_rp"),
        F.col("commit").alias("_rc"), "subj", "pred", "obj",
    )

    def gen(mk, mpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if mpdf.empty:
            return pd.DataFrame(
                columns=["repo", "path", "commit", "idx", "action",
                         "length", "source", "target", "role", "label"]
            )
        repo, path, commit = mk
        spans = sorted(
            {(int(b), int(e), ent)
             for b, e, ent in zip(mpdf["begin"], mpdf["end"], mpdf["entity"])}
        )
        slots = _doc_slots(rpdf.to_dict("records")) if not rpdf.empty else {}
        n_tokens = int(mpdf["n_tokens"].iloc[0])
        rows = [
            {"repo": repo, "path": path, "commit": commit, "idx": i,
             "action": a, "length": ln, "source": s, "target": tg,
             "role": ro, "label": lb}
            for i, (a, ln, s, tg, ro, lb) in enumerate(
                generate_transitions(spans, slots, n_tokens)
            )
        ]
        return pd.DataFrame(
            rows,
            columns=["repo", "path", "commit", "idx", "action",
                     "length", "source", "target", "role", "label"],
        )

    return (
        m.groupBy(*key)
        .cogroup(r.groupBy("_rr", "_rp", "_rc"))
        .applyInPandas(gen, schema=TRANSITIONS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# parser-state Apply analog + knolex cascade structure
# ---------------------------------------------------------------------------


def apply_transitions(
    actions: list[tuple[str, int, int, int, str, str]],
) -> dict:
    """Replay a gold action sequence — the ParserState::Apply analog
    (reference sling/nlp/parser/parser-state.cc:44-289): SHIFT advances
    the token cursor, MARK pushes it, EVOKE/REFER materialize spans
    (explicit length from the cursor, length 0 from the mark stack) and
    maintain the attention buffer with the EXACT Connect re-focusing
    rule (the larger of source/target moves next to the smaller,
    parser-state.cc:246-258). Returns the reconstructed document:
    ``spans`` [(begin, end, frame_idx)], ``frames`` [label],
    ``edges`` [(src_frame, role, tgt_frame)], ``assigns``
    [(frame, role, value)]. Round-tripping generate_transitions through
    this applier recovers the silver annotations exactly
    (test_transition_roundtrip) — the generator/applier consistency
    invariant the reference trains against."""
    current = 0
    marks: list[int] = []
    frames: list[str] = []  # frame_idx -> label
    attention: list[int] = []  # frame indices; last = center
    spans: list[tuple[int, int, int]] = []
    edges: list[tuple[int, str, int]] = []
    assigns: list[tuple[int, str, str]] = []

    def att(i: int) -> int:
        return attention[len(attention) - 1 - i]

    def move(idx: int, pos: int) -> None:
        if idx == pos:
            return
        n = len(attention)
        start, end = n - idx - 1, n - pos - 1
        f = attention[start]
        for i in range(start, end):
            attention[i] = attention[i + 1]
        attention[end] = f

    def span_bounds(length: int) -> tuple[int, int]:
        if length == 0:
            return marks.pop(), current + 1
        return current, current + length

    for action, length, source, target, role, label in actions:
        if action == SHIFT:
            current += 1
        elif action == MARK:
            marks.append(current)
        elif action == EVOKE:
            b, e = span_bounds(length)
            frames.append(label)
            spans.append((b, e, len(frames) - 1))
            attention.append(len(frames) - 1)
        elif action == REFER:
            b, e = span_bounds(length)
            f = att(target)
            spans.append((b, e, f))
            move(target, 0)
        elif action == CONNECT:
            edges.append((att(source), role, att(target)))
            if source < target:  # parser-state.cc:253-257
                move(target, source + 1)
            elif source > target:
                move(source, target + 1)
        elif action == ASSIGN:
            assigns.append((att(source), role, label))
        else:
            raise ValueError(f"unknown action {action!r}")
    return {"spans": spans, "frames": frames, "edges": edges,
            "assigns": assigns}


def action_table(transitions: DataFrame) -> DataFrame:
    """Action vocabulary + cascade-delegate structure from gold
    sequences — the knolex cascade's non-neural skeleton (reference
    knolex-decoder.cc:118-151: MainDelegate classifies SHIFT/MARK/
    CASCADE, an EvokeDelegate holds the EVOKE/REFER actions, a
    ConnectDelegate the CONNECT/ASSIGN actions; the per-delegate action
    inventories are COLLECTED FROM THE GOLD SEQUENCES exactly as the
    trainer builds its ActionTable). One hash aggregation keyed by the
    distinct action tuple; delegate assignment is a pure when-chain."""
    delegate = (
        F.when(F.col("action").isin(SHIFT, MARK), F.lit("main"))
        .when(F.col("action").isin(EVOKE, REFER), F.lit("evoke"))
        .otherwise(F.lit("connect"))
    )
    return (
        transitions.groupBy(
            "action", "length", "source", "target", "role", "label"
        )
        .agg(F.count("*").cast("long").alias("n_uses"))
        .withColumn("delegate", delegate)
        .select("delegate", "action", "length", "source", "target",
                "role", "label", "n_uses")
    )


CASCADE = "CASCADE"


def cascade_encode(
    actions: list[tuple[str, int, int, int, str, str]],
    scheme: str = "caspar",
) -> list[tuple[str, int, int, int, str, str]]:
    """Cascade-form gold sequences — the exact per-decoder training
    targets (the second tuple field carries the DELEGATE index for
    CASCADE actions, mirroring ParserAction's packed constructor where
    the same byte is length-or-delegate, parser-action.h:96-103):

    - ``caspar`` (caspar-decoder.cc:105-115): CASCADE(1) before every
      action that is not SHIFT/MARK — a ShiftMarkOther main delegate
      plus one classification delegate over the full action table;
    - ``knolex`` (knolex-decoder.cc:196-207): CASCADE(1) before EVOKE
      and CASCADE(2) before CONNECT only — faithfully reproducing that
      REFER/ASSIGN actions get NO cascade prefix in the reference (its
      knowledge-extraction corpora do not train those paths).
    """
    out: list[tuple[str, int, int, int, str, str]] = []
    for a in actions:
        if scheme == "caspar":
            if a[0] not in (SHIFT, MARK):
                out.append((CASCADE, 1, 0, 0, "", ""))
        elif scheme == "knolex":
            if a[0] == EVOKE:
                out.append((CASCADE, 1, 0, 0, "", ""))
            elif a[0] == CONNECT:
                out.append((CASCADE, 2, 0, 0, "", ""))
        else:
            raise ValueError(f"unknown cascade scheme {scheme!r}")
        out.append(a)
    return out
