"""Trainable caspar/knolex transition-scoring cascade — the last
declared round-3 scope boundary, closed.

Reference semantics: the transition decoders score parser actions with
a cascade of softmax delegates over a shared activation vector
(multiclass-delegate.h:33 MultiClassDelegate = softmax cross-entropy
classifier over a fixed action inventory):

- **caspar** (caspar-decoder.cc:105-123): a ShiftMarkOtherDelegate
  classifying SHIFT / MARK / CASCADE(1), chained to one
  ClassificationDelegate over the full gold action table;
- **knolex** (knolex-decoder.cc:118-151): a MainDelegate classifying
  SHIFT / MARK / CASCADE(1) / CASCADE(2), an EvokeDelegate over the
  EVOKE/REFER inventory and a ConnectDelegate over the CONNECT/ASSIGN
  inventory.

Both are trained on GOLD ACTION SEQUENCES from the silver-annotated
corpus (transitions.generate_transitions — hash-verified against the
independent oracle by the kg_transitions contract query) and decoded
greedily through the exact ParserState semantics
(parser-state.cc:44-289, the same automaton as
transitions.apply_transitions) with per-step validity masking.

What is faithfully reproduced: the cascade/delegate structure, the
action inventories collected from gold sequences (ActionTable
collection), softmax cross-entropy training, greedy masked decode, and
the state machine. What is an analog: the feature function (the
reference features its bi-LSTM activation; here the shared lexical
token encodings from kg.lexical plus parser-state features — attention
labels, mark depth, previous action — mirroring the roles/attention
feature channels of transition-decoder.cc) and the exact optimizer
(deterministic full-batch gradient descent instead of the reference's
minibatch Adam — chosen so training is bit-reproducible anywhere).

Execution shape: training is driver-side NumPy over the fixture's gold
sequences (the reference trains single-process too); the trained
weights (a few hundred KB) ship inside the decode task closure, and
decoding runs as one mapInPandas pass — batched encoder call per
document, then the O(actions) masked-argmax state walk, all float64
with quantized logits so executor-side decode is bit-identical to the
driver-side twin.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .transitions import ASSIGN, CONNECT, EVOKE, MARK, REFER, SHIFT

TOK_DIM = 32
ATT_DIM = 8
ATT_K = 4
MARK_CAP = 4
PREV_TYPES = (SHIFT, MARK, EVOKE, REFER, CONNECT, ASSIGN)
FEAT_DIM = 2 * TOK_DIM + MARK_CAP + ATT_K * ATT_DIM + len(PREV_TYPES) + 1
MAX_ACTIONS_PER_TOKEN = 10  # decode termination budget (forces SHIFT)

DECODE_SCHEMA = (
    "repo string, path string, commit string, idx int, action string, "
    "length int, source int, target int, role string, label string"
)


@lru_cache(maxsize=1 << 16)
def _label_embed(label: str) -> np.ndarray:
    from ..functions.fingerprint import hash64
    from .lexical import _hash_embed

    return _hash_embed(
        np.array([hash64(label)], dtype=np.uint64), ATT_DIM, 0xC0FFEE
    )[0]


class _State:
    """Decode/replay parser state (the ParserState::Apply automaton,
    parser-state.cc:44-289) that also exposes the feature channels."""

    __slots__ = ("n", "cursor", "marks", "frames", "attention", "prev",
                 "steps_here")

    def __init__(self, n_tokens: int):
        self.n = n_tokens
        self.cursor = 0
        self.marks: list[int] = []
        self.frames: list[str] = []
        self.attention: list[int] = []  # frame indices; last = center
        self.prev = -1  # index into PREV_TYPES; -1 = none
        self.steps_here = 0

    def att_frame(self, i: int) -> int:
        return self.attention[len(self.attention) - 1 - i]

    def _move(self, idx: int, pos: int) -> None:
        if idx == pos:
            return
        n = len(self.attention)
        start, end = n - idx - 1, n - pos - 1
        f = self.attention[start]
        for i in range(start, end):
            self.attention[i] = self.attention[i + 1]
        self.attention[end] = f

    def apply(self, action: tuple) -> None:
        a, length, source, target, role, label = action
        if a == SHIFT:
            self.cursor += 1
            self.steps_here = 0
        elif a == MARK:
            self.marks.append(self.cursor)
        elif a == EVOKE:
            if length == 0:
                self.marks.pop()
            self.frames.append(label)
            self.attention.append(len(self.frames) - 1)
        elif a == REFER:
            if length == 0:
                self.marks.pop()
            self._move(target, 0)
        elif a == CONNECT:
            if source < target:
                self._move(target, source + 1)
            elif source > target:
                self._move(source, target + 1)
        # ASSIGN mutates no state
        self.prev = PREV_TYPES.index(a)
        if a != SHIFT:
            self.steps_here += 1

    def features(self, enc: np.ndarray) -> np.ndarray:
        """The shared activation vector all delegates read
        (transition-decoder.cc feature channels analog): current +
        lookahead token encodings, mark depth, top-K attention-frame
        label embeddings, previous action type, cursor-at-end flag."""
        x = np.zeros(FEAT_DIM, dtype=np.float64)
        o = 0
        if self.cursor < self.n:
            x[o:o + TOK_DIM] = enc[self.cursor]
        o += TOK_DIM
        if self.cursor + 1 < self.n:
            x[o:o + TOK_DIM] = enc[self.cursor + 1]
        o += TOK_DIM
        x[o + min(len(self.marks), MARK_CAP - 1)] = 1.0
        o += MARK_CAP
        for i in range(min(ATT_K, len(self.attention))):
            x[o + i * ATT_DIM:o + (i + 1) * ATT_DIM] = _label_embed(
                self.frames[self.att_frame(i)]
            )
        o += ATT_K * ATT_DIM
        if self.prev >= 0:
            x[o + self.prev] = 1.0
        o += len(PREV_TYPES)
        x[o] = 1.0 if self.cursor >= self.n else 0.0
        return x


# ---------------------------------------------------------------------------
# delegates
# ---------------------------------------------------------------------------


class _Delegate:
    """MultiClassDelegate analog: softmax classifier over a fixed
    inventory, one hidden tanh layer, float64 with quantized logits
    (batch-size-invariant decode, same discipline as kg.bio)."""

    def __init__(self, name: str, n_classes: int, hidden: int = 128):
        from .biaffine import _rng

        g = _rng(f"caspar-delegate-{name}")
        self.name = name
        self.w1 = g.standard_normal((FEAT_DIM, hidden)) / np.sqrt(FEAT_DIM)
        self.b1 = np.zeros(hidden)
        self.w2 = g.standard_normal((hidden, n_classes)) / np.sqrt(hidden)
        self.b2 = np.zeros(n_classes)

    def logits(self, x: np.ndarray) -> np.ndarray:
        z = np.tanh(x @ self.w1 + self.b1)
        return np.round(z @ self.w2 + self.b2, 4)

    def train(self, x: np.ndarray, y: np.ndarray, epochs: int = 300,
              lr: float = 0.5) -> float:
        """Deterministic full-batch gradient descent on softmax
        cross-entropy (the loss of multiclass-delegate.h:33). Returns
        final training accuracy."""
        n = len(y)
        if n == 0:
            return 1.0
        onehot = np.zeros((n, self.w2.shape[1]))
        onehot[np.arange(n), y] = 1.0
        for _ in range(epochs):
            z = np.tanh(x @ self.w1 + self.b1)
            lg = z @ self.w2 + self.b2
            lg -= lg.max(axis=1, keepdims=True)
            p = np.exp(lg)
            p /= p.sum(axis=1, keepdims=True)
            g2 = (p - onehot) / n
            gw2 = z.T @ g2
            gb2 = g2.sum(axis=0)
            gz = g2 @ self.w2.T * (1.0 - z * z)
            gw1 = x.T @ gz
            gb1 = gz.sum(axis=0)
            self.w2 -= lr * gw2
            self.b2 -= lr * gb2
            self.w1 -= lr * gw1
            self.b1 -= lr * gb1
        pred = (np.tanh(x @ self.w1 + self.b1) @ self.w2 + self.b2).argmax(1)
        return float((pred == y).mean())


class CasparModel:
    """The trained transition-scoring cascade (caspar or knolex
    delegate layout) + greedy masked decoder."""

    def __init__(self, scheme: str, inventory: list[tuple]):
        if scheme not in ("caspar", "knolex"):
            raise ValueError(f"unknown scheme {scheme!r}")
        self.scheme = scheme
        # inventory: distinct non-SHIFT/MARK gold actions, sorted (the
        # trainer's ActionTable collection) and partitioned per scheme
        self.inventory = sorted(inventory)
        if scheme == "caspar":
            self.groups = [self.inventory]
        else:
            self.groups = [
                [a for a in self.inventory if a[0] in (EVOKE, REFER)],
                [a for a in self.inventory if a[0] in (CONNECT, ASSIGN)],
            ]
        self.main = _Delegate("main-" + scheme, 2 + len(self.groups))
        self.delegates = [
            _Delegate(f"{scheme}-{i}", max(1, len(g)))
            for i, g in enumerate(self.groups)
        ]
        self._index = [
            {a: j for j, a in enumerate(g)} for g in self.groups
        ]
        # per-group validity arrays for masked decode
        self._meta = [
            (
                np.array([{"EVOKE": 0, "REFER": 1, "CONNECT": 2,
                           "ASSIGN": 3}[a[0]] for a in g], dtype=np.int64),
                np.array([a[1] for a in g], dtype=np.int64),  # length
                np.array([a[2] for a in g], dtype=np.int64),  # source
                np.array([a[3] for a in g], dtype=np.int64),  # target
            )
            for i, g in enumerate(self.groups)
        ]

    def group_of(self, action: tuple) -> int:
        """Delegate index by ACTION TYPE (the cascade is structural, so
        an action unseen in training still belongs to a delegate — it
        just can't win its argmax)."""
        if self.scheme == "caspar":
            return 0
        return 0 if action[0] in (EVOKE, REFER) else 1

    # -- training ---------------------------------------------------------

    def fit(self, docs: list[dict], epochs: int = 300) -> dict[str, float]:
        """Train every delegate on gold sequences. ``docs``: list of
        {enc, n_tokens, actions}. Returns training accuracies."""
        xs_main, ys_main = [], []
        xs_d = [[] for _ in self.groups]
        ys_d = [[] for _ in self.groups]
        for d in docs:
            st = _State(d["n_tokens"])
            for a in d["actions"]:
                x = st.features(d["enc"])
                if a[0] == SHIFT:
                    ys_main.append(0)
                elif a[0] == MARK:
                    ys_main.append(1)
                else:
                    gi = self.group_of(a)
                    ys_main.append(2 + gi)
                    if a in self._index[gi]:
                        xs_d[gi].append(x)
                        ys_d[gi].append(self._index[gi][a])
                xs_main.append(x)
                st.apply(a)
        acc = {
            "main": self.main.train(
                np.array(xs_main), np.array(ys_main), epochs
            )
        }
        for i, dlg in enumerate(self.delegates):
            acc[dlg.name] = dlg.train(
                np.array(xs_d[i]) if xs_d[i] else np.zeros((0, FEAT_DIM)),
                np.array(ys_d[i], dtype=np.int64),
                epochs,
            )
        return acc

    # -- teacher-forced evaluation ---------------------------------------

    def next_action_accuracy(self, docs: list[dict]) -> dict[str, float]:
        """Teacher-forced next-action accuracy (gold state replay, the
        standard transition-parser eval): fraction of steps where the
        full cascade (main + chained delegate) predicts the gold
        action."""
        main_ok = main_n = full_ok = 0
        for d in docs:
            st = _State(d["n_tokens"])
            for a in d["actions"]:
                x = st.features(d["enc"])
                mp = int(self.main.logits(x).argmax())
                want = (
                    0 if a[0] == SHIFT
                    else 1 if a[0] == MARK
                    else 2 + self.group_of(a)
                )
                main_ok += mp == want
                main_n += 1
                if mp == want:
                    if want < 2:
                        full_ok += 1
                    else:
                        gi = want - 2
                        pred = int(self.delegates[gi].logits(x).argmax())
                        # unseen gold actions can never be predicted —
                        # counted as misses (get() returns -1)
                        full_ok += pred == self._index[gi].get(a, -1)
                st.apply(a)
        return {
            "main": main_ok / max(1, main_n),
            "full": full_ok / max(1, main_n),
        }

    # -- greedy masked decode --------------------------------------------

    def _valid_mask(self, st: _State, gi: int) -> np.ndarray:
        typ, length, src, tgt = self._meta[gi]
        att = len(st.attention)
        room = st.n - st.cursor
        has_mark = len(st.marks) > 0
        span_ok = np.where(length == 0, has_mark, length <= room)
        return np.where(
            typ == 0, span_ok,                        # EVOKE
            np.where(
                typ == 1, span_ok & (tgt < att),      # REFER
                np.where(
                    typ == 2, (src < att) & (tgt < att),  # CONNECT
                    src < att,                        # ASSIGN
                ),
            ),
        ).astype(bool)

    def decode(self, enc: np.ndarray, n_tokens: int) -> list[tuple]:
        """Greedy decode of one document: at every step the main
        delegate picks SHIFT/MARK/CASCADE(k) (masked to currently-legal
        moves), a CASCADE chains into delegate k's masked argmax; the
        chosen action drives the ParserState automaton. The per-token
        action budget forces SHIFT on runaway loops (the reference
        bounds actions per token the same way)."""
        st = _State(n_tokens)
        out: list[tuple] = []
        while st.cursor < st.n:
            x = st.features(enc)
            mlg = self.main.logits(x)
            masks = [self._valid_mask(st, gi) for gi in range(len(self.groups))]
            mmask = np.ones(len(mlg), dtype=bool)
            mmask[1] = len(st.marks) < MARK_CAP  # MARK
            for gi, m in enumerate(masks):
                mmask[2 + gi] = bool(m.any())
            if st.steps_here >= MAX_ACTIONS_PER_TOKEN:
                choice = 0
            else:
                mlg = np.where(mmask, mlg, -np.inf)
                choice = int(mlg.argmax())
            if choice == 0:
                action = (SHIFT, 0, 0, 0, "", "")
            elif choice == 1:
                action = (MARK, 0, 0, 0, "", "")
            else:
                gi = choice - 2
                dlg = self.delegates[gi].logits(x)
                dlg = np.where(masks[gi], dlg, -np.inf)
                action = self.groups[gi][int(dlg.argmax())]
            out.append(action)
            st.apply(action)
        return out


# ---------------------------------------------------------------------------
# fixture-trained model + Spark decode op
# ---------------------------------------------------------------------------


def _doc_encodings(tokens) -> np.ndarray:
    from .lexical import encode_tokens

    return encode_tokens(
        np.array([t.fp for t in tokens], dtype=np.uint64),
        [t.word for t in tokens],
        [t.brk for t in tokens],
        dim=TOK_DIM,
    ).astype(np.float64)


@lru_cache(maxsize=4)
def fixture_gold(n_files: int = 40) -> tuple:
    """Gold training docs from the silver fixture: the SAME generator +
    annotations the kg_transitions contract query hash-verifies, so the
    training data is itself correctness-gated. Returns (docs, inventory)
    with docs sorted by key (deterministic)."""
    from ..oracle.kg_oracle import latest_corpus, run
    from .transitions import _doc_slots, generate_transitions

    res = run(n_files)
    toks_by = {
        (d["repo"], d["path"], d["commit"]): d["tokens"]
        for d in latest_corpus(n_files)
    }
    spans_by: dict[tuple, set] = {}
    for m in res["mentions"]:
        k = (m["repo"], m["path"], m["commit"])
        spans_by.setdefault(k, set()).add((m["begin"], m["end"], m["entity"]))
    rel_by: dict[tuple, list] = {}
    for r in res["relations"]:
        k = (r["repo"], r["path"], r["commit"])
        rel_by.setdefault(k, []).append(r)
    docs, inventory = [], set()
    for k in sorted(spans_by):
        toks = toks_by[k]
        actions = generate_transitions(
            sorted(spans_by[k]), _doc_slots(rel_by.get(k, [])), len(toks)
        )
        inventory.update(a for a in actions if a[0] not in (SHIFT, MARK))
        docs.append({
            "key": k,
            "n_tokens": len(toks),
            "enc": _doc_encodings(toks),
            "actions": actions,
        })
    return docs, sorted(inventory)


@lru_cache(maxsize=4)
def trained_model(scheme: str = "caspar", n_files: int = 40,
                  epochs: int = 300) -> CasparModel:
    """The deterministic fixture-trained cascade: same seeds, same gold
    data, same full-batch optimizer ⇒ bit-identical weights on every
    build (driver twin == executor closure)."""
    docs, inventory = fixture_gold(n_files)
    model = CasparModel(scheme, inventory)
    model.fit(docs, epochs=epochs)
    return model


def caspar_decode(documents: DataFrame, model: CasparModel) -> DataFrame:
    """documents (tokens layout) → greedy-decoded action rows, one
    mapInPandas pass. The trained weights travel in the task closure
    (a few hundred KB — broadcast-equivalent at this size); decode is
    the O(actions) masked state walk per document with one batched
    encoder call per document."""

    def run(batches):
        from .lexical import encode_tokens

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                enc = encode_tokens(
                    np.array(r.t_fp, dtype=np.uint64), list(r.t_word),
                    list(r.t_brk), dim=TOK_DIM,
                ).astype(np.float64)
                for i, a in enumerate(model.decode(enc, len(r.t_fp))):
                    rows.append(
                        {"repo": r.repo, "path": r.path, "commit": r.commit,
                         "idx": i, "action": a[0], "length": a[1],
                         "source": a[2], "target": a[3], "role": a[4],
                         "label": a[5]}
                    )
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "idx", "action",
                         "length", "source", "target", "role", "label"],
            )

    return documents.select(
        "repo", "path", "commit", "t_brk", "t_fp", "t_word"
    ).mapInPandas(run, schema=DECODE_SCHEMA)
