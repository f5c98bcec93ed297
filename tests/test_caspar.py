"""Trained caspar/knolex transition-scoring cascade tests (reference
caspar-decoder.cc:105-123, knolex-decoder.cc:118-151,
multiclass-delegate.h:33). Closes the round-3 scope boundary: the
engine can now TRAIN and RUN a transition scorer over its gold
sequences, not just generate them."""

from __future__ import annotations

import numpy as np
import pytest

from sling_spark.kg.caspar import (
    FEAT_DIM,
    CasparModel,
    fixture_gold,
    trained_model,
)
from sling_spark.kg.transitions import ASSIGN, CONNECT, EVOKE, MARK, REFER, SHIFT, apply_transitions


@pytest.fixture(scope="module")
def gold():
    return fixture_gold(40)


def _heldout_model(gold):
    docs, _ = gold
    train = docs[:32]
    inv = sorted(
        {a for d in train for a in d["actions"] if a[0] not in (SHIFT, MARK)}
    )
    m = CasparModel("caspar", inv)
    m.fit(train)
    return m, docs[32:]


def test_heldout_next_action_accuracy(gold):
    """Teacher-forced accuracy on 8 held-out fixture docs (trained on
    the other 32). Measured 0.937 main / 0.871 full; thresholds leave
    noise margin but sit far above the SHIFT-majority baseline
    (~0.82 main)."""
    m, heldout = _heldout_model(gold)
    acc = m.next_action_accuracy(heldout)
    assert acc["main"] >= 0.88
    assert acc["full"] >= 0.78


def test_decode_wellformed_and_learned(gold):
    """Greedy decode must produce sequences the ParserState automaton
    replays without error (valid spans, in-range attention indices —
    the masking contract), terminate via the per-token budget, and
    actually RESEMBLE the gold annotation: mean span+label F1 over the
    probe docs measured 0.65; floor 0.5 (far above an untrained cascade,
    which emits SHIFT-only or noise)."""
    docs, _ = gold
    m = trained_model("caspar", 40)
    f1s = []
    for d in docs[:10]:
        decoded = m.decode(d["enc"], d["n_tokens"])
        assert sum(1 for a in decoded if a[0] == SHIFT) == d["n_tokens"]
        rep = apply_transitions(decoded)  # raises on malformed sequences
        gold_rep = apply_transitions(d["actions"])
        gs = {(b, e, gold_rep["frames"][f]) for b, e, f in gold_rep["spans"]}
        ds = {(b, e, rep["frames"][f]) for b, e, f in rep["spans"]}
        for b, e, _f in rep["spans"]:
            assert 0 <= b < e <= d["n_tokens"]
        tp = len(gs & ds)
        p = tp / max(len(ds), 1)
        r = tp / max(len(gs), 1)
        f1s.append(2 * p * r / max(p + r, 1e-9))
    assert float(np.mean(f1s)) >= 0.5


def test_training_is_deterministic(gold):
    """Two independently constructed+trained cascades must be
    bit-identical (seeded init, full-batch GD): the hash-oracle
    contract relies on driver-trained == closure-shipped weights."""
    docs, inv = gold
    a = CasparModel("caspar", inv)
    b = CasparModel("caspar", inv)
    a.fit(docs[:6], epochs=30)
    b.fit(docs[:6], epochs=30)
    x = docs[0]["enc"][0]
    feat = np.zeros(FEAT_DIM)
    feat[:len(x)] = x
    assert np.array_equal(a.main.logits(feat), b.main.logits(feat))
    assert np.array_equal(a.delegates[0].logits(feat), b.delegates[0].logits(feat))


def test_knolex_cascade_structure(gold):
    """knolex layout (knolex-decoder.cc:118-151): main classifies
    SHIFT/MARK/CASCADE(1)/CASCADE(2); EvokeDelegate holds EVOKE/REFER,
    ConnectDelegate holds CONNECT/ASSIGN; decode stays well-formed."""
    docs, inv = gold
    m = CasparModel("knolex", inv)
    assert m.main.w2.shape[1] == 4
    assert {a[0] for a in m.groups[0]} <= {EVOKE, REFER}
    assert {a[0] for a in m.groups[1]} <= {CONNECT, ASSIGN}
    assert len(m.groups[0]) + len(m.groups[1]) == len(inv)
    m.fit(docs[:6], epochs=30)
    decoded = m.decode(docs[6]["enc"], docs[6]["n_tokens"])
    apply_transitions(decoded)
    assert sum(1 for a in decoded if a[0] == SHIFT) == docs[6]["n_tokens"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["Spark", "uses", "the", "phrase", "table", "Apache",
             "2014-02-27", "release", ".", "scala", "runs", "on"]
        ),
        min_size=1, max_size=40,
    )
)
def test_decode_fuzz_always_wellformed(words):
    """Any token sequence: greedy decode terminates (per-token action
    budget), emits exactly one SHIFT per token, and replays through the
    ParserState automaton without error — the masking contract under
    inputs far outside the training distribution."""
    import numpy as np

    from sling_spark.functions.fingerprint import token_fp
    from sling_spark.kg.caspar import TOK_DIM, trained_model
    from sling_spark.kg.lexical import encode_tokens

    model = trained_model("caspar", 40)
    fps = np.array([token_fp(w) for w in words], dtype=np.uint64)
    brks = [0] * len(words)
    enc = encode_tokens(fps, words, brks, dim=TOK_DIM).astype(np.float64)
    decoded = model.decode(enc, len(words))
    assert sum(1 for a in decoded if a[0] == SHIFT) == len(words)
    rep = apply_transitions(decoded)
    for b, e, _f in rep["spans"]:
        assert 0 <= b < e <= len(words)
