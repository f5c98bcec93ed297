"""Property-based tests (hypothesis) for the scalar semantics, plus a
randomized distributed-vs-driver xref equivalence check (the SURVEY §5
"randomized checks vs a reference implementation" practice)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from sling_spark.functions.fingerprint import (
    FP_SKIPPED,
    phrase_fp,
    token_fp,
)
from sling_spark.functions.normalize import case_form, normalize_phrase
from sling_spark.functions.tokenize import sentences, tokenize

text_strategy = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=400,
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_roundtrip(content):
    toks = tokenize(content)
    for t in toks:
        assert content[t.begin : t.end] == t.word
        assert t.fp >= 1  # never 0 (document.h:94-100 invariant)
    # offsets strictly increase
    for a, b in zip(toks, toks[1:]):
        assert b.begin >= a.end
    # sentence bounds cover exactly [0, n)
    bounds = sentences(toks)
    if toks:
        assert bounds[0][0] == 0 and bounds[-1][1] == len(toks)
        for (s1, e1), (s2, e2) in zip(bounds, bounds[1:]):
            assert e1 == s2 and s1 < e1


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent_and_fp_stable(word):
    norm = normalize_phrase(word)
    assert normalize_phrase(norm) == norm  # idempotent
    assert token_fp(word) == token_fp(word)  # deterministic
    if norm and any(c.isalnum() for c in norm):
        assert token_fp(word) == token_fp(norm.upper())  # case-insensitive
    assert case_form(word) in (0, 1, 2, 3)


@given(st.lists(st.sampled_from(["alpha", "Beta", "x1", "Y", "deltA"]), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_phrase_fp_properties(words):
    fp = phrase_fp(words)
    assert fp >= 1
    if len(words) == 1:
        assert fp == token_fp(words[0])
    # order sensitivity: any non-palindromic reordering changes the fp
    rev = list(reversed(words))
    if [normalize_phrase(w) for w in rev] != [normalize_phrase(w) for w in words]:
        assert phrase_fp(rev) != fp
    # punctuation tokens do not contribute
    assert phrase_fp([*words, "."]) == fp
    assert phrase_fp([".", *words]) == fp


@given(st.lists(st.sampled_from(["1958", "1958-03", "1958-03-14", "1959", "x"]),
                min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_date_more_precise_properties(dates):
    from sling_spark.functions.dates import more_precise, parse_date

    a = dates[0]
    for b in dates[1:]:
        out = more_precise(a, b)
        pa, pb = parse_date(a), parse_date(b)
        if pa and pb:
            assert parse_date(out).precision >= pa.precision
        a = out


def test_oracle_merge_idempotent():
    """Re-merging merged items changes nothing (reconcile fixpoint)."""
    from sling_spark.oracle import kg_oracle

    clusters = kg_oracle.build_clusters()
    once = kg_oracle.merge_items(clusters)
    # feed merged output back through the same dedup logic by checking
    # no statement list contains a (pid, object) duplicate
    for it in once:
        seen = set()
        for s in it["statements"]:
            key = (s["pid"], s["object"])
            assert key not in seen, (it["id"], key)
            seen.add(key)


def _random_edge_set(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    namespaces = ["Q", "github", "pypi", "maven"]
    nodes = [
        f"{rng.choice(namespaces)}:{'n%d' % i}" for i in range(n_nodes)
    ]
    edges = []
    for _ in range(n_edges):
        a, b = rng.sample(nodes, 2)
        edges.append(
            {
                "id_a": a,
                "id_b": b,
                "priority_a": 0,
                "priority_b": 0,
                "redirect": False,
            }
        )
    return edges


def test_xref_distributed_equals_driver_on_random_graphs(spark):
    """Randomized equivalence: distributed CC + per-component repair ==
    global sequential union-find, on graphs with many main-id conflicts
    (every Q:-node is a main id, so refusals are frequent)."""
    from sling_spark.kg.xref import build_clusters

    schema = "id_a string, id_b string, priority_a int, priority_b int, redirect boolean"
    for seed in (7, 21, 99):
        edges = _random_edge_set(seed, n_nodes=40, n_edges=60)
        df = spark.createDataFrame(edges, schema=schema)
        drv = {
            (r["member_id"], r["canonical_id"])
            for r in build_clusters(df).collect()
        }
        dist = {
            (r["member_id"], r["canonical_id"])
            for r in build_clusters(df, driver_threshold=0).collect()
        }
        assert drv == dist, f"seed {seed}"
