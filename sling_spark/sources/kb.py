"""Seed knowledge base — the analog of SLING's commons/auxin inputs.

Shapes follow FIXTURES.md §2 (items / aliases / same_as / links /
popularity), which themselves mirror the reference KB data model:
item frames (doc/guide/wikiflow.md:130-209), alias records with
count/form/sources (sling/nlp/wiki/wiki.h:48-64), xref edges
(sling/nlp/kb/xref.h:79-152) and resolver context inputs
(sling/nlp/kb/resolver.cc:31-55, :140-151).

The domain is software projects (our corpus is source code). Everything
is a deterministic literal — no randomness, no external data. Ambiguity
is deliberate: "spark" names both Q1 (Apache Spark) and Q33 (SPARK/Ada),
"arrow" both Q5 and Q63, so the resolver's context scoring is actually
exercised.
"""

from __future__ import annotations

from ..functions.tokenize import phrase_fingerprint, phrase_form

# --- properties -----------------------------------------------------------

PROPERTIES: dict[str, str] = {
    "P1": "depends on",
    "P2": "written in",
    "P3": "developed by",
    "P4": "license",
    "P5": "uses format",
    "P6": "release date",  # literal-valued (date precision merge cases)
    "P7": "created",  # person → project (exercises gendered anaphora)
    "P21": "gender",  # person → Q91/Q92 (anaphora.cc gender agreement)
    "P40": "child",  # person → person (gendered inversion, reconciler.cc)
    "P279": "subclass of",
    # inverse properties emitted by the reconciler (reconciler.cc:97-273)
    "P101": "required by",  # inverse of P1
    "P103": "develops",  # inverse of P3 (qualifier-carrying)
    "P108": "created by",  # inverse of P7
    "P8810": "parent",  # gendered sentinel → specializes to P22/P25
    "P22": "father",
    "P25": "mother",
}

# Property inversions (the reconciler config analog — reference reads a
# frame config with an `inversions` map, reconciler.cc:49-68): for each
# statement (subj, pid, item-object) with pid in this map, an INVERSE
# statement keyed by the object is emitted: (object, inverse, subj).
# "qualifiers" maps original qualifier pids onto inverted ones (only
# those survive the inversion); an inverse of P8810 (parent) is the
# gendered special case — it specializes to P22 father / P25 mother by
# the SUBJECT item's own P21 gender, skips qualified statements, and
# skips subjects of unknown gender (reconciler.cc:163-177).
INVERSIONS: dict[str, dict] = {
    "P1": {"inverse": "P101"},
    "P3": {"inverse": "P103", "qualifiers": {"since": "since"}},
    "P7": {"inverse": "P108"},
    "P40": {"inverse": "P8810"},
}
GENDERED_PARENT = "P8810"  # inverse sentinel (n_parent_, reconciler.cc:255)
FATHER, MOTHER = "P22", "P25"
MALE, FEMALE = "Q91", "Q92"

# Unit alias table for the measure annotator (MeasureAnnotator,
# sling/nlp/silver/mentions.h:318-345). The reference resolves units via
# phrase-table lookup + P31 unit-type check on wikidata items; our code
# corpus carries no wikidata unit items, so the unit inventory is this
# explicit dimension table (numbers.quantity's documented convention).
# Unit ids live in a "/u/" namespace so they can never collide with
# entity Q-ids.
UNITS: dict[str, str] = {
    "kb": "/u/kilobyte",
    "mb": "/u/megabyte",
    "gb": "/u/gigabyte",
    "ms": "/u/millisecond",
    "sec": "/u/second",
    "px": "/u/pixel",
}

# relation-extraction property priority (analog of relations.cc:38-55
# P27>P17>P19>P20>P119) and blocked list (relations.cc:56-66 — the
# reference blocks sex-or-gender from relation mining; so do we).
PROPERTY_PRIORITY: list[str] = ["P1", "P2", "P5", "P3", "P4", "P7"]
BLOCKED_PROPERTIES: set[str] = {"P279", "P21", "P40"}

# alias source bitmask (subset of the 16 AliasSource values, wiki.h:48-64)
SRC_NAME = 1  # canonical item name
SRC_ALIAS = 2  # curated alias
SRC_ANCHOR = 4  # corpus-derived anchor (import/usage)

# xref namespace priority: lower = more canonical; "Q" is the single
# "main" namespace (xref.h:109-119 canonical ordering).
NAMESPACE_PRIORITY: dict[str, int] = {
    "Q": 0,
    "github": 1,
    "pypi": 2,
    "maven": 3,
    "crates": 4,
    "npm": 5,
}
CASELESS_NAMESPACES: set[str] = {"github", "pypi", "maven", "npm"}  # lowercased on ingest

#: matches entity REFERENCES (QIDs / namespaced ids) as opposed to
#: literal statement values (dates, numbers) — the reference's
#: target.IsRef() test (reconciler.cc:159-161)
ITEM_REF_RE = "^(Q[0-9]+$|(" + "|".join(
    ns for ns in sorted(NAMESPACE_PRIORITY) if ns != "Q"
) + "):)"

# --- entity catalog --------------------------------------------------------
# (id, name, types, aliases[(text, count)], statements[(pid, obj)],
#  alt_ids[(namespace, key)])
# alias counts are the prior weights the resolver multiplies by
# (resolver.cc:100-131: score = context * count).

_E = [
    ("Q1", "Apache Spark", ["framework"],
     [("Apache Spark", 120), ("Spark", 300), ("PySpark", 90)],
     [("P1", "Q2"), ("P2", "Q15"), ("P3", "Q50"), ("P4", "Q60"), ("P5", "Q20"),
      ("P6", "2014-02-27")],
     [("github", "apache/spark"), ("pypi", "pyspark"), ("maven", "org.apache.spark")]),
    ("Q2", "Apache Hadoop", ["framework"],
     [("Apache Hadoop", 80), ("Hadoop", 200)],
     [("P2", "Q11"), ("P3", "Q50"), ("P4", "Q60"), ("P6", "2006-04")],
     [("github", "apache/hadoop"), ("maven", "org.apache.hadoop")]),
    ("Q3", "NumPy", ["library"],
     [("NumPy", 250), ("numpy", 400)],
     [("P2", "Q16"), ("P4", "Q62"), ("P1", "Q10"), ("P6", "2006")],
     [("github", "numpy/numpy"), ("pypi", "numpy")]),
    ("Q4", "pandas", ["library"],
     [("pandas", 350)],
     [("P1", "Q3"), ("P2", "Q10"), ("P4", "Q62")],
     [("github", "pandas-dev/pandas"), ("pypi", "pandas")]),
    ("Q5", "Apache Arrow", ["library"],
     [("Apache Arrow", 70), ("Arrow", 150), ("pyarrow", 60)],
     [("P2", "Q16"), ("P3", "Q50"), ("P4", "Q60"), ("P5", "Q20")],
     [("github", "apache/arrow"), ("pypi", "pyarrow")]),
    ("Q6", "TensorFlow", ["library"],
     [("TensorFlow", 220), ("tensorflow", 180), ("TF", 40)],
     [("P2", "Q16"), ("P3", "Q51"), ("P4", "Q60"), ("P1", "Q3"), ("P279", "Q71")],
     [("github", "tensorflow/tensorflow"), ("pypi", "tensorflow")]),
    ("Q7", "PyTorch", ["library"],
     [("PyTorch", 240), ("torch", 160)],
     [("P2", "Q16"), ("P3", "Q52"), ("P4", "Q62"), ("P1", "Q3"), ("P279", "Q71"),
      ("P6", "2016-09")],
     [("github", "pytorch/pytorch"), ("pypi", "torch")]),
    ("Q8", "Apache Kafka", ["system"],
     [("Apache Kafka", 60), ("Kafka", 170)],
     [("P2", "Q15"), ("P3", "Q50"), ("P4", "Q60")],
     [("github", "apache/kafka"), ("maven", "org.apache.kafka")]),
    ("Q9", "Apache Flink", ["framework"],
     [("Apache Flink", 40), ("Flink", 110)],
     [("P2", "Q11"), ("P3", "Q50"), ("P4", "Q60")],
     [("github", "apache/flink"), ("maven", "org.apache.flink")]),
    ("Q10", "Python", ["language"],
     [("Python", 500), ("python", 450), ("CPython", 30)],
     [("P2", "Q16"), ("P4", "Q64"), ("P6", "1991-02-20")],
     [("github", "python/cpython")]),
    ("Q11", "Java", ["language"],
     [("Java", 400)],
     [("P4", "Q62")],
     []),
    ("Q12", "Go", ["language"],
     [("Go", 260), ("Golang", 120)],
     [("P3", "Q51"), ("P4", "Q62")],
     [("github", "golang/go")]),
    ("Q13", "JavaScript", ["language"],
     [("JavaScript", 320), ("JS", 90)],
     [],
     []),
    ("Q14", "Rust", ["language"],
     [("Rust", 280)],
     [("P4", "Q61"), ("P3", "Q54")],
     [("github", "rust-lang/rust")]),
    ("Q15", "Scala", ["language"],
     [("Scala", 180)],
     [("P1", "Q11")],
     [("github", "scala/scala")]),
    ("Q16", "C++", ["language"],
     [("C++", 300), ("cpp", 70)],
     [],
     []),
    ("Q17", "Ada", ["language"],
     [("Ada", 50)],
     [],
     []),
    ("Q20", "Apache Parquet", ["format"],
     [("Apache Parquet", 30), ("Parquet", 140)],
     [("P3", "Q50"), ("P4", "Q60")],
     [("github", "apache/parquet-format")]),
    ("Q21", "Apache Avro", ["format"],
     [("Avro", 60)],
     [("P3", "Q50"), ("P4", "Q60")],
     []),
    ("Q23", "JSON", ["format"],
     [("JSON", 310)],
     [],
     []),
    ("Q24", "Protocol Buffers", ["format"],
     [("Protocol Buffers", 40), ("protobuf", 130)],
     [("P3", "Q51"), ("P4", "Q62")],
     [("github", "protocolbuffers/protobuf")]),
    ("Q30", "Apache Airflow", ["system"],
     [("Apache Airflow", 30), ("Airflow", 100)],
     [("P2", "Q10"), ("P3", "Q50"), ("P4", "Q60")],
     [("github", "apache/airflow"), ("pypi", "apache-airflow")]),
    ("Q31", "Dask", ["library"],
     [("Dask", 80)],
     [("P2", "Q10"), ("P1", "Q4"), ("P4", "Q62")],
     [("github", "dask/dask"), ("pypi", "dask")]),
    ("Q32", "Ray", ["framework"],
     [("Ray", 90)],
     [("P2", "Q10"), ("P4", "Q60"), ("P1", "Q5")],
     [("github", "ray-project/ray"), ("pypi", "ray")]),
    ("Q33", "SPARK", ["language"],
     [("SPARK", 25), ("Spark", 15)],  # ambiguous with Q1
     [("P1", "Q17")],
     [("github", "adacore/spark2014")]),
    ("Q34", "React", ["library"],
     [("React", 210)],
     [("P2", "Q13"), ("P3", "Q52"), ("P4", "Q61")],
     [("github", "facebook/react"), ("npm", "react")]),
    ("Q35", "Node.js", ["runtime"],
     [("Node.js", 150), ("nodejs", 80), ("node", 120)],
     [("P2", "Q16"), ("P1", "Q13"), ("P4", "Q61")],
     [("github", "nodejs/node")]),
    ("Q36", "Kubernetes", ["system"],
     [("Kubernetes", 190), ("k8s", 110)],
     [("P2", "Q12"), ("P3", "Q51"), ("P4", "Q60")],
     [("github", "kubernetes/kubernetes")]),
    ("Q37", "Docker", ["system"],
     [("Docker", 230)],
     [("P2", "Q12"), ("P4", "Q60")],
     [("github", "moby/moby")]),
    ("Q38", "Redis", ["system"],
     [("Redis", 160)],
     [("P2", "Q16")],
     [("github", "redis/redis"), ("pypi", "redis"), ("crates", "redis")]),
    ("Q39", "PostgreSQL", ["system"],
     [("PostgreSQL", 120), ("Postgres", 140), ("psql", 20)],
     [("P2", "Q16")],
     [("github", "postgres/postgres")]),
    ("Q40", "DuckDB", ["system"],
     [("DuckDB", 70)],
     [("P2", "Q16"), ("P4", "Q61"), ("P5", "Q20")],
     [("github", "duckdb/duckdb"), ("pypi", "duckdb")]),
    ("Q50", "Apache Software Foundation", ["organization"],
     [("Apache Software Foundation", 50), ("Apache", 180), ("ASF", 40)],
     [],
     [("github", "apache")]),
    ("Q51", "Google", ["organization"],
     [("Google", 260)],
     [],
     [("github", "google")]),
    # multiword-alias org with NO short alias: its abbreviation is only
    # reachable through the AbbreviationAnnotator (mentions.cc:1115-1200)
    ("Q54", "Free Software Infrastructure Group", ["organization"],
     [("Free Software Infrastructure Group", 25)],
     [],
     []),
    ("Q52", "Meta", ["organization"],
     [("Meta", 90), ("Facebook", 110)],
     [],
     [("github", "facebook")]),
    ("Q53", "Databricks", ["organization"],
     [("Databricks", 60)],
     [],
     [("github", "databricks")]),
    ("Q60", "Apache License 2.0", ["license"],
     [("Apache License 2.0", 40), ("Apache 2.0", 80), ("Apache License", 30)],
     [],
     []),
    ("Q61", "MIT License", ["license"],
     [("MIT License", 50), ("MIT", 100)],
     [],
     []),
    ("Q62", "BSD License", ["license"],
     [("BSD License", 30), ("BSD", 70)],
     [],
     []),
    ("Q63", "Arrow Functions", ["concept"],
     [("arrow functions", 35), ("arrow", 45)],  # ambiguous with Q5
     [("P1", "Q13")],
     []),
    ("Q64", "Python Software Foundation License", ["license"],
     [("PSF License", 15)],
     [],
     []),
    # --- persons (gendered anaphora, anaphora.cc gender agreement) ----
    ("Q80", "Ada Lovelace", ["person"],
     [("Ada Lovelace", 45), ("Lovelace", 20)],
     [("P21", "Q92"), ("P7", "Q10"), ("P7", "Q3")],
     []),
    ("Q81", "Dennis Ritchie", ["person"],
     [("Dennis Ritchie", 40), ("Ritchie", 25)],
     [("P21", "Q91"), ("P7", "Q11"), ("P7", "Q12")],
     []),
    ("Q82", "Grace Hopper", ["person"],
     [("Grace Hopper", 35), ("Hopper", 15)],
     [("P21", "Q92"), ("P7", "Q15")],
     []),
    # fictional, alias-less persons (never mentionable — corpus output is
    # unaffected) exercising the gendered P40→P22/P25 inversion:
    ("Q83", "Alex Devlin", ["person"],
     [],
     [("P21", "Q91"), ("P40", "Q84")],  # male, child Q84 → Q84 gets P22=Q83
     []),
    ("Q84", "Robin Devlin", ["person"],
     [],
     [("P40", "Q83")],  # NO gender → this P40 inversion is skipped
     []),
    ("Q91", "male", ["gender"], [], [], []),
    ("Q92", "female", ["gender"], [], [], []),
    # --- class items (P279 taxonomy; exercise the Facts closure,
    # sling/nlp/kb/facts.h:30-90 "closure over P31/P279") -------------
    ("Q71", "machine learning framework", ["class"],
     [("machine learning framework", 20), ("ML framework", 25)],
     [("P5", "Q24"), ("P279", "Q72")],  # ML frameworks serialize with protobuf
     []),
    ("Q72", "software system", ["class"],
     [("software system", 10)],
     [("P1", "Q23")],  # software systems consume JSON
     []),
]


def entities() -> list[dict]:
    """Item rows: FIXTURES.md §2 `items` schema."""
    return [
        {
            "id": qid,
            "name": name,
            "types": types,
            "statements": [
                {"pid": pid, "object": obj, "qualifiers": {}} for pid, obj in stmts
            ],
        }
        for qid, name, types, _aliases, stmts, _alt in _E
    ]


def alias_rows() -> list[dict]:
    """Alias rows: FIXTURES.md §2 `aliases` schema (entity, alias, fp,
    count, form, sources). The canonical name is also an alias (SRC_NAME)."""
    rows: list[dict] = []
    for qid, name, _types, aliases, _stmts, _alt in _E:
        for text, count in aliases:
            # case variants of the same normalized phrase stay separate
            # rows (forms differ); the alias-reducer merges counts
            # downstream, so no dedup happens here
            sources = SRC_NAME if text == name else SRC_ALIAS
            rows.append(
                {
                    "entity": qid,
                    "alias": text,
                    "fp": phrase_fingerprint(text),
                    "count": count,
                    "form": phrase_form(text),
                    "sources": sources,
                }
            )
    return rows


def same_as_edges() -> list[dict]:
    """XRef input edges (FIXTURES.md §2 `same_as`) with adversarial cases:
    chains, a ring, case-variant duplicates, and a two-main-id conflict
    (must NOT merge — xref.cc:259-283 refusal semantics)."""
    edges: list[dict] = []

    def edge(a: str, b: str, redirect: bool = False) -> None:
        na, nb = a.split(":", 1)[0], b.split(":", 1)[0]
        edges.append(
            {
                "id_a": a,
                "id_b": b,
                "priority_a": NAMESPACE_PRIORITY[na],
                "priority_b": NAMESPACE_PRIORITY[nb],
                "redirect": redirect,
            }
        )

    for qid, _name, _types, _aliases, _stmts, alt_ids in _E:
        prev = f"Q:{qid}"
        for ns, key in alt_ids:
            # chain topology: Q -> first alt -> second alt ... (exercises
            # transitive closure, not just star joins)
            cur = f"{ns}:{key}"
            edge(prev, cur)
            prev = cur

    # ring: redis alt ids close a cycle back to the github id
    edge("crates:redis", "github:redis/redis")
    # case-variant duplicate of a caseless-namespace id
    edge("Q:Q1", "github:Apache/Spark")
    # two-main conflict: a bad upstream link claims pypi:torch is both
    # PyTorch and TensorFlow. The union that would merge Q6 and Q7 must be
    # refused (both clusters already contain a main id).
    edge("Q:Q6", "pypi:torch")
    # redirect edge example
    edge("github:facebook/react", "npm:react", redirect=True)
    return edges


def links_rows() -> list[dict]:
    """Outbound link graph (resolver context input, resolver.cc:31-55).
    Derived from KB statements: subject links to every ITEM-valued
    statement object, weight = 8; plus org->project links weight 4.
    Literal objects (dates, numbers) are excluded: the resolver's
    context keys are entity ids — literal mentions bypass context
    scoring entirely (mentions.py literal branch), so literal keys
    would only bloat the broadcast dict and the per-document context
    updates without ever matching a candidate."""
    import re

    rows: list[dict] = []
    for qid, _name, _types, _aliases, stmts, _alt in _E:
        for pid, obj in stmts:
            if not re.match(ITEM_REF_RE, obj):
                continue
            rows.append({"src": qid, "dst": obj, "count": 8})
            if pid == "P3":
                rows.append({"src": obj, "dst": qid, "count": 4})
    return rows


def popularity_rows() -> list[dict]:
    """Per-item popularity = sum of alias counts (the alias/anchor-count
    semantics of /w/item/popularity, wikiflow.md:308-313)."""
    return [
        {"id": qid, "count": sum(c for _t, c in aliases)}
        for qid, _name, _types, aliases, _stmts, _alt in _E
    ]


def source_item_fragments() -> list[dict]:
    """Per-source item fragments keyed by ALT ids — the reconciler/merger
    input (sling/nlp/kb/reconciler.cc:97-480). Fragments deliberately
    exercise every merge case (FIXTURES.md §4 merge_cases):

    - duplicate statements (same pid/object after canonicalization),
    - object ids expressed as alt ids (need object rewriting),
    - qualified statement subsuming an unqualified duplicate,
    - deprecated-rank statements (dropped),
    - date objects at different precisions (most precise wins),
    - name conflicts resolved by source priority (lower wins).

    ``source_priority``: 0 = seed KB, 1 = registry A, 2 = registry B.
    """

    def st(pid, obj, **quals):
        return {"pid": pid, "object": obj, "qualifiers": dict(quals)}

    return [
        {  # Q1 via its github id: dup statement + alt-id object + qualifier
            "id": "github:apache/spark",
            "name": "apache/spark",
            "types": ["repository"],
            "statements": [
                st("P2", "github:scala/scala"),   # dup of (P2, Q15) after rewrite
                st("P4", "Q60"),                   # exact dup
                st("P1", "Q2", since="2014"),      # qualified → subsumes seed (P1, Q2)
                st("P6", "2014-02"),               # date, month precision
            ],
            "source_priority": 1,
        },
        {  # Q1 via pypi: more precise date + unqualified dup of qualified
            "id": "pypi:pyspark",
            "name": "pyspark",
            "types": ["package"],
            "statements": [
                st("P6", "2014-02-27"),            # wins over 2014-02
                st("P1", "Q2"),                    # subsumed by the qualified copy
            ],
            "source_priority": 2,
        },
        {  # Q3: deprecated-rank statement must be dropped
            "id": "pypi:numpy",
            "name": "numpy",
            "types": ["package"],
            "statements": [
                st("P4", "Q61", rank="deprecated"),
                st("P6", "2006"),
            ],
            "source_priority": 2,
        },
        {  # Q38 via the ring: plain extra statement
            "id": "crates:redis",
            "name": "redis-rs",
            "types": ["package"],
            "statements": [st("P2", "Q14")],
            "source_priority": 1,
        },
        {  # pypi:torch — xref refusal keeps it with exactly one of Q6/Q7;
            # its statements must land on that cluster only
            "id": "pypi:torch",
            "name": "torch",
            "types": ["package"],
            "statements": [st("P6", "2016-09")],
            "source_priority": 2,
        },
        {  # case-variant id of a caseless namespace (normalizes into Q1)
            "id": "github:Apache/Spark",
            "name": "Apache/Spark",
            "types": ["repository"],
            "statements": [st("P5", "Q20")],       # dup of seed (P5, Q20)
            "source_priority": 2,
        },
        {  # inversion cases (reconciler.cc:163-199): the qualified P3
            # inverts to P103 CARRYING the mapped `since` qualifier (and
            # subsumes the seed's bare P3 Q50); the qualified P40 parent
            # inversion is SKIPPED (gendered inversions only invert
            # unqualified statements); the P6 date is a literal — never
            # inverted.
            "id": "maven:org.apache.spark",
            "name": "spark-core",
            "types": ["artifact"],
            "statements": [
                st("P3", "Q50", since="2014"),
                st("P6", "2014"),
            ],
            "source_priority": 2,
        },
        {
            "id": "Q83",
            "name": None,
            "types": [],
            "statements": [st("P40", "Q84", order="adopted")],  # qualified → no inversion
            "source_priority": 1,
        },
    ]


def statements_lookup() -> dict[str, list[tuple[str, str]]]:
    """subject -> [(pid, object)], direct statements only."""
    return {qid: list(stmts) for qid, _n, _t, _a, stmts, _alt in _E}


FACTS_CLOSURE_DEPTH = 2  # P279 hops the Facts extractor follows


def gender_lookup() -> dict[str, int]:
    """entity → grammatical gender for anaphora agreement
    (anaphora.cc:178-190: n_gender_ male→MASCULINE, female→FEMININE;
    everything else UNKNOWN). Encoding matches mentions.G_*:
    0 unknown, 1 masculine, 2 feminine."""
    out: dict[str, int] = {}
    for qid, _name, _types, _aliases, stmts, _alt in _E:
        for pid, obj in stmts:
            if pid == "P21":
                out[qid] = 1 if obj == "Q91" else 2 if obj == "Q92" else 0
    return out


def facts_lookup() -> dict[str, set[tuple[str, str]]]:
    """subject -> fact SET for relation extraction: direct statements
    plus statements inherited through up to FACTS_CLOSURE_DEPTH hops of
    P279 (the Facts::Extract closure, sling/nlp/kb/facts.h:30-90 /
    facts.cc). Blocked properties never appear as facts: P279 is only
    the traversal edge, and P21 (gender) is blocked from relation
    mining like the reference's sex-or-gender (relations.cc:56-66) —
    gender reaches the annotator via gender_lookup() instead."""
    direct = statements_lookup()
    out: dict[str, set[tuple[str, str]]] = {}
    for qid in direct:
        facts: set[tuple[str, str]] = set()
        frontier = [qid]
        seen = {qid}
        for _depth in range(FACTS_CLOSURE_DEPTH + 1):
            nxt = []
            for node in frontier:
                for pid, obj in direct.get(node, ()):
                    if pid == "P279":
                        if obj not in seen:
                            seen.add(obj)
                            nxt.append(obj)
                    elif pid not in BLOCKED_PROPERTIES:
                        facts.add((pid, obj))
            frontier = nxt
            if not frontier:
                break
        out[qid] = facts
    return out
