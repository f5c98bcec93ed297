"""KB query/serving layer (SURVEY.md §3.3 mapping).

The reference serves the KB three ways: direct frame access
(``store['Q2534120']``, doc/guide/pyapi.md:20-165), phrase lookup
(pyphrase.cc), and the knowledge-service REST item fetch + name search
(sling/nlp/kb/knowledge-service.cc:416-1064). The Spark equivalent is
``spark.sql`` over the materialized tables; this module registers the
views and provides the canned lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.tokenize import phrase_fingerprint


def register_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Register pipeline outputs as SQL views (kb_items, triples,
    mentions, clusters, phrase_table, ...)."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def get_item(spark: SparkSession, item_id: str) -> DataFrame:
    """store[id] analog."""
    return spark.sql("SELECT * FROM kb_items WHERE id = ?", args=[item_id])


def item_facts(spark: SparkSession, item_id: str) -> DataFrame:
    """Item statements as rows (knowledge-service item fetch shape)."""
    return spark.sql(
        """
        SELECT subj, pred, obj, qualifiers, source
        FROM triples WHERE subj = ?
        """,
        args=[item_id],
    )


def phrase_lookup(spark: SparkSession, phrase: str) -> DataFrame:
    """phrasetab.lookup(name) analog: normalize+fingerprint the phrase
    with the engine tokenizer, join the phrase table."""
    fp = phrase_fingerprint(phrase)
    return spark.sql(
        "SELECT explode(entries) AS e FROM phrase_table WHERE fp = ?", args=[fp]
    ).select(
        F.col("e.entity").alias("entity"),
        F.col("e.count").alias("count"),
        F.col("e.form").alias("form"),
    )


def name_search(spark: SparkSession, prefix: str, limit: int = 10) -> DataFrame:
    """Prefix search over the sorted name table (name-table-builder
    serving path). The prefix is matched LITERALLY — startswith, not
    LIKE — so '%' and '_' in a user query are characters, not SQL
    wildcards ('_' must not match every single-char name)."""
    return (
        spark.table("name_table")
        .filter(F.col("name").startswith(prefix.lower()))
        .select("name", F.explode("entries").alias("e"))
        .orderBy("name")
        .limit(limit)
        .select("name", F.col("e.entity").alias("entity"),
                F.col("e.count").alias("count"))
    )


def subject_triples_sql(spark: SparkSession) -> DataFrame:
    """Example analytical serving query: per-subject triple counts by
    source — pure spark.sql over the triple table."""
    return spark.sql(
        """
        SELECT subj, source, count(*) AS n_triples
        FROM triples GROUP BY subj, source ORDER BY n_triples DESC, subj
        """
    )


def render_document(
    spark: SparkSession, repo: str, path: str, format: str = "lex"
) -> DataFrame:
    """Annotated-document rendering (the knowledge-service document view,
    knowledge-service.cc document endpoints): one document's tokens +
    resolved mentions as LEX or simplified HTML markup. Requires the
    ``documents`` (raw layout) and ``mentions`` views to be registered."""
    from .functions.lex import render_lex, to_html
    from .functions.tokenize import tokenize

    docs = spark.sql(
        "SELECT repo, path, commit, content FROM documents WHERE repo = ? AND path = ?",
        args=[repo, path],
    )
    mentions = spark.sql(
        "SELECT repo, path, commit, begin, `end`, entity FROM mentions "
        "WHERE repo = ? AND path = ?",
        args=[repo, path],
    )
    if format == "lex":
        return render_lex(docs, mentions)

    joined = docs.join(
        mentions.groupBy("repo", "path", "commit").agg(
            F.collect_list(F.struct("begin", "end", "entity")).alias("spans")
        ),
        on=["repo", "path", "commit"],
        how="left",
    )

    def render_html(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                toks = tokenize(r.content)
                spans = [
                    (s["begin"], s["end"], s["entity"])
                    for s in (r.spans if r.spans is not None else ())
                ]
                rows.append(
                    {"repo": r.repo, "path": r.path, "commit": r.commit,
                     "html": to_html([t.word for t in toks],
                                     [t.brk for t in toks], spans)}
                )
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "html"])

    return joined.mapInPandas(
        render_html, schema="repo string, path string, commit string, html string"
    )


def term_search(spark: SparkSession, query: str, limit: int = 10) -> DataFrame:
    """Full-text item search over the search index (the knowledge-service
    query endpoint analog, reference sling/nlp/search/search.cc): AND
    across the query's terms — intersect each term's posting list,
    ranked by how few items share the rarest term (specificity). Expects
    a ``search_index`` view (term, n_items, postings)."""
    import re

    # tokenize with the SAME rule as the index builder (lowercase
    # alphanumeric runs, kg/aggregates.py search_index) — splitting on
    # whitespace would leave 'scikit-learn' as one un-indexed term and
    # the AND would return nothing for an indexed entity.
    # dedupe (order-preserving): `term IN (...)` matches each index row
    # once regardless of query duplicates, so the AND is over DISTINCT
    # terms — a repeated word must not raise the HAVING count (ADVICE r02)
    terms = list(dict.fromkeys(
        t for t in re.split(r"[^a-z0-9]+", query.lower()) if t
    ))
    if not terms:
        return spark.sql("SELECT NULL AS entity WHERE FALSE")
    marks = ", ".join("?" for _ in terms)
    return spark.sql(
        f"""
        WITH hits AS (
          SELECT explode(split(postings, ',')) AS entity, n_items
          FROM search_index WHERE term IN ({marks})
        )
        SELECT entity, count(*) AS matched, min(n_items) AS rarest
        FROM hits GROUP BY entity
        HAVING matched = {len(terms)}
        ORDER BY rarest ASC, entity LIMIT {int(limit)}
        """,
        args=terms,
    )
