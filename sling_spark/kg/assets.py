"""Broadcast-side KB assets (the auxin/commons analog).

SLING annotators receive read-only assets — commons store, phrase table,
IDF dictionary — via workflow ``auxin`` inputs, memory-mapped once per
worker (python/task/workflow.py:667-689; sling/nlp/silver/silver.py
equivalent at python/nlp/silver.py:120-138). Our analog: build each
asset AS a DataFrame (so the build itself is distributed and testable),
then collect + ``sc.broadcast`` the lookup dicts consumed inside the
annotation UDFs. All assets are dimension-sized (items/aliases), orders
of magnitude below corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import kb
from .documents import idf_table
from .mentions import KbAssets
from .phrase_table import build_phrase_table, phrase_table_dict, select_aliases

ALIAS_SCHEMA = "entity string, alias string, fp long, count int, form int, sources int"
ITEMS_DDL = (
    "id string, name string, types array<string>, statements "
    "array<struct<pid string, object string, qualifiers map<string,string>>>"
)


def seed_dataframes(spark: SparkSession) -> dict[str, DataFrame]:
    """The seed KB as DataFrames (items, aliases, same_as, links,
    popularity, fragments)."""
    items = spark.createDataFrame(kb.entities(), schema=ITEMS_DDL)
    aliases = spark.createDataFrame(kb.alias_rows(), schema=ALIAS_SCHEMA)
    same_as = spark.createDataFrame(
        kb.same_as_edges(),
        schema="id_a string, id_b string, priority_a int, priority_b int, redirect boolean",
    )
    links = spark.createDataFrame(kb.links_rows(), schema="src string, dst string, count int")
    popularity = spark.createDataFrame(kb.popularity_rows(), schema="id string, count int")
    fragments = spark.createDataFrame(
        kb.source_item_fragments(), schema=ITEMS_DDL + ", source_priority int"
    )
    return {
        "items": items,
        "aliases": aliases,
        "same_as": same_as,
        "links": links,
        "popularity": popularity,
        "fragments": fragments,
    }


def phrase_table_future(
    spark: SparkSession, seed: dict[str, DataFrame], min_count: int = 2
):
    """Launch the phrase-table build (alias selection → table → collected
    dict) on a second job-submitter thread. The branch is corpus-
    INDEPENDENT (seed aliases only), so its Spark jobs interleave into
    free task slots while the corpus stages run — the reference's
    workflow scheduler runs independent task branches in parallel the
    same way (python/task/workflow.py worker pools). Spark job submission
    is thread-safe."""
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="pt-branch")

    def run():
        selected = select_aliases(seed["aliases"], min_count=min_count)
        df = build_phrase_table(selected)
        return df, phrase_table_dict(df)

    fut = pool.submit(run)
    pool.shutdown(wait=False)
    return fut


def build_assets(
    spark: SparkSession,
    documents: DataFrame,
    seed: dict[str, DataFrame] | None = None,
    min_alias_count: int = 2,
    pt_future=None,
):
    """Run the alias-selection + phrase-table + IDF builds in Spark, then
    broadcast the collected lookup structures. Returns (broadcast,
    phrase_table_df) — the DataFrame is exposed for tests/parity.

    ``seed`` feeds the alias/phrase-table build; the links/popularity/
    statements dicts come straight from the literal kb fixtures (same
    data, no DataFrame round-trip)."""
    seed = seed or seed_dataframes(spark)
    if pt_future is None:
        pt_future = phrase_table_future(spark, seed, min_alias_count)
    idf_df = idf_table(documents)
    idf = {r["fp"]: r["idf"] for r in idf_df.collect()}
    pt_df, pt = pt_future.result()

    # links/popularity/statements are literal seed fixtures — build the
    # dicts straight from the source rows instead of a DataFrame
    # round-trip (each collect is a whole Spark job; three of them cost
    # more than the entire annotation pass on a busy machine)
    links: dict[str, list[tuple[str, int]]] = {}
    for r in kb.links_rows():
        links.setdefault(r["src"], []).append((r["dst"], r["count"]))
    for v in links.values():
        v.sort()  # deterministic context-update order

    popularity = {r["id"]: r["count"] for r in kb.popularity_rows()}

    statements = kb.facts_lookup()  # P279 closure (facts.h semantics)

    assets = KbAssets(
        phrase_table=pt,
        idf=idf,
        popularity=popularity,
        links=links,
        statements=statements,
        gender=kb.gender_lookup(),  # anaphora agreement (anaphora.cc)
    )
    return spark.sparkContext.broadcast(assets), pt_df
