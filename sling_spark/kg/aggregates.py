"""KB-side aggregations (SURVEY.md §2.4 / §2.6 inventory).

| reference (sling/)                              | here              |
|--------------------------------------------------|-------------------|
| nlp/kb/fanin.cc:35-104 (item-fanin)              | item_fanin        |
| nlp/wiki/wikipedia-links.cc:162-220 (link merge, | merge_links,      |
|   item-popularity)                               | item_popularity   |
| nlp/document/vocabulary-builder.cc:86,230        | word_vocabulary   |
| nlp/silver/idf.cc:39-226                         | documents.idf_table |
| nlp/kb/property-usage.cc:155                     | property_usage    |
| nlp/search/search-index-builder.cc:292,493       | inverted_index    |
| nlp/wiki/wikipedia-documents.cc:513-617          | invert_membership |
|   (category-inverter/member-merger)              |                   |
| nlp/wiki/wikipedia-documents.cc:720              | best_per_group    |
|   (summary-selector)                             |                   |

All are single-shuffle hash aggregations with map-side partial combine —
the exact shape SLING's Accumulator (task/accumulator.cc:23-60) emulates
by hand and Spark provides natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_fanin(items: DataFrame, skip_properties: set[str] | None = None) -> DataFrame:
    """Incoming fact references per item: explode every statement object
    (and qualifier values) and count per target (fanin.cc:35-104)."""
    skip = list(skip_properties or [])
    st = items.select(F.explode("statements").alias("st"))
    if skip:
        st = st.filter(~F.col("st.pid").isin(skip))
    objs = st.select(F.col("st.object").alias("target"))
    quals = st.select(F.explode(F.col("st.qualifiers")).alias("k", "v")).select(
        F.col("v").alias("target")
    )
    refs = objs.unionByName(quals).filter(F.col("target").rlike("^Q"))
    return refs.groupBy("target").agg(F.count("*").cast("long").alias("fanin"))


def merge_links(links: DataFrame) -> DataFrame:
    """Merge per-source link counts: (src, dst) → Σcount
    (wikipedia-link-merger, links.cc:162-205)."""
    return links.groupBy("src", "dst").agg(F.sum("count").cast("long").alias("count"))


def item_popularity(links: DataFrame) -> DataFrame:
    """Popularity = Σ incoming link counts per target
    (item-popularity-reducer, links.cc:208-220)."""
    return links.groupBy(F.col("dst").alias("id")).agg(
        F.sum("count").cast("long").alias("popularity")
    )


def word_vocabulary(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """Word → occurrence count over the tokenized documents table
    (vocabulary-builder semantics: UTF8::Normalize'd words, skip
    punctuation — vocabulary-builder.cc:56-64; empty normalizations
    dropped). The corpus-sized count aggregation stays JVM-side; the
    engine normalization (normalize_phrase, the UTF8::Normalize "lcn"
    analog — bare lower() would diverge from fingerprint identity)
    runs once per DISTINCT raw word, then counts re-merge — Python
    cost is vocabulary-sized, not token-sized."""
    from pyspark.sql.functions import pandas_udf

    def _norm(words):
        from ..functions.normalize import normalize_phrase

        return words.map(normalize_phrase)

    # no type hints: with `from __future__ import annotations` the
    # stringified 'pd.Series' hint cannot resolve in this module's
    # globals, so pass the return type positionally (scalar UDF)
    norm = pandas_udf(_norm, "string")

    toks = documents.select(
        F.explode(F.arrays_zip("t_word", "t_fp")).alias("t")
    ).select(F.col("t.t_word").alias("word"), F.col("t.t_fp").alias("fp"))
    raw_counts = (
        toks.filter(F.col("fp") > 1)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("count"))
    )
    return (
        raw_counts.withColumn("word", norm(F.col("word")))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.sum("count").cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )


def property_usage(items: DataFrame) -> DataFrame:
    """Per property: usage count by subject type
    (property-usage.cc:155)."""
    return (
        items.select(F.explode("types").alias("type"), F.col("statements"))
        .select("type", F.explode("statements").alias("st"))
        .groupBy(F.col("st.pid").alias("pid"), "type")
        .agg(F.count("*").cast("long").alias("n_uses"))
    )


def search_index(aliases: DataFrame, items: DataFrame) -> DataFrame:
    """Item search index: term → (n_items, sorted posting list) — the
    search-index-builder shape (reference sling/nlp/search/
    search-index-builder.cc:38-292): terms are the lowercase
    alphanumeric runs of every item name/alias, plus YEAR terms from
    date-valued statements (:58-61, :135). One explode + one hash
    aggregation keyed by term; at KB scale the reference buckets terms
    (:173-175) — here the term IS the shuffle key, which is the same
    sharding. Postings render as a CSV string (cross-engine hashable)."""
    alias_terms = aliases.select(
        "entity",
        F.explode(F.split(F.lower(F.col("alias")), "[^a-z0-9]+")).alias("term"),
    )
    year_terms = (
        items.select(F.col("id").alias("entity"), F.explode("statements").alias("st"))
        .filter(F.col("st.object").rlike(r"^\d{4}(-\d{2})?(-\d{2})?$"))
        .select("entity", F.substring(F.col("st.object"), 1, 4).alias("term"))
    )
    terms = alias_terms.unionByName(year_terms).filter(F.length("term") > 0)
    # collect_set dedups (entity, term) pairs itself — no separate
    # distinct shuffle; ONE exchange keyed by term
    postings = F.array_sort(F.collect_set("entity"))
    return terms.groupBy("term").agg(
        F.size(postings).cast("long").alias("n_items"),
        F.concat_ws(",", postings).alias("postings"),
    )


def inverted_index(mentions: DataFrame) -> DataFrame:
    """Entity → sorted posting list of documents mentioning it
    (search-index-builder shape: term → postings)."""
    return (
        mentions.select(
            "entity",
            F.concat_ws("/", "repo", "path").alias("doc"),
        )
        .distinct()
        .groupBy("entity")
        .agg(F.array_sort(F.collect_set("doc")).alias("postings"))
    )


def invert_membership(df: DataFrame, member_col: str, groups_col: str) -> DataFrame:
    """Invert a membership array column: (member, [groups]) →
    (group, sorted members) (category-inverter/member-merger shape)."""
    return (
        df.select(F.col(member_col).alias("member"), F.explode(groups_col).alias("grp"))
        .groupBy("grp")
        .agg(F.array_sort(F.collect_set("member")).alias("members"))
    )


def best_per_group(df: DataFrame, group_cols: list[str], order_cols: list) -> DataFrame:
    """Pick the best row per group by a deterministic order
    (summary-selector shape: row_number() = 1)."""
    rn = "__rn"
    while rn in df.columns:  # never clobber a caller's column
        rn += "_"
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )
