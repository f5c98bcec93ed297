"""Corpus ingest → tokenized ``documents`` table.

Reference semantics: wikipedia-document-builder turns raw article markup
into a document frame with text + tokens (sling/nlp/wiki/
wikipedia-documents.cc:46-424); tokens carry offsets, break level,
fingerprint and case form (sling/nlp/document/document.h:62-123). For our
source-code corpus, the tokenizer is ``functions.tokenize`` (line =
sentence unit).

Scale notes
-----------
- Latest-commit selection is ONE shuffle by (repo, path) — unavoidable
  (it is a group-wide argmax); expressed as max_by so Catalyst plans a
  partial aggregation (map-side combine) instead of a full window sort.
- Tokenization is an Arrow-batched mapInPandas — no per-row Python round
  trips; content is dropped after tokenizing (rows stay narrow; the
  sha256 lineage column preserves the per-row invariant from
  BASELINE.json: content sha256 equality).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

TOKEN_FIELDS = "begin int, end int, word string, brk int, fp long, form int"
DOCUMENTS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content_sha string, n_tokens int, "
    f"tokens array<struct<{TOKEN_FIELDS}>>"
)


def latest_versions(corpus: DataFrame) -> DataFrame:
    """Last-writer-wins per (repo, path): the reference orders messages by
    serial within key and keeps the newest (sling/task/sorter.cc:37-56,
    wikidata-importer.cc:100-147 revision tracking). Our serial is the
    lexicographically greatest commit hash (deterministic).

    max_by keeps this a hash aggregation with map-side partial combine —
    at 10^12 rows this is strictly cheaper than a window (no per-group
    sort, AQE can coalesce the post-shuffle partitions).
    """
    return corpus.groupBy("repo", "path").agg(
        F.max("commit").alias("commit"),
        F.max_by("lang", "commit").alias("lang"),
        F.max_by("content", "commit").alias("content"),
    )


def build_documents(corpus: DataFrame) -> DataFrame:
    """Tokenize the latest version of every file."""
    latest = latest_versions(corpus).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )

    def tok(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                toks = tokenize(row.content)
                out.append(
                    {
                        "repo": row.repo,
                        "path": row.path,
                        "commit": row.commit,
                        "lang": row.lang,
                        "content_sha": row.content_sha,
                        "n_tokens": len(toks),
                        "tokens": [
                            {
                                "begin": t.begin,
                                "end": t.end,
                                "word": t.word,
                                "brk": t.brk,
                                "fp": t.fp,
                                "form": t.form,
                            }
                            for t in toks
                        ],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "repo", "path", "commit", "lang",
                    "content_sha", "n_tokens", "tokens",
                ],
            )

    return latest.mapInPandas(tok, schema=DOCUMENTS_SCHEMA)


def idf_table(documents: DataFrame, n_docs: int | None = None) -> DataFrame:
    """Document-frequency → IDF per token fingerprint.

    Reference semantics: vocabulary-mapper + idf-table-builder
    (sling/nlp/silver/idf.cc:39-226): df = #docs containing the
    (normalized) word, idf = ln(N / df). Consumed by the common-word
    pruner during mention detection (mentions.h:126).

    Plan shape: explode → distinct(doc, fp) via a grouped count — two
    shuffles (dedup + count), both with partial aggregation. At 100 TB
    one would pre-aggregate per partition with approx sets; exact here.
    """
    if n_docs is None:
        n_docs = documents.count()
    tok = documents.select(
        F.col("content_sha").alias("doc"),
        F.explode("tokens").alias("t"),
    ).select("doc", F.col("t.fp").alias("fp"), F.col("t.word").alias("word"))
    # skipped/punctuation tokens (fp==1) carry no IDF
    tok = tok.filter(F.col("fp") > F.lit(1))
    df_counts = (
        tok.select("doc", "fp").distinct().groupBy("fp").agg(F.count("*").alias("df"))
    )
    return df_counts.select(
        "fp",
        "df",
        F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"),
    )
