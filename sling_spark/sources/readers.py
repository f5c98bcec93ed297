"""Generic sources/sinks (SURVEY.md §2.2 mapping).

Every SLING reader/writer task maps onto a Spark DataFrameReader/Writer;
these helpers pin the engine conventions (schemas, sharding, lineage
columns) rather than wrap Spark for its own sake.

| reference processor (sling/)          | here                       |
|----------------------------------------|----------------------------|
| task/record-file-reader.cc / writer    | read_records/write_records |
| task/text-file-reader.cc / writer      | read_text                  |
| task/text-map-reader.cc (TSV k→v)      | read_text_map              |
| wikidata-importer.cc (JSON lines)      | read_jsonl                 |
| web/warc-reader.cc                     | read_binary_corpus         |
| task/frame-store-writer.cc             | write_records(kb_items)    |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_records(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Record-file analog: columnar Parquet scan with explicit column
    pruning (never read all columns for a narrow projection)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def write_records(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    shard_key: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Record-file writer analog. ``shards``+``shard_key`` reproduces the
    sharder contract (route by hash(key) % N, task/sharder.cc:25-46) via
    repartition(N, key) — same placement invariant, shuffle-based."""
    if shards and shard_key:
        df = df.repartition(shards, F.col(shard_key))
    elif shards:
        df = df.repartition(shards)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_text_map(spark: SparkSession, path: str) -> DataFrame:
    """TSV key→value (text-map-reader analog)."""
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .toDF("key", "value")
    )


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_corpus(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """WARC-ish binary ingest: one row per file with content + lineage
    sha (split/parse steps then run as mapInPandas over the binary
    column)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("uri"),
            F.col("modificationTime").cast("long").alias("mtime"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
        )
    )
    return df.withColumn("content_sha", F.sha2(F.col("content"), 256))


def corpus_from_table(df: DataFrame) -> DataFrame:
    """Validate/coerce an arbitrary table into the canonical corpus shape
    (repo, path, commit, lang, content) + content_sha lineage column —
    the ingest contract from BASELINE.json's input_hint."""
    required = ["repo", "path", "commit", "lang", "content"]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table missing columns: {missing}")
    return df.select(*required).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
