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
    """TSV key→value (text-map-reader analog). Quote handling is OFF
    (a leading '\"' is data, not CSV quoting) and the two-column schema
    is explicit so a tab-less first line cannot skew inference."""
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .schema("key string, value string")
        .csv(path)
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


WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload binary, payload_sha string, "
    "source_file string, record_index int"
)


def parse_warc_records(data: bytes):
    """Yield WARC 1.0/1.1 records from raw file bytes (plain or
    per-record-gzipped multistream, the Common Crawl layout). Pure
    scalar parser — reference semantics: sling/task/warc-reader
    (record header block, Content-Length body, CRLF CRLF terminator).

    TOTAL on garbage (dirty-crawl tolerance): non-numeric Content-Length
    skips the record, the length is clamped into [0, bytes remaining],
    corrupt gzip members stop the decompression loop, and the scan
    position strictly advances every iteration — no crash, no infinite
    loop, whatever the input bytes."""
    import gzip
    import io
    import zlib

    if data[:2] == b"\x1f\x8b":  # gzip multistream: one member per record
        # member-by-member via decompressobj: a corrupt member (or
        # trailing garbage) loses only ITSELF — GzipFile.read() would
        # decompress all members in one call and discard everything on
        # the first error (per-member tolerance must hold per record)
        out = io.BytesIO()
        buf = data
        while buf[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                out.write(d.decompress(buf))
            except zlib.error:
                break  # corrupt member: keep the records already out
            if not d.eof:
                break  # truncated final member
            if len(d.unused_data) >= len(buf):
                break  # no progress — defensive
            buf = d.unused_data
        data = out.getvalue()

    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end == -1:
            break
        headers = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin1")] = v.strip().decode("latin1")
        body_start = head_end + 4
        try:
            length = int(headers.get("content-length", 0))
        except ValueError:
            pos = body_start  # unparseable length: skip the record
            continue
        length = max(0, min(length, n - body_start))  # clamp into the buffer
        payload = data[body_start : body_start + length]
        yield headers, payload
        # body_start > pos always (the find above succeeded), so the scan
        # strictly advances even when length == 0 — no infinite loop
        pos = body_start + length


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Distributed WARC ingest: binaryFile scan (one task per archive —
    the standard Spark Common-Crawl pattern; archives are the unit of
    parallelism) → pure-Python record split inside mapInPandas → one row
    per record with header fields + payload + sha lineage."""
    import hashlib

    import pandas as pd

    files = read_binary_corpus(spark, path, glob=glob)

    def split(batches):
        cols = ["warc_type", "record_id", "target_uri", "warc_date",
                "content_type", "content_length", "payload", "payload_sha",
                "source_file", "record_index"]
        for pdf in batches:
            data = {c: [] for c in cols}
            for row in pdf.itertuples(index=False):
                for i, (h, payload) in enumerate(parse_warc_records(bytes(row.content))):
                    data["warc_type"].append(h.get("warc-type"))
                    data["record_id"].append(h.get("warc-record-id"))
                    data["target_uri"].append(h.get("warc-target-uri"))
                    data["warc_date"].append(h.get("warc-date"))
                    data["content_type"].append(h.get("content-type"))
                    data["content_length"].append(len(payload))
                    data["payload"].append(payload)
                    data["payload_sha"].append(hashlib.sha256(payload).hexdigest())
                    data["source_file"].append(row.uri)
                    data["record_index"].append(i)
            yield pd.DataFrame(data, columns=cols)

    return files.select("uri", "content").mapInPandas(split, schema=WARC_SCHEMA)
