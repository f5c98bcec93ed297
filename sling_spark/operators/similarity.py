"""Similarity search over embedding columns (array<float>).

- **brute-force cosine top-k**: the exact baseline. The query set is
  broadcast (it is small by construction); the corpus side streams
  through a single narrow pass — no shuffle except the final per-query
  top-k aggregation. Dot products are computed JVM-side with
  ``aggregate``/``zip_with`` (whole-stage codegen), NOT in Python.
- **LSH-bucketed (random hyperplane / SRP)**: the scale path — sign
  sketches via fixed pseudo-random hyperplanes derived from xxhash64 of
  (dim, plane) pairs, bucket join, exact re-rank within buckets.
  At 100 TB the bucket join replaces the O(N*Q) scan.
- **IVF-style coarse quantization**: k-means-lite via deterministic
  seeded centroid init + a few Lloyd iterations in DataFrames; probe the
  nearest cells only. (Provided as ``ivf_assign`` building block.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    # a zero-norm vector has no direction: score NULL (fails any
    # threshold filter, sorts last under desc) — an unguarded divide
    # would abort the whole job under Spark 4's default ANSI mode the
    # moment one degenerate embedding appears in a 100 TB corpus
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Plan: broadcast(queries) × corpus cross join → columnar cosine →
    per-query top-k via window on the (small) candidate set. Scores are
    rounded so results are engine-portable (oracle comparability)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _srp_bucket(vec_col: str, table: int, planes: int):
    """Bucket id for one SRP hash table: ``planes`` sign bits, hyperplane
    weights derived deterministically from xxhash64(dim, table, plane) —
    no stored model, identical on every executor."""
    dims = F.size(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), dims - 1),
                    # pmod, not %: Spark's % keeps the dividend's sign,
                    # so xxhash64 % 7 spans {-6..6} and the weights
                    # would span [-9, 3] — a negative-mean hyperplane
                    # set that piles sign bits onto 0 and funnels
                    # vectors into few buckets. pmod gives the intended
                    # symmetric {-3..3}.
                    lambda d: (
                        F.pmod(
                            F.xxhash64(d.cast("string"), F.lit(f"t{table}p{p}")),
                            F.lit(7),
                        ) - 3
                    ).cast("double"),
                ),
                lambda x, wgt: x * wgt,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("long")


def srp_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 8,
    tables: int = 8,
    out_col: str = "srp_buckets",
) -> DataFrame:
    """Multi-table SRP sketch: array of ``tables`` bucket ids. Multiple
    independent tables trade bucket-join fan-out for recall (standard
    OR-amplification)."""
    return df.withColumn(
        out_col, F.array(*[_srp_bucket(vec_col, t, planes) for t in range(tables)])
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    tables: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of bucket
    collisions, then exact cosine re-rank. The shuffle key is
    (table, bucket) — near neighbors collide, the rest spread. This is
    the 100 TB path replacing the O(N·Q) brute-force scan."""
    c = srp_sketch(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        "cvec", planes, tables,
    ).select(
        "neighbor_id", "cvec", F.posexplode("srp_buckets").alias("table", "bucket")
    )
    q = srp_sketch(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", planes, tables,
    ).select(
        "query_id", "qvec", F.posexplode("srp_buckets").alias("table", "bucket")
    )
    cand = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse cell).
    Centroids ride as a literal array-of-arrays column — JVM-side argmin,
    no UDF."""
    cents = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in centroids
    ])
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ),
    )
    return df.withColumn(
        out_col, F.array_position(dists, F.array_min(dists)).cast("int") - 1
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means entirely in DataFrame ops: init =
    the k lowest-id vectors, each iteration one assign (JVM argmin) +
    one partial-agg mean per (cell, dim). Centroids are dimension-sized
    (k x d floats) — only they ever reach the driver; the corpus never
    does. This is the IVF coarse-quantizer trainer (FAISS-style), the
    scale path's offline step."""
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    cents = [list(r["v"]) for r in init]
    # fewer rows than k: fit that many cells (standard small-input
    # degradation) instead of indexing past the init list
    k = len(cents)
    for _ in range(iters):
        assigned = ivf_assign(df, cents, vec_col=vec_col)
        dims = assigned.select(
            "cell", F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x")
        )
        means = (
            dims.groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("entries"))
            .collect()
        )
        new = {r["cell"]: [e["m"] for e in r["entries"]] for r in means}
        # empty cells keep their previous centroid (standard Lloyd's)
        cents = [new.get(i, cents[i]) for i in range(k)]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: corpus sharded by coarse cell (ONE shuffle
    keyed on cell — this is the inverted file), each query probes its
    ``nprobe`` nearest cells, exact cosine re-rank inside the probed
    cells only. Complements lsh_topk as the second ANN scale path:
    candidate count ~ nprobe/k_cells of the corpus instead of O(N·Q)."""
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        centroids, vec_col="cvec",
    )
    cents = F.array(*[
        F.array(*[F.lit(float(v)) for v in cc]) for cc in centroids
    ])
    qdists = F.transform(
        cents,
        lambda cc: F.aggregate(
            F.zip_with(F.col("qvec"), cc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ),
    )
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.arrays_zip(
                    qdists.alias("d"),
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("i"),
                )
            ),
            lambda s: s["i"],
        ),
        1, nprobe,
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .withColumn("probe_cells", probe_cells)
        .select("query_id", "qvec", F.explode("probe_cells").alias("probe"))
        .withColumn("cell", F.col("probe").cast("int"))
        .drop("probe")
    )
    cand = c.join(F.broadcast(q), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec").cast("array<double>"), F.col("cvec").cast("array<double>")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
