"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the query
set, one pass over the corpus, per-row top-k via window). The scale path is
LSH bucketing (random hyperplanes): corpus and queries hash to sign-pattern
buckets; only same-bucket candidates are scored, cutting the scored pairs by
~2^planes. All vector math is JVM-side higher-order array functions
(zip_with/aggregate) — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datacollector_spark.functions.hashing import md5_long


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    queries is broadcast (the realistic shape: small query set vs huge
    corpus), so the scan is a single map-side pass; the only shuffle is the
    per-query top-k (window over query_id, k rows survive per partition via
    partial top-k in AQE... rank filter)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            cosine(
                F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")
            ),
        )
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine").cast("double"), "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 — seedable,
    reproducible across engines and runs (no RNG state)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane-{plane}-dim-{d}".encode()).hexdigest()[:15], 16)
        out.append((h / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, planes: int = 8) -> Column:
    """Sign-pattern bucket id (int) from ``planes`` random hyperplanes."""
    bucket = F.lit(0)
    for p in range(planes):
        w = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        s = dot(vec.cast("array<double>"), w)
        bucket = bucket + F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 6,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose hyperplane bucket
    is within ``probe_hamming`` bit flips of the query's bucket (multi-probe
    LSH). Bucket join replaces the full cross-product; recall rises with
    probes, cost with bucket width."""
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("_cb"),
    )
    # probe buckets: the query's bucket plus all single-bit flips (hamming<=1)
    probes = [0] + ([1 << p for p in range(planes)] if probe_hamming >= 1 else [])
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("_qb0"),
    ).withColumn(
        "_qb", F.explode(F.array(*[F.col("_qb0").bitwiseXOR(F.lit(m)) for m in probes]))
    )
    scored = (
        cb.join(
            F.broadcast(qb),
            (F.col("_cb") == F.col("_qb")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            cosine(
                F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine").cast("double"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share an LSH sign
    bucket (high-cosine pairs almost always do at small plane counts), then
    exact cosine verify.

    Scale shape — bucket expansion, not a self-join (the minhash template,
    operators/dedup.py): ONE shuffle of (id, vec) rows into groupBy(bucket)
    buckets, then in-bucket pair expansion with the cosine verify inline.
    A self-join would compute the ``planes`` hyperplane dot products per row
    PER SIDE and shuffle the vectors twice (or broadcast a full corpus
    copy). Vectors ride the single bucket shuffle, so the verify needs no
    joinback; per-bucket expansion cost is size^2, bounded by 2^planes
    bucketing of the corpus.

    ``max_bucket_size``: mega-bucket defense (minhash_lsh_pairs doctrine) —
    a cluster of near-identical embeddings shares its sign bucket, so the
    row_number truncation (same bucket exchange, min-id order) bounds the
    in-bucket expansion at cap^2 while the vectors ride along."""
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), dim, planes).alias("_b"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("_b").orderBy("_id")
        b = (
            b.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    grouped = (
        b.groupBy("_b")
        .agg(F.array_sort(F.collect_list(F.struct("_id", "_v"))).alias("_rows"))
        .where(F.size("_rows") >= 2)
    )
    # streamed expansion (operators/dedup._expand_sorted_id_buckets): the
    # pair structs stream out of two chained generators — per-value memory
    # stays O(bucket x dim), never the O(size^2) flattened pair array that
    # would single-task-OOM on a hot bucket
    pairs = (
        grouped.select("_rows", F.posexplode("_rows").alias("_i", "_x"))
        .select(
            "_x",
            F.explode(
                F.slice(F.col("_rows"), F.col("_i") + 2, F.size("_rows"))
            ).alias("_y"),
        )
        .select(
            F.col("_x._id").alias("id_a"),
            F.col("_y._id").alias("id_b"),
            cosine(
                F.col("_x._v").cast("array<double>"),
                F.col("_y._v").cast("array<double>"),
            ).alias("cosine"),
        )
    )
    return pairs.where(F.col("cosine") >= threshold)
