"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the query
set, one pass over the corpus, per-row top-k via window). Two scale paths:
LSH bucketing (random hyperplanes — corpus and queries hash to sign-pattern
buckets; only same-bucket candidates are scored, cutting the scored pairs by
~2^planes) and IVF (inverted lists under a coarse quantizer — deterministic
seed centroids with optional Lloyd refinement; queries probe their nprobe
nearest lists). All vector math is JVM-side higher-order array functions
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


def truncate_embeddings(
    df: DataFrame,
    dim_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    renormalize: bool = True,
    out_col: str = "embedding_trunc",
) -> DataFrame:
    """Matryoshka-style dimensionality truncation: keep the first
    ``dim_out`` components and (optionally) L2-renormalize — the standard
    cheap-index trick for MRL-trained embeddings (store full vectors,
    search a prefix). One projection, no shuffle, fuses into the scan; an
    all-zero prefix renormalizes to NaN (garbage-in contract, as the SQL
    definition). A vector SHORTER than ``dim_out`` raises distributively
    (ADVICE r5: F.slice silently truncates, so a misconfigured dim_out
    would emit wrong-dimensional renormalized vectors with no error)."""
    src = F.col(vec_col).cast("array<double>")
    v = F.when(F.size(src) >= F.lit(dim_out), F.slice(src, 1, dim_out)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"truncate_embeddings: vector shorter than dim_out={dim_out}: "),
                F.size(src).cast("string"),
            )
        ).cast("array<double>")
    )
    if renormalize:
        nrm = l2_norm(v)
        v = F.transform(v, lambda x: x / nrm)
    return df.withColumn(out_col, v)


# Above this many nlist x dim doubles the centroid table stops riding the
# plan as literals (plan/codegen size is O(nlist x dim) there — fine for the
# oracle-checked small quantizers, hundreds of MB of plan at production IVF
# sizes like nlist 4k-65k x 1k dims) and instead travels as DATA: a one-row
# broadcast DataFrame carrying the table as an array column, cross-joined in
# (BroadcastNestedLoopJoin of a single row — no corpus shuffle, plan stays
# O(1)). Same arithmetic either way; see _with_centroids_col.
IVF_LITERAL_MAX_ELEMS = 16_384

_CENTS_COL = "_cents"


def _cents_literal_ok(
    cents: list[tuple[int, list[float]]], literal_max_elems: int | None = None
) -> bool:
    cap = IVF_LITERAL_MAX_ELEMS if literal_max_elems is None else literal_max_elems
    return not cents or len(cents) * len(cents[0][1]) <= cap


def _with_centroids_col(df: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Attach the centroid table to every row as ``_cents`` via a one-row
    broadcast cross join — the large-nlist transport (data, not plan)."""
    spark = df.sparkSession
    rows = [([(int(cid), [float(x) for x in vec]) for cid, vec in cents],)]
    cdf = spark.createDataFrame(
        rows, f"{_CENTS_COL} array<struct<cid:int,cv:array<double>>>"
    )
    return df.crossJoin(F.broadcast(cdf))


def _cents_array(cents: list[tuple[int, list[float]]]) -> Column:
    """The centroid table as a literal array<struct<cid,cv>> expression."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
            )
            for cid, vec in cents
        ]
    )


def _centroid_scores_over(v: Column, cents_arr: Column) -> Column:
    """array<struct<cid,cos>>: cosine of ``v`` against every centroid in
    ``cents_arr`` (either the literal array or the broadcast column) —
    computed ONCE per centroid via transform (never inside a fold lambda,
    where it would re-evaluate per element)."""
    vd = v.cast("array<double>")
    return F.transform(
        cents_arr,
        lambda c: F.struct(
            c["cid"].alias("cid"), cosine(vd, c["cv"]).alias("cos")
        ),
    )


def _centroid_scores(
    v: Column, cents: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<cid,cos>>: cosine of ``v`` against every centroid.

    The centroid table is inlined as literals (driver-side metadata,
    O(nlist x dim) doubles) — the right transport for small quantizers; the
    IVF operators switch to the broadcast-column form past
    IVF_LITERAL_MAX_ELEMS."""
    return _centroid_scores_over(v, _cents_array(cents))


def _nearest_centroid_over(v: Column, cents_arr: Column) -> Column:
    init = F.struct(
        F.lit(-1).alias("cid"), F.lit(-2.0).cast("double").alias("cos")
    )
    return F.aggregate(
        _centroid_scores_over(v, cents_arr),
        init,
        lambda acc, c: F.when(c["cos"] > acc["cos"], c).otherwise(acc),
    )["cid"]


def nearest_centroid(v: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine centroid id for ``v`` — strictly-greater fold over the
    cid-ascending score array, so exact ties deterministically go to the
    LOWEST cid (the SQL twin orders ``cos DESC, cid ASC``)."""
    return _nearest_centroid_over(v, _cents_array(cents))


def _assign_frame(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    keep_cols: list[Column],
    vec_col: str,
    out_col: str,
) -> DataFrame:
    """``keep_cols`` + nearest-centroid id per row. Literal quantizer below
    IVF_LITERAL_MAX_ELEMS (one projection, zero joins — the oracle-checked
    shape); broadcast-column quantizer above it (one-row BNLJ cross join —
    plan stays O(1), still zero corpus shuffles). Identical arithmetic and
    tie-break in both forms."""
    if _cents_literal_ok(cents):
        return df.select(
            *keep_cols, nearest_centroid(F.col(vec_col), cents).alias(out_col)
        )
    return _with_centroids_col(df, cents).select(
        *keep_cols,
        _nearest_centroid_over(F.col(vec_col), F.col(_CENTS_COL)).alias(out_col),
    )


def _probes_frame(
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """(query_id, _qv, _qcid) with one row per probed centroid — probe order
    is cos DESC, cid ASC (oracle twin: row_number() OVER (ORDER BY cos DESC,
    cid)). Same literal/broadcast transport switch as :func:`_assign_frame`."""
    if _cents_literal_ok(cents):
        q, cents_arr = queries, _cents_array(cents)
    else:
        q, cents_arr = _with_centroids_col(queries, cents), F.col(_CENTS_COL)
    ordered = F.array_sort(
        _centroid_scores_over(F.col(vec_col), cents_arr),
        lambda x, y: F.when(x["cos"] > y["cos"], F.lit(-1))
        .when(x["cos"] < y["cos"], F.lit(1))
        .when(x["cid"] < y["cid"], F.lit(-1))
        .when(x["cid"] > y["cid"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.transform(F.slice(ordered, 1, nprobe), lambda c: c["cid"])
        ).alias("_qcid"),
    )


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    kmeans_iters: int = 0,
) -> list[tuple[int, list[float]]]:
    """Coarse-quantizer centroids for IVF: seeded deterministically with the
    ``nlist`` smallest-id vectors, optionally refined with Lloyd iterations.

    Determinism contract: at ``kmeans_iters=0`` the centroids are a pure
    function of the data (engine-reproducible — the gate query's oracle
    recomputes them in SQL). Lloyd refinement (``kmeans_iters>0``) improves
    cluster balance but the per-dimension means are fp-order dependent, so
    refined runs are verified by recall tests, not hash oracles.

    Scale shape: each iteration is one corpus projection (the assignment is
    a literal-table argmax, no shuffle) + one hash aggregate producing
    nlist x dim partial means (map-side combine; the shuffle carries nlist
    rows). The only driver traffic is the O(nlist x dim) centroid table."""
    seeds = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy("_id")
        .limit(nlist)
        .collect()
    )
    cents = [(i, list(r["_v"])) for i, r in enumerate(seeds)]
    for _ in range(kmeans_iters):
        assigned = _assign_frame(
            corpus,
            cents,
            [F.col(vec_col).cast("array<double>").alias("_v")],
            vec_col,
            "_cid",
        )
        rows = (
            assigned.groupBy("_cid")
            .agg(*[F.avg(F.col("_v")[d]).alias(f"d{d}") for d in range(dim)])
            .collect()
        )
        means = {r["_cid"]: [float(r[f"d{d}"]) for d in range(dim)] for r in rows}
        # empty clusters keep their previous centroid
        cents = [(cid, means.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 0,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: an inverted-file index over a coarse
    quantizer. Corpus vectors are assigned to their nearest centroid
    (one projection — the centroid table rides the closure as literals);
    each query probes its ``nprobe`` closest centroids and scores only
    vectors filed under those, cutting scored pairs to ~nprobe/nlist of
    brute force.

    100 TB plan shape: ONE corpus scan, ZERO corpus shuffles — assignment
    fuses into the scan, the probe table (queries x nprobe) is broadcast,
    and the only exchange is the per-query top-k window over the pruned
    candidate set. ``nprobe=nlist`` degrades gracefully to exact brute
    force (the gate oracle checks the nprobe<nlist path bit-for-bit via
    the deterministic quantizer)."""
    cents = centroids or train_ivf_centroids(
        corpus, dim, id_col, vec_col, nlist=nlist, kmeans_iters=kmeans_iters
    )
    assigned = _assign_frame(
        corpus, cents, [F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")],
        vec_col, "_ccid",
    )
    probes = _probes_frame(queries, cents, id_col, vec_col, nprobe)
    # each corpus vector lives in exactly one inverted list and probe cids
    # are distinct per query, so no (query, neighbor) pair repeats — no
    # dropDuplicates pass needed (unlike multi-probe LSH)
    scored = (
        assigned.join(
            F.broadcast(probes),
            (F.col("_ccid") == F.col("_qcid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            cosine(
                F.col("_qv").cast("array<double>"),
                F.col("_cv").cast("array<double>"),
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine").cast("double"), "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    kmeans_iters: int = 0,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: inverted lists land as parquet
    PARTITIONED BY the centroid id (``<path>/lists/cid=N/``), the centroid
    table as JSON metadata. At query time the probe set becomes a literal
    partition filter, so a search physically reads only nprobe/nlist of
    the index files — the on-disk analog of the inline operator's
    candidate pruning, and the shape that matters at 100 TB (an un-probed
    inverted list is never opened). Returns the centroid table."""
    import json
    import os

    cents = train_ivf_centroids(
        corpus, dim, id_col, vec_col, nlist=nlist, kmeans_iters=kmeans_iters
    )
    assigned = _assign_frame(
        corpus,
        cents,
        [F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")],
        vec_col,
        "cid",
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(path, "lists")
    )
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump({"dim": dim, "centroids": cents}, fh)
    return cents


def ivf_index_search(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Search a persisted IVF index (:func:`build_ivf_index`). The query
    set's probed centroid ids are collected driver-side (queries are the
    small side by construction) into a LITERAL ``cid IN (...)`` filter, so
    Spark prunes un-probed list partitions at the scan — `.explain` shows
    the probe set in PartitionFilters. Results are identical to
    :func:`ivf_ann_topk` over the same corpus and quantizer."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        meta = json.load(fh)
    cents = [(int(cid), vec) for cid, vec in meta["centroids"]]
    probes = _probes_frame(queries, cents, id_col, vec_col, nprobe)
    probe_cids = sorted(
        {r["_qcid"] for r in probes.select("_qcid").distinct().collect()}
    )
    lists = spark.read.parquet(os.path.join(path, "lists")).where(
        F.col("cid").isin(probe_cids)
    )
    scored = (
        lists.join(
            F.broadcast(probes),
            (F.col("cid") == F.col("_qcid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            cosine(
                F.col("_qv").cast("array<double>"),
                F.col("vec").cast("array<double>"),
            ),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "cosine"
        )
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
