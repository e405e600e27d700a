"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's Record Deduplicator (exact hash dedupe,
basic-lib/.../dedup/DeDupProcessor.java), these are the near-duplicate
families a 100 TB document corpus needs. All are shuffle-shaped for scale:

  * exact        — one hash-aggregate; shuffle volume = distinct keys
  * minhash LSH  — shingle -> K minhashes -> B bands; candidate pairs come
    from a self-join on (band, band_hash) buckets, so the quadratic blowup
    is confined to tiny buckets instead of the whole corpus
  * simhash      — 64-bit sign fingerprint; near-dups share a fingerprint
    chunk (pigeonhole over hamming distance), again bucket-joined
  * n-gram Jaccard — exact verify: explode shingles, join on shingle,
    |A∩B| / |A∪B| per pair
  * embedding cosine — see operators/similarity.py

Everything is built from JVM expressions (no Python in the hot path); the
shingle/minhash math uses higher-order array functions, not UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacollector_spark.functions.hashing import (
    affine_params,
    md5_base28,
    md5_long,
    word_shingles,
)

MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne); a*base < 2^59 stays in int64


def exact_dedup(df: DataFrame, columns: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact content group; add
    ``dup_count``. The scalable form of DeDupProcessor: hash-aggregate,
    map-side combined, shuffle = distinct groups."""
    return (
        df.groupBy(*columns)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, *columns, "dup_count")
    )


def minhash_signature(text: Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """K minhash values over word shingles as array<bigint>.

    Universal-hash family: each shingle is hashed ONCE to a 28-bit base
    (md5-derived, cross-engine reproducible), then the K permutations are
    pure arithmetic h_i(s) = (a_i*base + b_i) mod p — so the per-shingle
    cost is one md5 + K multiply-adds, not K cryptographic hashes.
    P[min_i(A)=min_i(B)] = J(A,B) as usual.

    Implemented as ONE aggregate() fold over the shingle array with K
    accumulators (zip_with least), not K separate array_min(transform)
    expressions: Catalyst's projection collapse would inline the (costly)
    shingling expression into every one of the K copies — measured ~10x
    slower. The fold touches each shingle once.
    """
    sh = word_shingles(text, shingle_n)
    return _minhash_fold(sh, num_hashes)


def _minhash_fold(shingles: Column, num_hashes: int) -> Column:
    """aggregate() fold computing K affine minhashes over a shingle array.

    The md5 base hash is hoisted into its own transform() pass: a lambda
    body is re-evaluated per zip_with element, so computing the base inside
    the K-wide zip would md5 every shingle K times (measured 32x cost)."""
    ab = affine_params(num_hashes, MINHASH_PRIME)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in ab])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in ab])
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    bases = F.transform(shingles, lambda s: md5_base28(s))

    def step(acc: Column, h: Column) -> Column:
        hashes = F.zip_with(
            a_arr, b_arr, lambda a, b: F.pmod(a * h + b, F.lit(MINHASH_PRIME))
        )
        return F.zip_with(acc, hashes, lambda x, y: F.least(x, y))

    return F.aggregate(bases, init, step)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.6,
    spread: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) via banded minhash LSH, verified
    with exact shingle Jaccard.

    Scale shape: the band self-join carries ONLY (id, band, band_hash) — 24
    bytes/row — never document content; shingle arrays are joined back to
    the few surviving candidate pairs for the exact verify. Shuffle key
    cardinality ~ corpus size x bands, and no pair outside a shared bucket
    is ever materialized — the properties that make this run at 10^8+ docs.
    Every hash is md5-derived arithmetic, so a SQL oracle (DuckDB) can
    reproduce the exact pair set (see __spark_entry__.oracle_sql).

    ``spread`` repartitions the (id, text) projection to the cluster's
    default parallelism before the hash-heavy signature pass: the md5+fold
    compute dominates one shuffle of raw text at every scale, and without
    it a corpus read as few splits (small files, huge row groups) serializes
    the expensive pass onto a handful of cores.

    Mega-bucket hazard: a cluster of N near-IDENTICAL documents puts N ids
    in the same band bucket — the in-bucket expansion is N^2 pairs and the
    collect_list is O(N). Two defenses, both on by design:
      1. upstream: the curation composition (operators/curation.
         curate_corpus) runs exact_dedup BEFORE minhash so byte-identical
         mega-clusters (the overwhelmingly common case) collapse to one id
         first;
      2. ``max_bucket_size``: per-(band, band_hash) truncation — a
         row_number window over the band exchange keeps only the
         ``max_bucket_size`` smallest ids per bucket BEFORE the
         collect_list, bounding both the bucket row (O(cap)) and the pair
         expansion (O(cap^2)). Deterministic (min-id order); cluster
         connectivity for the retained ids survives via the remaining
         bands, and the downstream connected-components pass reunites what
         any single band's truncation split. The window sorts within the
         SAME (band, bh) exchange the groupBy needs, so the cap adds no
         extra shuffle. The analog of the reference's bounded dedup window
         (basic-lib/.../dedup/DeDupProcessor.java:122-141). None = uncapped
         (exact pair-set oracle parity for the gate query).
    """
    rows_per_band = num_hashes // bands
    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    if spread:
        src = src.repartition(df.sparkSession.sparkContext.defaultParallelism, "_id")
    # materialize shingles ONCE (reused by the verify joinback): the
    # fingerprint pass is persisted (memory, spilling to disk) because three
    # consumers read it — the signature fold and both sides of the verify
    # joinback (guide §5: cache exactly when reused and recompute is
    # expensive; guide §8: materialize the fingerprint pass). Without this
    # the two joinback branches recompute the scan+shingling per side or,
    # worse, re-shuffle the full shingle arrays.
    shingled = src.select(
        "_id",
        word_shingles(F.col("_t"), shingle_n).alias("_sh"),
    ).persist()
    sig = shingled.select("_id", _minhash_fold(F.col("_sh"), num_hashes).alias("_sig"))
    # id-only band rows: band hash = md5_long of the comma-joined band slice
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    md5_long(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("_sig", b * rows_per_band + r + 1).cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bh"),
    )
    # bucket expansion instead of a self-join: ONE shuffle on (band, bh) and
    # the signature pipeline runs once (a self-join evaluates it per side —
    # locally AQE broadcasts one side, which defeats exchange reuse; at
    # cluster scale the join shuffles the banded frame twice). Buckets are
    # tiny by LSH design, so the within-bucket pair blowup is bounded.
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_band", "_bh").orderBy("_id")
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    grouped = (
        banded.groupBy("_band", "_bh")
        .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    cand = _expand_sorted_id_buckets(grouped, "_ids").dropDuplicates(["id_a", "id_b"])
    # joinback: only candidate pairs (<< corpus) pull their shingle arrays
    sh_a = shingled.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sh_b = shingled.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    jac = F.size(F.array_intersect("_sha", "_shb")) / F.size(F.array_union("_sha", "_shb"))
    out = pairs.withColumn("jaccard", jac.cast("double")).drop("_sha", "_shb")
    if verify_threshold is not None:
        out = out.where(F.col("jaccard") >= verify_threshold)
    return out


def _expand_sorted_id_buckets(grouped: DataFrame, ids_col: str) -> DataFrame:
    """All in-bucket pairs (id_a < id_b) from a frame holding a SORTED id
    array per bucket, STREAMED: posexplode the array, then explode each
    element's tail slice. No intermediate value ever holds more than one
    bucket's id array (O(bucket)), so a hot bucket produces its size^2
    pairs as spillable generator output rows — never as a single flattened
    O(size^2) array value (which would hit the 2 GB value limit / one-task
    OOM long before the shuffle could spill)."""
    return (
        grouped.select(F.col(ids_col), F.posexplode(ids_col).alias("_i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col(ids_col), F.col("_i") + 2, F.size(ids_col))
            ).alias("id_b"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    raise_on_nonconvergence: bool = True,
) -> DataFrame:
    """Connected components over an undirected near-duplicate pair graph:
    (node, component) where component = min node id in the component — the
    step that turns pairwise near-dup evidence into dedup CLUSTERS (keep
    one representative per component, drop the rest).

    Min-label propagation to fixpoint: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(graph
    diameter) rounds. Near-dup graphs are unions of small dense clusters
    (diameter 1-3), so 2-4 rounds is typical at any corpus size; the loop
    stops early at fixpoint and hard-stops at ``max_iter``. Each round is
    one broadcast-or-shuffle join + hash aggregate, with localCheckpoint
    per round to truncate lineage (the iterative-algorithm hygiene Spark
    needs). For adversarial long-chain graphs use
    :func:`connected_components_star` (Kiveris et al. large-star/
    small-star) — same join primitives, O(log n) rounds regardless of
    diameter.

    If the graph has not converged after ``max_iter`` rounds the result
    would silently contain SPLIT components (near-dups kept as distinct
    'representatives'), so by default this raises instead — switch to the
    star variant or raise ``max_iter``. ``raise_on_nonconvergence=False``
    restores the old return-partial behavior (the frame then carries a
    ``converged=False`` marker in its ``.converged`` attribute)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("_nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nl").alias("_mn"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_mn"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0 and raise_on_nonconvergence:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "the graph's diameter exceeds max_iter (long chains); use "
            "connected_components_star (O(log n) rounds) or raise max_iter"
        )
    labels.converged = changed == 0
    return labels


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log n) rounds INDEPENDENT of graph diameter —
    the swap-in for adversarial chain-shaped near-dup graphs where
    min-label propagation's O(diameter) rounds would stall.

      * large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
      * small-star(u): orient edges to the smaller endpoint; connect every
        smaller neighbor and u itself to m = min(N≤(u) ∪ {u})

    Each operation is one groupBy-min + one join on the SAME key — the
    identical shuffle shape as a min-label round, just with a doubling
    contraction rate. Returns (node, component) with component = min node
    id, byte-identical to :func:`connected_components` output."""
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(edges: DataFrame) -> DataFrame:
        und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            und.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", F.col("u")).alias("_m"))
        )
        return (
            und.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        toward_min = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = toward_min.groupBy("u").agg(F.min("v").alias("_m"))
        linked = toward_min.join(mins, "u")
        return (
            linked.select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .union(mins.select(F.col("u"), F.col("_m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        new_e = small_star(large_star(e)).localCheckpoint()
        diff = (
            new_e.exceptAll(e).union(e.exceptAll(new_e)).limit(1).count()
        )
        e = new_e
        if diff == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (expected O(log n) ~ a few dozen for any real graph)"
        )
    # converged edge set is a star per component: every non-root points at
    # the component min; roots (and isolated nodes) label themselves
    labels = e.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("label")
    ).groupBy("node").agg(F.min("label").alias("label"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("label")
    )


def dedup_corpus_by_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, algorithm: str = "min_label"
) -> DataFrame:
    """Corpus dedup from pair evidence: keep ONE representative (min id)
    per connected component of the near-dup graph, plus every unpaired
    document. The end-to-end shape: pairs (minhash/simhash/embedding) ->
    components -> survivors.

    ``algorithm``: 'min_label' (O(diameter) rounds — the right default for
    near-dup graphs, diameter 1-3) or 'star' (large-star/small-star,
    O(log n) rounds — for adversarial chain-shaped graphs)."""
    if algorithm == "star":
        comp = connected_components_star(pairs)
    elif algorithm == "min_label":
        comp = connected_components(pairs)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}: min_label | star")
    losers = comp.where(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


SIMHASH_BITS = 60  # md5_long width: bit masks stay positive in int64


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """``bits``-wide simhash of word tokens, as a (positive) long.

    Each token votes +-1 per bit position (bit b of md5_long(token)); the
    fingerprint's bit b is 1 iff the sum is positive. Implemented with
    aggregate() over the token array — single pass, JVM-side. md5_long is
    the token hash so a SQL oracle can reproduce the fingerprint exactly
    (60 usable bits; masks never touch the sign bit).
    """
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    hashes = F.transform(tokens, lambda t: md5_long(t))
    # votes[b] = sum over tokens of (bit b set ? 1 : -1)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = SIMHASH_BITS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: split the fingerprint into ``chunks`` pieces; any pair
    within hamming<=chunks-1 shares at least one identical chunk, so
    candidates come from (chunk, value) buckets (requires
    max_hamming < chunks). Verification = bit_count(xor).

    Scale shape — bucket expansion, not a self-join (the minhash template,
    minhash_lsh_pairs above): ONE shuffle of (id, fp, chunk, value) rows
    (~28 bytes, never text) into groupBy(chunk, value) buckets, then
    in-bucket pair expansion. A self-join would evaluate the whole simhash
    pipeline (token explode + 60-bit vote aggregate — the costly part) once
    PER SIDE, and locally AQE's broadcast defeats exchange reuse. The
    fingerprint rides the bucket row, so the hamming verify needs no
    joinback at all. Buckets are tiny by design (a hot bucket means a
    near-identical cluster, which IS the signal); the pair blowup is
    confined within buckets.

    ``max_bucket_size``: the same mega-bucket defense as
    minhash_lsh_pairs — a cluster of near-identical docs shares every
    fingerprint CHUNK, so one adversarial cluster fills one (chunk, value)
    bucket with N ids; the row_number truncation (inside the same chunk
    exchange, min-id order, deterministic) bounds the expansion at cap^2
    per bucket. Retained-id connectivity survives via the other chunks.
    """
    if max_hamming >= chunks:
        raise ValueError("pigeonhole requires max_hamming < chunks")
    width = bits // chunks
    fp = df.select(F.col(id_col).alias("_id"), simhash(F.col(text_col), bits).alias("_fp"))
    chunked = fp.select(
        "_id",
        "_fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_fp"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_chunk", "_cv"),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_chunk", "_cv").orderBy("_id")
        chunked = (
            chunked.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    grouped = (
        chunked.groupBy("_chunk", "_cv")
        .agg(F.array_sort(F.collect_list(F.struct("_id", "_fp"))).alias("_rows"))
        .where(F.size("_rows") >= 2)
    )
    # streamed expansion (see _expand_sorted_id_buckets): posexplode rows,
    # explode each row's tail slice — per-value memory stays O(bucket), the
    # size^2 pair blowup streams as generator rows instead of accumulating
    # into one flattened array value
    pairs = (
        grouped.select("_rows", F.posexplode("_rows").alias("_i", "_x"))
        .select(
            F.col("_x._id").alias("id_a"),
            F.col("_x._fp").alias("_fa"),
            F.explode(
                F.slice(F.col("_rows"), F.col("_i") + 2, F.size("_rows"))
            ).alias("_y"),
        )
        .select("id_a", F.col("_y._id").alias("id_b"), "_fa", F.col("_y._fp").alias("_fb"))
        # a pair may share several chunks; fp copies are identical, keep one
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .drop("_fa", "_fb")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT all-pairs Jaccard >= threshold via inverted shingle index:
    explode shingles, group by shingle into posting lists, expand in-list
    pairs, count shared, size-join for the union. Shuffle key = shingle; no
    full cross-product ever exists, and (bucket expansion, the minhash
    template) the shingle pipeline feeds ONE exchange — a self-join would
    evaluate the explode+dedup per side and shuffle it twice.

    ``max_shingle_df`` drops shingles whose document frequency exceeds the
    cap BEFORE pair expansion (sizes then count the capped sets, so Jaccard
    stays an honest set similarity over the retained shingles). Without it
    a corpus-scale stop-shingle ("the quick brown", df=10^6) would create a
    10^12-pair bucket; with it the worst bucket is max_shingle_df^2 pairs.
    Standard trade-off: ubiquitous shingles carry ~no similarity signal."""
    # (id, shingle) pairs are already distinct per doc (word_shingles is
    # array_distinct), so no dedup pass is needed: the posting-list groupBy
    # is the ONLY shingle-keyed exchange, and both downstream consumers
    # (per-doc sizes, pair expansion) hang off it — Catalyst reuses the
    # exchange instead of re-evaluating the shingle pipeline.
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_s"),
    )
    posting = sh.groupBy("_s").agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
    if max_shingle_df is not None:
        # the df-cap is free here: a posting list IS the document frequency
        posting = posting.where(F.size("_ids") <= max_shingle_df)
    # per-doc retained-shingle counts, derived from the SAME posting lists
    # (so Jaccard is an honest set similarity over the retained shingles)
    sizes = (
        posting.select(F.explode("_ids").alias("_id"))
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    shared = (
        _expand_sorted_id_buckets(posting.where(F.size("_ids") >= 2), "_ids")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    out = (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            (F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared"))).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
