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

from datacollector_spark.functions.hashing import md5_long, word_shingles


def exact_dedup(df: DataFrame, columns: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact content group; add
    ``dup_count``. The scalable form of DeDupProcessor: hash-aggregate,
    map-side combined, shuffle = distinct groups."""
    others = [c for c in df.columns if c not in columns]
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

    h_i(s) = xxhash64(s, i); the per-row min over shingles approximates
    Jaccard similarity: P[min_i(A)=min_i(B)] = J(A,B).

    Implemented as ONE aggregate() fold over the shingle array with K
    accumulators (zip_with least), not K separate array_min(transform)
    expressions: Catalyst's projection collapse would inline the (costly)
    shingling expression into every one of the K copies — measured ~10x
    slower. The fold touches each shingle once and hashes it K times.
    """
    sh = word_shingles(text, shingle_n)
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(s, i)),
            F.least,
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.6,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded minhash LSH,
    optionally verified with exact shingle Jaccard.

    rows/band bucket ~ collisions only; the self-join is on
    (band_idx, band_hash) so its shuffle key cardinality is ~corpus size,
    and no pair outside a shared bucket is ever materialized — the property
    that makes this run at 10^8+ docs.
    """
    rows_per_band = num_hashes // bands
    # materialize shingles ONCE; building the signature from the column
    # reference keeps the (expensive) shingle expression out of each of the
    # K per-hash transforms (no reliance on expression CSE)
    shingled = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    sig = shingled.select(
        "_id",
        "_sh",
        F.array(
            *[
                F.array_min(
                    F.transform(F.col("_sh"), lambda s, i=i: md5_long(s, salt=f"#{i}"))
                )
                for i in range(num_hashes)
            ]
        ).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("_sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bh"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bh") == F.col("b._bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("_sha"),
            F.col("b._sh").alias("_shb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("_sha", "_shb")) / F.size(F.array_union("_sha", "_shb"))
    out = pairs.withColumn("jaccard", jac.cast("double")).drop("_sha", "_shb")
    if verify_threshold is not None:
        out = out.where(F.col("jaccard") >= verify_threshold)
    return out


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit simhash of word tokens, as a signed long.

    Each token votes +-1 per bit position (bit b of md5_long(token)); the
    fingerprint's bit b is 1 iff the sum is positive. Implemented with
    aggregate() over the token array — single pass, JVM-side.
    """
    import struct as _struct

    def _mask(b: int) -> int:  # signed-long bit mask (bit 63 wraps negative)
        return _struct.unpack("q", _struct.pack("Q", 1 << b))[0]

    masks = F.array(*[F.lit(_mask(b)).cast("long") for b in range(bits)])
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    # xxhash64: full 64-bit coverage (md5_long is 60-bit; no oracle needs
    # to reproduce simhash, so the fast JVM hash wins)
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
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
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: split the 64-bit fingerprint into ``chunks`` pieces; any pair
    within hamming<=chunks-1 shares at least one identical chunk, so
    candidates come from chunk-bucket self-joins (requires
    max_hamming < chunks). Verification = bit_count(xor).
    """
    if max_hamming >= chunks:
        raise ValueError("pigeonhole requires max_hamming < chunks")
    width = 64 // chunks
    fp = df.select(F.col(id_col).alias("_id"), simhash(F.col(text_col)).alias("_fp"))
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
    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._cv") == F.col("b._cv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._fp").alias("_fa"),
            F.col("b._fp").alias("_fb"),
        )
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
) -> DataFrame:
    """EXACT all-pairs Jaccard >= threshold via inverted shingle index:
    explode shingles, self-join on shingle, count shared, size-join for the
    union. Shuffle key = shingle (document-frequency bounded); no full
    cross-product ever exists."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_s"),
    ).dropDuplicates(["_id", "_s"])
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
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
