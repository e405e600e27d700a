"""End-to-end corpus curation: the training-data pipeline composed.

quality gate -> exact dedup -> near-dup pairs -> connected components ->
one survivor per cluster. Each stage is one of the engine's oracle-checked
operators; this module is the composition a real curation run uses
(jobs/curate_corpus.py is the spark-submit wrapper).

Scale notes: the stages are independently shuffle-shaped (see their
modules); the composition adds nothing quadratic — survivors flow between
stages as (id)-keyed frames and the final anti-joins are id-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datacollector_spark.operators.dedup import (
    dedup_corpus_by_pairs,
    exact_dedup,
    minhash_lsh_pairs,
)
from datacollector_spark.operators.text import lang_id, quality_features


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.25,
    languages: list[str] | None = None,
    minhash_threshold: float = 0.6,
    max_bucket_size: int | None = 1_000,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
) -> tuple[DataFrame, dict]:
    """Curate a document corpus; returns (survivors, stage_counts).

    Stages (each drop is measured and reported):
      1. quality gate  — composite quality_score >= min_quality
      2. language gate — lang_id(text) in ``languages`` (skipped if None)
      3. exact dedup   — one representative per byte-identical text
      4. near-dup      — minhash-LSH pairs at ``minhash_threshold`` Jaccard,
                         connected components, keep min-id per cluster
      5. decontamination — if ``benchmark`` is given, drop survivors
                         sharing any ``decontaminate_n``-gram with it
                         (:func:`decontaminate`); runs LAST so the eval
                         sweep only scans the already-deduped survivor set

    ``max_bucket_size`` caps each minhash band bucket (the mega-bucket
    defense for near-identical-but-UNEQUAL clusters that survive stage 3 —
    templated spam, boilerplate; see minhash_lsh_pairs). With cap C the
    worst bucket contributes C^2 verify pairs per band instead of N^2.

    Each inter-stage frame is persisted before its count so the report
    costs one pipeline pass total: without the persist, the exact-dedup
    count would recompute the quality projection, the minhash pass would
    recompute both, and the final count the whole chain — a 3-4x
    multiplier at exactly the corpus scale this module targets. The
    ``input`` count rides the quality pass as an ``observe()`` metric
    (CollectMetrics on the pre-filter plan), so the report costs ZERO
    extra source scans end to end. The returned ``survivors`` frame is
    left persisted (it was just counted); callers unpersist after
    writing.
    """
    from pyspark.sql import Observation

    counts: dict[str, int] = {}
    obs = Observation("curation_input")
    scored = quality_features(
        df.observe(obs, F.count(F.lit(1)).alias("input_rows")), text_col
    )
    kept = scored.where(F.col("quality_score") >= min_quality)
    if languages:
        kept = kept.where(lang_id(F.col(text_col)).isin(languages))
    kept = kept.select(*df.columns).persist()
    counts["after_quality"] = kept.count()
    # the count above materialized the observed plan; get() won't block
    counts["input"] = int(obs.get["input_rows"])

    reps = exact_dedup(kept, [text_col], id_col).select(id_col)
    deduped = kept.join(reps, id_col, "left_semi").persist()
    counts["after_exact"] = deduped.count()

    pairs = minhash_lsh_pairs(
        deduped,
        id_col,
        text_col,
        verify_threshold=minhash_threshold,
        max_bucket_size=max_bucket_size,
    )
    survivors = dedup_corpus_by_pairs(deduped, pairs, id_col).persist()
    counts["after_neardup"] = survivors.count()
    if benchmark is not None:
        flagged = decontaminate(
            survivors, benchmark, id_col=id_col, text_col=text_col,
            n=decontaminate_n,
        )
        clean = (
            flagged.where(~F.col("contaminated"))
            .drop("contaminated", "n_matched")
            .persist()
        )
        counts["after_decontaminate"] = clean.count()
        survivors.unpersist()
        survivors = clean
    if max_bucket_size is not None:
        # a capped run is a RECALL change (over-cap band buckets drop
        # candidate pairs), not just a performance guard — record it so
        # the curation report shows the run was capped (ADVICE r4)
        counts["near_dup_bucket_cap"] = max_bucket_size
    # survivors is materialized in cache by the count above; its upstream
    # cached stages can be released now
    kept.unpersist()
    deduped.unpersist()
    return survivors, counts


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with an eval/benchmark set (the GPT-3/Pile 13-gram rule —
    at test scale use a smaller ``n``). Returns the corpus with
    ``contaminated`` (bool) and ``n_matched`` (distinct matched n-grams).

    Scale shape: benchmark n-grams hash to 60-bit longs (md5-derived, so
    the SQL oracle reproduces the exact join keys) and are distinct —
    eval suites are tiny next to a training corpus, so the benchmark side
    broadcasts (``broadcast_benchmark=False`` falls back to a shuffle
    join for pathological benchmark sizes). The corpus side explodes its
    shingles map-side into the broadcast join; only MATCHED rows (rare)
    reach the per-doc aggregate, and the verdict joins back to the corpus
    by id (AQE broadcasts the tiny matched side). Two corpus scans, zero
    corpus shuffles."""
    from datacollector_spark.functions.hashing import md5_long, word_shingles

    bench = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("_s")
        )
        .select(md5_long(F.col("_s")).alias("_bh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_shingles = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("_s"),
    ).select(id_col, md5_long(F.col("_s")).alias("_h"))
    matched = (
        doc_shingles.join(bench, F.col("_h") == F.col("_bh"))
        .groupBy(id_col)
        .agg(F.count_distinct("_h").alias("n_matched"))
    )
    return (
        corpus.join(matched, id_col, "left")
        .withColumn("n_matched", F.coalesce(F.col("n_matched"), F.lit(0)))
        .withColumn("contaminated", F.col("n_matched") > 0)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | None = None,
    exact_n: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction —
    per-stratum rates with the :func:`hash_split` stability contract (pure
    function of (id, salt): rerun-stable, growth-stable, engine-
    reproducible; never ``sample()``, whose membership shifts with
    partitioning).

    Exactly one of:
      * ``fractions`` — {stratum: keep_fraction}; keep iff
        u(id) < fraction, unlisted strata get ``default_fraction``.
        One projection + filter, NO shuffle: fuses into the scan.
      * ``exact_n`` — {stratum: row_count}; the n rows with the smallest
        (hash, id) per stratum — a deterministic reservoir. One shuffle
        (the per-stratum window); unlisted strata are dropped.
    """
    from datacollector_spark.functions.hashing import md5_long

    if (fractions is None) == (exact_n is None):
        raise ValueError("pass exactly one of fractions / exact_n")
    h = md5_long(F.col(id_col).cast("string"), salt=salt)
    if fractions is not None:
        for name, f in fractions.items():
            if not 0.0 <= f <= 1.0:
                raise ValueError(f"fraction for {name!r} out of [0,1]: {f}")
        u = h / F.lit(float(1 << 60))
        rate = F.lit(float(default_fraction))
        # deterministic build order so the generated plan (and its SQL
        # twin) is stable regardless of dict ordering
        for name in sorted(fractions):
            rate = F.when(
                F.col(strata_col) == name, F.lit(float(fractions[name]))
            ).otherwise(rate)
        return df.where(u < rate)
    # Drop unlisted strata BEFORE the window: they carry quota 0 and would
    # be discarded after the shuffle anyway — at corpus scale the unlisted
    # strata are usually most of the data, so filtering first keeps the
    # row_number exchange proportional to the quota'd strata only. The
    # filter fuses into the scan (and pushes down to parquet).
    names = sorted(exact_n)
    df = df.where(F.col(strata_col).isin(names))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    quota = F.lit(0)
    for name in names:
        quota = F.when(
            F.col(strata_col) == name, F.lit(int(exact_n[name]))
        ).otherwise(quota)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    salt: str = "pack-v1",
    range_bits: int = 8,
) -> DataFrame:
    """Deterministic contiguous sequence packing: assign documents to
    fixed-token-budget training bins. Documents are laid out in a
    deterministic pseudo-random global order (md5-60bit of (id, salt) —
    rerun- and engine-reproducible, a global shuffle without an RNG), and
    each doc's bin is ``floor(exclusive_prefix_tokens / budget)`` — docs are
    never split; a bin overflows by at most one document; docs longer than
    the budget take a bin (plus spill) on their own. Adds ``pack_order``
    (position in the global layout), ``pack_bin``, and ``pack_offset``
    (token offset within the layout).

    Scale shape — a DISTRIBUTED prefix sum, never a global window (a
    partition-less window moves the whole corpus to one task): the top
    ``range_bits`` bits of the order hash split the layout into 2^range_bits
    contiguous range buckets; the in-bucket cumulative sum is a window
    partitioned by bucket, and each bucket's global prefix is the sum of
    lower buckets' totals — a 2^range_bits-row aggregate broadcast back.
    One corpus shuffle (the range-bucket window) + one tiny join."""
    from datacollector_spark.functions.hashing import md5_long

    h = md5_long(F.col(id_col).cast("string"), salt=salt)
    rb = F.shiftright(h, 60 - range_bits)
    keyed = df.withColumn("_h", h).withColumn("_rb", rb)
    w = Window.partitionBy("_rb").orderBy("_h", F.col(id_col))
    in_bucket = keyed.withColumn(
        "_tok_cum",
        F.coalesce(
            F.sum(F.col(token_col).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("_rn", F.row_number().over(w))
    # per-bucket totals -> exclusive global prefix per bucket. Derived from
    # the WINDOWED frame (last row's inclusive sum / max row_number), not a
    # separate groupBy over the source: both consumers then sit on the same
    # hashpartitioning(_rb) shuffle, which AQE reuses at runtime — the
    # corpus is scanned, hashed, and shuffled ONCE (a separate source-side
    # aggregate was a second full md5 pass: 25.8s -> 4.5s at 10^7 rows).
    totals = in_bucket.groupBy("_rb").agg(
        F.max(F.col("_tok_cum") + F.col(token_col).cast("long")).alias("_tok"),
        F.max("_rn").alias("_cnt"),
    )
    wb = (
        Window.orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "_rb",
        F.coalesce(F.sum("_tok").over(wb), F.lit(0)).alias("_tok_prefix"),
        F.coalesce(F.sum("_cnt").over(wb), F.lit(0)).alias("_cnt_prefix"),
    )
    out = in_bucket.join(F.broadcast(prefixes), "_rb")
    offset = F.col("_tok_prefix") + F.col("_tok_cum")
    return (
        out.withColumn(
            "pack_order",
            (F.col("_cnt_prefix") + F.col("_rn") - 1).cast("long"),
        )
        .withColumn("pack_offset", offset.cast("long"))
        # integer DIV, not floor(double/) — exact past 2^53 total tokens
        .withColumn(
            "pack_bin",
            F.expr(f"pack_offset DIV {int(budget)}").cast("long"),
        )
        .drop("_h", "_rb", "_tok_cum", "_rn", "_tok_prefix", "_cnt_prefix")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free id hash —
    the held-out-split step of a training-data run. Unlike sample()/
    randomSplit(), the assignment is a PURE FUNCTION of (id, salt): stable
    across runs, partitionings, Spark versions and engines (md5-derived, so
    a SQL oracle reproduces it exactly), and adding documents later never
    reassigns existing ones. Changing ``salt`` draws a fresh split.

    ``fractions``: {split_name: fraction} summing to 1.0 (validated);
    assignment by cumulative thresholds over u = md5_60bit(id||salt)/2^60.
    Adds a ``split`` column; one projection, no shuffle."""
    from datacollector_spark.functions.hashing import md5_long

    fractions = fractions or {"train": 0.9, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = md5_long(F.col(id_col).cast("string"), salt=salt) / F.lit(float(1 << 60))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        branch = F.when(u < cum, F.lit(name))
        expr = branch if expr is None else expr.when(u < cum, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
