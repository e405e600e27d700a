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

from pyspark.sql import DataFrame
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
) -> tuple[DataFrame, dict]:
    """Curate a document corpus; returns (survivors, stage_counts).

    Stages (each drop is measured and reported):
      1. quality gate  — composite quality_score >= min_quality
      2. language gate — lang_id(text) in ``languages`` (skipped if None)
      3. exact dedup   — one representative per byte-identical text
      4. near-dup      — minhash-LSH pairs at ``minhash_threshold`` Jaccard,
                         connected components, keep min-id per cluster

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
