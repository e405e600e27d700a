"""spark-submit entry point for an end-to-end training-mix build — the
full training-data run composed from the engine's oracle-checked operators:

    quality/language/dedup curation  (curate_corpus)
      -> benchmark n-gram decontamination        (optional --benchmark)
      -> per-stratum rate sampling               (optional --mix)
      -> deterministic train/val/test hash split (hash_split)
      -> per-split token-budget sequence packing (pack_sequences)
      -> parquet output partitioned by split

    spark-submit --py-files dist/datacollector_spark.zip \
        jobs/build_training_mix.py --input /path/documents.parquet \
        --output /path/mix [--benchmark /path/eval.parquet]
        [--mix lang:en=0.5,lang:de=1.0 --mix-default 0.1]
        [--splits train=0.9,val=0.05,test=0.05] [--budget 2048]
        [--token-col n_chars] [--min-quality 0.25] [--languages en,de]

Prints one MIX_RESULT JSON line with per-stage counts and per-split bins.
Every stage is shuffle-shaped for the 10^8+-doc design point (see the
operators' docstrings); nothing here adds a pass the stages don't already
pay.
"""

from __future__ import annotations

import argparse
import json


def parse_mix(s: str) -> tuple[str, dict[str, float]]:
    """--mix 'lang:en=0.5,lang:de=1.0' -> ('lang', {'en': .5, 'de': 1.0});
    one strata column per run."""
    col = None
    fractions: dict[str, float] = {}
    for part in s.split(","):
        try:
            key, frac = part.split("=", 1)
            c, v = key.split(":", 1)
            float(frac)
        except ValueError:
            raise SystemExit(
                f"--mix: malformed entry {part!r} (expected column:value=fraction)"
            )
        if col is None:
            col = c
        elif c != col:
            raise SystemExit(f"--mix uses one strata column, got {col} and {c}")
        fractions[v] = float(frac)
    assert col is not None
    return col, fractions


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.25)
    ap.add_argument("--languages", default=None)
    ap.add_argument("--minhash-threshold", type=float, default=0.6)
    ap.add_argument("--max-bucket-size", type=int, default=1000)
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--decontaminate-n", type=int, default=13)
    ap.add_argument("--mix", default=None, help="strata:value=frac,...")
    ap.add_argument("--mix-default", type=float, default=0.0)
    ap.add_argument("--splits", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument(
        "--token-col",
        default="n_chars",
        help="numeric column used as the packing token count",
    )
    ap.add_argument(
        "--chunk-max-tokens",
        type=int,
        default=0,
        help="if > 0, split documents into overlapping word-window chunks "
        "of this size AFTER the split assignment (chunks of one doc never "
        "straddle splits) and pack the chunks by their real token counts",
    )
    ap.add_argument("--chunk-overlap", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("datacollector-spark-training-mix")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from datacollector_spark.operators.curation import (
        curate_corpus,
        hash_split,
        pack_sequences,
        stratified_sample,
    )

    df = spark.read.parquet(args.input)
    survivors, counts = curate_corpus(
        df,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        languages=args.languages.split(",") if args.languages else None,
        minhash_threshold=args.minhash_threshold,
        max_bucket_size=args.max_bucket_size or None,
        benchmark=(
            spark.read.parquet(args.benchmark) if args.benchmark else None
        ),
        decontaminate_n=args.decontaminate_n,
    )

    mixed = survivors
    if args.mix:
        col, fractions = parse_mix(args.mix)
        mixed = stratified_sample(
            mixed,
            col,
            fractions=fractions,
            id_col=args.id_col,
            default_fraction=args.mix_default,
        )

    try:
        splits = {
            name: float(frac)
            for name, frac in (kv.split("=", 1) for kv in args.splits.split(","))
        }
    except ValueError:
        raise SystemExit(
            f"--splits: malformed value {args.splits!r} (expected name=frac,...)"
        )
    assigned = hash_split(mixed, args.id_col, fractions=splits)

    # optional context-window chunking AFTER the split assignment: every
    # chunk inherits its document's split, so no document leaks across the
    # train/eval boundary; packing then uses the chunks' REAL token counts
    pack_id, token_col = args.id_col, args.token_col
    if args.chunk_max_tokens > 0:
        from datacollector_spark.operators.text import chunk_documents

        # `split` rides through the chunker as a pass-through column — the
        # old shape re-joined chunks to the documents on id, which shuffled
        # every chunk's full text across the cluster just to re-attach one
        # small column the parent row already had
        chunks = chunk_documents(
            assigned,
            id_col=args.id_col,
            text_col=args.text_col,
            max_tokens=args.chunk_max_tokens,
            overlap=args.chunk_overlap,
            extra_cols=["split"],
        )
        assigned = chunks.withColumn(
            "chunk_id",
            F.concat_ws("#", F.col(args.id_col), F.col("chunk_idx")),
        )
        pack_id, token_col = "chunk_id", "chunk_tokens"

    # pack each split independently (bins never straddle splits), one
    # deterministic layout per split
    packed = None
    for split_name in splits:
        part = pack_sequences(
            assigned.where(F.col("split") == split_name),
            id_col=pack_id,
            token_col=token_col,
            budget=args.budget,
            salt=f"pack-{split_name}",
        )
        packed = part if packed is None else packed.unionByName(part)

    assert packed is not None
    # persist: the write and the stats aggregate both consume the packed
    # frame — without it the stats pass would re-run the whole pipeline
    # (and a read-back of an all-empty output has no schema to infer)
    packed = packed.persist()
    packed.write.mode("overwrite").partitionBy("split").parquet(args.output)
    stats = {
        r["split"]: {"rows": r["rows"], "bins": r["bins"]}
        for r in packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (F.max("pack_bin") + 1).alias("bins"),
        )
        .collect()
    }
    packed.unpersist()
    counts["mix_rows"] = sum(s["rows"] for s in stats.values())
    print("MIX_RESULT " + json.dumps({"stages": counts, "splits": stats}))
    survivors.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
