"""spark-submit entry point for corpus curation (the training-data run).

    spark-submit --py-files dist/datacollector_spark.zip \
        jobs/curate_corpus.py --input /path/documents.parquet \
        --output /path/curated [--min-quality 0.25] [--languages en,de]
        [--minhash-threshold 0.6] [--benchmark /path/eval.parquet
        --decontaminate-n 13]

Prints one CURATE_RESULT JSON line with per-stage counts.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.25)
    ap.add_argument("--languages", default=None, help="comma-separated, e.g. en,de")
    ap.add_argument("--minhash-threshold", type=float, default=0.6)
    ap.add_argument(
        "--max-bucket-size",
        type=int,
        default=1000,
        help="minhash band-bucket cap (mega-bucket defense); 0 = uncapped",
    )
    ap.add_argument(
        "--benchmark",
        default=None,
        help="parquet path of an eval/benchmark set; survivors sharing any "
        "word n-gram with it are dropped (decontamination stage)",
    )
    ap.add_argument("--decontaminate-n", type=int, default=13)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("datacollector-spark-curate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from datacollector_spark.operators.curation import curate_corpus

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
    survivors.write.mode("overwrite").parquet(args.output)
    print("CURATE_RESULT " + json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
