"""Benchmark harness. Prints ONE JSON line:

{"metric": ..., "value": <total suite sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...,
 "cdc": {"events": E, "wall_s": s, "events_per_sec": r},
 "scaling": {"cores_low": 8, "thr_low": ..., "cores_high": 32,
             "thr_high": ..., "efficiency": ...}}

The headline is the CDC apply path (BASELINE.md): seeded changelog segments
-> Structured Streaming AvailableNow -> transform -> LWW collapse -> lake
MERGE, measured first-to-last micro-batch commit. Scaling evidence runs the
same input at local[N] and local[4N] (the sandbox proxy for an N vs 4N
executor cluster; see BASELINE.md protocol) and reports
efficiency = (thr_high / thr_low) / (cores_high / cores_low).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, DCS_BENCH_EVENTS,
DCS_BENCH_SCALING=0|1, DCS_BENCH_LOW_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("DCS_BENCH_EVENTS", "4000000"))
SCALING = os.environ.get("DCS_BENCH_SCALING", "1") == "1"
LOW_CPUS = int(os.environ.get("DCS_BENCH_LOW_CPUS", str(max(CPUS // 4, 2))))

HEADLINE_QUERIES = [
    "cdc_lww_final_state",
    "tpch_pricing_summary",
    "lookup_broadcast_dim",
    "window_topk_per_key",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
]


def _session(cores: int):
    from datacollector_spark.session import get_spark

    return get_spark(
        app_name=f"dcs-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def _cdc_apply(spark, segments_dir: str, cores: int) -> float:
    """Run the full ingest pipeline over pre-written segments; return wall
    seconds (first to last micro-batch commit)."""
    from datacollector_spark.lake import LakeTable
    from datacollector_spark.model import KEY_COLUMNS, transcripts_schema
    from datacollector_spark.operators.transforms import transcript_transforms
    from datacollector_spark.streaming import CdcIngestPipeline

    work = tempfile.mkdtemp(prefix=f"dcs-bench-{cores}-")
    table = LakeTable.create(
        spark,
        os.path.join(work, "table"),
        transcripts_schema(),
        KEY_COLUMNS,
        num_buckets=2 * cores,
    )
    pipe = CdcIngestPipeline(
        spark,
        segments_dir,
        table,
        os.path.join(work, "ckpt"),
        transforms=transcript_transforms,
        lineage_dir=os.path.join(work, "lineage"),
        max_files_per_trigger=8,  # 16 segments -> 2 micro-batches
        per_bucket_lineage=True,
        lineage_flush_rows=10_000,  # flush once at end of the bounded run
    )
    t0 = time.time()
    pipe.run_available_now()
    wall = time.time() - t0
    shutil.rmtree(work, ignore_errors=True)
    return wall


def _write_segments(spark, n_events: int) -> tuple[str, int]:
    from datacollector_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
        write_segments,
    )

    seg_dir = tempfile.mkdtemp(prefix="dcs-bench-seg-")
    spec = ChangelogSpec(
        n_events=n_events,
        n_conversations=max(n_events // 200, 100),
        seed=42,
    )
    df = generate_changelog(spark, spec)
    n_delivered = df.count()
    write_segments(df, seg_dir, n_segments=16)
    return seg_dir, n_delivered


def main() -> None:
    import __spark_entry__ as entrymod

    result: dict = {"sf": SF_DIR, "unit": "sec"}
    queries: dict[str, float] = {}

    spark = _session(CPUS)
    t_suite = time.time()

    # 1) headline query suite at SF_DIR
    qs = entrymod.queries()
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    # 2) CDC apply throughput at full parallelism
    seg_dir, n_delivered = _write_segments(spark, N_EVENTS)
    wall_high = _cdc_apply(spark, seg_dir, CPUS)
    thr_high = n_delivered / wall_high
    queries["cdc_apply"] = round(wall_high, 3)
    result["cdc"] = {
        "events": n_delivered,
        "wall_s": round(wall_high, 3),
        "events_per_sec": round(thr_high, 1),
        "cores": CPUS,
    }

    # 3) scaling: same input, low parallelism (N vs 4N cores proxy)
    if SCALING:
        spark.stop()
        spark = _session(LOW_CPUS)
        wall_low = _cdc_apply(spark, seg_dir, LOW_CPUS)
        thr_low = n_delivered / wall_low
        eff = (thr_high / thr_low) / (CPUS / LOW_CPUS)
        result["scaling"] = {
            "cores_low": LOW_CPUS,
            "thr_low": round(thr_low, 1),
            "cores_high": CPUS,
            "thr_high": round(thr_high, 1),
            "efficiency": round(eff, 3),
        }

    shutil.rmtree(seg_dir, ignore_errors=True)
    spark.stop()

    result["metric"] = "cdc_apply+headline_queries_total_sec"
    result["value"] = round(time.time() - t_suite, 3)
    result["queries"] = queries
    print(json.dumps(result))


if __name__ == "__main__":
    main()
