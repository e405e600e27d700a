"""Event-time conversation-assembler soak — the 100x-backfill claim proven
at scale (VERDICT r4 ask #6, the way tools/mor_soak.py proved exactly-once).

Replays ~10^6 synthetic turns spanning ~10 weeks of EVENT time through
``assemble_conversations_event_time`` with AvailableNow triggers and a
CHECKPOINT RESTART mid-replay (two sequential runs over one checkpoint),
then asserts the emitted conversation-session boundaries are EXACTLY the
batch ``session_window(gap)`` oracle over the same turns.

Data shape: 10 one-week blocks, conversations rotating across 3 groups
(group g active in blocks where block % 3 == g) — so every conversation's
gap timer fires in a later batch that carries other groups' traffic (an
event-time timer fires for a key only in a batch where the key has no
data and the watermark has passed its quiet horizon). A final sentinel
block advances the watermark past every real session's horizon so nothing
real is left in state and the oracle comparison is total, not partial.

Usage:  python tools/assembler_soak.py          # ~10^6 turns
        DCS_SOAK_TURNS=100000 python tools/assembler_soak.py

Prints one JSON line with throughput + the boundary-match verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

TURNS = int(os.environ.get("DCS_SOAK_TURNS", "1000000"))
BLOCKS = 10
TURNS_PER_SESSION = 10
GAP_S = 60
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
WEEK_MS = 7 * 24 * 3600 * 1000
WORKDIR = os.environ.get("DCS_SOAK_WORKDIR", "/dev/shm")


def main() -> None:
    from pyspark.sql import functions as F

    from datacollector_spark.session import get_spark
    from datacollector_spark.streaming.stateful import (
        assemble_conversations_event_time,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "assembler-soak", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    work = tempfile.mkdtemp(prefix="dcs-asm-soak-", dir=WORKDIR)
    src = os.path.join(work, "turns")
    out_dir = os.path.join(work, "sessions")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    sessions_per_block = max(1, TURNS // (BLOCKS * TURNS_PER_SESSION))

    def write_block(b: int) -> None:
        # sessions spread over the first 80% of the block's week, turns 5 s
        # apart — every within-session gap << GAP_S, every cross-block gap
        # for one conversation >> GAP_S (weeks), so session_window(GAP_S)
        # sees exactly one session per (conv, block)
        n = sessions_per_block
        start = (
            f"{BASE_MS + b * WEEK_MS}L + cast(id * (0.8 * {WEEK_MS}) / {n} AS LONG)"
        )
        (
            spark.range(n)
            .selectExpr(
                f"concat('g', {b % 3}, '-', id) AS conv_id",
                f"{start} AS start_ms",
                f"explode(sequence(0, {TURNS_PER_SESSION - 1})) AS j",
            )
            .selectExpr(
                "conv_id",
                f"cast({b} * {TURNS_PER_SESSION} + j AS INT) AS turn_idx",
                "IF(j % 2 = 0, 'user', 'assistant') AS role",
                f"concat(conv_id, '-b', {b}, '-t', j) AS text",
                "timestamp_millis(start_ms + j * 5000) AS event_time",
            )
            .coalesce(1)
            .write.parquet(os.path.join(src, f"f{b:02d}"))
        )
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "event_time timestamp"
    )

    def run_stream() -> float:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f*")
        )
        out = assemble_conversations_event_time(stream, gap_ms=GAP_S * 1000)
        t0 = time.perf_counter()
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    # ---- replay phase 1: blocks 0-4, then RESTART from checkpoint for 5-9
    for b in range(5):
        write_block(b)
    wall1 = run_stream()
    for b in range(5, BLOCKS):
        write_block(b)
    wall2 = run_stream()  # checkpoint-resumed mid-replay

    # ---- sentinel: push the watermark past every real session's horizon
    (
        spark.createDataFrame(
            [("sentinel", 0, "user", "s", None)],
            "conv_id string, turn_idx int, role string, text string, x string",
        )
        .selectExpr(
            "conv_id", "turn_idx", "role", "text",
            f"timestamp_millis({BASE_MS + (BLOCKS + 2) * WEEK_MS}L) AS event_time",
        )
        .coalesce(1)
        .write.parquet(os.path.join(src, "fzz_sentinel"))
    )
    wall3 = run_stream()

    # ---- oracle: batch session_window over the same (real) turns
    turns = spark.read.parquet(src + "/f*").where("conv_id != 'sentinel'")
    n_turns = turns.count()
    oracle = (
        turns.groupBy("conv_id", F.session_window("event_time", f"{GAP_S} seconds"))
        .agg(
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
            F.count("*").alias("n_turns"),
        )
        .select("conv_id", "first_turn", "last_turn", "n_turns")
    )
    emitted = spark.read.parquet(out_dir).select(
        "conv_id", "first_turn", "last_turn", "n_turns"
    )
    n_oracle = oracle.count()
    n_emitted = emitted.count()
    # exact set equality both ways (exceptAll is multiplicity-aware)
    missing = oracle.exceptAll(emitted).count()
    extra = emitted.exceptAll(oracle).count()

    result = {
        "turns": n_turns,
        "sessions_oracle": n_oracle,
        "sessions_emitted": n_emitted,
        "boundaries_missing": missing,
        "boundaries_extra": extra,
        "boundary_match": missing == 0 and extra == 0,
        "restart": "checkpoint-resumed after block 5 of 10 (mid-replay)",
        "wall_run1_s": round(wall1, 1),
        "wall_run2_s": round(wall2, 1),
        "wall_sentinel_s": round(wall3, 1),
        "turns_per_sec": round(n_turns / (wall1 + wall2), 1),
        "gap_s": GAP_S,
        "cores": cpus,
    }
    print("ASSEMBLER_SOAK " + json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    if not result["boundary_match"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
