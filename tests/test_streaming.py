"""Structured-Streaming pipeline tests: bounded drain, kill/restart
exactly-once, and mid-stream schema evolution (FIXTURES.md F5)."""

from __future__ import annotations

import pandas as pd
import pytest
from pandas.testing import assert_frame_equal
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.lake import LakeTable
from datacollector_spark.model import (
    KEY_COLUMNS,
    PAYLOAD_COLUMNS,
    changelog_schema,
    transcripts_schema,
)
from datacollector_spark.oracle import apply_sequential
from datacollector_spark.sources.generator import (
    ChangelogSpec,
    generate_changelog,
    write_segments,
)
from datacollector_spark.streaming import CdcIngestPipeline


def _final(table: LakeTable, cols=None) -> pd.DataFrame:
    cols = cols or PAYLOAD_COLUMNS
    return (
        table.read().select(*cols).orderBy(*KEY_COLUMNS).toPandas().reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def seg_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    spec = ChangelogSpec(n_events=12_000, n_conversations=120, seed=7)
    df = generate_changelog(spark, spec)
    src = str(root / "segments")
    write_segments(df, src, n_segments=12)
    oracle = apply_sequential(df.drop("delivery_pos").toPandas(), PAYLOAD_COLUMNS)
    return src, oracle, root


def test_available_now_drain_matches_oracle(spark, seg_data, tmp_path):
    src, oracle, _ = seg_data
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=8
    )
    pipe = CdcIngestPipeline(
        spark,
        src,
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
        lineage_dir=str(tmp_path / "lineage"),
    )
    pipe.run_available_now(timeout_s=300)
    assert pipe.batches_applied >= 3  # really micro-batched, not one gulp
    assert_frame_equal(_final(table.refresh()), oracle, check_dtype=False)
    # lineage written: batch rows + per-bucket rows
    lin = spark.read.parquet(str(tmp_path / "lineage"))
    assert lin.where(F.col("bucket").isNull()).count() == pipe.batches_applied
    assert lin.where(F.col("bucket").isNotNull()).count() > 0
    total_src = (
        lin.where(F.col("bucket").isNull()).agg(F.sum("rows_source")).collect()[0][0]
    )
    assert total_src > 0


class _Boom(Exception):
    pass


def test_kill_restart_exactly_once(spark, seg_data, tmp_path):
    """Crash AFTER the table commit but BEFORE the streaming checkpoint
    advances — the window where at-least-once engines double-apply. On
    restart Spark replays the same batch_id; the commit key makes it a
    no-op and the final state still equals the oracle."""
    src, oracle, _ = seg_data
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=8
    )
    ckpt = str(tmp_path / "ckpt")

    def bomb(pipe, batch_id):
        if pipe.batches_applied == 2:
            raise _Boom("injected crash after commit, before checkpoint")

    pipe = CdcIngestPipeline(spark, src, table, ckpt, max_files_per_trigger=3)
    pipe.on_batch_applied = bomb
    with pytest.raises(Exception):
        pipe.run_available_now(timeout_s=300)
    v_after_crash = table.refresh().version
    assert v_after_crash >= 2

    pipe2 = CdcIngestPipeline(spark, src, table.refresh(), ckpt, max_files_per_trigger=3)
    pipe2.run_available_now(timeout_s=300)
    # the replayed micro-batch must not have produced a new snapshot beyond
    # its original commit: committed_keys dedupe turned it into a noop
    lineage = table.refresh().lineage
    assert any(e["noop"] for e in lineage) or table.version > v_after_crash
    assert_frame_equal(_final(table), oracle, check_dtype=False)


def test_schema_evolution_midstream(spark, tmp_path):
    """Phase 1 streams the base schema; phase 2 restarts with an evolved
    source schema (new tool_variant column). The sink ALTER-ADDs the column;
    pre-evolution rows read back NULL (FIXTURES.md F5)."""
    spec = ChangelogSpec(n_events=4_000, n_conversations=60, seed=11)
    df = generate_changelog(spark, spec)
    evolved_full = df.withColumn(
        "tool_variant",
        F.when(F.col("lsn") >= 2_000, F.concat(F.lit("variant-"), F.col("tool"))),
    )
    src1 = str(tmp_path / "seg1")
    src2 = str(tmp_path / "seg2")
    write_segments(
        evolved_full.where(F.col("lsn") < 2_000), src1, 4, drop_columns=["tool_variant"]
    )
    write_segments(evolved_full.where(F.col("lsn") >= 2_000), src2, 4)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=8
    )
    # phase 1: base schema over a union glob dir layout — stream src1 only
    pipe1 = CdcIngestPipeline(spark, src1, table, str(tmp_path / "c1"))
    pipe1.run_available_now(timeout_s=300)
    assert "tool_variant" not in table.schema.fieldNames()

    evolved_schema = changelog_schema(
        [T.StructField("tool_variant", T.StringType(), True)]
    )
    pipe2 = CdcIngestPipeline(
        spark, src2, table.refresh(), str(tmp_path / "c2"), source_schema=evolved_schema
    )
    pipe2.run_available_now(timeout_s=300)
    table.refresh()
    assert "tool_variant" in table.schema.fieldNames()

    cols = PAYLOAD_COLUMNS + ["tool_variant"]
    got = _final(table, cols)
    pdf = evolved_full.drop("delivery_pos").toPandas()
    expect = apply_sequential(pdf, cols)
    assert_frame_equal(got, expect, check_dtype=False)
    # rows whose last write predates the DDL must read back NULL
    last_write = (
        pdf.drop_duplicates(["lsn", "seq_in_tx"]).sort_values(["lsn", "seq_in_tx"])
        .groupby(KEY_COLUMNS).tail(1)
    )
    pre_ddl_live = last_write[(last_write["op"] != 2) & (last_write["lsn"] < 2_000)]
    if len(pre_ddl_live):
        assert got["tool_variant"].isna().sum() >= len(pre_ddl_live)


def test_transforms_in_pipeline(spark, tmp_path):
    """Masking + normalization run inside the micro-batch, vectorized."""
    from datacollector_spark.operators.transforms import transcript_transforms

    rows = [
        (1, 1, 0, "c1", 0, "Human", "mail me at bob@example.com", "", None),
        (1, 2, 0, "c1", 1, "AI", "card 12345678901 ok", "SearchTool ", None),
    ]
    import datetime as dt

    data = [r[:9] + (dt.datetime(2025, 1, 1),) for r in [x + (None,) for x in rows]]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7] or None, dt.datetime(2025, 1, 1)) for r in rows],
        "op int, lsn long, seq_in_tx int, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )
    src = str(tmp_path / "seg")
    df.withColumn("delivery_pos", F.col("lsn")).repartition(1).write.parquet(src)

    schema = df.schema.add("delivery_pos", T.LongType())
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=4
    )
    pipe = CdcIngestPipeline(
        spark,
        src,
        table,
        str(tmp_path / "c"),
        source_schema=schema,
        transforms=transcript_transforms,
    )
    pipe.run_available_now(timeout_s=300)
    got = _final(table.refresh())
    assert got["role"].tolist() == ["user", "assistant"]
    assert got["text"].tolist() == ["mail me at <email>", "card <num> ok"]
    assert got["tool"].tolist()[0] is None or pd.isna(got["tool"].tolist()[0])
    assert got["tool"].tolist()[1] == "searchtool"


def test_continuous_trigger_tails_new_segments(spark, tmp_path):
    """Production mode: processing-time trigger tails the directory; a
    segment written AFTER the stream starts is applied without restart."""
    import time

    from datacollector_spark.sources.generator import ChangelogSpec, generate_changelog

    df = generate_changelog(spark, ChangelogSpec(n_events=2000, n_conversations=30, seed=3))
    base = df.drop("delivery_pos")
    src = str(tmp_path / "seg")
    base.where("lsn < 1000").coalesce(1).write.mode("append").parquet(src)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=4
    )
    pipe = CdcIngestPipeline(
        spark, src, table, str(tmp_path / "ckpt"),
        source_schema=base.schema, max_files_per_trigger=4,
    )
    q = pipe.run_continuous("1 seconds")
    try:
        deadline = time.time() + 90
        while pipe.batches_applied < 1 and time.time() < deadline:
            time.sleep(1)
        assert pipe.batches_applied >= 1
        n1 = table.refresh().read().count()
        base.where("lsn >= 1000").coalesce(1).write.mode("append").parquet(src)
        deadline = time.time() + 90
        while time.time() < deadline:
            if table.refresh().read().count() > n1:
                break
            time.sleep(1)
        assert table.refresh().read().count() > n1
    finally:
        q.stop()


def test_kill_restart_exactly_once_mor(spark, seg_data, tmp_path):
    """Same crash window as test_kill_restart_exactly_once but in
    merge-on-read mode: a replayed delta APPEND would double rows if the
    commit key failed, and the read-side LWW must still resolve the final
    state; compaction afterwards must not change it."""
    src, oracle, _ = seg_data
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=8
    )
    ckpt = str(tmp_path / "ckpt")

    def bomb(pipe, batch_id):
        if pipe.batches_applied == 2:
            raise _Boom("injected crash after commit, before checkpoint")

    pipe = CdcIngestPipeline(
        spark, src, table, ckpt, max_files_per_trigger=3, merge_mode="mor"
    )
    pipe.on_batch_applied = bomb
    with pytest.raises(Exception):
        pipe.run_available_now(timeout_s=300)

    pipe2 = CdcIngestPipeline(
        spark, src, table.refresh(), ckpt, max_files_per_trigger=3, merge_mode="mor"
    )
    pipe2.run_available_now(timeout_s=300)
    assert_frame_equal(_final(table.refresh()), oracle, check_dtype=False)
    table.compact_deltas()
    assert table.delta_file_count() == 0
    assert_frame_equal(_final(table), oracle, check_dtype=False)
