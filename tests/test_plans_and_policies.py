"""Pipeline-spec validation/build, late-record policy, data rules, and the
spark-submit packaging contract."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datacollector_spark.lake import LakeTable
from datacollector_spark.model import KEY_COLUMNS, transcripts_schema
from datacollector_spark.plans import PipelineSpec, ValidationError
from datacollector_spark.streaming import CdcIngestPipeline
from datacollector_spark.streaming.pipeline import DataRule


def test_spec_validation_errors():
    with pytest.raises(ValidationError, match="VALIDATION_0001"):
        PipelineSpec({"stages": []})
    with pytest.raises(ValidationError, match="VALIDATION_0006"):
        PipelineSpec({"stages": [{"name": "x", "type": "nope"}]})
    with pytest.raises(ValidationError, match="VALIDATION_0005"):
        PipelineSpec(
            {
                "stages": [
                    {"name": "m", "type": "field_masker", "in": "ghost", "columns": ["a"]}
                ]
            }
        )
    with pytest.raises(ValidationError, match="VALIDATION_0003"):
        PipelineSpec(
            {
                "stages": [
                    {"name": "s", "type": "parquet_origin", "path": "/x", "out": "main"},
                    {"name": "m", "type": "field_masker", "in": "main"},
                ]
            }
        )


def test_spec_build_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "error", "secret-1"), (2, "click", "hello"), (3, "error", "boom")],
        "id int, event_type string, text string",
    ).write.parquet(src)
    spec = PipelineSpec(
        {
            "pipeline": "demo",
            "stages": [
                {"name": "src", "type": "parquet_origin", "path": src, "out": "main"},
                {
                    "name": "sel",
                    "type": "stream_selector",
                    "in": "main",
                    "conditions": [["errors", "event_type = 'error'"]],
                    "default_lane": "ok",
                },
                {
                    "name": "mask",
                    "type": "field_masker",
                    "in": "ok",
                    "columns": ["text"],
                    "mask_type": "VARIABLE_LENGTH",
                    "out": "masked",
                },
                {"name": "sink", "type": "memory_target", "in": "masked"},
            ],
        }
    )
    lanes = spec.build(spark)
    assert lanes["errors"].count() == 2
    got = lanes["sink"].first()
    assert got["text"] == "xxxxx"


def _mk_changelog_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "op int, lsn long, seq_in_tx int, commit_ts timestamp, conv_id string, "
        "turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_late_records_split_and_rules(spark, tmp_path):
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def row(lsn, ts_off, conv="c1", turn=0, text="x"):
        ts = t0 + dt.timedelta(seconds=ts_off)
        return (1, lsn, 0, ts, conv, turn, "user", text, None, ts)

    # batch 1 establishes the watermark; batch 2 has one very-late event
    b1 = [row(1, 0, turn=0), row(2, 1000, turn=1)]
    b2 = [row(3, 1010, turn=2), row(4, -5000, turn=3, text="too-late")]
    src = str(tmp_path / "seg")
    _mk_changelog_df(spark, b1).coalesce(1).write.mode("append").parquet(src)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=4
    )
    late_dir = str(tmp_path / "late")
    pipe = CdcIngestPipeline(
        spark,
        src,
        table,
        str(tmp_path / "ckpt"),
        source_schema=_mk_changelog_df(spark, b1).schema,
        late_limit_s=3600,
        late_dir=late_dir,
        data_rules=[DataRule("deletes_present", "op = 2", min_count=1)],
        max_files_per_trigger=1,
    )
    pipe.run_available_now(timeout_s=120)
    _mk_changelog_df(spark, b2).coalesce(1).write.mode("append").parquet(src)
    pipe2 = CdcIngestPipeline(
        spark,
        src,
        table.refresh(),
        str(tmp_path / "ckpt"),
        source_schema=_mk_changelog_df(spark, b1).schema,
        late_limit_s=3600,
        late_dir=late_dir,
        data_rules=[DataRule("inserts", "op = 1", min_count=1)],
        max_files_per_trigger=1,
    )
    pipe2._watermark = t0 + dt.timedelta(seconds=1000 - 3600)
    pipe2.run_available_now(timeout_s=120)

    final = table.refresh().read().toPandas()
    assert "too-late" not in set(final["text"])
    late = spark.read.parquet(late_dir).toPandas()
    assert set(late["text"]) == {"too-late"}
    assert any(a["rule"] == "inserts" for a in pipe2.alerts)


def test_spark_submit_py_files_launch(spark, tmp_path):
    """The north-star launch contract: package the engine as a zip, launch
    jobs/run_pipeline.py through spark-submit --py-files, assert the
    pipeline applies the changelog."""
    import os
    import shutil
    import subprocess
    import sys

    from datacollector_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
        write_segments,
    )
    from tools.package import build

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not (spark_submit and os.path.exists(spark_submit)) and os.path.exists(cand):
        spark_submit = cand
    if not (spark_submit and os.path.exists(spark_submit)):
        pytest.skip("spark-submit not found")

    seg = str(tmp_path / "seg")
    write_segments(
        generate_changelog(spark, ChangelogSpec(n_events=2000, n_conversations=30)),
        seg,
        4,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = build(str(tmp_path / "dist" / "datacollector_spark.zip"))
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(repo, "jobs", "run_pipeline.py"),
            "--segments",
            seg,
            "--table",
            str(tmp_path / "table"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
            "--buckets",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("PIPELINE_RESULT ")]
    assert line, proc.stdout[-2000:]
    import json

    res = json.loads(line[0][len("PIPELINE_RESULT "):])
    assert res["rows"] > 0 and res["batches"] >= 1
