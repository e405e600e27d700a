"""Snapshot expiration: old version files are deleted, current state and the
exactly-once replay window survive."""

from __future__ import annotations

import os

from pandas.testing import assert_frame_equal
from pyspark.sql import functions as F

from datacollector_spark.lake import LakeTable
from datacollector_spark.model import KEY_COLUMNS, transcripts_schema
from datacollector_spark.operators.collapse import lww_collapse
from datacollector_spark.sources.generator import ChangelogSpec, generate_changelog


def _parquet_count(root):
    n = 0
    for dirpath, _d, files in os.walk(os.path.join(root, "data")):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_expire_snapshots_keeps_state(spark, tmp_path):
    df = generate_changelog(
        spark, ChangelogSpec(n_events=3000, n_conversations=50, seed=5)
    ).drop("delivery_pos")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), transcripts_schema(), KEY_COLUMNS, num_buckets=4
    )
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        batch = df.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        table.merge(lww_collapse(batch), commit_key=f"b{i}")
    files_before = _parquet_count(str(tmp_path / "t"))
    before = table.read().orderBy(*KEY_COLUMNS).toPandas()

    deleted = table.expire_snapshots(keep_last=1)
    assert deleted > 0
    assert _parquet_count(str(tmp_path / "t")) < files_before
    after = table.read().orderBy(*KEY_COLUMNS).toPandas()
    assert_frame_equal(before, after, check_dtype=False)
    # commit keys survive expiration (exactly-once across restarts intact)
    assert table.committed("b1")
    # current snapshot still loadable from a fresh handle
    fresh = LakeTable(spark, str(tmp_path / "t"))
    assert fresh.version == table.version
