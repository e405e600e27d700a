"""Property-based replay equality: arbitrary changelogs (random ops, key
collisions, duplicate deliveries, arbitrary batch splits) must produce the
same final state as the sequential oracle. The reference has no
property-based coverage (SURVEY §5) — this is the upgrade."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pandas.testing import assert_frame_equal

from datacollector_spark.lake import LakeTable
from datacollector_spark.model import KEY_COLUMNS, transcripts_schema
from datacollector_spark.operators.collapse import lww_collapse
from datacollector_spark.oracle import apply_sequential

_T0 = dt.datetime(2025, 1, 1)

events = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3, 4]),          # op (incl. UPSERT=4)
        st.integers(0, 3),                      # conv
        st.integers(0, 3),                      # turn
    ),
    min_size=1,
    max_size=60,
)
splits = st.lists(st.integers(1, 6), min_size=1, max_size=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events, batch_sizes=splits, data=st.data())
def test_random_changelog_replay_equals_oracle(spark, tmp_path_factory, evs, batch_sizes, data):
    _run_replay(spark, tmp_path_factory, evs, batch_sizes, data, mode="cow")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events, batch_sizes=splits, data=st.data())
def test_random_changelog_replay_equals_oracle_mor(
    spark, tmp_path_factory, evs, batch_sizes, data
):
    # merge-on-read path under the same adversarial inputs, with a mid-run
    # compaction thrown in
    _run_replay(spark, tmp_path_factory, evs, batch_sizes, data, mode="mor")


def _run_replay(spark, tmp_path_factory, evs, batch_sizes, data, mode):
    rows = []
    for lsn, (op, conv, turn) in enumerate(evs):
        rows.append(
            (
                op,
                lsn,
                lsn % 5,
                f"c{conv}",
                turn,
                "user",
                f"t-{conv}-{turn}-v{lsn}",
                None,
                _T0,
            )
        )
    # duplicate a random subset (same lsn/seq) and shuffle delivery order
    dup_idx = data.draw(
        st.lists(st.integers(0, len(rows) - 1), max_size=5, unique=True)
    )
    delivered = rows + [rows[i] for i in dup_idx]
    perm = data.draw(st.permutations(range(len(delivered))))
    delivered = [delivered[i] for i in perm]

    schema = (
        "op int, lsn long, seq_in_tx int, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp"
    )
    pdf = pd.DataFrame(
        delivered,
        columns=["op", "lsn", "seq_in_tx", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    expect = apply_sequential(pdf, ["conv_id", "turn_idx", "text"])

    table = LakeTable.create(
        spark,
        str(tmp_path_factory.mktemp("prop") / "t"),
        transcripts_schema(),
        KEY_COLUMNS,
        num_buckets=4,
    )
    i, b = 0, 0
    while i < len(delivered):
        size = batch_sizes[b % len(batch_sizes)] * 5
        batch = delivered[i : i + size]
        i += size
        df = spark.createDataFrame(batch, schema)
        table.merge(lww_collapse(df), commit_key=f"b{b}", mode=mode)
        if mode == "mor" and b == 1:
            table.compact_deltas()
        b += 1

    got = (
        table.read()
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert_frame_equal(got, expect, check_dtype=False)
