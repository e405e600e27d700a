"""Spark-independent oracle: sequential CDC apply in pandas.

FIXTURES.md F3 — the expected final table state is computed WITHOUT Spark:
deduplicate the changelog on (lsn, seq_in_tx), sort by that total order, and
apply events one at a time (insert/overwrite on op in {1,3,4}, drop on op=2).
The engine's distributed LWW collapse + MERGE must reproduce this exactly.

Mirrors the per-field equality assertions the reference uses in its CDC tests
(mysql-binlog-lib/src/test/.../AbstractMysqlSource.java:145-179).
"""

from __future__ import annotations

import pandas as pd

from datacollector_spark.model import KEY_COLUMNS, OP_DELETE


def apply_sequential(
    changelog: pd.DataFrame,
    payload_columns: list[str],
    key_columns: list[str] | None = None,
) -> pd.DataFrame:
    """Apply a changelog sequentially; return the final table state sorted by
    key. Duplicate (lsn, seq_in_tx) deliveries are dropped first (the replay
    dedupe the reference does in BinaryLogConsumer.java:148-155)."""
    keys = key_columns or KEY_COLUMNS
    df = (
        changelog.drop_duplicates(subset=["lsn", "seq_in_tx"], keep="first")
        .sort_values(["lsn", "seq_in_tx"], kind="mergesort")
        .reset_index(drop=True)
    )
    # sequential apply == last event per key wins (total order), delete drops
    last = df.groupby(keys, as_index=False, sort=False).tail(1)
    final = last[last["op"] != OP_DELETE]
    return (
        final[payload_columns]
        .sort_values(keys, kind="mergesort")
        .reset_index(drop=True)
    )
