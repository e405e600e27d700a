"""Last-writer-wins collapse of a change-event micro-batch.

The distributed generalization of two reference behaviors:
  * the Record Deduplicator (basic-lib/.../dedup/DeDupProcessor.java:122-143)
    — exact-duplicate suppression; and
  * GTID incomplete-transaction replay skip
    (mysql-binlog-lib/.../BinaryLogConsumer.java:148-155) — at-least-once
    delivery collapsed to effectively-once per key.

Expressed as a hash aggregation so Spark's partial/final split gives
map-side combine for free: duplicates and multiple updates to the same
(conv_id, turn_idx) collapse BEFORE the shuffle, which is what keeps the
shuffle volume proportional to distinct keys — not events — at 10^10 scale.

Skew: for hot keys (a conversation with a very long tail of updates to the
same turn), partial aggregation already absorbs most of the skew. The salted
two-phase variant adds an explicit pre-shuffle spreading for adversarial
cases where one (conv_id, turn_idx) receives a large share of all events in
a micro-batch (north rule: 'salted repartitioning to break hot-conversation
skew').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacollector_spark.model import KEY_COLUMNS


def lww_collapse(
    df: DataFrame,
    key_columns: list[str] | None = None,
    order_columns: tuple[str, str] = ("lsn", "seq_in_tx"),
    carry_columns: list[str] | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Collapse to one row per key: the row with the max (lsn, seq_in_tx).

    ``carry_columns`` — columns to carry through (defaults to every non-key
    column). Exact duplicates (same total-order coordinates) collapse
    trivially because max_by picks one of the identical rows.

    ``salt_buckets`` — if set, runs a two-phase collapse: first
    groupBy(key, salt) with a deterministic salt spread over N buckets,
    then the final groupBy(key). Use for adversarially hot keys.
    """
    keys = key_columns or KEY_COLUMNS
    carries = carry_columns or [c for c in df.columns if c not in keys]
    lsn_col, seq_col = order_columns
    for oc in (lsn_col, seq_col):
        if oc not in carries:
            carries = carries + [oc]

    payload = F.struct(*[F.col(c) for c in carries])
    order = F.struct(F.col(lsn_col), F.col(seq_col))

    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(lsn_col), F.col(seq_col)), F.lit(salt_buckets))
        partial = (
            df.groupBy(*keys, salt.alias("_salt"))
            .agg(F.max_by(payload, order).alias("_p"))
            .select(*keys, "_p.*")
        )
        df = partial

    collapsed = (
        df.groupBy(*keys)
        .agg(F.max_by(payload, F.struct(F.col(lsn_col), F.col(seq_col))).alias("_p"))
        .select(*keys, "_p.*")
    )
    return collapsed
