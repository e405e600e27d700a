"""Deterministic, distributed synthetic changelog generator.

Plays the role of the reference's dev origins
(dev-lib/.../devtest/RandomDataGeneratorSource.java — deterministic test
source) combined with the binlog event shape produced by the MySQL binlog
origin (mysql-binlog-lib/.../origin/mysql/RecordConverter.java:44-56). The
emitted "segment" parquet files model binlog files: (segment, position)
encodes the monotone LSN, exactly like the reference's
BinLogPositionSourceOffset.java:34 (file:pos offsets).

Scale design: the generator is pure columnar Spark — ``spark.range(E)``
plus seeded-hash arithmetic — so the same code that makes 10^4 test events
makes the 10^10-event design point without a driver-side loop. Determinism
comes from ``xxhash64(event_index, salt)``: every field is a pure function
of (seed, index), independent of partitioning, task order, or cluster size.

Delivery corruption (FIXTURES.md F2) is injected here:
  * duplicates (~2%): the same (lsn, seq_in_tx) event emitted twice —
    models the reference's incomplete-transaction redelivery
    (BinaryLogConsumer.java:148-155);
  * out-of-order (~10%): a bounded forward displacement of the delivery
    position, so physical segment order != LSN order;
  * deletes (~1%) and later re-inserts (LWW + tombstone ordering).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datacollector_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE

_MASK53 = (1 << 53) - 1
_EPOCH = "2025-01-01 00:00:00"


def _uniform(idx: Column, salt: int, seed: int) -> Column:
    """Deterministic U(0,1) from an event index — xxhash64 folded to 53 bits.

    The same (seed, salt, idx) always yields the same value on any cluster.
    """
    h = F.xxhash64(idx, F.lit(salt), F.lit(seed))
    return (h.bitwiseAND(F.lit(_MASK53))).cast("double") / F.lit(float(1 << 53))


def _zipf_index(u: Column, n: int, exponent: float) -> Column:
    """Bounded-Pareto inverse CDF — continuous Zipf over [1, n], floor'd.

    P(k) ~ k^-s. Gives the hot-conversation skew the north rule requires the
    engine to survive (a few conv_ids receive a large share of events).
    """
    s = exponent
    if abs(s - 1.0) < 1e-9:
        s = 1.0000001
    one_minus_s = 1.0 - s
    n_pow = float(n) ** one_minus_s
    # x = (1 - u (1 - n^(1-s)))^(1/(1-s)), x in [1, n]
    x = F.pow(F.lit(1.0) - u * F.lit(1.0 - n_pow), F.lit(1.0 / one_minus_s))
    return F.least(F.floor(x).cast("long"), F.lit(n)) - F.lit(1)


@dataclass
class ChangelogSpec:
    """Seeded knobs (FIXTURES.md F2 'Generator knobs')."""

    n_events: int = 10_000
    n_conversations: int = 200
    seed: int = 42
    zipf_exponent: float = 1.2
    mean_turns: float = 20.0  # geometric turn_idx, mean turns per conversation
    duplicate_fraction: float = 0.02
    out_of_order_fraction: float = 0.10
    out_of_order_window: int = 500  # max forward displacement in positions
    delete_fraction: float = 0.01
    tx_size: int = 50  # events per pseudo-transaction (drives seq_in_tx)
    n_servers: int = 4
    # pad text to at least this many chars (0 = tiny version-stamped text).
    # Real transcript turns run 100s-1000s of bytes; benches use ~512 so
    # compute density is representative, tests keep 0 for speed.
    min_text_chars: int = 0


def generate_changelog(spark: SparkSession, spec: ChangelogSpec) -> DataFrame:
    """Emit ``spec.n_events`` change events in the FIXTURES.md F2 envelope,
    plus a ``delivery_pos`` column (physical delivery order, != lsn order for
    the out-of-order fraction) used by :func:`write_segments`.

    lsn is unique per logical event; duplicates share (lsn, seq_in_tx).
    """
    base = spark.range(0, spec.n_events, 1).withColumnRenamed("id", "i")
    i = F.col("i")
    sd = spec.seed

    u_conv = _uniform(i, 1, sd)
    u_turn = _uniform(i, 2, sd)
    u_op = _uniform(i, 3, sd)
    u_dup = _uniform(i, 4, sd)
    u_ooo = _uniform(i, 5, sd)
    u_disp = _uniform(i, 6, sd)
    u_role = _uniform(i, 7, sd)
    u_tool = _uniform(i, 8, sd)

    conv_idx = _zipf_index(u_conv, spec.n_conversations, spec.zipf_exponent)
    # geometric turn index with mean spec.mean_turns
    p = 1.0 / spec.mean_turns
    turn_idx = F.least(
        F.floor(F.log(F.lit(1.0) - u_turn) / F.lit(math.log(1.0 - p))).cast("int"),
        F.lit(500),
    )

    op = (
        F.when(u_op < spec.delete_fraction, F.lit(OP_DELETE))
        .when(u_op < spec.delete_fraction + 0.60, F.lit(OP_INSERT))
        .otherwise(F.lit(OP_UPDATE))
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.floor(u_role * 4) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool-"), F.floor(u_tool * 16).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    conv_id = F.concat(F.lit("conv-"), F.lpad(conv_idx.cast("string"), 8, "0"))
    lsn = i  # unique, monotone in generation order
    # text is version-stamped with the lsn so LWW mistakes are visible
    text = F.concat_ws(
        "-", F.lit("text"), conv_id, turn_idx.cast("string"), F.lit("v"), lsn.cast("string")
    )
    if spec.min_text_chars > 0:
        filler = (
            " the assistant considered the request and produced a detailed"
            " answer citing the relevant context and tools"
        )
        text = F.rpad(text, spec.min_text_chars, filler)
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(_EPOCH)) + i)

    df = base.select(
        op.alias("op"),
        lsn.cast("long").alias("lsn"),
        (i % spec.tx_size).cast("int").alias("seq_in_tx"),
        F.lit("transcripts").alias("src_table"),
        (F.pmod(F.xxhash64(i, F.lit(9), F.lit(sd)), F.lit(spec.n_servers)) + 1)
        .cast("long")
        .alias("server_id"),
        ts.alias("commit_ts"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        # before-image: synthetic but shape-faithful (RecordConverter.java:161-182)
        F.when(op != OP_INSERT, role).alias("old_role"),
        F.when(op != OP_INSERT, F.concat(F.lit("old-"), text)).alias("old_text"),
        F.when(op != OP_INSERT, tool).alias("old_tool"),
        F.when(op != OP_INSERT, ts - F.expr("INTERVAL 1 MINUTE")).alias("old_ts"),
        u_dup.alias("_u_dup"),
        u_ooo.alias("_u_ooo"),
        u_disp.alias("_u_disp"),
    )

    # out-of-order: displace delivery position forward within a bounded window
    displacement = F.when(
        F.col("_u_ooo") < spec.out_of_order_fraction,
        F.floor(F.col("_u_disp") * spec.out_of_order_window).cast("long"),
    ).otherwise(F.lit(0))
    df = df.withColumn(
        "delivery_pos", (F.col("lsn") + displacement) * 4 + F.lit(0)
    )

    # duplicates: re-emit a fraction with the same (lsn, seq_in_tx), delivered
    # slightly later (the replayed slice of a partially-consumed transaction)
    dups = (
        df.where(F.col("_u_dup") < spec.duplicate_fraction)
        .withColumn(
            "delivery_pos",
            F.col("delivery_pos")
            + 4 * F.floor(F.col("_u_disp") * spec.out_of_order_window).cast("long")
            + F.lit(1),
        )
    )
    out = df.unionByName(dups).drop("_u_dup", "_u_ooo", "_u_disp")
    return out


def write_segments(
    df: DataFrame,
    path: str,
    n_segments: int = 16,
    drop_columns: list[str] | None = None,
) -> None:
    """Write the changelog as ordered parquet 'binlog segment' files.

    Range-partitions by delivery position so each output file is one
    contiguous delivery window (a binlog file); within a file, rows are
    sorted by delivery order. ``drop_columns`` lets schema-evolution tests
    write pre-DDL segments without the evolved columns.
    """
    out = df
    if drop_columns:
        out = out.drop(*drop_columns)
    (
        out.repartitionByRange(n_segments, "delivery_pos")
        .sortWithinPartitions("delivery_pos")
        .drop("delivery_pos")
        .write.mode("overwrite")
        .parquet(path)
    )
