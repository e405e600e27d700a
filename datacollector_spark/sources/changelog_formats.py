"""Changelog-format decoders: vendor CDC envelopes -> the engine's envelope.

The reference's JDBC producer can decode four change-log formats into
op + row data (jdbc-lib/.../lib/jdbc/ChangeLogFormat.java:25-29, readers
JdbcMySqlBinLogRecordReader / JdbcOracleCDCRecordReader /
JdbcMicrosoftRecordReader / JdbcMongoDBOplogRecordReader). Here each decoder
is a columnar `from_json` projection from the vendor JSON into the FIXTURES
F2 envelope columns (op, lsn, seq_in_tx, payload...).

Op-code mappings mirror the readers:
  * MySQL binlog: Type INSERT/UPDATE/DELETE; Data = after-image, OldData =
    before-image (RecordConverter.java:44-56)
  * Oracle CDC: operation code already numeric (OperationType.java)
  * Mongo oplog: op i/u/d (JdbcMongoDBOplogRecordReader)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacollector_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE

_MYSQL_SCHEMA = (
    "Type STRING, Database STRING, Table STRING, ServerId BIGINT, "
    "Timestamp BIGINT, BinLogFilename STRING, BinLogPosition BIGINT, "
    "GTID STRING, SeqNo INT, Data MAP<STRING,STRING>, OldData MAP<STRING,STRING>"
)

_ORACLE_SCHEMA = (
    "OPERATION INT, SCN BIGINT, SEQ INT, TABLE_NAME STRING, "
    "TIMESTAMP BIGINT, DATA MAP<STRING,STRING>, BEFORE MAP<STRING,STRING>"
)

_MONGO_SCHEMA = (
    "op STRING, ts BIGINT, h BIGINT, ns STRING, o MAP<STRING,STRING>, "
    "o2 MAP<STRING,STRING>"
)

_TYPE_TO_OP = {
    "INSERT": OP_INSERT,
    "UPDATE": OP_UPDATE,
    "DELETE": OP_DELETE,
}


def _op_from_type(col):
    return (
        F.when(col == "INSERT", OP_INSERT)
        .when(col == "UPDATE", OP_UPDATE)
        .when(col == "DELETE", OP_DELETE)
        .otherwise(5)
        .cast("int")
    )


def decode_mysql_binlog(df: DataFrame, json_col: str, lsn_bits: int = 32) -> DataFrame:
    """MySQL binlog JSON -> envelope. LSN = (file index << bits) | position
    — the monotone encoding of the reference's file:pos offsets
    (BinLogPositionSourceOffset.java:34); file index = trailing digits of
    the binlog filename (mysql-bin.000007 -> 7).

    The collapse/merge packed order (lsn<<16 | seq) needs lsn < 2^47, so
    the LSN budget is file_idx < 2^(47-lsn_bits) and position < 2^lsn_bits.
    The default 32 position bits cover max_binlog_size (1 GiB, < 2^31) with
    headroom and leave 15 bits = 32768 binlog rotations; both bounds are
    enforced distributively — an out-of-range offset raises instead of
    silently overflowing into wrong LWW winners."""
    r = F.from_json(F.col(json_col), _MYSQL_SCHEMA)
    file_idx = F.regexp_extract(r["BinLogFilename"], r"(\d+)$", 1).cast("long")
    pos = r["BinLogPosition"]
    lsn = F.shiftleft(file_idx, lsn_bits) + pos
    max_idx = 1 << (47 - lsn_bits)
    lsn_checked = F.when(
        (file_idx < max_idx) & (pos >= 0) & (pos < F.lit(1 << lsn_bits).cast("long")),
        lsn,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"binlog offset out of LSN budget (file_idx < {max_idx}, "
                    f"position < 2^{lsn_bits}): "
                ),
                r["BinLogFilename"],
                F.lit(":"),
                pos.cast("string"),
            )
        ).cast("long")
    )
    return df.select(
        _op_from_type(r["Type"]).alias("op"),
        lsn_checked.alias("lsn"),
        F.coalesce(r["SeqNo"], F.lit(0)).cast("int").alias("seq_in_tx"),
        r["Table"].alias("src_table"),
        r["ServerId"].alias("server_id"),
        F.timestamp_millis(r["Timestamp"]).alias("commit_ts"),
        r["Data"].alias("data"),
        r["OldData"].alias("old_data"),
    )


def decode_oracle_cdc(df: DataFrame, json_col: str) -> DataFrame:
    """Oracle CDC (LogMiner) JSON -> envelope. lsn = SCN, seq_in_tx = SEQ;
    the downstream packed order (lsn<<16 | seq, operators/collapse.py)
    reproduces the reference's SCN::seq offset (OracleCDCSource.java:158)
    EXACTLY ONCE — packing SCN<<16|SEQ here and again downstream would
    overflow int64 for SCN >= 2^31 and silently corrupt LWW winners.

    Budget guards (raise instead of silently-wrong ordering, same contract
    as decode_mysql_binlog): SCN < 2^47 (Oracle SCNs are 48-bit; a real SCN
    hits 2^47 only after ~4000 years at 1M SCN/s) and SEQ < 2^16 (one
    redo-record sequence per statement; a transaction touching one row
    >65535 times within a single SCN needs a wider packing)."""
    r = F.from_json(F.col(json_col), _ORACLE_SCHEMA)
    scn, seq = r["SCN"], r["SEQ"]
    lsn_checked = F.when(
        (scn >= 0) & (scn < F.lit(1 << 47).cast("long")), scn
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("oracle SCN out of LSN budget (< 2^47): "), scn.cast("string"))
        ).cast("long")
    )
    seq_checked = F.when(
        seq.isNull() | ((seq >= 0) & (seq < (1 << 16))), F.coalesce(seq, F.lit(0))
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("oracle SEQ out of seq budget (< 2^16): "), seq.cast("string"))
        ).cast("int")
    )
    return df.select(
        r["OPERATION"].cast("int").alias("op"),
        lsn_checked.alias("lsn"),
        seq_checked.cast("int").alias("seq_in_tx"),
        r["TABLE_NAME"].alias("src_table"),
        F.lit(None).cast("long").alias("server_id"),
        F.timestamp_millis(r["TIMESTAMP"]).alias("commit_ts"),
        r["DATA"].alias("data"),
        r["BEFORE"].alias("old_data"),
    )


def decode_mongo_oplog(df: DataFrame, json_col: str) -> DataFrame:
    """Mongo oplog JSON -> envelope. op i/u/d; ts is a packed BSON Timestamp
    (seconds<<32 | ordinal), a monotone total order — but at ~2^62 for
    current wall clocks it blows the engine's lsn < 2^47 packing budget, so
    it is RESCALED into (lsn, seq_in_tx) losslessly: lsn = ts >> 16,
    seq_in_tx = ts & 0xFFFF. The downstream packed order
    (lsn<<16 | seq, operators/collapse.py) then reconstructs the exact BSON
    ts, so cross-batch LWW ordering equals oplog ordering bit-for-bit, and
    lsn = ts>>16 < 2^47 holds for every non-negative int64 ts. Negative ts
    (corrupt oplog entry) raises instead of silently mis-ordering.

    For updates the oplog splits the record: 'o2' carries the row key and
    'o' the modification document, so data = o overlaid with o2 (key fields
    always win — JdbcMongoDBOplogRecordReader reads the key from o2). The
    decoder assumes full-document 'o' images (replacement-style updates);
    operator documents ({$set: ...}) carry nested structure a flat
    MAP<STRING,STRING> cannot represent and must be decoded upstream."""
    r = F.from_json(F.col(json_col), _MONGO_SCHEMA)
    op = (
        F.when(r["op"] == "i", OP_INSERT)
        .when(r["op"] == "u", OP_UPDATE)
        .when(r["op"] == "d", OP_DELETE)
        .otherwise(5)
        .cast("int")
    )
    o, o2 = r["o"], r["o2"]
    # o2 overlays o: strip o2's keys from o, then concat (no dup-key error)
    o_minus_o2 = F.map_filter(
        o, lambda k, _v: ~F.coalesce(F.array_contains(F.map_keys(o2), k), F.lit(False))
    )
    merged = F.map_concat(F.coalesce(o_minus_o2, F.create_map()), F.coalesce(o2, F.create_map()))
    ts = r["ts"]
    lsn_checked = F.when(ts >= 0, F.shiftrightunsigned(ts, 16)).otherwise(
        F.raise_error(
            F.concat(F.lit("negative BSON timestamp in oplog entry: "), ts.cast("string"))
        ).cast("long")
    )
    return df.select(
        op.alias("op"),
        lsn_checked.alias("lsn"),
        ts.bitwiseAND(F.lit((1 << 16) - 1)).cast("int").alias("seq_in_tx"),
        r["ns"].alias("src_table"),
        F.coalesce(r["h"], F.lit(0)).alias("server_id"),
        F.timestamp_seconds(F.shiftrightunsigned(r["ts"], 32)).alias("commit_ts"),
        # insert/delete: o is the row (or its key); update: key from o2
        F.when(op == OP_UPDATE, merged).otherwise(o).alias("data"),
        r["o2"].alias("old_data"),
    )


def project_transcript_payload(df: DataFrame) -> DataFrame:
    """Lift the generic map payload into the typed transcripts columns —
    the typed-columns step the engine does because input_hint pins the
    payload table (SURVEY.md §1.3)."""
    d = F.col("data")
    return df.select(
        "op",
        "lsn",
        "seq_in_tx",
        "src_table",
        "server_id",
        "commit_ts",
        d["conv_id"].alias("conv_id"),
        d["turn_idx"].cast("int").alias("turn_idx"),
        d["role"].alias("role"),
        d["text"].alias("text"),
        d["tool"].alias("tool"),
        F.to_timestamp(d["ts"]).alias("ts"),
    )
