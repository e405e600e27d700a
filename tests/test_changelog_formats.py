"""Vendor changelog decoders + the ALL_TYPES coercion fixture (FIXTURES F4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from datacollector_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE


def test_decode_mysql_binlog(spark):
    from datacollector_spark.sources.changelog_formats import (
        decode_mysql_binlog,
        project_transcript_payload,
    )

    ev = {
        "Type": "UPDATE",
        "Database": "chat",
        "Table": "transcripts",
        "ServerId": 3,
        "Timestamp": 1735732800000,
        "BinLogFilename": "mysql-bin.000007",
        "BinLogPosition": 12345,
        "SeqNo": 2,
        "Data": {"conv_id": "c1", "turn_idx": "4", "role": "user",
                 "text": "hi", "tool": None, "ts": "2025-01-01 12:00:00"},
        "OldData": {"conv_id": "c1", "turn_idx": "4", "text": "old"},
    }
    df = spark.createDataFrame([(json.dumps(ev),)], "raw string")
    out = decode_mysql_binlog(df, "raw")
    row = out.first()
    assert row["op"] == OP_UPDATE
    assert row["lsn"] == (7 << 32) + 12345
    assert row["seq_in_tx"] == 2 and row["server_id"] == 3
    typed = project_transcript_payload(out).first()
    assert typed["conv_id"] == "c1" and typed["turn_idx"] == 4
    assert typed["text"] == "hi"


def test_decode_oracle_cdc(spark):
    from datacollector_spark.sources.changelog_formats import decode_oracle_cdc

    ev = {
        "OPERATION": OP_DELETE,
        "SCN": 999,
        "SEQ": 5,
        "TABLE_NAME": "TRANSCRIPTS",
        "TIMESTAMP": 1735732800000,
        "DATA": {"conv_id": "c9"},
        "BEFORE": {"conv_id": "c9", "text": "bye"},
    }
    df = spark.createDataFrame([(json.dumps(ev),)], "raw string")
    row = decode_oracle_cdc(df, "raw").first()
    # lsn = bare SCN, seq carried separately: the downstream pack
    # (lsn<<16 | seq) reproduces the reference's SCN::seq offset exactly once
    assert row["op"] == OP_DELETE
    assert row["lsn"] == 999 and row["seq_in_tx"] == 5


def test_decode_mongo_oplog(spark):
    from datacollector_spark.sources.changelog_formats import decode_mongo_oplog

    ts = (1735732800 << 32) | 3
    ev = {"op": "i", "ts": ts, "h": 77, "ns": "chat.transcripts",
          "o": {"conv_id": "c2", "text": "yo"}}
    df = spark.createDataFrame([(json.dumps(ev),)], "raw string")
    row = decode_mongo_oplog(df, "raw").first()
    # BSON ts rescaled into the (lsn, seq) budget: packed order == exact ts
    assert row["op"] == OP_INSERT
    assert row["lsn"] == ts >> 16 and row["seq_in_tx"] == ts & 0xFFFF
    assert (row["lsn"] << 16) + row["seq_in_tx"] == ts
    assert row["commit_ts"].year == 2025


def test_all_types_coercion_roundtrip(spark):
    """FIXTURES F4: the MySQL ALL_TYPES fixture
    (mysql-binlog-lib/src/test/resources/schema.sql:16-41) mapped per
    SURVEY §1.2 — string-encoded CDC values coerce to every Spark type and
    survive a write/read roundtrip."""
    from datacollector_spark.operators.transforms import coerce_types
    from pyspark.sql import types as T

    raw = spark.createDataFrame(
        [
            (
                "123.45",  # decimal(10,2)
                "7",       # tinyint -> byte... stored int per survey
                "12",      # smallint
                "1234567", # mediumint -> int
                "1.5",     # float
                "2.25",    # double
                "2025-01-01 10:30:00",  # timestamp
                "9999999999",  # bigint
                "42",      # int
                "2025-01-02",  # date
                "37230000",    # time -> long millis
                "2025-01-01 10:30:00",  # datetime
                "2025",    # year -> int
                "hello",   # varchar
                "2",       # enum -> int
                "5",       # set -> long bitmask
                "YmxvYg==",  # blob (base64) -> binary
                "long text",  # text
            )
        ],
        ", ".join(f"c{i} string" for i in range(18)),
    )
    target = T.StructType(
        [
            T.StructField("c0", T.DecimalType(10, 2)),
            T.StructField("c1", T.IntegerType()),
            T.StructField("c2", T.ShortType()),
            T.StructField("c3", T.IntegerType()),
            T.StructField("c4", T.FloatType()),
            T.StructField("c5", T.DoubleType()),
            T.StructField("c6", T.TimestampType()),
            T.StructField("c7", T.LongType()),
            T.StructField("c8", T.IntegerType()),
            T.StructField("c9", T.DateType()),
            T.StructField("c10", T.LongType()),
            T.StructField("c11", T.TimestampType()),
            T.StructField("c12", T.IntegerType()),
            T.StructField("c13", T.StringType()),
            T.StructField("c14", T.IntegerType()),
            T.StructField("c15", T.LongType()),
            T.StructField("c16", T.StringType()),  # decoded below
            T.StructField("c17", T.StringType()),
        ]
    )
    typed = coerce_types(raw, target).withColumn("c16", F.unbase64("c16"))
    row = typed.first()
    assert str(row["c0"]) == "123.45"
    assert row["c2"] == 12 and row["c4"] == 1.5
    assert row["c6"].hour == 10 and row["c9"].day == 2
    assert row["c12"] == 2025
    assert bytes(row["c16"]) == b"blob"
    # roundtrip through parquet preserves all types
    import tempfile

    p = tempfile.mkdtemp() + "/t"
    typed.write.parquet(p)
    back = spark.read.parquet(p)
    assert [f.dataType for f in back.schema.fields][:16] == [
        f.dataType for f in typed.schema.fields
    ][:16]
