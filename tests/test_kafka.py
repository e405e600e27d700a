"""Kafka origin/producer wrappers — option wiring + jar-free record codec
(the spark-sql-kafka jar is absent here; see sources/kafka.py docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacollector_spark.sources.kafka import (
    decode_kafka_records,
    encode_for_kafka,
    kafka_origin_options,
    kafka_stream_origin,
)


def test_origin_options_subscribe_and_passthrough():
    opts = kafka_origin_options(
        "broker:9092",
        topics=["events", "audit"],
        starting_offsets="latest",
        max_offsets_per_trigger=50000,
        consumer_config={"group.id": "dcs", "kafka.fetch.max.bytes": "1048576"},
    )
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "events,audit"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["kafka.group.id"] == "dcs"  # auto-prefixed
    assert opts["kafka.fetch.max.bytes"] == "1048576"  # already prefixed


def test_origin_options_pattern_xor_topics():
    opts = kafka_origin_options("b:9092", topic_pattern="events-.*")
    assert opts["subscribePattern"] == "events-.*"
    with pytest.raises(ValueError):
        kafka_origin_options("b:9092")
    with pytest.raises(ValueError):
        kafka_origin_options("b:9092", topics="t", topic_pattern="t.*")


def test_stream_origin_builds_reader(spark):
    # reader construction (option wiring) needs no jar; .load() would
    reader = kafka_stream_origin(spark, bootstrap_servers="b:9092", topics="t")
    assert reader is not None


def _kafka_frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )


def test_decode_json_records(spark):
    rows = [
        (None, b'{"conv_id":"c1","turn_idx":3}', "t", 0, 17, None, 0),
        (None, b'{"conv_id":"c2","turn_idx":9}', "t", 1, 18, None, 0),
    ]
    out = decode_kafka_records(
        _kafka_frame(spark, rows), "conv_id STRING, turn_idx INT"
    ).orderBy("offset")
    got = out.collect()
    assert [r["conv_id"] for r in got] == ["c1", "c2"]
    assert got[0]["offset"] == 17  # metadata preserved


def test_encode_roundtrip_and_default_strategy(spark):
    df = spark.createDataFrame([("c1", 3), ("c2", 9)], "conv_id string, turn_idx int")
    enc = encode_for_kafka(df, topic="out", key_expr="conv_id")
    assert enc.columns == ["key", "value", "topic"]  # DEFAULT: no partition
    row = enc.where(F.col("key").cast("string") == "c1").first()
    assert row["topic"] == "out"
    import json

    assert json.loads(bytes(row["value"]).decode()) == {"conv_id": "c1", "turn_idx": 3}


def test_encode_partition_strategies(spark):
    df = spark.createDataFrame(
        [(i, f"c{i}") for i in range(20)], "n int, conv_id string"
    )
    expr = encode_for_kafka(
        df,
        topic="t",
        partition_strategy="EXPRESSION",
        partition_expr="pmod(n, 4)",
        num_partitions=4,
    )
    parts = {r["partition"] for r in expr.select("partition").collect()}
    assert parts == {0, 1, 2, 3}

    rr = encode_for_kafka(
        df, topic="t", partition_strategy="ROUND_ROBIN", num_partitions=4
    )
    assert set(r["partition"] for r in rr.collect()) <= {0, 1, 2, 3}

    rnd = encode_for_kafka(
        df, topic="t", partition_strategy="RANDOM", num_partitions=4
    )
    assert all(0 <= r["partition"] < 4 for r in rnd.collect())

    with pytest.raises(ValueError):
        encode_for_kafka(df, topic="t", partition_strategy="EXPRESSION")
    with pytest.raises(ValueError):
        encode_for_kafka(df, topic="t", partition_strategy="BOGUS")


def test_encode_csv_value(spark):
    df = spark.createDataFrame([("a", 1)], "x string, y int")
    enc = encode_for_kafka(df, topic="t", value_format="csv")
    assert bytes(enc.first()["value"]).decode() == "a,1"
