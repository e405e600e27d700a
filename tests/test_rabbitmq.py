"""RabbitMQ origin/destination over the from-scratch AMQP 0-9-1 client,
against the in-process broker fake (tests/amqpfake.py).  Codec bytes are
pinned against hand-computed spec framings, then the full protocol round
trips live: handshake, topology declare, publish routing (direct / fanout
/ topic / default), basic.get + manual multiple-ack, mandatory
basic.return, auth refusal, unacked redelivery, and the Spark-level
competing-consumer drain + foreachPartition publish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.sources.rabbitmq import (
    AmqpClient,
    AmqpError,
    RabbitConfig,
    encode_properties,
    encode_table,
    decode_properties,
    parse_amqp_uri,
    rabbit_origin_batch,
    rabbit_target,
)
from tests.amqpfake import FakeBroker, _topic_match


@pytest.fixture()
def broker():
    b = FakeBroker()
    b.start()
    yield b
    b.stop()


def _client(b: FakeBroker, **kw) -> AmqpClient:
    return AmqpClient("127.0.0.1", b.port, **kw)


# ---------------------------------------------------------------------------
# codec pinning (hand-computed per the AMQP 0-9-1 spec)
# ---------------------------------------------------------------------------


def test_field_table_bytes_pinned():
    # longstr(size=4) + shortstr "a" + 't' + 0x01
    assert encode_table({"a": True}) == b"\x00\x00\x00\x04\x01at\x01"
    # longstr value: shortstr "k" + 'S' + longstr "hi"
    assert (
        encode_table({"k": "hi"}) == b"\x00\x00\x00\x09\x01kS\x00\x00\x00\x02hi"
    )
    assert encode_table({}) == b"\x00\x00\x00\x00"


def test_basic_properties_flags_pinned():
    # delivery_mode rides bit 12 -> flags 0x1000, one octet value
    assert encode_properties({"delivery_mode": 2}) == b"\x10\x00\x02"
    # content_type (bit 15) + app_id (bit 3): 0x8008
    enc = encode_properties({"content_type": "application/json", "app_id": "sdc"})
    assert enc[:2] == b"\x80\x08"
    assert decode_properties(enc) == {
        "content_type": "application/json",
        "app_id": "sdc",
    }


def test_parse_amqp_uri():
    # AMQP URI spec: vhost is the raw path segment (amqp://h/prod -> vhost
    # "prod"), empty path -> default "/", %2F decodes to an explicit "/"
    assert parse_amqp_uri("amqp://h:5673/vh") == ("h", 5673, "vh")
    assert parse_amqp_uri("amqp://user:pw@h") == ("h", 5672, "/")
    assert parse_amqp_uri("amqp://h") == ("h", 5672, "/")
    assert parse_amqp_uri("amqp://h/%2F") == ("h", 5672, "/")


def test_named_vhost_connects(spark):
    b = FakeBroker(vhost="prod")
    b.start()
    try:
        c = AmqpClient("127.0.0.1", b.port, vhost="prod")
        c.queue_declare("q")
        c.close()
    finally:
        b.stop()


def test_topic_pattern_match():
    assert _topic_match("a.*.c", "a.b.c")
    assert not _topic_match("a.*.c", "a.b.b.c")
    assert _topic_match("a.#", "a")
    assert _topic_match("a.#", "a.b.c.d")
    assert _topic_match("#", "anything.at.all")
    assert not _topic_match("a.b", "a.c")


# ---------------------------------------------------------------------------
# live protocol
# ---------------------------------------------------------------------------


def test_handshake_declare_publish_get_ack(broker):
    c = _client(broker)
    try:
        assert broker.connections == 1
        assert c.server_properties.get("product") == "fake-broker"
        q, n, _ = c.queue_declare("work", durable=True)
        assert q == "work" and n == 0
        c.basic_publish(
            b'{"x": 1}', routing_key="work",
            properties={"delivery_mode": 2, "content_type": "application/json"},
        )
        msg = c.basic_get("work")
        assert msg["body"] == b'{"x": 1}'
        assert msg["delivery_tag"] == 1 and msg["routing_key"] == "work"
        assert msg["properties"]["content_type"] == "application/json"
        assert c.basic_get("work") is None  # get-empty
        c.basic_ack(msg["delivery_tag"], multiple=True)
        c.close()
        assert broker.acked == [1]
        assert not broker.queues["work"]  # acked, not requeued
    finally:
        c.close()


def test_exchange_routing_direct_fanout_topic(broker):
    c = _client(broker)
    try:
        for qn in ("q1", "q2", "qt"):
            c.queue_declare(qn)
        c.exchange_declare("exd", "direct")
        c.exchange_declare("exf", "fanout")
        c.exchange_declare("ext", "topic")
        c.queue_bind("q1", "exd", "red")
        c.queue_bind("q2", "exd", "blue")
        c.queue_bind("q1", "exf", "ignored")
        c.queue_bind("q2", "exf", "ignored2")
        c.queue_bind("qt", "ext", "logs.*.error")
        c.basic_publish(b"direct-red", exchange="exd", routing_key="red")
        c.basic_publish(b"fan", exchange="exf", routing_key="whatever")
        c.basic_publish(b"topic-hit", exchange="ext", routing_key="logs.app.error")
        c.basic_publish(b"topic-miss", exchange="ext", routing_key="logs.error")
        # basic.publish is async — fence with a synchronous method so the
        # broker has processed the publishes (frames are handled in order)
        c.queue_declare("q1")
        assert [m[0] for m in broker.queues["q1"]] == [b"direct-red", b"fan"]
        assert [m[0] for m in broker.queues["q2"]] == [b"fan"]
        assert [m[0] for m in broker.queues["qt"]] == [b"topic-hit"]
    finally:
        c.close()


def test_mandatory_unroutable_returns(broker):
    c = _client(broker)
    try:
        c.queue_declare("q")
        c.basic_publish(b"lost", exchange="", routing_key="nope", mandatory=True)
        c.poll_returns(timeout=0.5)
        assert len(c.returned) == 1
        n = c.returned[0]
        assert n["reply_code"] == 312 and n["reply_text"] == "NO_ROUTE"
        assert n["body"] == b"lost"
    finally:
        c.close()


def test_auth_refused(broker):
    with pytest.raises(AmqpError, match="ACCESS_REFUSED"):
        _client(broker, username="wrong", password="nope")


def test_unacked_redelivery_on_connection_drop(broker):
    c = _client(broker)
    c.queue_declare("q")
    for i in range(3):
        c.basic_publish(b"m%d" % i, routing_key="q")
    # consume all three but CRASH before acking (raw socket close)
    got = [c.basic_get("q")["body"] for _ in range(3)]
    assert got == [b"m0", b"m1", b"m2"]
    c.sock.close()
    import time

    deadline = time.time() + 5
    while time.time() < deadline and len(broker.queues["q"]) < 3:
        time.sleep(0.05)
    assert [m[0] for m in broker.queues["q"]] == [b"m0", b"m1", b"m2"]
    # a fresh consumer sees the redelivered messages
    c2 = _client(broker)
    try:
        assert c2.basic_get("q")["body"] == b"m0"
    finally:
        c2.close()


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("body", T.StringType()),
    ]
)


def test_spark_publish_then_competing_consumer_drain(spark, broker):
    cfg = RabbitConfig(
        uri=f"amqp://127.0.0.1:{broker.port}/",
        queue="transcripts",
        exchanges=[{"name": "ex", "type": "direct", "routingKey": "transcripts"}],
    )
    df = spark.range(0, 120).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("turn "), F.col("id").cast("string")).alias("body"),
    ).repartition(3)
    rabbit_target(df, cfg)
    assert len(broker.queues["transcripts"]) == 120

    out = rabbit_origin_batch(spark, cfg, SCHEMA, consumers=4)
    rows = out.collect()
    assert sorted(r["event_id"] for r in rows) == list(range(120))
    # queue fully drained and every delivery acked
    assert not broker.queues["transcripts"]
    assert len(broker.acked) == 120
    # competing consumers actually split the work (4 connections for the
    # drain + 3 for the publish partitions)
    assert broker.connections == 7


def test_spark_single_message_per_batch(spark, broker):
    cfg = RabbitConfig(
        uri=f"amqp://127.0.0.1:{broker.port}/",
        queue="batched",
        single_message_per_batch=True,
    )
    df = spark.range(0, 10).select(F.col("id").alias("event_id")).coalesce(1)
    rabbit_target(df, cfg)
    # one partition -> ONE newline-delimited message
    assert len(broker.queues["batched"]) == 1
    body = broker.queues["batched"][0][0]
    assert len(body.splitlines()) == 10


def test_spark_mandatory_unroutable_raises(spark, broker):
    cfg = RabbitConfig(
        uri=f"amqp://127.0.0.1:{broker.port}/",
        queue="",  # no queue declared -> default-exchange route unroutable
        mandatory=True,
    )
    df = spark.range(0, 3).select(F.col("id").alias("event_id")).coalesce(1)
    with pytest.raises(Exception, match="RABBITMQ_08|NO_ROUTE"):
        rabbit_target(df, cfg)


# ---------------------------------------------------------------------------
# config port
# ---------------------------------------------------------------------------


def test_rabbit_config_port_target_then_origin(spark, broker, tmp_path):
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    src = spark.range(0, 25).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("body"),
    )
    src_path = str(tmp_path / "src.parquet")
    src.write.parquet(src_path)
    uri = f"amqp://127.0.0.1:{broker.port}/"

    publish_cfg = {
        "pipelineConfig": {
            "title": "to rabbit",
            "stages": [
                {
                    "instanceName": "Origin_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource"
                    ),
                    "outputLanes": ["lane1"],
                    "configuration": [],
                },
                {
                    "instanceName": "RabbitMQ_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_rabbitmq_RabbitDTarget"
                    ),
                    "inputLanes": ["lane1"],
                    "configuration": [
                        {"name": "conf.uri", "value": uri},
                        {"name": "conf.queue.name", "value": "ported"},
                        {
                            "name": "conf.exchanges",
                            "value": [
                                {"name": "exp", "type": "FANOUT", "routingKey": ""}
                            ],
                        },
                    ],
                },
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        publish_cfg, origin_overrides={"Origin_01": {"path": src_path}}
    )
    spec.build(spark)
    spec.run_targets()
    assert len(broker.queues["ported"]) == 25
    assert broker.exchanges["exp"] == "fanout"

    consume_cfg = {
        "pipelineConfig": {
            "title": "from rabbit",
            "stages": [
                {
                    "instanceName": "RabbitMQ_02",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_rabbitmq_RabbitDSource"
                    ),
                    "outputLanes": ["lane1"],
                    "configuration": [
                        {"name": "conf.uri", "value": uri},
                        {"name": "conf.queue.name", "value": "ported"},
                    ],
                },
                {
                    "instanceName": "Trash_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_devnull_NullDTarget"
                    ),
                    "inputLanes": ["lane1"],
                    "configuration": [],
                },
            ],
        }
    }
    with pytest.raises(ValidationError, match="record_schema"):
        PipelineSpec.from_sdc_config(consume_cfg)
    spec2 = PipelineSpec.from_sdc_config(
        consume_cfg, origin_overrides={"RabbitMQ_02": {"record_schema": SCHEMA}}
    )
    lanes = spec2.build(spark)
    rows = lanes["lane1"].collect()
    assert sorted(r["event_id"] for r in rows) == list(range(25))
    assert rows[0].asDict().keys() == {"event_id", "body"}
    # default-uri config refuses
    bad = {
        "pipelineConfig": {
            "title": "bad",
            "stages": [
                {
                    "instanceName": "R",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_rabbitmq_RabbitDSource"
                    ),
                    "outputLanes": ["l1"],
                    "configuration": [{"name": "conf.uri", "value": "amqp://"}],
                },
                {
                    "instanceName": "T",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_devnull_NullDTarget"
                    ),
                    "inputLanes": ["l1"],
                    "configuration": [],
                },
            ],
        }
    }
    with pytest.raises(ValidationError, match="conf.uri"):
        PipelineSpec.from_sdc_config(
            bad, origin_overrides={"R": {"record_schema": SCHEMA}}
        )
