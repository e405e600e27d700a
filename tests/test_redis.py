"""Redis lookup/destination over the from-scratch RESP client, against an
in-process fake that speaks genuine RESP2 (tests/respfake.py) — protocol
bytes pinned, distributed lookup/write round trips, and the
RedisLookupDProcessor / RedisDTarget config port."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacollector_spark.sources.redis import (
    RespClient,
    RespError,
    parse_redis_uri,
    redis_kv_lookup,
    redis_target,
)

from tests.respfake import FakeRedis


@pytest.fixture()
def fake():
    f = FakeRedis()
    f.start()
    yield f
    f.stop()


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def test_resp_encode_pinned_bytes():
    # the RESP2 spec's own example framing: array of bulk strings
    assert (
        RespClient.encode(["SET", "mykey", "myvalue"])
        == b"*3\r\n$3\r\nSET\r\n$5\r\nmykey\r\n$7\r\nmyvalue\r\n"
    )
    # integers stringify as bulk strings (LRANGE key 0 -1)
    assert (
        RespClient.encode(["LRANGE", "k", 0, -1])
        == b"*4\r\n$6\r\nLRANGE\r\n$1\r\nk\r\n$1\r\n0\r\n$2\r\n-1\r\n"
    )


def test_resp_client_typed_replies_and_pipeline(fake):
    c = RespClient("127.0.0.1", fake.port)
    try:
        assert c.command("PING") == "PONG"
        assert c.command("SET", "a", "1") == "OK"
        assert c.command("GET", "a") == "1"
        assert c.command("GET", "missing") is None  # $-1 nil
        assert c.command("LPUSH", "l", "x", "y") == 2
        assert c.command("LRANGE", "l", 0, -1) == ["y", "x"]
        # one write, three replies — true pipelining
        replies = c.pipeline([["SET", "b", "2"], ["GET", "b"], ["GET", "a"]])
        assert replies == ["OK", "2", "1"]
        # error replies surface as RespError
        with pytest.raises(RespError, match="unknown command"):
            c.command("BOGUS")
    finally:
        c.close()


def test_parse_redis_uri():
    assert parse_redis_uri("redis://localhost:6379/0") == ("localhost", 6379, 0)
    assert parse_redis_uri("redis://:password@h:7000/2") == ("h", 7000, 2)
    assert parse_redis_uri("redis://h") == ("h", 6379, 0)


def test_db_index_selected(spark, fake):
    from datacollector_spark.sources.redis import _connect_uri

    c = _connect_uri(f"redis://127.0.0.1:{fake.port}/3")
    c.close()
    assert fake.selected_db == 3


# ---------------------------------------------------------------------------
# distributed lookup
# ---------------------------------------------------------------------------


def test_string_lookup_uses_mget_and_nulls_missing(spark, fake):
    for i in range(0, 40, 2):  # even keys only
        fake.execute(["SET", f"k{i}", f"v{i}"])
    fake.commands.clear()
    df = spark.range(0, 40).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    ).repartition(4)
    out = redis_kv_lookup(df, "key", f"redis://127.0.0.1:{fake.port}", into="val")
    rows = {r["id"]: r["val"] for r in out.collect()}
    assert rows[4] == "v4" and rows[3] is None and len(rows) == 40
    # chunked MGET, never per-key GET
    cmds = {c[0] for c in fake.commands}
    assert "MGET" in cmds and "GET" not in cmds


def test_hash_list_set_lookups(spark, fake):
    fake.execute(["HSET", "h1", "name", "ann", "age", "7"])
    fake.execute(["LPUSH", "l1", "b", "a"])
    fake.execute(["SADD", "s1", "z", "y"])
    df = spark.createDataFrame([("h1",), ("nope",)], ["k"])
    h = {r["k"]: r["v"] for r in redis_kv_lookup(
        df, "k", f"redis://127.0.0.1:{fake.port}", into="v", data_type="HASH"
    ).collect()}
    # missing collection keys answer EMPTY (Redis semantics), not null
    assert h["h1"] == {"name": "ann", "age": "7"} and h["nope"] == {}
    ldf = spark.createDataFrame([("l1",)], ["k"])
    assert redis_kv_lookup(
        ldf, "k", f"redis://127.0.0.1:{fake.port}", into="v", data_type="LIST"
    ).collect()[0]["v"] == ["a", "b"]
    sdf = spark.createDataFrame([("s1",)], ["k"])
    assert redis_kv_lookup(
        sdf, "k", f"redis://127.0.0.1:{fake.port}", into="v", data_type="SET"
    ).collect()[0]["v"] == ["y", "z"]


# ---------------------------------------------------------------------------
# destination
# ---------------------------------------------------------------------------


def test_target_batch_modes_and_ttl(spark, fake):
    df = spark.createDataFrame(
        [("c1", "alice", ["t1", "t2"]), ("c2", "bob", ["t3"])],
        ["ckey", "name", "tags"],
    ).repartition(2)
    redis_target(
        df,
        f"redis://127.0.0.1:{fake.port}",
        [
            {"key": "ckey", "value": "name", "data_type": "STRING", "ttl": 60},
            {"key": "ckey", "value": "tags", "data_type": "LIST"},
        ],
    )
    assert fake.strings == {"c1": "alice", "c2": "bob"}
    # LPUSH in element order -> stored reversed (RedisTarget semantics)
    assert fake.lists["c1"] == ["t2", "t1"] and fake.lists["c2"] == ["t3"]
    assert fake.ttls == {"c1": 60, "c2": 60}


def test_target_hash_and_null_skip(spark, fake):
    df = spark.createDataFrame(
        [("u1", {"a": "1"}), (None, {"b": "2"}), ("u3", None)],
        "k string, h map<string,string>",
    )
    redis_target(
        df,
        f"redis://127.0.0.1:{fake.port}",
        [{"key": "k", "value": "h", "data_type": "HASH"}],
    )
    # null key and null value rows are skipped (RedisTarget.java:229)
    assert fake.hashes == {"u1": {"a": "1"}}


def test_target_publish_mode(spark, fake):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    redis_target(
        df,
        f"redis://127.0.0.1:{fake.port}",
        [],
        mode="PUBLISH",
        channel="events",
    )
    assert sorted(m for _, m in fake.published) == [
        '{"id": 1, "v": "x"}',
        '{"id": 2, "v": "y"}',
    ]
    assert all(ch == "events" for ch, _ in fake.published)


def test_target_validation_errors(spark):
    df = None
    with pytest.raises(ValueError, match="REDIS_04"):
        redis_target(df, "redis://h", [], mode="BATCH")
    with pytest.raises(ValueError, match="REDIS_03"):
        redis_target(df, "redis://h", [], mode="PUBLISH")


# ---------------------------------------------------------------------------
# config port
# ---------------------------------------------------------------------------


def test_redis_config_port_lookup_and_target(spark, fake, tmp_path):
    from datacollector_spark.plans.spec import PipelineSpec

    for i in range(10):
        fake.execute(["SET", f"cust-{i}", f"segment-{i % 3}"])

    config = {
        "pipelineConfig": {
            "title": "redis port",
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
                    "instanceName": "RedisLookup_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_processor_kv_redis_"
                        "RedisLookupDProcessor"
                    ),
                    "inputLanes": ["lane1"],
                    "outputLanes": ["lane2"],
                    "configuration": [
                        {"name": "conf.uri", "value": f"redis://127.0.0.1:{fake.port}"},
                        {
                            "name": "conf.lookups",
                            "value": [
                                {
                                    "keyExpr": (
                                        "${str:concat('cust-', "
                                        "record:value('/k'))}"
                                    ),
                                    "outputFieldPath": "/segment",
                                    "dataType": "STRING",
                                }
                            ],
                        },
                    ],
                },
                {
                    "instanceName": "Redis_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_redis_RedisDTarget"
                    ),
                    "inputLanes": ["lane2"],
                    "configuration": [
                        {"name": "conf.uri", "value": f"redis://127.0.0.1:{fake.port}"},
                        {"name": "conf.mode", "value": "BATCH"},
                        {
                            "name": "conf.redisFieldMapping",
                            "value": [
                                {
                                    "keyExpr": "/k",
                                    "valExpr": "/segment",
                                    "dataType": "STRING",
                                    "ttl": -1,
                                }
                            ],
                        },
                    ],
                },
            ],
        }
    }
    src = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    src_path = str(tmp_path / "src.parquet")
    src.write.parquet(src_path)
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"Origin_01": {"path": src_path}}
    )
    lanes = spec.build(spark)
    got = {r["k"]: r["segment"] for r in lanes["lane2"].collect()}
    assert got == {str(i): f"segment-{i % 3}" for i in range(10)}
    # the lazy target has not written yet at build time
    assert "0" not in fake.strings
    spec.run_targets()
    for i in range(10):
        assert fake.strings[str(i)] == f"segment-{i % 3}"
