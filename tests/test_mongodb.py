"""MongoDB connector: BSON codec pinned to the spec's published bytes,
OP_MSG client round-trip, range-partitioned origin with durable offset
resume, and the op-code-aware destination (MongoDBTarget.java semantics)
against the loopback fake mongod."""

from __future__ import annotations

import datetime as dt

import pytest

from datacollector_spark.model import OP_DELETE, OP_INSERT, OP_UPSERT
from datacollector_spark.sources.mongodb import (
    MongoSourceConfig,
    MongoTargetConfig,
    MongoWireClient,
    ObjectId,
    bson_decode,
    bson_encode,
    mongodb_next_offset,
    mongodb_read_batch,
    mongodb_write,
)
from tests.mongofake import FakeMongod


# ------------------------------------------------------------------- codec


def test_bson_spec_pinned_bytes():
    """The two example documents published in the BSON spec (bsonspec.org
    §Specification, 'the following BSON examples') — byte-for-byte."""
    hello = b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    assert bson_encode({"hello": "world"}) == hello
    assert bson_decode(hello) == {"hello": "world"}

    awesome = (
        b"1\x00\x00\x00\x04BSON\x00&\x00\x00\x00\x020\x00\x08\x00\x00\x00"
        b"awesome\x00\x011\x00333333\x14@\x102\x00\xc2\x07\x00\x00\x00\x00"
    )
    assert bson_encode({"BSON": ["awesome", 5.05, 1986]}) == awesome
    assert bson_decode(awesome) == {"BSON": ["awesome", 5.05, 1986]}


def test_bson_roundtrip_types():
    oid = ObjectId("6563e1f2a9b8c7d6e5f40312")
    doc = {
        "_id": oid,
        "s": "héllo",
        "i32": 42,
        "i64": 2**40,
        "f": 3.25,
        "b": True,
        "none": None,
        "bin": b"\x00\x01\xff",
        "ts": dt.datetime(2026, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc),
        "nested": {"a": [1, "two", None]},
    }
    out = bson_decode(bson_encode(doc))
    assert out == doc
    assert isinstance(out["_id"], ObjectId) and str(out["_id"]) == str(oid)


def test_objectid_ordering_and_hex():
    a, b = ObjectId(), ObjectId()
    assert a < b and str(a) < str(b)  # hex order == byte order
    assert ObjectId(str(a)) == a


# ----------------------------------------------------------- wire + origin


@pytest.fixture()
def mongod():
    srv = FakeMongod()
    yield srv
    srv.close()


def test_wire_client_crud_roundtrip(mongod):
    cli = MongoWireClient("127.0.0.1", mongod.port)
    try:
        cli.command("db", {"insert": "c", "documents": [{"_id": 1, "v": "a"}]})
        cli.command(
            "db",
            {
                "update": "c",
                "updates": [{"q": {"_id": 1}, "u": {"_id": 1, "v": "b"}, "upsert": True}],
            },
        )
        rows = list(cli.find_iter("db", "c", {}, batch_size=10))
        assert rows == [{"_id": 1, "v": "b"}]
        cli.command("db", {"delete": "c", "deletes": [{"q": {"_id": 1}, "limit": 1}]})
        assert list(cli.find_iter("db", "c", {})) == []
    finally:
        cli.close()


def test_origin_parallel_scan_and_resume(spark, mongod):
    """120 docs with string offsets drain in offset order across 4 range
    partitions; a second drain from the durable offset reads only the
    delta (MongoDBSource.java produce/prepareCursor)."""
    docs = [{"k": f"k{i:04d}", "v": i} for i in range(120)]
    mongod.seed("db", "events", docs)

    cfg = MongoSourceConfig(
        "127.0.0.1",
        mongod.port,
        "db",
        "events",
        offset_field="k",
        offset_type="STRING",
        batch_size=25,
        num_partitions=4,
    )
    schema = "k string, v long"
    from pyspark.sql.types import StructType

    schema_t = spark.createDataFrame([], schema).schema
    df = mongodb_read_batch(spark, cfg, schema_t)
    got = [r["k"] for r in df.orderBy("k").collect()]
    assert got == [f"k{i:04d}" for i in range(120)]
    off = mongodb_next_offset(df, cfg)
    assert off == "k0119"

    mongod.seed("db", "events", [{"k": f"k{i:04d}", "v": i} for i in range(120, 150)])
    delta = mongodb_read_batch(spark, cfg, schema_t, last_offset=off)
    ks = [r["k"] for r in delta.orderBy("k").collect()]
    assert ks == [f"k{i:04d}" for i in range(120, 150)]
    # the fan-out really was a range scan: >1 find against the server
    assert mongod.commands_seen.count("find") >= 4


def test_origin_objectid_mode_requires_initial_offset(spark, mongod):
    from pyspark.sql.types import StringType, StructField, StructType

    cfg = MongoSourceConfig("127.0.0.1", mongod.port, "db", "c")
    with pytest.raises(ValueError, match="MONGODB_19"):
        mongodb_read_batch(
            spark, cfg, StructType([StructField("_id", StringType())])
        )


def test_origin_objectid_offsets_roundtrip(spark, mongod):
    ids = [ObjectId() for _ in range(30)]
    mongod.seed("db", "c", [{"_id": oid, "n": i} for i, oid in enumerate(ids)])
    lo = ObjectId(bytes(12))  # all-zero id sorts before everything
    cfg = MongoSourceConfig(
        "127.0.0.1",
        mongod.port,
        "db",
        "c",
        offset_field="_id",
        offset_type="OBJECTID",
        initial_offset=str(lo),
        num_partitions=3,
    )
    schema_t = spark.createDataFrame([], "_id string, n long").schema
    df = mongodb_read_batch(spark, cfg, schema_t)
    rows = df.orderBy("_id").collect()
    assert [r["_id"] for r in rows] == sorted(str(i) for i in ids)
    assert mongodb_next_offset(df, cfg) == str(max(ids))


# -------------------------------------------------------------- destination


def test_target_opcode_apply(spark, mongod):
    """INSERT/UPSERT/DELETE honor sdc.operation.type; unknown and null ops
    count as error records (MONGODB_14/15); final store state checks out."""
    rows = [
        ("a", 1, OP_INSERT),
        ("b", 2, OP_INSERT),
        ("a", 10, OP_UPSERT),   # replaces a
        ("c", 3, OP_UPSERT),    # upserts new
        ("b", 2, OP_DELETE),    # deletes b (full-doc filter)
        ("z", 9, 99),           # MONGODB_14 unknown op
        ("y", 8, None),         # MONGODB_15 missing op
    ]
    df = spark.createDataFrame(rows, "k string, v long, sdc_op int").coalesce(1)
    cfg = MongoTargetConfig(
        "127.0.0.1", mongod.port, "db", "out", unique_key_field="k"
    )
    meters = mongodb_write(df, cfg).collect()
    agg = {
        m: sum(r[m] for r in meters)
        for m in ("inserted", "upserted", "deleted", "errors")
    }
    assert agg == {"inserted": 2, "upserted": 2, "deleted": 1, "errors": 2}
    final = {d["k"]: d["v"] for d in mongod.docs("db", "out")}
    assert final == {"a": 10, "c": 3}


def test_target_validates_columns(spark, mongod):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="MONGODB_15"):
        mongodb_write(
            df, MongoTargetConfig("127.0.0.1", mongod.port, "db", "c")
        )
    df2 = df.withColumn("sdc_op", df.v.cast("int"))
    with pytest.raises(ValueError, match="MONGODB_18"):
        mongodb_write(
            df2,
            MongoTargetConfig(
                "127.0.0.1", mongod.port, "db", "c", unique_key_field="missing"
            ),
        )


# ------------------------------------------------------------- oplog (CDC)


def _oplog_entry(sec, ord_, op, ns, o, o2=None, h=0):
    from datacollector_spark.sources.mongodb import BsonTimestamp

    d = {"ts": BsonTimestamp(sec, ord_), "op": op, "ns": ns, "o": o, "h": h}
    if o2 is not None:
        d["o2"] = o2
    return d


def test_bson_timestamp_codec_roundtrip():
    from datacollector_spark.sources.mongodb import BsonTimestamp

    t = BsonTimestamp(1_700_000_000, 7)
    out = bson_decode(bson_encode({"ts": t}))["ts"]
    assert out == t and out.seconds == 1_700_000_000 and out.ordinal == 7
    assert BsonTimestamp(1, 2) < BsonTimestamp(1, 3) < BsonTimestamp(2, 0)


def test_oplog_tail_to_cdc_final_state(spark, mongod):
    """Live oplog drain -> decode_mongo_oplog -> LWW collapse reproduces the
    sequential replay: inserts, replacement updates (o2 key + o doc), and
    deletes, with the durable ts::ordinal offset resuming the tail
    (MongoDBOplogSource.java:100-160)."""
    from pyspark.sql import functions as F

    from datacollector_spark.model import OP_DELETE
    from datacollector_spark.operators.collapse import lww_collapse
    from datacollector_spark.sources.changelog_formats import decode_mongo_oplog
    from datacollector_spark.sources.mongodb import (
        MongoOplogConfig,
        mongodb_oplog_next_offset,
        mongodb_oplog_read_batch,
    )

    sec = 1_700_000_000
    entries = []
    for i in range(40):
        entries.append(
            _oplog_entry(sec + i, 1, "i", "db.c", {"k": f"k{i:02d}", "v": str(i)}, h=i)
        )
    for i in range(20):  # replace v with v*10 on the first 20
        entries.append(
            _oplog_entry(
                sec + 100 + i, 1, "u", "db.c",
                {"k": f"k{i:02d}", "v": str(i * 10)}, o2={"k": f"k{i:02d}"},
            )
        )
    for i in range(10):  # delete the first 10
        entries.append(
            _oplog_entry(sec + 200 + i, 1, "d", "db.c", {"k": f"k{i:02d}"})
        )
    # a noop entry the op-type filter must drop (OplogOpType NOOP)
    entries.append(_oplog_entry(sec + 300, 1, "n", "", {"msg": "periodic noop"}))
    mongod.seed("local", "oplog.rs", entries)

    cfg = MongoOplogConfig("127.0.0.1", mongod.port, num_partitions=3)
    raw = mongodb_oplog_read_batch(spark, cfg)
    assert raw.count() == 70  # noop filtered server-side

    env = decode_mongo_oplog(raw, "json")
    winners = lww_collapse(
        env.withColumn("k", F.col("data")["k"]),
        key_columns=["k"],
        carry_columns=["op", "data"],
    )
    final = {
        r["k"]: r["data"]["v"]
        for r in winners.where(F.col("op") != OP_DELETE).collect()
    }
    expect = {f"k{i:02d}": str(i * 10) for i in range(10, 20)}
    expect.update({f"k{i:02d}": str(i) for i in range(20, 40)})
    assert final == expect

    # durable resume: new entries past the offset, old ones not re-read
    off = mongodb_oplog_next_offset(raw)
    assert off == f"{sec + 300}::1" or off == f"{sec + 209}::1"
    mongod.seed(
        "local", "oplog.rs",
        [_oplog_entry(sec + 400, 2, "i", "db.c", {"k": "k99", "v": "99"})],
    )
    delta = mongodb_oplog_read_batch(spark, cfg, last_offset=off)
    rows = delta.collect()
    assert len(rows) == 1 and '"k99"' in rows[0]["json"]


def test_oplog_spool_tail_streaming_ingest_exactly_once(spark, mongod, tmp_path):
    """Live Mongo oplog -> spool landing -> CdcIngestPipeline -> lake:
    two tail cycles with a durable offset file between them; the final
    table state equals the sequential replay, an empty cycle lands
    nothing, and re-landing the same segment (crash between land and
    offset advance) does not change final state."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datacollector_spark.lake.table import LakeTable
    from datacollector_spark.sources.mongodb import (
        BsonTimestamp,
        MongoOplogConfig,
        mongodb_oplog_spool_tail,
    )
    from datacollector_spark.streaming.pipeline import CdcIngestPipeline

    sec = 1_700_000_000

    def entry(i, op, conv, turn, text=None):
        o = {"conv_id": conv, "turn_idx": str(turn)}
        if op != "d":
            o.update(
                {"role": "user", "text": text, "tool": "",
                 "ts": "2026-03-01 10:00:00"}
            )
        d = {"ts": BsonTimestamp(sec + i, 1), "op": op, "ns": "db.tr",
             "o": o, "h": i}
        if op == "u":
            d["o2"] = {"conv_id": conv, "turn_idx": str(turn)}
        return d

    batch1 = [entry(i, "i", f"c{i % 5}", i // 5, f"t{i}") for i in range(20)]
    mongod.seed("local", "oplog.rs", batch1)

    payload = {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    schema = T.StructType(
        [
            T.StructField("op", T.IntegerType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("seq_in_tx", T.IntegerType()),
            T.StructField("src_table", T.StringType()),
            T.StructField("server_id", T.LongType()),
            T.StructField("commit_ts", T.TimestampType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("old_role", T.StringType()),
            T.StructField("old_text", T.StringType()),
            T.StructField("old_tool", T.StringType()),
            T.StructField("old_ts", T.TimestampType()),
        ]
    )
    spool = str(tmp_path / "spool")
    offset_path = str(tmp_path / "oplog.offset")
    cfg = MongoOplogConfig("127.0.0.1", mongod.port, num_partitions=2)

    table = LakeTable.create(
        spark,
        str(tmp_path / "lake"),
        T.StructType([f for f in schema.fields if f.name not in
                      ("op", "lsn", "seq_in_tx", "src_table", "server_id",
                       "commit_ts") and not f.name.startswith("old_")]),
        ["conv_id", "turn_idx"],
        num_buckets=8,
    )
    import os

    os.makedirs(spool)
    n1, off1 = mongodb_oplog_spool_tail(spark, cfg, spool, offset_path, payload)
    assert n1 == 20 and off1 == f"{sec + 19}::1"

    pipe = CdcIngestPipeline(
        spark, spool, table, str(tmp_path / "ckpt"), source_schema=schema
    )
    pipe.run_available_now(timeout_s=300)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in table.refresh().read().collect()
    }
    assert got == {(f"c{i % 5}", i // 5): f"t{i}" for i in range(20)}

    # cycle 2: updates + deletes land past the durable offset
    batch2 = [entry(100 + j, "u", f"c{j}", 0, f"new{j}") for j in range(3)]
    batch2 += [entry(200, "d", "c4", 0)]
    mongod.seed("local", "oplog.rs", batch2)
    seg_before = set(os.listdir(spool))
    n2, off2 = mongodb_oplog_spool_tail(spark, cfg, spool, offset_path, payload)
    assert n2 == 4 and off2 == f"{sec + 200}::1"
    pipe.run_available_now(timeout_s=300)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in table.refresh().read().collect()
    }
    expect = {(f"c{i % 5}", i // 5): f"t{i}" for i in range(20)}
    for j in range(3):
        expect[(f"c{j}", 0)] = f"new{j}"
    del expect[("c4", 0)]
    assert got == expect

    # crash-shaped duplicate: re-land cycle 2's segment files; LWW + the
    # lsn merge guard make the replay a no-op on final state
    for f in set(os.listdir(spool)) - seg_before:
        shutil.copy(os.path.join(spool, f), os.path.join(spool, "dup-" + f))
    pipe.run_available_now(timeout_s=300)
    got2 = {
        (r.conv_id, r.turn_idx): r.text
        for r in table.refresh().read().collect()
    }
    assert got2 == expect

    # quiet cycle: nothing new, offset unchanged
    n3, off3 = mongodb_oplog_spool_tail(spark, cfg, spool, offset_path, payload)
    assert n3 == 0 and off3 == off2


def test_spark_submit_mongo_cdc_job(spark, mongod, tmp_path):
    """The north-star launch contract for the Mongo CDC path: package the
    engine, launch jobs/run_mongo_cdc.py through spark-submit --py-files
    against the live loopback mongod, assert the oplog lands in the lake."""
    import json as _json
    import os
    import shutil
    import subprocess
    import sys

    import pytest as _pytest

    from datacollector_spark.sources.mongodb import BsonTimestamp
    from tools.package import build

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not (spark_submit and os.path.exists(spark_submit)) and os.path.exists(cand):
        spark_submit = cand
    if not (spark_submit and os.path.exists(spark_submit)):
        _pytest.skip("spark-submit not found")

    sec = 1_700_000_000
    entries = [
        {"ts": BsonTimestamp(sec + i, 1), "op": "i", "ns": "db.tr",
         "o": {"conv_id": f"c{i % 4}", "turn_idx": str(i // 4),
               "role": "user", "text": f"t{i}", "tool": "",
               "ts": "2026-03-01 10:00:00"},
         "h": i}
        for i in range(24)
    ]
    mongod.seed("local", "oplog.rs", entries)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = build(str(tmp_path / "dist" / "datacollector_spark.zip"))
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", zip_path,
            os.path.join(repo, "jobs", "run_mongo_cdc.py"),
            "--mongo-host", "127.0.0.1",
            "--mongo-port", str(mongod.port),
            "--spool", str(tmp_path / "spool"),
            "--offset-file", str(tmp_path / "oplog.offset"),
            "--table", str(tmp_path / "table"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--buckets", "4",
            "--num-partitions", "2",
            "--cycles", "1",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [
        l for l in proc.stdout.splitlines() if l.startswith("MONGO_CDC_RESULT ")
    ]
    assert line, proc.stdout[-2000:]
    res = _json.loads(line[0][len("MONGO_CDC_RESULT "):])
    assert res["events_landed"] == 24 and res["rows"] == 24
    assert res["offset"] == f"{sec + 23}::1"
