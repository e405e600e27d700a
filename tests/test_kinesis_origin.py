"""Kinesis origin/destination against an in-process fake implementing the
public Kinesis Data Streams JSON API (ListShards / GetShardIterator /
GetRecords / PutRecords) with server-side SigV4 recomputation
(service="kinesis").

Reference: aws-lib origin/kinesis (KCL shard-per-processor model,
sequence-number checkpoints) + destination/kinesis (PutRecords)."""
from __future__ import annotations

import base64
import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from datacollector_spark.sources.kinesis import (
    KinesisClient,
    KinesisClientConfig,
    kinesis_origin_batch,
    kinesis_target,
)
from tests.awsfake import verify_sigv4

ACCESS, SECRET = "AKKIN", "kin3siskey"


class FakeKinesis:
    """In-memory shards; iterators are opaque tokens (stream, shard, index).
    PutRecords routes by md5(partition_key) over the shard count — the same
    hash-range idea as the real service."""

    def __init__(self, streams: dict[str, int]):
        # stream -> list of shards, each a list of (seq, pk, data_b64)
        self.streams = {s: [[] for _ in range(n)] for s, n in streams.items()}
        self._seq = 999_998  # crossing 10^6 changes the string WIDTH
        self._iters: dict[str, tuple[str, int, int]] = {}
        self._lock = threading.Lock()
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(length)
                if not verify_sigv4(self, payload, ACCESS, SECRET):
                    return self.send_error(403, "SignatureDoesNotMatch")
                op = (self.headers.get("x-amz-target") or "").split(".")[-1]
                req = json.loads(payload or b"{}")
                try:
                    resp = getattr(fake, f"op_{op}")(req)
                except AttributeError:
                    return self.send_error(400, f"UnknownOperationException {op}")
                except KeyError as e:
                    return self.send_error(400, f"ResourceNotFoundException {e}")
                body = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self._server.server_address[1]}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- API ops
    def op_ListShards(self, req):
        shards = self.streams[req["StreamName"]]
        return {
            "Shards": [
                {"ShardId": f"shardId-{i:012d}"} for i in range(len(shards))
            ]
        }

    def _shard(self, stream, shard_id):
        return self.streams[stream][int(shard_id.split("-")[-1])]

    def op_GetShardIterator(self, req):
        stream, shard_id = req["StreamName"], req["ShardId"]
        shard = self._shard(stream, shard_id)
        typ = req["ShardIteratorType"]
        if typ == "TRIM_HORIZON":
            idx = 0
        elif typ == "LATEST":
            idx = len(shard)
        elif typ in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            want = req["StartingSequenceNumber"]
            idx = next(
                (i for i, (seq, _, _) in enumerate(shard) if seq == want),
                len(shard),
            )
            if typ == "AFTER_SEQUENCE_NUMBER":
                idx += 1
        else:
            raise KeyError(typ)
        token = f"it-{len(self._iters)}"
        self._iters[token] = (stream, shard_id, idx)
        return {"ShardIterator": token}

    def op_GetRecords(self, req):
        stream, shard_id, idx = self._iters[req["ShardIterator"]]
        shard = self._shard(stream, shard_id)
        limit = req.get("Limit", 1000)
        page = shard[idx : idx + limit]
        nxt = f"it-{len(self._iters)}"
        self._iters[nxt] = (stream, shard_id, idx + len(page))
        return {
            "Records": [
                {"SequenceNumber": seq, "PartitionKey": pk, "Data": data}
                for seq, pk, data in page
            ],
            "NextShardIterator": nxt,
            "MillisBehindLatest": 0 if idx + len(page) >= len(shard) else 1,
        }

    def op_PutRecords(self, req):
        shards = self.streams[req["StreamName"]]
        with self._lock:
            for r in req["Records"]:
                self._seq += 1
                i = int(hashlib.md5(r["PartitionKey"].encode()).hexdigest(), 16) % len(
                    shards
                )
                shards[i].append((str(self._seq), r["PartitionKey"], r["Data"]))
        return {"FailedRecordCount": 0}

    # ------------------------------------------------------------- helpers
    def seed(self, stream: str, records: list[tuple[str, bytes]]):
        self.op_PutRecords(
            {
                "StreamName": stream,
                "Records": [
                    {"PartitionKey": pk, "Data": base64.b64encode(d).decode()}
                    for pk, d in records
                ],
            }
        )

    def total(self, stream):
        return sum(len(s) for s in self.streams[stream])

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


@pytest.fixture()
def fake_kinesis():
    f = FakeKinesis({"events": 4})
    yield f
    f.stop()


def _cfg(f: FakeKinesis) -> KinesisClientConfig:
    return KinesisClientConfig(f.endpoint, ACCESS, SECRET)


def test_client_ops_signature_verified(fake_kinesis):
    fake_kinesis.seed("events", [(f"k{i}", f"v{i}".encode()) for i in range(10)])
    client = KinesisClient(_cfg(fake_kinesis))
    shards = client.list_shards("events")
    assert shards == [f"shardId-{i:012d}" for i in range(4)]
    it = client.get_shard_iterator("events", shards[0], "TRIM_HORIZON")
    out = client.get_records(it)
    assert all(base64.b64decode(r["Data"]).startswith(b"v") for r in out["Records"])
    # wrong secret is rejected by server-side recompute
    bad = KinesisClient(KinesisClientConfig(fake_kinesis.endpoint, ACCESS, "nope"))
    with pytest.raises(IOError, match="403"):
        bad.list_shards("events")


def test_origin_batch_drains_all_shards_and_resumes(spark, fake_kinesis):
    fake_kinesis.seed(
        "events", [(f"key-{i}", json.dumps({"i": i}).encode()) for i in range(100)]
    )
    cfg = _cfg(fake_kinesis)
    df, off1 = kinesis_origin_batch(spark, cfg, "events")
    try:
        rows = df.collect()
        assert len(rows) == 100
        got = sorted(json.loads(bytes(r.data))["i"] for r in rows)
        assert got == list(range(100))
        # offsets cover every non-empty shard with its numeric max seq
        offs = json.loads(off1)
        assert set(offs) == {
            f"shardId-{i:012d}"
            for i in range(4)
            if fake_kinesis.streams["events"][i]
        }
    finally:
        df.unpersist()
    # second batch: new records only (AFTER_SEQUENCE_NUMBER resume)
    fake_kinesis.seed(
        "events", [(f"key-{i}", json.dumps({"i": i}).encode()) for i in range(100, 130)]
    )
    df2, off2 = kinesis_origin_batch(spark, cfg, "events", last_offsets=off1)
    try:
        got2 = sorted(json.loads(bytes(r.data))["i"] for r in df2.collect())
        assert got2 == list(range(100, 130))
    finally:
        df2.unpersist()
    # third: nothing new, offsets unchanged
    df3, off3 = kinesis_origin_batch(spark, cfg, "events", last_offsets=off2)
    try:
        assert df3.count() == 0 and off3 == off2
    finally:
        df3.unpersist()


def test_offset_max_is_numeric_not_lexicographic(spark, fake_kinesis):
    """Seeding crosses the 999999→1000000 width boundary: lexicographic max
    would pick 999999; numeric (width-aware) max must pick the 7-digit one."""
    fake_kinesis.seed("events", [("samekey", b"a")] * 5)  # seqs 999999..1000003
    df, off = kinesis_origin_batch(spark, _cfg(fake_kinesis), "events")
    try:
        offs = json.loads(off)
        (only_shard,) = offs
        assert offs[only_shard] == "1000003"
    finally:
        df.unpersist()


def test_latest_initial_position_skips_backlog(spark, fake_kinesis):
    fake_kinesis.seed("events", [(f"k{i}", b"old") for i in range(20)])
    df, off = kinesis_origin_batch(
        spark, _cfg(fake_kinesis), "events", initial_position="LATEST"
    )
    try:
        assert df.count() == 0
    finally:
        df.unpersist()


def test_target_roundtrip_through_origin(spark, fake_kinesis):
    cfg = _cfg(fake_kinesis)
    src = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).alias("v"),
    ).repartition(6)
    kinesis_target(src, cfg, "events", partition_key_col="k")
    assert fake_kinesis.total("events") == 200
    df, _ = kinesis_origin_batch(spark, cfg, "events")
    try:
        back = sorted(
            (json.loads(bytes(r.data))["k"], json.loads(bytes(r.data))["v"])
            for r in df.collect()
        )
        assert back == [(i, i % 9) for i in range(200)]
        # partition keys route deterministically: same key -> same shard
        by_key = {}
        for i, shard in enumerate(fake_kinesis.streams["events"]):
            for _, pk, _ in shard:
                assert by_key.setdefault(pk, i) == i
    finally:
        df.unpersist()
