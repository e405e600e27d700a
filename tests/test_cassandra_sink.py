"""Cassandra destination — live loopback fake speaking CQL native protocol
v4 (independent frame decoder; STARTUP/READY, PREPARE with ids, BATCH of
prepared executions with typed value decoding).

Reference: cassandra-protolib/.../destination/cassandra/CassandraTarget.java."""
from __future__ import annotations

import socketserver
import struct
import threading

import pytest
from pyspark.sql import functions as F

from datacollector_spark.sources.cassandra import (
    CassandraConfig,
    CqlConnection,
    cassandra_target,
    encode_value,
)

OP_ERROR, OP_STARTUP, OP_READY = 0x00, 0x01, 0x02
OP_RESULT, OP_PREPARE, OP_BATCH = 0x08, 0x09, 0x0D


class FakeCassandra:
    """Stores prepared CQL by id and decodes every BATCH back into
    (cql, values) pairs using its own reading of the v4 spec."""

    def __init__(self):
        self.prepared: dict[bytes, str] = {}
        self.batches: list[dict] = []  # {type, consistency, rows: [(cql, values)]}
        self._lock = threading.Lock()
        fake = self

        class Handler(socketserver.StreamRequestHandler):
            def _recv_exact(self, n):
                buf = b""
                while len(buf) < n:
                    chunk = self.rfile.read(n - len(buf))
                    if not chunk:
                        return None
                    buf += chunk
                return buf

            def _send(self, stream, opcode, body=b""):
                self.wfile.write(
                    struct.pack(">BBhBi", 0x84, 0, stream, opcode, len(body)) + body
                )

            def handle(self):
                while True:
                    header = self._recv_exact(9)
                    if header is None:
                        return
                    ver, flags, stream, op, length = struct.unpack(">BBhBi", header)
                    body = self._recv_exact(length) if length else b""
                    if ver != 0x04:
                        return self._send(stream, OP_ERROR, struct.pack(">iH", 0xA, 0))
                    if op == OP_STARTUP:
                        self._send(stream, OP_READY)
                    elif op == OP_PREPARE:
                        (qlen,) = struct.unpack(">i", body[:4])
                        cql = body[4 : 4 + qlen].decode()
                        with fake._lock:
                            pid = struct.pack(">I", len(fake.prepared) + 1)
                            fake.prepared[pid] = cql
                        # RESULT kind=4 Prepared: id + empty metadata stubs
                        resp = (
                            struct.pack(">i", 0x0004)
                            + struct.pack(">H", len(pid)) + pid
                            + struct.pack(">iii", 0, 0, 0)   # flags, col count, pk count
                            + struct.pack(">ii", 0, 0)       # result metadata stub
                        )
                        self._send(stream, OP_RESULT, resp)
                    elif op == OP_BATCH:
                        pos = 0
                        btype = body[pos]; pos += 1
                        (n,) = struct.unpack_from(">H", body, pos); pos += 2
                        rows = []
                        for _ in range(n):
                            kind = body[pos]; pos += 1
                            assert kind == 1, "expected prepared-id kind"
                            (idlen,) = struct.unpack_from(">H", body, pos); pos += 2
                            pid = body[pos : pos + idlen]; pos += idlen
                            (nv,) = struct.unpack_from(">H", body, pos); pos += 2
                            vals = []
                            for _ in range(nv):
                                (vlen,) = struct.unpack_from(">i", body, pos); pos += 4
                                if vlen < 0:
                                    vals.append(None)
                                else:
                                    vals.append(body[pos : pos + vlen]); pos += vlen
                            rows.append((fake.prepared[pid], vals))
                        (cons,) = struct.unpack_from(">H", body, pos); pos += 2
                        with fake._lock:
                            fake.batches.append(
                                {"type": btype, "consistency": cons, "rows": rows}
                            )
                        # RESULT kind=1 Void
                        self._send(stream, OP_RESULT, struct.pack(">i", 0x0001))
                    else:
                        self._send(stream, OP_ERROR, struct.pack(">iH", 0xA, 0))

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def all_rows(self):
        return [r for b in self.batches for r in b["rows"]]

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


@pytest.fixture()
def fake_cassandra():
    f = FakeCassandra()
    yield f
    f.stop()


def _cfg(f, **kw):
    return CassandraConfig(f.host, f.port, **kw)


def test_value_encoding_spec_formats():
    assert encode_value(None) == struct.pack(">i", -1)
    assert encode_value(True) == struct.pack(">i", 1) + b"\x01"
    assert encode_value(7) == struct.pack(">i", 8) + struct.pack(">q", 7)
    assert encode_value(1.5) == struct.pack(">i", 8) + struct.pack(">d", 1.5)
    assert encode_value("hé") == struct.pack(">i", 3) + "hé".encode()
    with pytest.raises(TypeError, match="CASSANDRA_06"):
        encode_value(object())


def test_handshake_prepare_batch(fake_cassandra):
    conn = CqlConnection(_cfg(fake_cassandra))
    pid = conn.prepare("INSERT INTO ks.t (a, b) VALUES (?, ?);")
    conn.batch([(pid, [1, "x"]), (pid, [2, "y"])], "UNLOGGED", "QUORUM")
    conn.close()
    assert fake_cassandra.batches[0]["type"] == 1  # UNLOGGED
    assert fake_cassandra.batches[0]["consistency"] == 0x4  # QUORUM
    rows = fake_cassandra.all_rows()
    assert rows[0][0] == "INSERT INTO ks.t (a, b) VALUES (?, ?);"
    assert struct.unpack(">q", rows[0][1][0])[0] == 1
    assert rows[1][1][1] == b"y"


def test_target_validation():
    import pyspark.sql.session as _s  # noqa: F401 — spark fixture not needed

    cfg = CassandraConfig("127.0.0.1", 1)
    with pytest.raises(ValueError, match="CASSANDRA_02"):
        cassandra_target(None, cfg, "no_keyspace", {"a": "a"})


def test_target_writes_with_null_column_splitting(spark, fake_cassandra):
    """Rows with null columns use a DIFFERENT prepared INSERT (present-column
    set), matching CassandraTarget.java:294-335; batches flush per
    max_batch_size."""
    df = spark.range(30).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n-"), F.col("id")).alias("name"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") * 1.5).alias("score"),
    ).coalesce(1)
    cassandra_target(
        df,
        _cfg(fake_cassandra, batch_type="UNLOGGED", max_batch_size=8,
             consistency="LOCAL_ONE"),
        "ks.users",
        {"k": "k", "name": "name_c", "score": "score_c"},
    )
    rows = fake_cassandra.all_rows()
    assert len(rows) == 30
    full = [r for r in rows if "score_c" in r[0]]
    partial = [r for r in rows if "score_c" not in r[0]]
    assert len(partial) == 10 and len(full) == 20
    assert partial[0][0] == "INSERT INTO ks.users (k, name_c) VALUES (?, ?);"
    assert full[0][0] == "INSERT INTO ks.users (k, name_c, score_c) VALUES (?, ?, ?);"
    # typed decode round-trip on a full row
    k, name, score = full[0][1]
    kv = struct.unpack(">q", k)[0]
    assert name.decode() == f"n-{kv}"
    assert struct.unpack(">d", score)[0] == kv * 1.5
    # 30 statements at max_batch_size=8 -> 4 BATCH frames
    assert [len(b["rows"]) for b in fake_cassandra.batches] == [8, 8, 8, 6]
    assert all(b["consistency"] == 0xA for b in fake_cassandra.batches)
