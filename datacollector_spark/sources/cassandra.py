"""Cassandra destination — from-scratch CQL native protocol v4 client.

Reference semantics (cassandra-protolib/.../destination/cassandra/
CassandraTarget.java, cited file:line):

* :136-180 — ``qualifiedTableName`` must be ``keyspace.table``
  (CASSANDRA_02); one PREPARED ``INSERT INTO t (cols) VALUES (?...)`` per
  DISTINCT present-column set, cached (:101, :163-180, :327).
* :294-335 — null/missing mapped fields are dropped from the column set for
  that row (Cassandra can't bind nulls without tombstoning), so rows group
  by their present columns.
* :255-285 — statements accumulate into a BatchStatement (LOGGED /
  UNLOGGED / COUNTER, default LOGGED) flushed at ``maxBatchSize``.

Wire protocol: the PUBLIC CQL binary protocol v4 (the Apache Cassandra
``native_protocol_v4.spec``) implemented directly over a TCP socket — frame
header ``version|flags|stream|opcode|length``, STARTUP→READY handshake,
PREPARE→RESULT(prepared id), and BATCH frames of prepared executions. No
driver jar, no compression (flags 0 — LZ4 in the reference is a transport
option, not a semantic).

Typed value serialization follows the v4 binary formats for the types a
DataFrame row carries: None→null(-1), bool→1 byte, int→bigint 8B BE,
float→double 8B BE, str→UTF-8, bytes→blob, datetime→timestamp ms.
The test fake decodes the same spec formats independently and the
round-trip is asserted value-for-value.

Scale shape: ``foreachPartition`` — one connection and one prepared-
statement cache per partition, batches flushed executor-side; concurrency =
partitions, like the driver's session pooling under the reference's
record-at-a-time loop.
"""
from __future__ import annotations

import datetime as _dt
import socket
import struct
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame

# opcodes (native_protocol_v4.spec §2.4)
OP_ERROR = 0x00
OP_STARTUP = 0x01
OP_READY = 0x02
OP_QUERY = 0x07
OP_RESULT = 0x08
OP_PREPARE = 0x09
OP_EXECUTE = 0x0A
OP_BATCH = 0x0D

CONSISTENCY = {
    "ANY": 0x0, "ONE": 0x1, "TWO": 0x2, "THREE": 0x3, "QUORUM": 0x4,
    "ALL": 0x5, "LOCAL_QUORUM": 0x6, "EACH_QUORUM": 0x7, "SERIAL": 0x8,
    "LOCAL_SERIAL": 0x9, "LOCAL_ONE": 0xA,
}
BATCH_TYPE = {"LOGGED": 0, "UNLOGGED": 1, "COUNTER": 2}


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _long_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + b


def _short_bytes(b: bytes) -> bytes:
    return struct.pack(">H", len(b)) + b


def encode_value(v) -> bytes:
    """[bytes] framing of one bound value (v4 §6: -1 length = null)."""
    if v is None:
        return struct.pack(">i", -1)
    if isinstance(v, bool):
        raw = b"\x01" if v else b"\x00"
    elif isinstance(v, int):
        raw = struct.pack(">q", v)
    elif isinstance(v, float):
        raw = struct.pack(">d", v)
    elif isinstance(v, str):
        raw = v.encode("utf-8")
    elif isinstance(v, (bytes, bytearray)):
        raw = bytes(v)
    elif isinstance(v, _dt.datetime):
        raw = struct.pack(">q", int(v.timestamp() * 1000))
    else:
        raise TypeError(f"CASSANDRA_06: unsupported bind type {type(v).__name__}")
    return struct.pack(">i", len(raw)) + raw


@dataclass(frozen=True)
class CassandraConfig:
    host: str
    port: int = 9042
    consistency: str = "LOCAL_QUORUM"
    batch_type: str = "LOGGED"  # CassandraTargetConfig.java:82-88
    max_batch_size: int = 65535  # CassandraTargetConfig.java:93-100
    timeout_s: float = 10.0


class CqlConnection:
    """Minimal v4 connection: handshake, prepare, execute, batch."""

    def __init__(self, config: CassandraConfig):
        self.c = config
        self._stream = 0
        self.sock = socket.create_connection(
            (config.host, config.port), timeout=config.timeout_s
        )
        body = struct.pack(">H", 1) + _string("CQL_VERSION") + _string("3.0.0")
        op, resp = self._request(OP_STARTUP, body)
        if op != OP_READY:
            raise IOError(f"CASSANDRA_03: startup failed (opcode 0x{op:02x})")

    def _request(self, opcode: int, body: bytes) -> tuple[int, bytes]:
        self._stream = (self._stream + 1) % 0x7FFF
        frame = struct.pack(">BBhBi", 0x04, 0, self._stream, opcode, len(body)) + body
        self.sock.sendall(frame)
        header = self._recv_exact(9)
        _ver, _flags, _stream, op, length = struct.unpack(">BBhBi", header)
        resp = self._recv_exact(length) if length else b""
        if op == OP_ERROR:
            code = struct.unpack(">i", resp[:4])[0]
            msg_len = struct.unpack(">H", resp[4:6])[0]
            raise IOError(
                f"CASSANDRA server error 0x{code:04x}: "
                f"{resp[6 : 6 + msg_len].decode('utf-8', 'replace')}"
            )
        return op, resp

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise IOError("CASSANDRA: connection closed mid-frame")
            buf += chunk
        return buf

    def prepare(self, cql: str) -> bytes:
        op, resp = self._request(OP_PREPARE, _long_string(cql))
        kind = struct.unpack(">i", resp[:4])[0]
        if op != OP_RESULT or kind != 0x0004:  # RESULT::Prepared
            raise IOError(f"CASSANDRA: unexpected prepare result kind {kind}")
        id_len = struct.unpack(">H", resp[4:6])[0]
        return resp[6 : 6 + id_len]

    def batch(
        self, statements: list[tuple[bytes, list]], batch_type: str, consistency: str
    ) -> None:
        """BATCH frame (v4 §4.1.7) of prepared executions."""
        if not statements:
            return
        body = bytearray()
        body.append(BATCH_TYPE[batch_type])
        body += struct.pack(">H", len(statements))
        for prepared_id, values in statements:
            body.append(1)  # kind 1 = prepared id
            body += _short_bytes(prepared_id)
            body += struct.pack(">H", len(values))
            for v in values:
                body += encode_value(v)
        body += struct.pack(">H", CONSISTENCY[consistency])
        body.append(0)  # flags
        self._request(OP_BATCH, bytes(body))

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def cassandra_target(
    df: DataFrame,
    config: CassandraConfig,
    qualified_table: str,
    column_map: dict[str, str],
) -> None:
    """Write the frame: ``column_map`` = {dataframe column -> cassandra
    column} (the reference's columnNames mapping); per row, null columns are
    dropped and the INSERT for that row's present-column set comes from the
    per-partition prepared cache; statements flush in BATCH frames of
    ``max_batch_size``."""
    if "." not in qualified_table:
        raise ValueError(
            f"CASSANDRA_02: qualified table name '{qualified_table}' must be "
            "<keyspace>.<table>"
        )
    missing = [c for c in column_map if c not in df.columns]
    if missing:
        raise ValueError(f"CASSANDRA_08: mapped columns absent: {missing}")
    cols = list(column_map)

    def write_partition(rows):
        conn = None
        prepared: dict[tuple[str, ...], bytes] = {}
        pending: list[tuple[bytes, list]] = []
        try:
            for row in rows:
                if conn is None:
                    conn = CqlConnection(config)
                d = row.asDict()
                present = tuple(
                    sorted(c for c in cols if d[c] is not None)
                )  # sorted set of present columns (CassandraTarget.java:296)
                if not present:
                    continue
                if present not in prepared:
                    names = ", ".join(column_map[c] for c in present)
                    marks = ", ".join("?" for _ in present)
                    prepared[present] = conn.prepare(
                        f"INSERT INTO {qualified_table} ({names}) VALUES ({marks});"
                    )
                pending.append((prepared[present], [d[c] for c in present]))
                if len(pending) >= config.max_batch_size:
                    conn.batch(pending, config.batch_type, config.consistency)
                    pending = []
            if conn is not None and pending:
                conn.batch(pending, config.batch_type, config.consistency)
        finally:
            if conn is not None:
                conn.close()

    df.select(*cols).foreachPartition(write_partition)
