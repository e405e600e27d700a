"""MongoDB origin + op-code-aware destination — from-scratch BSON codec and
OP_MSG wire client, jar-free, same pattern as the Cassandra/Redis/RabbitMQ
connectors.

Reference semantics (mongodb-protolib, cited file:line):

* Origin (``origin/mongodb/MongoDBSource.java``):
  - :183-220 ``prepareCursor`` — query ``{offsetField: {$gt: offset}}``
    sorted ascending on ``offsetField``; offset type OBJECTID (hex string
    offset, ``MongoDBSource.java:228-233``) or STRING (:170-175).
  - :94-160 ``produce`` — documents stream until batch size; the NEW offset
    is the last document's offset-field value; a document whose offset field
    is missing or of the wrong type goes to the error lane (MONGODB_05,
    :124-133).
  - ``initialOffset`` is required for OBJECTID mode (MONGODB_19, :63-74).
* Destination (``destination/mongodb/MongoDBTarget.java``):
  - :147-155 — per-record operation from the ``sdc.operation.type`` header
    (numeric codes, ``commonlib OperationType.java:30-35``: INSERT=1,
    DELETE=2, UPDATE=3, UPSERT=4), legacy ``SDC.MONGODB.OPERATION`` label
    fallback; a record with NO operation is an error record (MONGODB_15,
    :133-144), an unknown label is MONGODB_14 (:178-189).
  - :156-176 — INSERT -> ``InsertOneModel(doc)``; UPSERT ->
    ``ReplaceOneModel({uniqueKeyField: value}, doc, upsert=true)`` (the
    unique-key config is required for UPSERT, MONGODB_16/17/18
    validateUniqueKey); DELETE -> ``DeleteOneModel(doc)`` — the FULL
    document is the delete filter.
  - :203-212 — the whole batch rides ONE ordered ``bulkWrite``.

Wire protocol: the PUBLIC MongoDB wire format — BSON per bsonspec.org
(codec below, pinned to the spec's own example byte strings in
tests/test_mongodb.py) and OP_MSG (opcode 2013, MongoDB >= 3.6: int32
header quad, flagBits, one kind-0 body section per message).

Scale shape: the origin is a RANGE-PARTITIONED parallel scan — the driver
fetches only P-1 split-point VALUES of the offset field (skip/limit-1
probes, the same split strategy mongo-spark-connector derives from
splitVector), then each executor task scans its (lo, hi] slice over its own
connection inside ``mapInPandas``, paging with find/getMore.  The
destination is mapInPandas returning per-batch meters: one connection per
partition, consecutive same-op runs coalesced into single ordered
insert/update/delete commands (the wire form of the reference's one ordered
bulkWrite), chunked at ``max_batch``.  No document ever transits the
driver; concurrency = partitions.
"""

from __future__ import annotations

import datetime as _dt
import os
import socket
import struct
import threading
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.model import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    OP_UPSERT,
)

# --------------------------------------------------------------------- BSON


class ObjectId:
    """12-byte BSON ObjectId: 4-byte big-endian seconds + 5-byte process
    random + 3-byte big-endian counter (the public spec layout).  Ordering
    is bytewise, so ids generated later compare greater within one
    process — which is all the origin's ``$gt`` offset paging needs."""

    _counter = int.from_bytes(os.urandom(3), "big")
    _random = os.urandom(5)
    _lock = threading.Lock()

    __slots__ = ("binary",)

    def __init__(self, value: "bytes | str | ObjectId | None" = None):
        if value is None:
            with ObjectId._lock:
                ObjectId._counter = (ObjectId._counter + 1) & 0xFFFFFF
                counter = ObjectId._counter
            ts = int(_dt.datetime.now(_dt.timezone.utc).timestamp())
            self.binary = (
                struct.pack(">I", ts)
                + ObjectId._random
                + counter.to_bytes(3, "big")
            )
        elif isinstance(value, ObjectId):
            self.binary = value.binary
        elif isinstance(value, bytes):
            if len(value) != 12:
                raise ValueError("ObjectId must be 12 bytes")
            self.binary = value
        else:
            b = bytes.fromhex(value)
            if len(b) != 12:
                raise ValueError("ObjectId hex must be 24 chars")
            self.binary = b

    def __str__(self) -> str:
        return self.binary.hex()

    def __repr__(self) -> str:
        return f"ObjectId('{self.binary.hex()}')"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, ObjectId) and self.binary == other.binary

    def __lt__(self, other: "ObjectId") -> bool:
        return self.binary < other.binary

    def __le__(self, other: "ObjectId") -> bool:
        return self.binary <= other.binary

    def __hash__(self) -> int:
        return hash(self.binary)


class BsonTimestamp:
    """BSON type 0x11 (internal replication timestamp): uint64 packed as
    (seconds << 32) | ordinal.  Orders by the packed value — the oplog's
    natural order."""

    __slots__ = ("value",)

    def __init__(self, seconds_or_packed: int, ordinal: int | None = None):
        if ordinal is None:
            self.value = int(seconds_or_packed)
        else:
            self.value = (int(seconds_or_packed) << 32) | int(ordinal)
        if not 0 <= self.value < 2**64:
            raise ValueError("BSON timestamp out of uint64 range")

    @property
    def seconds(self) -> int:
        return self.value >> 32

    @property
    def ordinal(self) -> int:
        return self.value & 0xFFFFFFFF

    def __repr__(self) -> str:
        return f"BsonTimestamp({self.seconds}, {self.ordinal})"

    def __int__(self) -> int:
        return self.value

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, BsonTimestamp) and self.value == other.value

    def __lt__(self, other: "BsonTimestamp") -> bool:
        return self.value < other.value

    def __le__(self, other: "BsonTimestamp") -> bool:
        return self.value <= other.value

    def __gt__(self, other: "BsonTimestamp") -> bool:
        return self.value > other.value

    def __ge__(self, other: "BsonTimestamp") -> bool:
        return self.value >= other.value

    def __hash__(self) -> int:
        return hash(self.value)


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _encode_value(name: bytes, value: Any) -> bytes:
    """One element: type tag + cstring name + payload (bsonspec.org §4)."""
    if isinstance(value, bool):  # before int — bool is an int subclass
        return b"\x08" + name + b"\x00" + (b"\x01" if value else b"\x00")
    if isinstance(value, float):
        return b"\x01" + name + b"\x00" + struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return (
            b"\x02" + name + b"\x00" + struct.pack("<i", len(raw) + 1) + raw + b"\x00"
        )
    if isinstance(value, dict):
        return b"\x03" + name + b"\x00" + bson_encode(value)
    if isinstance(value, (list, tuple)):
        as_doc = {str(i): v for i, v in enumerate(value)}
        return b"\x04" + name + b"\x00" + bson_encode(as_doc)
    if isinstance(value, (bytes, bytearray)):
        raw = bytes(value)
        return (
            b"\x05" + name + b"\x00" + struct.pack("<i", len(raw)) + b"\x00" + raw
        )
    if isinstance(value, ObjectId):
        return b"\x07" + name + b"\x00" + value.binary
    if isinstance(value, BsonTimestamp):
        return b"\x11" + name + b"\x00" + struct.pack("<Q", value.value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        ms = int((value - _EPOCH).total_seconds() * 1000)
        return b"\x09" + name + b"\x00" + struct.pack("<q", ms)
    if value is None:
        return b"\x0a" + name + b"\x00"
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return b"\x10" + name + b"\x00" + struct.pack("<i", value)
        return b"\x12" + name + b"\x00" + struct.pack("<q", value)
    raise TypeError(f"BSON cannot encode {type(value).__name__}: {value!r}")


def bson_encode(doc: dict) -> bytes:
    """Document: int32 total length + elements + 0x00 terminator."""
    body = b"".join(_encode_value(str(k).encode("utf-8"), v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _decode_value(tag: int, data: bytes, pos: int) -> tuple[Any, int]:
    if tag == 0x01:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if tag == 0x02:
        (n,) = struct.unpack_from("<i", data, pos)
        s = data[pos + 4 : pos + 4 + n - 1].decode("utf-8")
        return s, pos + 4 + n
    if tag in (0x03, 0x04):
        (n,) = struct.unpack_from("<i", data, pos)
        sub = bson_decode(data[pos : pos + n])
        if tag == 0x04:
            return [sub[k] for k in sub], pos + n
        return sub, pos + n
    if tag == 0x05:
        (n,) = struct.unpack_from("<i", data, pos)
        return bytes(data[pos + 5 : pos + 5 + n]), pos + 5 + n
    if tag == 0x07:
        return ObjectId(bytes(data[pos : pos + 12])), pos + 12
    if tag == 0x08:
        return data[pos] == 1, pos + 1
    if tag == 0x09:
        (ms,) = struct.unpack_from("<q", data, pos)
        return _EPOCH + _dt.timedelta(milliseconds=ms), pos + 8
    if tag == 0x0A:
        return None, pos
    if tag == 0x10:
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if tag == 0x11:
        return BsonTimestamp(struct.unpack_from("<Q", data, pos)[0]), pos + 8
    if tag == 0x12:
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    raise ValueError(f"BSON: unsupported element type 0x{tag:02x}")


def bson_decode(data: bytes) -> dict:
    (total,) = struct.unpack_from("<i", data, 0)
    if total != len(data):
        raise ValueError(f"BSON: length header {total} != buffer {len(data)}")
    pos, out = 4, {}
    while data[pos] != 0x00:
        tag = data[pos]
        end = data.index(b"\x00", pos + 1)
        name = data[pos + 1 : end].decode("utf-8")
        out[name], pos = _decode_value(tag, data, end + 1)
    return out


# ------------------------------------------------------------------- OP_MSG

OP_MSG = 2013


class MongoError(Exception):
    """A command reply with ok != 1 (errmsg/codeName surfaced)."""


class MongoWireClient:
    """Minimal OP_MSG client: header quad + flagBits(0) + one kind-0 body
    section per message; replies parsed the same way."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._req = 0

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mongodb connection closed mid-reply")
            buf += chunk
        return bytes(buf)

    def command(self, db: str, cmd: dict) -> dict:
        """Run one command (command name must be the first key — dicts keep
        insertion order) and return the reply document; raise MongoError on
        ok != 1 (writeErrors are returned in-band, as the server does)."""
        body = dict(cmd)
        body["$db"] = db
        payload = struct.pack("<i", 0) + b"\x00" + bson_encode(body)
        self._req += 1
        header = struct.pack("<iiii", 16 + len(payload), self._req, 0, OP_MSG)
        self.sock.sendall(header + payload)

        length, _rid, _rto, opcode = struct.unpack("<iiii", self._recv_exact(16))
        frame = self._recv_exact(length - 16)
        if opcode != OP_MSG:
            raise MongoError(f"unexpected reply opcode {opcode}")
        if frame[4] != 0:
            raise MongoError(f"unexpected section kind {frame[4]}")
        reply = bson_decode(frame[5:])
        if reply.get("ok") != 1:
            raise MongoError(
                f"{reply.get('codeName', 'Error')}: {reply.get('errmsg', reply)}"
            )
        return reply

    def find_iter(
        self,
        db: str,
        coll: str,
        filter: dict,
        sort: dict | None = None,
        projection: dict | None = None,
        skip: int = 0,
        limit: int = 0,
        batch_size: int = 1000,
    ) -> Iterator[dict]:
        cmd: dict[str, Any] = {"find": coll, "filter": filter}
        if sort:
            cmd["sort"] = sort
        if projection:
            cmd["projection"] = projection
        if skip:
            cmd["skip"] = skip
        if limit:
            cmd["limit"] = limit
        cmd["batchSize"] = batch_size
        reply = self.command(db, cmd)
        cursor = reply["cursor"]
        yield from cursor["firstBatch"]
        cid = cursor["id"]
        while cid:
            reply = self.command(
                db, {"getMore": cid, "collection": coll, "batchSize": batch_size}
            )
            cursor = reply["cursor"]
            yield from cursor["nextBatch"]
            cid = cursor["id"]


# ------------------------------------------------------------------- origin


@dataclass
class MongoSourceConfig:
    """MongoSourceConfigBean.java:30-88 + MongoDBConfig.java:63-92."""

    host: str
    port: int
    database: str
    collection: str
    offset_field: str = "_id"
    offset_type: str = "OBJECTID"  # OBJECTID | STRING (OffsetFieldType.java)
    initial_offset: str = ""
    batch_size: int = 1000
    num_partitions: int = 4


def _offset_value(cfg: MongoSourceConfig, offset: str | None):
    """Offset string -> typed filter value (hex ObjectId or plain string);
    None/empty means scan from the beginning (STRING mode only —
    MongoDBSource.java:60-75: OBJECTID requires an initial offset)."""
    if not offset:
        return None
    if cfg.offset_type == "OBJECTID":
        return ObjectId(offset)
    return offset


def _coerce(value: Any, dtype: T.DataType) -> Any:
    if value is None:
        return None
    if isinstance(dtype, T.StringType):
        return str(value) if not isinstance(value, str) else value
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return int(value)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(value)
    return value


def mongodb_read_batch(
    spark: SparkSession,
    cfg: MongoSourceConfig,
    record_schema: T.StructType,
    last_offset: str | None = None,
) -> DataFrame:
    """One drain of ``{offsetField > last_offset}`` in ascending offset
    order (MongoDBSource.java:183-220), parallelized: the driver probes
    P-1 split VALUES (skip/limit-1, offset-field projection only), then
    each task range-scans (lo, hi] over its own connection.  The offset
    field must be in ``record_schema`` (string column for OBJECTID mode) —
    the next durable offset is its max, via :func:`mongodb_next_offset`."""
    if cfg.offset_type not in ("OBJECTID", "STRING"):
        raise ValueError(f"MONGODB_05: unknown offset type {cfg.offset_type!r}")
    if cfg.offset_type == "OBJECTID" and not (last_offset or cfg.initial_offset):
        raise ValueError(
            "MONGODB_19: OBJECTID offset mode requires an initial offset"
        )
    if cfg.offset_field not in record_schema.fieldNames():
        raise ValueError(
            f"offset field {cfg.offset_field!r} must be part of record_schema"
        )
    start = _offset_value(cfg, last_offset or cfg.initial_offset)

    base_filter: dict[str, Any] = (
        {cfg.offset_field: {"$gt": start}} if start is not None else {}
    )
    cli = MongoWireClient(cfg.host, cfg.port)
    try:
        n = cli.command(
            cfg.database, {"count": cfg.collection, "query": base_filter}
        )["n"]
        splits: list[str] = []
        if n and cfg.num_partitions > 1:
            step = max(1, (n + cfg.num_partitions - 1) // cfg.num_partitions)
            for k in range(1, cfg.num_partitions):
                if k * step >= n:
                    break
                probe = list(
                    cli.find_iter(
                        cfg.database,
                        cfg.collection,
                        base_filter,
                        sort={cfg.offset_field: 1},
                        projection={cfg.offset_field: 1},
                        skip=k * step,
                        limit=1,
                        batch_size=1,
                    )
                )
                if probe:
                    splits.append(str(probe[0][cfg.offset_field]))
    finally:
        cli.close()
    splits = sorted(set(splits))

    lo_bounds = [last_offset or cfg.initial_offset or ""] + splits
    hi_bounds = splits + [""]
    ranges = spark.createDataFrame(
        [(lo, hi) for lo, hi in zip(lo_bounds, hi_bounds)],
        "lo string, hi string",
    ).repartition(len(lo_bounds))

    host, port, db, coll = cfg.host, cfg.port, cfg.database, cfg.collection
    off_field, off_type, page = cfg.offset_field, cfg.offset_type, cfg.batch_size
    fields = [(f.name, f.dataType) for f in record_schema.fields]
    out_schema = T.StructType(list(record_schema.fields))

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        rcfg = MongoSourceConfig(
            host, port, db, coll, offset_field=off_field, offset_type=off_type
        )
        for pdf in batches:
            for lo, hi in pdf[["lo", "hi"]].itertuples(index=False):
                cond: dict[str, Any] = {}
                lo_v = _offset_value(rcfg, lo or None)
                hi_v = _offset_value(rcfg, hi or None)
                if lo_v is not None:
                    cond["$gt"] = lo_v
                if hi_v is not None:
                    cond["$lte"] = hi_v
                filt = {off_field: cond} if cond else {}
                client = MongoWireClient(host, port)
                try:
                    rows: list[list] = []
                    for doc in client.find_iter(
                        db, coll, filt, sort={off_field: 1}, batch_size=page
                    ):
                        rows.append(
                            [_coerce(doc.get(nm), dt) for nm, dt in fields]
                        )
                        if len(rows) >= page:
                            yield pd.DataFrame(
                                rows, columns=[nm for nm, _ in fields]
                            )
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows, columns=[nm for nm, _ in fields])
                finally:
                    client.close()

    return ranges.mapInPandas(scan, out_schema)


def mongodb_next_offset(df: DataFrame, cfg: MongoSourceConfig) -> str | None:
    """The durable offset after a drain: max offset-field value as a string
    (hex for OBJECTID — both orderings agree with the server's because the
    hex of a 12-byte big-endian id sorts like its bytes)."""
    row = df.agg(F.max(cfg.offset_field).alias("o")).first()
    return None if row is None or row["o"] is None else str(row["o"])


# ----------------------------------------------------------- oplog (CDC)


@dataclass
class MongoOplogConfig:
    """MongoDBOplogSourceConfigBean.java:30-66 — the oplog tail origin's
    knobs: initialTs/initialOrdinal (both must be set together,
    MONGODB_34/35 cross-check :70-90) and the oplog op-type filter."""

    host: str
    port: int
    database: str = "local"
    collection: str = "oplog.rs"
    initial_ts: int = -1
    initial_ordinal: int = -1
    filter_op_types: tuple = ("i", "u", "d")  # OplogOpType.java
    batch_size: int = 1000
    num_partitions: int = 4


def _oplog_start(cfg: MongoOplogConfig, last_offset: str | None):
    """Offset string is ``tsSeconds::ordinal``
    (MongoDBOplogSource.java:58,143-157); -1/-1 initials mean 'from the
    start of the oplog'."""
    if last_offset:
        s, _, o = last_offset.partition("::")
        return BsonTimestamp(int(s), int(o))
    if (cfg.initial_ts == -1) != (cfg.initial_ordinal == -1):
        raise ValueError(
            "MONGODB_34: initial_ts and initial_ordinal must be set together"
        )
    if cfg.initial_ts > 0 and cfg.initial_ordinal >= 0:
        return BsonTimestamp(cfg.initial_ts, cfg.initial_ordinal)
    return None


def _oplog_filter(cfg: MongoOplogConfig, gt=None, lte=None) -> dict:
    """ts range AND op-type membership (MongoDBOplogSource.java:171-191 —
    the reference ors per-type eq filters; ``$in`` is the equivalent
    server-side form)."""
    filt: dict[str, Any] = {}
    cond: dict[str, Any] = {}
    if gt is not None:
        cond["$gt"] = gt
    if lte is not None:
        cond["$lte"] = lte
    if cond:
        filt["ts"] = cond
    if cfg.filter_op_types:
        filt["op"] = {"$in": list(cfg.filter_op_types)}
    return filt


def mongodb_oplog_read_batch(
    spark: SparkSession,
    cfg: MongoOplogConfig,
    last_offset: str | None = None,
) -> DataFrame:
    """One drain of the oplog tail past the ``ts`` offset
    (MongoDBOplogSource.java:100-160: tailable cursor over the capped
    ``local.oplog.rs`` in natural == ts order, entries filtered to the
    configured op types).  ``ts`` is monotone, so the drain parallelizes
    exactly like the regular origin: P-1 split-VALUE probes, then each
    executor task range-scans (lo, hi] over its own connection.

    Output: ``ts`` (the packed uint64 BSON timestamp, the durable-offset
    column) + ``json`` (the full entry as a JSON string) — the shape
    ``changelog_formats.decode_mongo_oplog`` takes into the CDC envelope,
    rescaling ts into (lsn, seq_in_tx) losslessly."""
    start = _oplog_start(cfg, last_offset)
    cli = MongoWireClient(cfg.host, cfg.port)
    try:
        base = _oplog_filter(cfg, gt=start)
        n = cli.command(
            cfg.database, {"count": cfg.collection, "query": base}
        )["n"]
        splits: list[int] = []
        if n and cfg.num_partitions > 1:
            step = max(1, (n + cfg.num_partitions - 1) // cfg.num_partitions)
            for k in range(1, cfg.num_partitions):
                if k * step >= n:
                    break
                probe = list(
                    cli.find_iter(
                        cfg.database,
                        cfg.collection,
                        base,
                        sort={"ts": 1},
                        projection={"ts": 1},
                        skip=k * step,
                        limit=1,
                        batch_size=1,
                    )
                )
                if probe:
                    splits.append(probe[0]["ts"].value)
    finally:
        cli.close()
    splits = sorted(set(splits))

    lo0 = str(start.value) if start is not None else ""
    lo_bounds = [lo0] + [str(s) for s in splits]
    hi_bounds = [str(s) for s in splits] + [""]
    ranges = spark.createDataFrame(
        list(zip(lo_bounds, hi_bounds)), "lo string, hi string"
    ).repartition(len(lo_bounds))

    host, port, db, coll = cfg.host, cfg.port, cfg.database, cfg.collection
    ops, page = tuple(cfg.filter_op_types), cfg.batch_size

    def scan(batches: Iterator) -> Iterator:
        import json as _json

        import pandas as pd

        rcfg = MongoOplogConfig(host, port, db, coll, filter_op_types=ops)
        for pdf in batches:
            for lo, hi in pdf[["lo", "hi"]].itertuples(index=False):
                filt = _oplog_filter(
                    rcfg,
                    gt=BsonTimestamp(int(lo)) if lo else None,
                    lte=BsonTimestamp(int(hi)) if hi else None,
                )
                client = MongoWireClient(host, port)
                try:
                    ts_vals: list[int] = []
                    jsons: list[str] = []
                    for doc in client.find_iter(
                        db, coll, filt, sort={"ts": 1}, batch_size=page
                    ):
                        ts = doc["ts"].value
                        if ts >= 2**63:
                            raise ValueError(
                                f"oplog ts {ts} exceeds int64 (corrupt entry)"
                            )
                        entry = {
                            "op": doc.get("op"),
                            "ts": ts,
                            "h": doc.get("h"),
                            "ns": doc.get("ns"),
                            "o": doc.get("o"),
                            "o2": doc.get("o2"),
                        }
                        ts_vals.append(ts)
                        jsons.append(_json.dumps(entry, default=str))
                        if len(ts_vals) >= page:
                            yield pd.DataFrame({"ts": ts_vals, "json": jsons})
                            ts_vals, jsons = [], []
                    if ts_vals:
                        yield pd.DataFrame({"ts": ts_vals, "json": jsons})
                finally:
                    client.close()

    return ranges.mapInPandas(scan, "ts long, json string")


def mongodb_oplog_next_offset(df: DataFrame) -> str | None:
    """Durable ``tsSeconds::ordinal`` offset after a drain
    (MongoDBOplogSource.java createOffset)."""
    row = df.agg(F.max("ts").alias("t")).first()
    if row is None or row["t"] is None:
        return None
    t = BsonTimestamp(int(row["t"]))
    return f"{t.seconds}::{t.ordinal}"


def mongodb_oplog_spool_tail(
    spark: SparkSession,
    cfg: MongoOplogConfig,
    spool_dir: str,
    offset_path: str,
    payload_schema: dict[str, str],
) -> tuple[int, str | None]:
    """One tail-and-land cycle wiring the oplog into the STREAMING CDC
    ingest: drain past the durable offset, decode to the engine's changelog
    envelope (``changelog_formats.decode_mongo_oplog``), extract
    ``payload_schema`` ({column: spark-sql type}) from the after-image map,
    and land the batch ATOMICALLY as parquet part-files in the spool dir
    the ``CdcIngestPipeline`` file stream tails (the HTTP push origin's
    tmp+rename landing, applied to the oplog).

    The offset file advances only AFTER the segment is visible, so a crash
    in between re-lands the same events — safe by design: duplicates share
    (lsn, seq_in_tx), and the pipeline's dedup + LWW collapse + ``s.lsn >
    t._lsn`` merge guard make re-delivery a no-op on final state
    (at-least-once landing, exactly-once apply).

    Returns (events_landed, new_offset)."""
    import json
    import shutil
    import uuid

    from datacollector_spark.sources.changelog_formats import decode_mongo_oplog

    last: str | None = None
    if os.path.exists(offset_path):
        with open(offset_path) as fh:
            last = json.load(fh).get("offset") or None

    raw = mongodb_oplog_read_batch(spark, cfg, last_offset=last).persist()
    try:
        n = raw.count()
        if n == 0:
            return 0, last
        env = decode_mongo_oplog(raw, "json")
        payload = [
            F.col("data")[c].cast(t).alias(c) for c, t in payload_schema.items()
        ]
        old = [
            F.lit(None).cast(t).alias(f"old_{c}")
            for c, t in payload_schema.items()
            if c not in ("conv_id", "turn_idx")
        ]
        typed = env.select(
            "op", "lsn", "seq_in_tx", "src_table", "server_id", "commit_ts",
            *payload, *old,
        )
        tag = uuid.uuid4().hex
        tmp = os.path.join(spool_dir, f".tmp-{tag}")
        typed.write.parquet(tmp)
        os.makedirs(spool_dir, exist_ok=True)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, f),
                    os.path.join(spool_dir, f"seg-{tag}-{f}"),
                )
        shutil.rmtree(tmp)
        new_offset = mongodb_oplog_next_offset(raw)
        otmp = offset_path + ".tmp"
        with open(otmp, "w") as fh:
            json.dump({"offset": new_offset}, fh)
        os.replace(otmp, offset_path)
        return n, new_offset
    finally:
        raw.unpersist()


# -------------------------------------------------------------- destination


@dataclass
class MongoTargetConfig:
    """MongoTargetConfigBean.java:30-54."""

    host: str
    port: int
    database: str
    collection: str
    unique_key_field: str = "_id"
    op_column: str = "sdc_op"  # sdc.operation.type as a column (house rule)
    max_batch: int = 1000


def _pythonize(v: Any, pd) -> Any:
    """Arrow/pandas scalar -> plain Python for the BSON encoder: numpy
    scalars unwrap via .item() (keeps bool a bool), Timestamps become
    datetimes, NaN/NaT become BSON null."""
    if v is None or isinstance(v, (str, bytes, bool, dict, list)):
        return v
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def mongodb_write(df: DataFrame, cfg: MongoTargetConfig) -> DataFrame:
    """Op-code-aware bulk apply (MongoDBTarget.java:120-212): every row
    becomes a document (minus the op column); INSERT(1) -> insert,
    UPSERT(4)/UPDATE(3) -> replaceOne on ``unique_key_field`` with
    upsert=true (the reference treats both through ReplaceOneModel),
    DELETE(2) -> deleteOne with the full document as filter; a null or
    unknown op is an error record (MONGODB_15/14).  Consecutive same-op
    runs coalesce into single ordered commands — the wire equivalent of the
    reference's one ordered bulkWrite — chunked at ``max_batch``.

    Ordering holds WITHIN a partition (like one reference runner); for CDC
    apply, pre-collapse per key (operators/collapse.py) so cross-partition
    order cannot matter.  Returns per-Arrow-batch meters."""
    if cfg.op_column not in df.columns:
        raise ValueError(f"MONGODB_15: op column {cfg.op_column!r} missing")
    if cfg.unique_key_field not in df.columns:
        raise ValueError(
            f"MONGODB_18: unique key field {cfg.unique_key_field!r} missing"
        )
    host, port, db, coll = cfg.host, cfg.port, cfg.database, cfg.collection
    key_f, op_col, max_batch = cfg.unique_key_field, cfg.op_column, cfg.max_batch
    doc_cols = [c for c in df.columns if c != op_col]

    def apply(batches: Iterator) -> Iterator:
        import pandas as pd

        client = MongoWireClient(host, port)

        def flush(op: int, docs: list[dict]) -> tuple[int, int]:
            """Returns (applied, write_errors)."""
            if not docs:
                return 0, 0
            if op == OP_INSERT:
                reply = client.command(
                    db, {"insert": coll, "documents": docs, "ordered": True}
                )
                return reply.get("n", 0), len(reply.get("writeErrors", []))
            if op in (OP_UPSERT, OP_UPDATE):
                reply = client.command(
                    db,
                    {
                        "update": coll,
                        "updates": [
                            {
                                "q": {key_f: d[key_f]},
                                "u": d,
                                "upsert": True,
                                "multi": False,
                            }
                            for d in docs
                        ],
                        "ordered": True,
                    },
                )
                return reply.get("n", 0), len(reply.get("writeErrors", []))
            reply = client.command(
                db,
                {
                    "delete": coll,
                    "deletes": [{"q": d, "limit": 1} for d in docs],
                    "ordered": True,
                },
            )
            return reply.get("n", 0), len(reply.get("writeErrors", []))

        try:
            for pdf in batches:
                counts = {OP_INSERT: 0, OP_UPSERT: 0, OP_DELETE: 0}
                errors = 0
                run_op: int | None = None
                run: list[dict] = []
                for rec in pdf.to_dict("records"):
                    op = rec.get(op_col)
                    op = None if pd.isna(op) else int(op)
                    if op == OP_UPDATE:
                        op = OP_UPSERT
                    if op not in counts:
                        errors += 1  # MONGODB_15 (missing) / MONGODB_14
                        continue
                    doc = {c: _pythonize(rec[c], pd) for c in doc_cols}
                    if op != run_op or len(run) >= max_batch:
                        if run:
                            n, e = flush(run_op, run)
                            counts[run_op] += n
                            errors += e
                        run_op, run = op, []
                    run.append(doc)
                if run:
                    n, e = flush(run_op, run)
                    counts[run_op] += n
                    errors += e
                yield pd.DataFrame(
                    {
                        "inserted": [counts[OP_INSERT]],
                        "upserted": [counts[OP_UPSERT]],
                        "deleted": [counts[OP_DELETE]],
                        "errors": [errors],
                    }
                )
        finally:
            client.close()

    return df.mapInPandas(
        apply, "inserted long, upserted long, deleted long, errors long"
    )
