"""Pure-Python Avro: binary datum codec + Object Container File reader/writer,
no spark-avro jar required.

The reference ships Avro as a first-class data format
(``commonlib/.../lib/parser/avro/AvroDataFileParser.java``,
``AvroMessageParser.java``; generator ``lib/generator/avro/``). This module
implements the same wire format from the PUBLIC Apache Avro 1.11
specification (binary encoding + object container files):

 * zig-zag varint ints/longs, little-endian float/double, length-prefixed
   bytes/string, block-encoded arrays/maps, union-index-prefixed unions,
   enums as int position, fixed as raw bytes;
 * OCF layout: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
   ``avro.codec``), 16-byte sync marker, then blocks of
   ``(count, byte-size, data, sync)``; codecs ``null`` and ``deflate``
   (raw zlib, RFC 1951).

Spark integration is Arrow-batched, never per-row Python:

 * ``read_avro_files``: ``binaryFile`` source (one task per file — the same
   per-file parallelism unit as the reference's directory spooler) →
   ``mapInPandas`` decode → typed columns. At 100 TB the parallelism is the
   file count, which is how Avro landing zones are laid out (many
   rotation-sized files); within a task decode is sequential exactly like the
   JVM DataFileReader.
 * ``from_avro_py`` / ``to_avro_py``: message-framed datum column decode /
   encode (Kafka-style value payloads) inside ``mapInPandas``.

When the spark-avro jar IS present, ``sources.formats.parse_avro`` uses the
native JVM path; this module is the jar-free fallback and the spec oracle the
tests pin byte-level behavior against.

Supported schema subset (what SDC pipelines actually move): null, boolean,
int, long, float, double, bytes, string, record, array, map, 2-branch
nullable unions, enum, fixed, and the logical types date,
timestamp-millis/micros. Unsupported shapes raise by name.
"""
from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string"
}


# --------------------------------------------------------------------------
# varint / zig-zag (Avro spec "Binary encoding > primitive types")
# --------------------------------------------------------------------------
def _encode_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)  # zig-zag
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: io.BytesIO) -> int:
    shift = 0
    accum = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        accum |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)  # un-zig-zag


# --------------------------------------------------------------------------
# schema handling
# --------------------------------------------------------------------------
def _norm_schema(schema: Any) -> Any:
    """Accept a JSON document string, a bare type name ('long'), or an
    already-parsed schema object."""
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith(("{", "[", '"')):
            return json.loads(s)
        return s  # bare primitive/named-type reference
    return schema


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _nullable_branch(schema: list) -> Any:
    """The non-null branch of a 2-branch nullable union; raises otherwise."""
    branches = [s for s in schema if _schema_type(s) != "null"]
    if len(schema) != 2 or len(branches) != 1:
        raise NotImplementedError(
            f"only 2-branch nullable unions are supported, got {schema!r}"
        )
    return branches[0]


def avro_to_spark_type(schema: Any) -> T.DataType:
    """Avro schema (JSON) → Spark type, logical types honored."""
    schema = _norm_schema(schema)
    t = _schema_type(schema)
    if t == "union":
        return avro_to_spark_type(_nullable_branch(schema))
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if logical == "date":
        return T.DateType()
    if logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    simple = {
        "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
        "bytes": T.BinaryType(), "string": T.StringType(),
    }
    if t in simple:
        return simple[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    raise NotImplementedError(f"avro type {t!r} not supported")


# --------------------------------------------------------------------------
# datum decoder
# --------------------------------------------------------------------------
def _decoder(schema: Any) -> Callable[[io.BytesIO], Any]:
    """Compile the schema once into a closure tree (no per-datum dispatch on
    schema JSON — the compile cost is paid per Arrow batch, not per row)."""
    schema = _norm_schema(schema)
    t = _schema_type(schema)
    if t == "union":
        branches = [(_schema_type(s), _decoder(s) if _schema_type(s) != "null" else None)
                    for s in schema]

        def read_union(buf, branches=branches):
            idx = _decode_long(buf)
            kind, fn = branches[idx]
            return None if kind == "null" else fn(buf)

        return read_union
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return lambda buf: None
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t in ("int", "long"):
        if logical == "date":
            import datetime as _dt

            epoch = _dt.date(1970, 1, 1)
            return lambda buf: epoch + _dt.timedelta(days=_decode_long(buf))
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime as _dt

            unit = 1_000 if logical == "timestamp-millis" else 1_000_000
            epoch = _dt.datetime(1970, 1, 1)

            def read_ts(buf, unit=unit, epoch=epoch):
                v = _decode_long(buf)
                return epoch + _dt.timedelta(microseconds=v * (1_000_000 // unit))

            return read_ts
        return _decode_long
    if t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return lambda buf: buf.read(_decode_long(buf))
    if t == "string":
        return lambda buf: buf.read(_decode_long(buf)).decode("utf-8")
    if t == "record":
        readers = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def read_record(buf, readers=readers):
            return {name: fn(buf) for name, fn in readers}

        return read_record
    if t == "array":
        item = _decoder(schema["items"])

        def read_array(buf, item=item):
            out = []
            while True:
                count = _decode_long(buf)
                if count == 0:
                    return out
                if count < 0:  # block with byte-size prefix
                    count = -count
                    _decode_long(buf)  # skip byte size
                for _ in range(count):
                    out.append(item(buf))

        return read_array
    if t == "map":
        val = _decoder(schema["values"])

        def read_map(buf, val=val):
            out = {}
            while True:
                count = _decode_long(buf)
                if count == 0:
                    return out
                if count < 0:
                    count = -count
                    _decode_long(buf)
                for _ in range(count):
                    k = buf.read(_decode_long(buf)).decode("utf-8")
                    out[k] = val(buf)

        return read_map
    if t == "enum":
        symbols = schema["symbols"]
        return lambda buf: symbols[_decode_long(buf)]
    if t == "fixed":
        size = schema["size"]
        return lambda buf: buf.read(size)
    raise NotImplementedError(f"avro type {t!r} not supported")


# --------------------------------------------------------------------------
# datum encoder
# --------------------------------------------------------------------------
def _encoder(schema: Any) -> Callable[[Any], bytes]:
    schema = _norm_schema(schema)
    t = _schema_type(schema)
    if t == "union":
        idx_null = next(
            (i for i, s in enumerate(schema) if _schema_type(s) == "null"), None
        )
        branch = _nullable_branch(schema)
        idx_val = 1 - idx_null if idx_null is not None else 0
        enc = _encoder(branch)

        def write_union(v, enc=enc):
            if v is None:
                return _encode_long(idx_null)
            return _encode_long(idx_val) + enc(v)

        return write_union
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return lambda v: b""
    if t == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        if logical == "date":
            import datetime as _dt

            epoch = _dt.date(1970, 1, 1)
            return lambda v: _encode_long((v - epoch).days)
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime as _dt

            unit = 1_000 if logical == "timestamp-millis" else 1_000_000
            epoch = _dt.datetime(1970, 1, 1)

            def write_ts(v, unit=unit, epoch=epoch):
                td = v - epoch  # integer µs arithmetic — no float rounding
                micros = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
                return _encode_long(micros // (1_000_000 // unit))

            return write_ts
        return _encode_long
    if t == "float":
        return lambda v: struct.pack("<f", v)
    if t == "double":
        return lambda v: struct.pack("<d", v)
    if t == "bytes":
        return lambda v: _encode_long(len(v)) + bytes(v)
    if t == "string":
        return lambda v: (lambda b: _encode_long(len(b)) + b)(v.encode("utf-8"))
    if t == "record":
        writers = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def write_record(v, writers=writers):
            return b"".join(fn(v[name]) for name, fn in writers)

        return write_record
    if t == "array":
        item = _encoder(schema["items"])

        def write_array(v, item=item):
            if not v:
                return _encode_long(0)
            return _encode_long(len(v)) + b"".join(item(x) for x in v) + _encode_long(0)

        return write_array
    if t == "map":
        val = _encoder(schema["values"])

        def write_map(v, val=val):
            if not v:
                return _encode_long(0)
            body = b"".join(
                _encode_long(len(k.encode())) + k.encode() + val(x)
                for k, x in v.items()
            )
            return _encode_long(len(v)) + body + _encode_long(0)

        return write_map
    if t == "enum":
        pos = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda v: _encode_long(pos[v])
    if t == "fixed":
        size = schema["size"]

        def write_fixed(v, size=size):
            if len(v) != size:
                raise ValueError(f"fixed size {size} != {len(v)}")
            return bytes(v)

        return write_fixed
    raise NotImplementedError(f"avro type {t!r} not supported")


def encode_datum(schema: Any, value: Any) -> bytes:
    return _encoder(schema)(value)


def decode_datum(schema: Any, data: bytes) -> Any:
    return _decoder(schema)(io.BytesIO(data))


# --------------------------------------------------------------------------
# Object Container Files (Avro spec "Object Container Files")
# --------------------------------------------------------------------------
def write_ocf(
    path: str,
    schema: Any,
    records: list,
    *,
    codec: str = "null",
    sync_marker: Optional[bytes] = None,
    block_records: int = 1000,
) -> None:
    """Write an OCF. ``sync_marker`` injectable for byte-deterministic tests
    (defaults to random, per spec)."""
    schema = _norm_schema(schema)
    enc = _encoder(schema)
    sync = sync_marker or os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    meta_enc = _encoder({"type": "map", "values": "bytes"})
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(meta_enc({k: v for k, v in meta.items()}))
        f.write(sync)
        for i in range(0, len(records), block_records):
            chunk = records[i : i + block_records]
            raw = b"".join(enc(r) for r in chunk)
            if codec == "deflate":
                raw = zlib.compress(raw)[2:-4]  # raw RFC1951: strip zlib header+adler
            elif codec != "null":
                raise NotImplementedError(f"codec {codec!r}")
            f.write(_encode_long(len(chunk)))
            f.write(_encode_long(len(raw)))
            f.write(raw)
            f.write(sync)


def read_ocf_bytes(data: bytes) -> tuple[dict, list]:
    """Decode one OCF from bytes → (parsed avro schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _decoder({"type": "map", "values": "bytes"})(buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(SYNC_SIZE)
    dec = _decoder(schema)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _decode_long(buf)
        size = _decode_long(buf)
        raw = buf.read(size)
        if codec == "deflate":
            raw = zlib.decompress(raw, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        block = io.BytesIO(raw)
        for _ in range(count):
            records.append(dec(block))
        if buf.read(SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
    return schema, records


def read_ocf(path: str) -> tuple[dict, list]:
    with open(path, "rb") as f:
        return read_ocf_bytes(f.read())


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------
def read_avro_files(
    spark: SparkSession, path: str, schema_json: str, glob: str = "*.avro"
) -> DataFrame:
    """Distributed OCF directory read without the spark-avro jar:
    ``binaryFile`` scan (one task per file) → Arrow-batched decode →
    typed columns. The declared ``schema_json`` is the reader schema and
    fixes the output type; each file's writer schema must match it (schema
    resolution beyond exact match raises — evolution belongs to the lake
    sink, lake/table.py)."""
    spark_type = avro_to_spark_type(json.loads(schema_json))
    if not isinstance(spark_type, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    out_schema = T.StructType(
        [T.StructField("_file", T.StringType(), False)] + list(spark_type.fields)
    )
    field_names = [f.name for f in spark_type.fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                _schema, records = read_ocf_bytes(bytes(content))
                for r in records:
                    rows.append([fpath] + [r.get(n) for n in field_names])
            yield pd.DataFrame(rows, columns=["_file"] + field_names)

    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    return raw.select("path", "content").mapInPandas(run, out_schema)


def from_avro_py(df: DataFrame, column: str, schema_json: str, into: str) -> DataFrame:
    """Decode a binary column of single-datum Avro payloads (Kafka message
    values — AvroMessageParser.java shape) into a struct column, Arrow-batched."""
    spark_type = avro_to_spark_type(json.loads(schema_json))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(into, spark_type, True)]
    )

    def run(batches: Iterator) -> Iterator:
        dec = _decoder(json.loads(schema_json))
        for pdf in batches:
            out = pdf.copy()
            out[into] = [
                dec(io.BytesIO(bytes(v))) if v is not None else None
                for v in pdf[column]
            ]
            yield out

    return df.mapInPandas(run, out_schema)


def to_avro_py(df: DataFrame, columns: list[str], schema_json: str, into: str) -> DataFrame:
    """Encode the named columns as single-datum Avro binary payloads
    (generator lib/generator/avro shape), Arrow-batched."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(into, T.BinaryType(), True)]
    )

    def run(batches: Iterator) -> Iterator:
        enc = _encoder(json.loads(schema_json))
        for pdf in batches:
            out = pdf.copy()
            out[into] = [
                enc({c: row[c] for c in columns})
                for row in pdf[columns].to_dict("records")
            ]
            yield out

    return df.mapInPandas(run, out_schema)
