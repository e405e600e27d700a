"""SDC_RECORD data format — the reference's own on-disk record interchange
format (config enum ``SDC_JSON``), implemented from scratch so spool
directories of archived / error / RPC records written by a real
DataCollector read straight into DataFrames (and back) with no JVM.

Wire format, per the reference:

- A stream starts with ONE magic byte (RecordWriterReaderFactory.java:44-67,
  RecordEncoding.java:26-36): base ``0xA0``; JSON1 = ``0xA1``; KRYO1 =
  ``0xA2``.  KRYO1 is the JVM-internal Kryo codec and is refused here by
  magic number with a clear error — JSON1 is the interchange encoding the
  reference itself defaults to (``RecordEncoding.DEFAULT = JSON1``).
- Then one JSON object PER LINE: ``{"header": {...}, "value": {...}}``
  (JsonRecordWriter.java:50-60 — ObjectMapper one-line mode plus a raw
  ``\\n`` after every record).
- The header carries the fifteen HeaderJson properties
  (HeaderJson.java:34-90): stageCreator, sourceId, stagesPath, trackingId,
  previousTrackingId, raw, rawMimeType, errorDataCollectorId,
  errorPipelineName, errorStage, errorCode, errorMessage, errorTimestamp,
  errorStackTrace, values.  Jackson's default inclusion emits nulls, so we
  do too.
- The value is RecordImpl's FieldWithPath tree (RecordImpl.java:125-262):
  every node is ``{"sqpath", "dqpath", "type", "value"[, "attributes"]}``
  (attributes NON_NULL-gated).  The serializer quirks that define the
  format, all reproduced here:

  * INTEGER / LONG / FLOAT / DOUBLE values are STRINGIFIED
    (FieldWithPath.getValue, RecordImpl.java:180-187), and the reader
    parses them back (FieldDeserializer.java:84-95).
  * LIST_MAP serializes as a plain LIST — the keys are dropped on write
    and recovered on read from each child's ``sqpath``
    (RecordImpl.java:188-193, FieldDeserializer.java:72-80,
    EscapeUtil.getLastFieldNameFromPath).
  * BYTE_ARRAY is base64 (Jackson byte[] default; FieldDeserializer:81-83).
  * DATE / DATETIME / TIME are epoch-millis numbers (Jackson
    java.util.Date default).
  * Field paths escape non-word names in single/double-quote variants
    (EscapeUtil.java:30-84): ``/col``, ``/'odd name'``, ``[3]`` for list
    elements.

Spark mapping: each DataFrame row is one record whose value is a LIST_MAP
of the columns (the ordered shape the reference's own columnar parsers —
delimited, SQL origins — produce), so the column order survives the
list-with-sqpath round trip.  Scale shape mirrors the Avro OCF path
(avro_py.py): executors write one file per partition (`foreachPartition`,
no driver data path) and the reader is a ``binaryFile`` scan → Arrow-batched
``mapInPandas`` decode, one task per file.
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal
import json
import re
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC_BASE = 0xA0
MAGIC_JSON1 = 0xA1
MAGIC_KRYO1 = 0xA2

_NON_WORD = re.compile(r"\W", re.IGNORECASE)

_HEADER_KEYS = (
    "stageCreator",
    "sourceId",
    "stagesPath",
    "trackingId",
    "previousTrackingId",
    "raw",
    "rawMimeType",
    "errorDataCollectorId",
    "errorPipelineName",
    "errorStage",
    "errorCode",
    "errorMessage",
    "errorTimestamp",
    "errorStackTrace",
    "values",
)


# ---------------------------------------------------------------------------
# field-path escaping (EscapeUtil.java semantics)
# ---------------------------------------------------------------------------

def sq_escape(name: str) -> str:
    """EscapeUtil.singleQuoteEscape: names with any non-word char are
    wrapped in single quotes with backslash doubling; plain names pass."""
    if not _NON_WORD.search(name):
        return name
    out = ["'"]
    for c in name:
        if c == "\\":
            out.append("\\\\")
        elif c == '"':
            out.append('\\"')
        elif c == "'":
            out.append("\\\\'")
        else:
            out.append(c)
    out.append("'")
    return "".join(out)


def dq_escape(name: str) -> str:
    """EscapeUtil.doubleQuoteEscape (replace-based, reference order)."""
    if not _NON_WORD.search(name):
        return name
    name = name.replace("\\", "\\\\").replace('"', '\\\\"').replace("'", "\\'")
    return '"' + name + '"'


def sq_unescape(part: str) -> str:
    """EscapeUtil.singleQuoteUnescape."""
    if _NON_WORD.search(part) and len(part) > 2:
        part = part.replace('\\"', '"').replace("\\\\'", "'").replace("\\\\", "\\")
        return part[1:-1]
    return part


def last_field_name_from_path(path: str) -> str:
    """EscapeUtil.getLastFieldNameFromPath: last ``/`` segment, with the
    reference's special case for quoted names that CONTAIN a slash."""
    parts = path.split("/")
    last = parts[-1]
    if "'" in last and not (last.startswith("'") and last.endswith("'")):
        qparts = path.split("/'")
        last = "'" + qparts[-1]
    # a list element path ends in [i]; the reference never hits this for
    # LIST_MAP keys (list elements are positional), keep the raw form
    return sq_unescape(last)


# ---------------------------------------------------------------------------
# JSON emitter — exact control over numerics (stringified INTEGER/LONG/
# FLOAT/DOUBLE ride as strings; DECIMAL emits its exact decimal literal the
# way Jackson writes BigDecimal, which json.dumps cannot)
# ---------------------------------------------------------------------------

def _emit(obj: Any) -> str:
    if obj is None:
        return "null"
    if obj is True:
        return "true"
    if obj is False:
        return "false"
    if isinstance(obj, str):
        return json.dumps(obj, ensure_ascii=False)
    if isinstance(obj, decimal.Decimal):
        return format(obj, "f")
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, float):
        return json.dumps(obj)
    if isinstance(obj, dict):
        return "{" + ",".join(f"{_emit(str(k))}:{_emit(v)}" for k, v in obj.items()) + "}"
    if isinstance(obj, (list, tuple)):
        return "[" + ",".join(_emit(v) for v in obj) + "]"
    raise TypeError(f"cannot serialize {type(obj)!r}")


# ---------------------------------------------------------------------------
# spark type <-> SDC Field.Type
# ---------------------------------------------------------------------------

def spark_type_to_sdc(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.LongType):
        return "LONG"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.ShortType):
        return "SHORT"
    if isinstance(dt, T.ByteType):
        return "BYTE"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "DATETIME"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.BinaryType):
        return "BYTE_ARRAY"
    if isinstance(dt, T.DecimalType):
        return "DECIMAL"
    if isinstance(dt, T.ArrayType):
        return "LIST"
    if isinstance(dt, T.StructType):
        return "LIST_MAP"
    if isinstance(dt, T.MapType):
        return "MAP"
    raise TypeError(f"no SDC Field.Type for spark type {dt!r}")


_EPOCH = _dt.date(1970, 1, 1)


def _to_millis(v: Any) -> int:
    # pandas.Timestamp, datetime (naive = UTC, matching the NTZ testdata)
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, _dt.date):
        return (v - _EPOCH).days * 86_400_000
    return int(v)


def _field_with_path(value: Any, dt: T.DataType, sq: str, dq: str) -> dict:
    """Build one FieldWithPath node (RecordImpl.createFieldWithPath)."""
    tp = spark_type_to_sdc(dt)
    node: dict[str, Any] = {"sqpath": sq, "dqpath": dq, "type": tp, "value": None}
    if value is None or (isinstance(value, float) and value != value):
        return node
    if tp in ("INTEGER", "LONG", "SHORT", "BYTE"):
        node["value"] = str(int(value)) if tp in ("INTEGER", "LONG") else int(value)
    elif tp in ("DOUBLE", "FLOAT"):
        node["value"] = repr(float(value))
    elif tp == "BOOLEAN":
        node["value"] = bool(value)
    elif tp == "STRING":
        node["value"] = str(value)
    elif tp == "DATETIME" or tp == "DATE":
        node["value"] = _to_millis(value)
    elif tp == "BYTE_ARRAY":
        node["value"] = base64.b64encode(bytes(value)).decode("ascii")
    elif tp == "DECIMAL":
        node["value"] = (
            value if isinstance(value, decimal.Decimal) else decimal.Decimal(str(value))
        )
    elif tp == "LIST":
        et = dt.elementType
        node["value"] = [
            _field_with_path(v, et, f"{sq}[{i}]", f"{dq}[{i}]")
            for i, v in enumerate(value)
        ]
    elif tp == "LIST_MAP":
        # serialized as a plain LIST of the children; keys recovered from
        # sqpath at read time (RecordImpl.java:188-193)
        if hasattr(value, "asDict"):
            value = value.asDict()
        node["value"] = [
            _field_with_path(
                value.get(f.name),
                f.dataType,
                f"{sq}/{sq_escape(f.name)}",
                f"{dq}/{dq_escape(f.name)}",
            )
            for f in dt.fields
        ]
    elif tp == "MAP":
        vt = dt.valueType
        node["value"] = {
            k: _field_with_path(
                v, vt, f"{sq}/{sq_escape(str(k))}", f"{dq}/{dq_escape(str(k))}"
            )
            for k, v in value.items()
        }
    return node


def default_header(source_id: str, stage_creator: str = "spool_dir") -> dict:
    """A HeaderImpl-shaped header (all fifteen keys, nulls included the way
    default Jackson inclusion writes them)."""
    h: dict[str, Any] = {k: None for k in _HEADER_KEYS}
    h["stageCreator"] = stage_creator
    h["sourceId"] = source_id
    h["trackingId"] = source_id + "::" + stage_creator
    h["errorTimestamp"] = 0
    h["values"] = {}
    return h


def encode_record(row: dict, schema: T.StructType, header: dict) -> str:
    """One JSON1 line: {"header": ..., "value": <LIST_MAP of the columns>}."""
    value = _field_with_path(row, schema, "", "")
    return _emit({"header": header, "value": value})


def encode_stream(
    rows: list[dict],
    schema: T.StructType,
    headers: list[dict] | None = None,
    source_prefix: str = "sdc",
) -> bytes:
    """Magic byte + one record per line (JsonRecordWriter contract).  The
    magic is a RAW byte before the UTF-8 text — assembled at the bytes
    level so it never gets UTF-8 expanded."""
    out = [bytes([MAGIC_JSON1])]
    for i, row in enumerate(rows):
        h = headers[i] if headers else default_header(f"{source_prefix}::{i}")
        out.append(encode_record(row, schema, h).encode("utf-8"))
        out.append(b"\n")
    return b"".join(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _parse_tree(node: dict | None) -> tuple[str, Any] | None:
    """FieldDeserializer.parse: type-tagged tree -> (type, python value)."""
    if node is None:
        return None
    tp = node["type"]
    v = node.get("value")
    if v is None:
        return (tp, None)
    if tp in ("INTEGER", "LONG", "SHORT", "BYTE"):
        return (tp, int(v))
    if tp in ("FLOAT", "DOUBLE"):
        return (tp, float(v))
    if tp == "DECIMAL":
        return (tp, v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v)))
    if tp == "BYTE_ARRAY":
        return (tp, base64.b64decode(v))
    if tp in ("DATE", "DATETIME", "TIME"):
        return (tp, int(v))
    if tp == "MAP":
        return (tp, {k: _parse_tree(c) for k, c in v.items()})
    if tp == "LIST":
        return (tp, [_parse_tree(c) for c in v])
    if tp == "LIST_MAP":
        # keys recovered from each child's sqpath (FieldDeserializer:72-80)
        out = {}
        for child in v:
            key = last_field_name_from_path(child["sqpath"])
            out[key] = _parse_tree(child)
        return (tp, out)
    return (tp, v)


def decode_stream(data: bytes) -> list[tuple[dict, tuple[str, Any] | None]]:
    """Parse one SDC_RECORD stream -> [(header, parsed value tree)].

    Validates the magic byte exactly as RecordWriterReaderFactory does:
    anything without the 0xA0 base bits is rejected; KRYO1 is recognised
    but refused (JVM-internal codec)."""
    if not data:
        raise ValueError("End of stream")
    magic = data[0]
    if (magic & MAGIC_BASE) != MAGIC_BASE:
        raise ValueError(f"Invalid magic number '0x{magic:X}'")
    if magic == MAGIC_KRYO1:
        raise ValueError(
            "KRYO1-encoded SDC record stream: the Kryo codec is JVM-internal; "
            "re-export with DATA_COLLECTOR_RECORD_FORMAT=JSON1 (the "
            "reference's own default interchange encoding)"
        )
    if magic != MAGIC_JSON1:
        raise ValueError(f"Unsupported magic number '0x{magic:X}'")
    out = []
    # split on '\n' ONLY — the JsonRecordWriter contract is one raw \n per
    # record; str.splitlines() would also split on U+2028/U+2029/U+0085,
    # which json.dumps(ensure_ascii=False) legally leaves unescaped inside
    # string values
    for line in data[1:].decode("utf-8").split("\n"):
        if not line.strip():
            continue
        obj = json.loads(line, parse_float=decimal.Decimal)
        out.append((obj.get("header") or {}, _parse_tree(obj.get("value"))))
    return out


def _coerce(parsed: tuple[str, Any] | None, dt: T.DataType) -> Any:
    """Schema-directed coercion of a parsed (type, value) to the Spark type."""
    if parsed is None:
        return None
    tp, v = parsed
    if v is None:
        return None
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return bool(v)
    if isinstance(dt, T.StringType):
        return str(v)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # exact integer epoch-millis arithmetic (float seconds can drift 1µs)
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=int(v))
    if isinstance(dt, T.DateType):
        return _EPOCH + _dt.timedelta(days=int(v) // 86_400_000)
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    if isinstance(dt, T.DecimalType):
        return v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
    if isinstance(dt, T.ArrayType):
        return [_coerce(c, dt.elementType) for c in v]
    if isinstance(dt, T.StructType):
        return {f.name: _coerce(v.get(f.name), f.dataType) for f in dt.fields}
    if isinstance(dt, T.MapType):
        return {k: _coerce(c, dt.valueType) for k, c in v.items()}
    return v


# ---------------------------------------------------------------------------
# distributed read / write
# ---------------------------------------------------------------------------

def read_sdc_record_files(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    glob: str = "*.sdc",
    with_headers: bool = False,
    with_error_headers: bool = False,
) -> DataFrame:
    """Distributed SDC_RECORD directory read: ``binaryFile`` scan (one task
    per file) → Arrow-batched decode → typed columns.  ``schema`` names the
    columns expected in each record's root LIST_MAP/MAP; ``with_headers``
    additionally surfaces the record header as the ``_record_id`` /
    ``_record_creator`` metadata columns, and ``with_error_headers`` the
    error-header triple as ``_error_stage`` / ``_error_code`` /
    ``_error_message`` (the same conventions attach_record_headers /
    precondition_filter / the EL shim's record:errorCode() use) — so an
    error archive written by ``write_sdc_record_files`` reads back with
    its error context intact, like the reference's Write-to-File error
    records re-ingested by the Directory origin."""
    meta = [T.StructField("_file", T.StringType(), False)]
    if with_headers:
        meta += [
            T.StructField("_record_id", T.StringType(), True),
            T.StructField("_record_creator", T.StringType(), True),
        ]
    if with_error_headers:
        meta += [
            T.StructField("_error_stage", T.StringType(), True),
            T.StructField("_error_code", T.StringType(), True),
            T.StructField("_error_message", T.StringType(), True),
        ]
    out_schema = T.StructType(meta + list(schema.fields))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for header, tree in decode_stream(bytes(content)):
                    if tree is None or tree[1] is None:
                        vals = {}
                    else:
                        vals = {
                            f.name: _coerce(tree[1].get(f.name), f.dataType)
                            for f in schema.fields
                        }
                    head = [fpath]
                    if with_headers:
                        head += [header.get("sourceId"), header.get("stageCreator")]
                    if with_error_headers:
                        head += [
                            header.get("errorStage"),
                            header.get("errorCode"),
                            header.get("errorMessage"),
                        ]
                    rows.append(head + [vals.get(f.name) for f in schema.fields])
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ).astype(object)

    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    return raw.select("path", "content").mapInPandas(run, out_schema)


# metadata columns that ride the record HEADER, not the value tree — the
# write side lifts them out of each row and the read side restores them
# (HeaderImpl's errorStage/errorCode/errorMessage and sourceId/stageCreator)
_HEADER_COLUMN_MAP = {
    "_record_id": "sourceId",
    "_record_creator": "stageCreator",
    "_error_stage": "errorStage",
    "_error_code": "errorCode",
    "_error_message": "errorMessage",
    "_error_time": "errorTimestamp",
}


def write_sdc_record_files(
    df: DataFrame,
    out_dir: str,
    stage_creator: str = "fs_target",
    suffix: str = ".sdc",
) -> None:
    """Executor-side SDC_RECORD file write: one ``part-<pid><suffix>`` file
    per partition, each a fresh JSON1 stream (magic byte + lines), written
    straight from the partition's executor — no driver data path, scales
    with partitions like s3_target.

    Metadata columns (``_record_id``/``_record_creator``/``_error_stage``/
    ``_error_code``/``_error_message``) are lifted into each record's
    HEADER instead of the value tree — writing a precondition_filter error
    lane therefore produces exactly the reference's Write-to-File error
    archive (error context in HeaderImpl, data in the value), re-readable
    with ``read_sdc_record_files(..., with_error_headers=True)``."""
    import os

    header_cols = [c for c in df.columns if c in _HEADER_COLUMN_MAP]
    schema = T.StructType(
        [f for f in df.schema.fields if f.name not in _HEADER_COLUMN_MAP]
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows: Iterator) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[dict] = []
        headers: list[dict] = []
        for i, r in enumerate(rows):
            d = r.asDict(recursive=True)
            h = default_header(f"part-{pid:05d}::{i}", stage_creator)
            for col in header_cols:
                v = d.pop(col)
                if v is not None:
                    key = _HEADER_COLUMN_MAP[col]
                    h[key] = int(v) if key == "errorTimestamp" else str(v)
            buf.append(d)
            headers.append(h)
        if not buf:
            return
        fname = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        with open(fname, "wb") as f:
            f.write(encode_stream(buf, schema, headers))

    df.foreachPartition(write_partition)
