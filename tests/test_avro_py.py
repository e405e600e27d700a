"""Pure-Python Avro codec + OCF: byte-level ground truth straight from the
Apache Avro specification's own worked examples (NOT roundtrip-only — the
encoder is pinned to spec bytes, the decoder to the encoder AND to
hand-crafted buffers), then OCF layout, codecs, and the distributed Spark
read path.

Reference format surface: commonlib/.../lib/parser/avro/AvroDataFileParser.java
(OCF spooling), AvroMessageParser.java (single-datum messages)."""
from __future__ import annotations

import datetime as dt
import io
import json
import struct

import pytest

from datacollector_spark.sources.avro_py import (
    _decode_long,
    _encode_long,
    avro_to_spark_type,
    decode_datum,
    encode_datum,
    from_avro_py,
    read_ocf,
    read_ocf_bytes,
    read_avro_files,
    to_avro_py,
    write_ocf,
)

REC = json.dumps(
    {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
)


def test_zigzag_varint_spec_table():
    # the exact table from the Avro spec "binary encoding" section
    for value, expect in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
    ]:
        assert _encode_long(value) == expect, value
        assert _decode_long(io.BytesIO(expect)) == value


def test_record_encoding_spec_example():
    # spec: record {a: long=27, b: string="foo"} serializes to 36 06 66 6f 6f
    assert encode_datum(REC, {"a": 27, "b": "foo"}) == b"\x36\x06\x66\x6f\x6f"
    assert decode_datum(REC, b"\x36\x06\x66\x6f\x6f") == {"a": 27, "b": "foo"}


def test_array_encoding_spec_example():
    # spec: array<long> [3, 27] -> 04 06 36 00
    schema = {"type": "array", "items": "long"}
    assert encode_datum(schema, [3, 27]) == b"\x04\x06\x36\x00"
    assert decode_datum(schema, b"\x04\x06\x36\x00") == [3, 27]
    # decoder also accepts the negative-count block form (count, bytesize)
    assert decode_datum(schema, b"\x03\x04\x06\x36\x00") == [3, 27]


def test_primitives_and_union_null():
    assert encode_datum('"float"', 1.5) == struct.pack("<f", 1.5)
    assert encode_datum('"double"', -2.25) == struct.pack("<d", -2.25)
    assert encode_datum('"boolean"', True) == b"\x01"
    union = ["null", "string"]
    assert encode_datum(union, None) == b"\x00"
    assert encode_datum(union, "hi") == b"\x02\x04hi"
    assert decode_datum(union, b"\x00") is None
    assert decode_datum(union, b"\x02\x04hi") == "hi"


def test_enum_fixed_map_logical():
    assert encode_datum({"type": "enum", "name": "e", "symbols": ["A", "B"]}, "B") == b"\x02"
    assert decode_datum({"type": "enum", "name": "e", "symbols": ["A", "B"]}, b"\x02") == "B"
    assert encode_datum({"type": "fixed", "name": "f", "size": 2}, b"ab") == b"ab"
    m = {"type": "map", "values": "int"}
    assert decode_datum(m, encode_datum(m, {"k": 7})) == {"k": 7}
    d = {"type": "int", "logicalType": "date"}
    assert encode_datum(d, dt.date(1970, 1, 3)) == _encode_long(2)
    assert decode_datum(d, _encode_long(2)) == dt.date(1970, 1, 3)
    tsu = {"type": "long", "logicalType": "timestamp-micros"}
    t0 = dt.datetime(2024, 5, 1, 12, 30, 15, 123456)
    assert decode_datum(tsu, encode_datum(tsu, t0)) == t0


def test_ocf_layout_and_roundtrip(tmp_path):
    path = str(tmp_path / "x.avro")
    recs = [{"a": i, "b": f"s{i}"} for i in range(10)]
    sync = bytes(range(16))
    write_ocf(path, REC, recs, sync_marker=sync, block_records=4)
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"          # magic per spec
    assert raw.count(sync) == 4            # header + 3 blocks (4+4+2)
    schema, got = read_ocf(path)
    assert got == recs and schema["name"] == "test"


def test_ocf_deflate_codec(tmp_path):
    path = str(tmp_path / "z.avro")
    recs = [{"a": i, "b": "x" * 50} for i in range(100)]
    write_ocf(path, REC, recs, codec="deflate")
    null_path = str(tmp_path / "n.avro")
    write_ocf(null_path, REC, recs, codec="null")
    import os

    assert os.path.getsize(path) < os.path.getsize(null_path) / 2
    assert read_ocf(path)[1] == recs


def test_ocf_corrupt_sync_raises(tmp_path):
    path = str(tmp_path / "c.avro")
    write_ocf(path, REC, [{"a": 1, "b": "x"}], sync_marker=bytes(16))
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # clobber the trailing sync
    with pytest.raises(ValueError, match="sync"):
        read_ocf_bytes(bytes(raw))


def test_avro_to_spark_type():
    t = avro_to_spark_type(json.loads(REC))
    assert [f.name for f in t.fields] == ["a", "b"]
    assert str(t["a"].dataType) == "LongType()"
    assert (
        str(avro_to_spark_type({"type": "long", "logicalType": "timestamp-micros"}))
        == "TimestampType()"
    )


def test_read_avro_files_distributed(spark, tmp_path):
    recs = [{"a": i, "b": f"s{i}"} for i in range(100)]
    for part in range(4):
        write_ocf(
            str(tmp_path / f"part-{part}.avro"), REC, recs[part * 25 : (part + 1) * 25]
        )
    df = read_avro_files(spark, str(tmp_path), REC)
    assert df.count() == 100
    assert df.selectExpr("count(distinct _file)").first()[0] == 4
    assert sorted(r.a for r in df.collect()) == list(range(100))
    # decode runs in tasks (mapInPandas over the binaryFile scan)
    assert "MapInPandas" in df._jdf.queryExecution().executedPlan().toString()


def test_message_datum_roundtrip_in_spark(spark):
    src = spark.range(50).selectExpr(
        "id AS a", "concat('v', cast(id AS string)) AS b"
    )
    enc = to_avro_py(src, ["a", "b"], REC, "payload")
    dec = from_avro_py(enc.select("payload"), "payload", REC, "rec")
    out = dec.select("rec.a", "rec.b")
    assert sorted((r.a, r.b) for r in out.collect()) == [
        (i, f"v{i}") for i in range(50)
    ]
