"""SDC_RECORD (SDC_JSON) data format — wire-format pinning + distributed
round trip + config port.

The format is the reference's own record interchange encoding
(container/.../record/io/RecordWriterReaderFactory.java, JsonRecordWriter,
RecordImpl.FieldWithPath, FieldDeserializer, EscapeUtil): magic byte 0xA1
then one-line JSON records.  These tests pin the byte-level quirks —
stringified numerics, LIST_MAP-as-LIST with sqpath key recovery, escaped
paths, base64 byte arrays, nulls-in-header — against hand-derived
expectations, then prove the executor-side write → binaryFile read round
trip and the SpoolDirDSource config port."""

from __future__ import annotations

import datetime as dt
import decimal
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.sources.sdc_record import (
    MAGIC_JSON1,
    MAGIC_KRYO1,
    decode_stream,
    default_header,
    dq_escape,
    encode_record,
    encode_stream,
    last_field_name_from_path,
    read_sdc_record_files,
    sq_escape,
    sq_unescape,
    write_sdc_record_files,
)

# ---------------------------------------------------------------------------
# path escaping (EscapeUtil.java semantics)
# ---------------------------------------------------------------------------


def test_escape_plain_name_passes_through():
    assert sq_escape("turn_idx") == "turn_idx"
    assert dq_escape("turn_idx") == "turn_idx"


def test_escape_non_word_names():
    # EscapeUtil.singleQuoteEscape("odd name") -> 'odd name'
    assert sq_escape("odd name") == "'odd name'"
    assert dq_escape("odd name") == '"odd name"'
    # embedded single quote: \\' inside single-quote form
    assert sq_escape("o'brien") == "'o\\\\'brien'"
    # embedded double quote
    assert sq_escape('say "hi"') == "'say \\\"hi\\\"'"
    # round trip through the unescaper the deserializer uses
    for name in ("odd name", "o'brien", 'say "hi"', "back\\slash", "plain"):
        assert sq_unescape(sq_escape(name)) == name


def test_last_field_name_from_path():
    assert last_field_name_from_path("/conv_id") == "conv_id"
    assert last_field_name_from_path("/a/b/c") == "c"
    assert last_field_name_from_path("/'odd name'") == "odd name"
    # the reference's special case: quoted name CONTAINING a slash
    assert last_field_name_from_path("/'foo/bar'") == "foo/bar"


# ---------------------------------------------------------------------------
# wire-format pinning
# ---------------------------------------------------------------------------

_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


def _sample_row():
    return {
        "conv_id": "c-1",
        "turn_idx": 3,
        "score": 0.5,
        "n": 12,
        "ok": True,
        "ts": dt.datetime(2026, 1, 2, 3, 4, 5),
        "payload": b"\x00\x01\xff",
        "tags": ["a", "b"],
    }


def test_record_json_shape_matches_reference_serializer():
    line = encode_record(_sample_row(), _SCHEMA, default_header("src::0"))
    obj = json.loads(line)
    assert set(obj) == {"header", "value"}
    # header: all fifteen HeaderJson keys, nulls included (default Jackson
    # inclusion), values map present
    h = obj["header"]
    assert h["sourceId"] == "src::0"
    assert h["raw"] is None and h["errorCode"] is None
    assert h["errorTimestamp"] == 0 and h["values"] == {}
    assert len(h) == 15
    # root is a LIST_MAP serialized as a plain LIST (keys dropped)
    v = obj["value"]
    assert v["type"] == "LIST_MAP" and v["sqpath"] == "" and v["dqpath"] == ""
    assert isinstance(v["value"], list) and len(v["value"]) == 8
    by_path = {c["sqpath"]: c for c in v["value"]}
    # INTEGER and LONG are STRINGIFIED (FieldWithPath.getValue)
    assert by_path["/turn_idx"]["type"] == "INTEGER"
    assert by_path["/turn_idx"]["value"] == "3"
    assert by_path["/n"]["value"] == "12"
    # DOUBLE stringified too
    assert by_path["/score"]["type"] == "DOUBLE"
    assert by_path["/score"]["value"] == "0.5"
    # BOOLEAN stays a JSON bool, STRING a string
    assert by_path["/ok"]["value"] is True
    assert by_path["/conv_id"]["value"] == "c-1"
    # DATETIME = epoch millis number (naive == UTC)
    assert by_path["/ts"]["type"] == "DATETIME"
    assert by_path["/ts"]["value"] == int(
        dt.datetime(2026, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    # BYTE_ARRAY = base64
    assert by_path["/payload"]["value"] == "AAH/"
    # LIST elements carry [i] paths
    tags = by_path["/tags"]
    assert tags["type"] == "LIST"
    assert [c["sqpath"] for c in tags["value"]] == ["/tags[0]", "/tags[1]"]
    # attributes are NON_NULL-gated: absent everywhere here
    assert "attributes" not in v and all("attributes" not in c for c in v["value"])


def test_magic_byte_and_refusals():
    data = encode_stream([_sample_row()], _SCHEMA)
    assert data[0] == MAGIC_JSON1
    # exactly one byte of magic — the first line after it must parse
    records = decode_stream(data)
    assert len(records) == 1
    with pytest.raises(ValueError, match="KRYO1"):
        decode_stream(bytes([MAGIC_KRYO1]) + b"whatever")
    with pytest.raises(ValueError, match="Invalid magic"):
        decode_stream(b"{not a magic byte}")
    with pytest.raises(ValueError, match="End of stream"):
        decode_stream(b"")


def test_decode_recovers_typed_values_and_listmap_keys():
    row = _sample_row()
    header, (tp, vals) = decode_stream(encode_stream([row], _SCHEMA))[0]
    assert tp == "LIST_MAP"
    assert header["sourceId"] == "sdc::0"
    assert vals["turn_idx"] == ("INTEGER", 3)
    assert vals["n"] == ("LONG", 12)
    assert vals["score"] == ("DOUBLE", 0.5)
    assert vals["payload"] == ("BYTE_ARRAY", b"\x00\x01\xff")
    assert vals["tags"][1] == [("STRING", "a"), ("STRING", "b")]


def test_escaped_column_name_survives_listmap_roundtrip():
    schema = T.StructType(
        [
            T.StructField("odd name", T.StringType()),
            T.StructField("o'brien", T.LongType()),
        ]
    )
    row = {"odd name": "x", "o'brien": 7}
    line = encode_record(row, schema, default_header("s"))
    obj = json.loads(line)
    sqpaths = [c["sqpath"] for c in obj["value"]["value"]]
    assert sqpaths == ["/'odd name'", "/'o\\\\'brien'"]
    _, (_, vals) = decode_stream(encode_stream([row], schema))[0]
    assert vals["odd name"] == ("STRING", "x")
    assert vals["o'brien"] == ("LONG", 7)


def test_null_and_decimal_fields():
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("d", T.DecimalType(10, 2)),
        ]
    )
    row = {"a": None, "d": decimal.Decimal("12345678.91")}
    obj = json.loads(encode_record(row, schema, default_header("s")))
    by = {c["sqpath"]: c for c in obj["value"]["value"]}
    assert by["/a"]["value"] is None
    # DECIMAL rides as a plain JSON number with full precision (Jackson
    # BigDecimal), not a float-rounded one
    assert '"value":12345678.91' in encode_record(row, schema, default_header("s"))
    _, (_, vals) = decode_stream(encode_stream([row], schema))[0]
    assert vals["a"] == ("STRING", None)
    assert vals["d"] == ("DECIMAL", decimal.Decimal("12345678.91"))


# ---------------------------------------------------------------------------
# distributed round trip + config port
# ---------------------------------------------------------------------------


def test_executor_write_then_distributed_read_roundtrip(spark, tmp_path):
    df = (
        spark.range(0, 200)
        .select(
            F.concat(F.lit("conv-"), (F.col("id") % 17).cast("string")).alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            (F.col("id") * 0.25).alias("score"),
            F.col("id").alias("n"),
            (F.col("id") % 2 == 0).alias("ok"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).cast(
                "timestamp_ntz"
            ).alias("ts"),
            F.encode(F.concat(F.lit("p"), F.col("id").cast("string")), "utf-8").alias(
                "payload"
            ),
            F.array(F.lit("a"), F.col("id").cast("string")).alias("tags"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "spool")
    write_sdc_record_files(df, out)
    back = read_sdc_record_files(spark, out, df.schema, with_headers=True)
    assert back.where(F.col("_record_id").isNull()).count() == 0
    assert back.where(F.col("_record_creator") != "fs_target").count() == 0
    a = df.select("conv_id", "turn_idx", "score", "n", "ok", "ts", "payload", "tags")
    b = back.select("conv_id", "turn_idx", "score", "n", "ok", "ts", "payload", "tags")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_spooldir_config_port_sdc_json(spark, tmp_path):
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        Row(conv_id=f"c{i % 3}", turn_idx=i, text=f"turn {i}") for i in range(30)
    ]
    src = spark.createDataFrame(rows, schema).repartition(2)
    spool = str(tmp_path / "in")
    write_sdc_record_files(src, spool)

    config = {
        "pipelineConfig": {
            "title": "sdc record spool",
            "stages": [
                {
                    "instanceName": "Directory_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource"
                    ),
                    "outputLanes": ["lane1"],
                    "configuration": [
                        {"name": "conf.spoolDir", "value": spool},
                        {"name": "conf.filePattern", "value": "*.sdc"},
                        {"name": "conf.dataFormat", "value": "SDC_JSON"},
                    ],
                },
                {
                    "instanceName": "Expression_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_processor_expression_"
                        "ExpressionDProcessor"
                    ),
                    "inputLanes": ["lane1"],
                    "outputLanes": ["lane2"],
                    "configuration": [
                        {
                            "name": "expressionProcessorConfigs",
                            "value": [
                                {
                                    "fieldToSet": "/upper_text",
                                    "expression": "${str:toUpper(record:value('/text'))}",
                                }
                            ],
                        }
                    ],
                },
                {
                    "instanceName": "Trash_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_devnull_NullDTarget"
                    ),
                    "inputLanes": ["lane2"],
                    "configuration": [],
                },
            ],
        }
    }
    # the SDC_JSON format needs the declared record schema
    with pytest.raises(ValidationError, match="record_schema"):
        PipelineSpec.from_sdc_config(config)
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"Directory_01": {"record_schema": schema}}
    )
    lanes = spec.build(spark)
    got = lanes["lane2"].select("conv_id", "turn_idx", "upper_text")
    exp = src.select(
        "conv_id", "turn_idx", F.upper("text").alias("upper_text")
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_spooldir_config_port_rejects_unported_format(tmp_path):
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    config = {
        "pipelineConfig": {
            "title": "bad",
            "stages": [
                {
                    "instanceName": "Directory_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource"
                    ),
                    "outputLanes": ["lane1"],
                    "configuration": [
                        {"name": "conf.spoolDir", "value": str(tmp_path)},
                        {"name": "conf.dataFormat", "value": "DELIMITED"},
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
    with pytest.raises(ValidationError, match="VALIDATION_0006"):
        PipelineSpec.from_sdc_config(config)


def test_error_archive_roundtrip(spark, tmp_path):
    """The reference's Write-to-File error archive: a precondition error
    lane (data + _error_* metadata columns) writes as SDC_RECORD with the
    error context in each record's HEADER (HeaderImpl errorStage/errorCode/
    errorMessage/errorTimestamp), and reads back with the _error_* columns
    restored — record:errorCode()-style EL keeps working on the re-ingested
    archive."""
    import json as _json

    from datacollector_spark.operators.processors import precondition_filter

    df = spark.range(0, 30).select(
        F.col("id").alias("event_id"), (F.col("id") * 2.0).alias("value")
    )
    _ok, err = precondition_filter(df, "value >= 20", stage_name="Pre_01")
    out = str(tmp_path / "errors")
    write_sdc_record_files(err, out, stage_creator="Pre_01")

    # on disk: error context lives in the HEADER, not the value tree
    files = list((tmp_path / "errors").glob("*.sdc"))
    assert files
    line = files[0].read_bytes()[1:].splitlines()[0]
    obj = _json.loads(line)
    assert obj["header"]["errorStage"] == "Pre_01"
    assert obj["header"]["errorCode"] == "CONTAINER_0051"
    assert obj["header"]["errorTimestamp"] > 0
    value_paths = [c["sqpath"] for c in obj["value"]["value"]]
    assert value_paths == ["/event_id", "/value"]  # no _error_* in the value

    data_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_sdc_record_files(
        spark, out, data_schema, with_error_headers=True
    )
    rows = back.collect()
    assert sorted(r["event_id"] for r in rows) == list(range(10))
    assert all(
        r["_error_stage"] == "Pre_01" and r["_error_code"] == "CONTAINER_0051"
        for r in rows
    )



def test_unicode_line_separators_roundtrip():
    """U+2028/U+2029/U+0085 are legal UNESCAPED inside JSON strings
    (json.dumps with ensure_ascii=False leaves them raw) - the stream
    splitter must split on the writer's raw newline ONLY, never on them."""
    schema = T.StructType([T.StructField("text", T.StringType())])
    rows = [{"text": "a\u2028b\u2029c\u0085d"}, {"text": "plain"}]
    decoded = decode_stream(encode_stream(rows, schema))
    assert len(decoded) == 2
    assert decoded[0][1][1]["text"] == ("STRING", "a\u2028b\u2029c\u0085d")
