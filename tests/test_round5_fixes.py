"""Round-5 breadth: EL census third batch (file:/time:TZ/record-header/
delimited/runtime-metadata families), from_sdc_config over the remaining
config-portable processor classes, BY_TYPE whole-type conversion, the
config-port edge fixes (empty hasher configs, fan-in combiner), and the
event-time assembler's session_window boundary equality.

Every EL test EXECUTES the translated SQL against a ground-truth value —
name mapping alone is not coverage (the round-4 lesson)."""

from __future__ import annotations

import pytest

from datacollector_spark.functions.el import ELContext, el_expr, el_to_sql
from datacollector_spark.plans.spec import PipelineSpec, ValidationError


def _ev(df, el, context=None):
    from pyspark.sql import functions as F

    return df.select(F.expr(el_to_sql(el, context)).alias("v")).first()["v"]


# --------------------------------------------------------------- EL: file:
def test_el_file_functions(spark):
    """FileEL.java:36-120 semantics on real path shapes (commons-io
    FilenameUtils ground truth)."""
    df = spark.createDataFrame([("/path/to/file.txt",)], "p string")

    assert _ev(df, "${file:fileName(p)}") == "file.txt"
    assert _ev(df, "${file:parentPath(p)}") == "/path/to"
    assert _ev(df, "${file:fileExtension(p)}") == "txt"
    assert _ev(df, "${file:removeExtension(p)}") == "/path/to/file"
    # pathElement: 0-based; negative counts from the end; OOB -> null
    assert _ev(df, "${file:pathElement(p, 0)}") == "path"
    assert _ev(df, "${file:pathElement(p, 2)}") == "file.txt"
    assert _ev(df, "${file:pathElement(p, -1)}") == "file.txt"
    assert _ev(df, "${file:pathElement(p, 9)}") is None
    # edge shapes (FilenameUtils): root file and extension-less
    edge = spark.createDataFrame([("/file.txt", "archive.tar.gz", "noext")],
                                 "a string, b string, c string")
    assert _ev(edge, "${file:parentPath(a)}") == "/"
    assert _ev(edge, "${file:fileExtension(b)}") == "gz"
    assert _ev(edge, "${file:removeExtension(b)}") == "archive.tar"
    assert _ev(edge, "${file:fileExtension(c)}") == ""
    assert _ev(edge, "${file:parentPath(c)}") == ""


# --------------------------------------------------------------- EL: time:
def test_el_time_second_batch(spark):
    """TimeNowEL.java:118-230: extractLongFromDate (format then strip
    non-digits then parse), extractDateFromString, and the TZ pair."""
    df = spark.createDataFrame(
        [("2024-03-05 17:30:45",)], "s string"
    ).selectExpr("to_timestamp(s) AS ts", "s")

    assert _ev(df, "${time:extractLongFromDate(ts, 'yyyyMMdd')}") == 20240305
    # non-digit chars are stripped before the long parse
    assert (
        _ev(df, "${time:extractLongFromDate(ts, 'yyyy-MM-dd HH:mm')}")
        == 202403051730
    )
    got = _ev(df, "${time:extractDateFromString(s, 'yyyy-MM-dd HH:mm:ss')}")
    assert str(got) == "2024-03-05 17:30:45"
    # UTC session zone: formatting in New York is UTC-5 (March 5 is EST)
    assert (
        _ev(df, "${time:extractStringFromDateTZ(ts, 'America/New_York', 'HH:mm')}")
        == "12:30"
    )
    # createDateFromStringTZ: parse a wall-clock string AS a zone's local
    # time -> the UTC instant
    got = _ev(
        df,
        "${time:createDateFromStringTZ(s, 'America/New_York', "
        "'yyyy-MM-dd HH:mm:ss')}",
    )
    assert str(got) == "2024-03-05 22:30:45"


# ------------------------------------------------- EL: record header cols
def test_el_record_header_columns(spark):
    """Record-header EL reads metadata columns; attach_record_headers and
    the precondition error lane provide them (RecordEL.java:221-310)."""
    from datacollector_spark.operators.processors import (
        attach_record_headers,
        precondition_filter,
    )

    df = attach_record_headers(
        spark.createDataFrame([(7, "x")], "id long, v string"),
        creator="Origin_01",
        offset_cols=["id"],
    )
    assert _ev(df, "${record:id()}") == "Origin_01::7"
    assert _ev(df, "${record:creator()}") == "Origin_01"
    assert _ev(df, "${record:attributeOrDefault('/v', 'dflt')}") == "x"

    base = spark.createDataFrame([(1, None)], "id long, v string")
    _, err = precondition_filter(
        base, "", required_fields=["v"], stage_name="Check_01"
    )
    row = err.first()
    assert row["_error_stage"] == "Check_01"
    assert row["_error_code"] == "CONTAINER_0050"
    assert _ev(err, "${record:errorCode()}") == "CONTAINER_0050"
    assert _ev(err, "${str:contains(record:errorMessage(), 'v')}") is True


# ------------------------------------------------- EL: delimited helpers
def test_el_delimited_helpers(spark):
    """record:d* over the columnar LIST-of-{header,value} form
    (RecordEL.java:332-480), including duplicate headers."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([("a", "1"), ("b", "2"), ("a", "3")],)],
        "raw array<struct<header string, value string>>",
    ).select(F.col("raw").alias("_delimited"))

    assert _ev(df, "${record:dValue('b')}") == "2"
    assert _ev(df, "${record:dValue('a')}") == "1"  # first occurrence
    assert _ev(df, "${record:dValue('zz')}") is None
    assert _ev(df, "${record:dValueAt(1)}") == "2"
    assert _ev(df, "${record:dValueAt(9)}") is None
    assert _ev(df, "${record:dIndex('b')}") == 1
    assert _ev(df, "${record:dIndex('zz')}") == -1
    assert _ev(df, "${record:dExists('a')}") is True
    assert _ev(df, "${record:dExists('zz')}") is False
    assert _ev(df, "${record:dIsDupHeader('a')}") is True
    assert _ev(df, "${record:dIsDupHeader('b')}") is False
    assert _ev(df, "${record:dHasDupHeaders()}") is True
    # dToMap: LAST occurrence wins per header (LinkedHashMap.put)
    m = _ev(df, "${record:dToMap()}")
    assert m == {"a": "3", "b": "2"}


# ------------------------------------------- EL: runtime-metadata context
def test_el_context_families(tmp_path):
    ctx = ELContext(
        pipeline={"id": "p-1", "name": "n", "title": "My 'Pipe'", "version": "7"},
        sdc_id="sdc-42",
        sdc_hostname="host-a",
        jvm_max_memory_mb=4096,
        runtime_conf={"region": "us-east"},
        resources_dir=str(tmp_path),
        offsets={"id": "12345"},
        vault={"secret/path": "s3cr3t"},
    )
    (tmp_path / "res.txt").write_text("resource-value\n")

    assert el_to_sql("${pipeline:id()}", ctx) == "'p-1'"
    # apostrophes emit as chr(39), never backslash escapes
    assert el_to_sql("${pipeline:title()}", ctx) == (
        "concat('My ', chr(39), 'Pipe', chr(39))"
    )
    assert el_to_sql("${sdc:id()}", ctx) == "'sdc-42'"
    assert el_to_sql("${sdc:hostname()}", ctx) == "'host-a'"
    assert el_to_sql("${jvm:maxMemoryMB()}", ctx) == "4096"
    assert el_to_sql("${runtime:conf('region')}", ctx) == "'us-east'"
    assert el_to_sql("${runtime:loadResource('res.txt', true)}", ctx) == (
        "'resource-value'"
    )
    assert el_to_sql("${offset:column('id')}", ctx) == "'12345'"
    assert el_to_sql("${vault:read('secret/path')}", ctx) == "'s3cr3t'"
    # missing values raise BY NAME, never silently None
    with pytest.raises(ValueError, match="pipeline:id"):
        el_to_sql("${pipeline:id()}")
    with pytest.raises(ValueError, match="sdc:id"):
        el_to_sql("${sdc:id()}")
    with pytest.raises(ValueError, match="runtime:conf"):
        el_to_sql("${runtime:conf('missing')}", ctx)
    # documented residual: per-field context has no columnar analog
    with pytest.raises(ValueError, match="columnar analog"):
        el_to_sql("${record:fieldAttribute('/f', 'a')}")


# ------------------------------------------ whole-type converter (BY_TYPE)
def test_whole_type_converter(spark):
    """FieldTypeConverterProcessor.java:60-102 BY_TYPE: every field whose
    CURRENT type matches converts — including inside structs and arrays."""
    from datacollector_spark.operators.processors import (
        field_type_converter_by_type,
    )

    df = spark.createDataFrame(
        [(1, "2024-03-05", 2.5, ("x", "2024-01-01"), ["2024-02-02"])],
        "id long, d string, v double, s struct<a string, b string>, arr array<string>",
    ).selectExpr(
        "id",
        "cast(d AS DATE) AS d",
        "v",
        "named_struct('a', s.a, 'b', cast(s.b AS DATE)) AS s",
        "transform(arr, x -> cast(x AS DATE)) AS arr",
    )
    out = field_type_converter_by_type(df, {"date": "string"})
    assert dict(out.dtypes)["d"] == "string"
    assert dict(out.dtypes)["s"] == "struct<a:string,b:string>"
    assert dict(out.dtypes)["arr"] == "array<string>"
    row = out.first()
    assert row["d"] == "2024-03-05"
    assert row["s"]["b"] == "2024-01-01"
    assert row["arr"] == ["2024-02-02"]
    # non-matching types untouched
    assert dict(out.dtypes)["id"] == "bigint"
    assert dict(out.dtypes)["v"] == "double"


def test_whole_type_converter_from_config(spark, tmp_path):
    """The exported BY_TYPE shape (wholeTypeConverterConfigs) ports instead
    of refusing (the r4 fail-loudly placeholder is gone)."""
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "2024-03-05")], "id long, d string"
    ).selectExpr("id", "cast(d AS DATE) AS d").write.parquet(path)
    config = {
        "pipelineConfig": {
            "title": "by-type",
            "stages": [
                {
                    "instanceName": "O",
                    "stageName": "x_DSource",
                    "configuration": [],
                    "inputLanes": [],
                    "outputLanes": ["l0"],
                },
                {
                    "instanceName": "C",
                    "stageName": "x_fieldtypeconverter_FieldTypeConverterDProcessor",
                    "configuration": [
                        {"name": "convertBy", "value": "BY_TYPE"},
                        {
                            "name": "wholeTypeConverterConfigs",
                            "value": [
                                {"sourceType": "DATE", "targetType": "STRING"}
                            ],
                        },
                    ],
                    "inputLanes": ["l0"],
                    "outputLanes": ["l1"],
                },
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"O": {"path": path}}
    )
    out = spec.build(spark)["l1"]
    assert dict(out.dtypes)["d"] == "string"
    assert out.first()["d"] == "2024-03-05"


# ------------------------------------------------ config-port: new classes
def _stage(name, klass, conf, ins, outs):
    return {
        "instanceName": name,
        "stageName": klass,
        "configuration": [{"name": k, "value": v} for k, v in conf.items()],
        "inputLanes": ins,
        "outputLanes": outs,
    }


def _one_stage_port(spark, tmp_path, klass, conf, rows, schema, **port_kw):
    path = str(tmp_path / "in.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    config = {
        "pipelineConfig": {
            "title": "t",
            "stages": [
                _stage("O", "x_DSource", {}, [], ["l0"]),
                _stage("P", klass, conf, ["l0"], ["l1"]),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"O": {"path": path}}, **port_kw
    )
    return spec.build(spark)["l1"]


def test_port_value_replacer(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_fieldvaluereplacer_FieldValueReplacerDProcessor",
        {
            "nullReplacerConditionalConfigs": [
                {"fieldsToNull": ["/v"], "condition": "${record:value('/v') < 0}"}
            ],
            "fieldsToReplaceIfNull": [{"fields": ["/name"], "newValue": "unknown"}],
            "fieldsToConditionallyReplace": [
                {
                    "fieldNames": ["/v"],
                    "operator": "GREATER_THAN",
                    "comparisonValue": "100",
                    "replacementValue": "100.0",
                }
            ],
        },
        [(1.0, "a"), (-5.0, None), (250.0, "c")],
        "v double, name string",
    )
    rows = {r["v"]: r["name"] for r in out.collect()}
    # -5 was nulled by the conditional null-out; 250 capped at 100
    assert rows == {1.0: "a", None: "unknown", 100.0: "c"}
    assert dict(out.dtypes)["v"] == "double"  # literal coercion kept the type


def test_port_splitter_to_list(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_splitter_SplitterDProcessor",
        {
            "fieldPath": "/s",
            "separator": ",",
            "fieldPathsForSplits": ["/p1", "/p2"],
            "tooManySplitsAction": "TO_LIST",
            "remainingSplitsPath": "/rest",
            "originalFieldAction": "KEEP",
        },
        [("a,b,c,d",), ("x",)],
        "s string",
    )
    rows = {r["s"]: (r["p1"], r["p2"], r["rest"]) for r in out.collect()}
    assert rows["a,b,c,d"] == ("a", "b", ["c", "d"])
    # too-few: second split null, remainder empty
    assert rows["x"] == ("x", None, [])


def test_port_splitter_to_last_field(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_splitter_SplitterDProcessor",
        {
            "fieldPath": "/s",
            "separator": " ",
            "fieldPathsForSplits": ["/first", "/rest"],
            "tooManySplitsAction": "TO_LAST_FIELD",
            "originalFieldAction": "REMOVE",
        },
        [("one two three four",)],
        "s string",
    )
    row = out.first()
    assert (row["first"], row["rest"]) == ("one", "two three four")
    assert "s" not in out.columns  # original REMOVED


def test_port_field_masker_modes(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_fieldmask_FieldMaskDProcessor",
        {
            "fieldMaskConfigs": [
                {"fields": ["/card"], "maskType": "CUSTOM", "mask": "####-xxxx"},
                {
                    "fields": ["/mail"],
                    "maskType": "REGEX",
                    "regex": "(\\w+)@(\\w+)[.]com",
                    "groupsToShow": "1",
                },
            ]
        },
        [("12345678", "bob@corp.com")],
        "card string, mail string",
    )
    row = out.first()
    # FieldMaskProcessor.mask() consumes ONE input char per mask char and
    # stops at input end — 8 input chars through a 9-char mask yield 8
    assert row["card"] == "1234-xxx"
    assert row["mail"] == "bob"


def test_port_field_masker_nonprefix_groups_raises(spark, tmp_path):
    with pytest.raises(ValidationError, match="groupsToShow"):
        _one_stage_port(
            spark, tmp_path,
            "x_fieldmask_FieldMaskDProcessor",
            {
                "fieldMaskConfigs": [
                    {
                        "fields": ["/m"],
                        "maskType": "REGEX",
                        "regex": "(a)(b)(c)",
                        "groupsToShow": "2,3",
                    }
                ]
            },
            [("abc",)],
            "m string",
        )


def test_port_list_pivot_and_order(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_listpivot_ListPivotDProcessor",
        {
            "listPath": "/items",
            "copyFields": True,
            "newPath": "/item",
            "saveOriginalFieldName": True,
            "originalFieldNamePath": "/srcField",
        },
        [(1, ["a", "b"])],
        "id long, items array<string>",
    )
    rows = sorted((r["id"], r["item"], r["srcField"]) for r in out.collect())
    assert rows == [(1, "a", "items"), (1, "b", "items")]
    assert "items" not in out.columns

    out2 = _one_stage_port(
        spark, tmp_path,
        "x_fieldorder_FieldOrderDProcessor",
        {
            "config.fields": ["/b", "/a", "/missing"],
            "config.missingFieldAction": "USE_DEFAULT",
            "config.defaultValue": "0",
            "config.extraFieldAction": "DISCARD",
        },
        [(1, 2, 3)],
        "a long, b long, extra long",
    )
    assert out2.columns == ["b", "a", "missing"]
    assert tuple(out2.first()) == (2, 1, 0)


def test_port_merger_zip_flattener(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_fieldmerger_FieldMergerDProcessor",
        {"mergeMapping": [{"fromField": "/src", "toField": "/dst"}]},
        [((1, "x"), (2.0,))],
        "src struct<a long, b string>, dst struct<c double>",
    )
    assert "src" not in out.columns
    row = out.first()["dst"]
    assert (row["c"], row["a"], row["b"]) == (2.0, 1, "x")

    out2 = _one_stage_port(
        spark, tmp_path,
        "x_zip_FieldZipDProcessor",
        {
            "fieldZipConfigBean.fieldZipConfigs": [
                {
                    "firstField": "/l",
                    "secondField": "/r",
                    "zippedFieldPath": "/z",
                }
            ]
        },
        [([1, 2], ["a", "b"])],
        "l array<long>, r array<string>",
    )
    z = out2.first()["z"]
    assert [(e["l"], e["r"]) for e in z] == [(1, "a"), (2, "b")]

    out3 = _one_stage_port(
        spark, tmp_path,
        "x_fieldflattener_FieldFlattenerDProcessor",
        {
            "config.flattenType": "SPECIFIC_FIELDS",
            "config.fields": ["/nested"],
            "config.nameSeparator": "_",
        },
        [((1, (2, "x")),)],
        "nested struct<a long, inner struct<b long, c string>>",
    )
    row = out3.first()
    assert (row["nested_a"], row["nested_inner_b"], row["nested_inner_c"]) == (
        1, 2, "x",
    )


def test_port_empty_hasher_raises_clearly(spark, tmp_path):
    """ADVICE r4: an empty fieldHasherConfigs used to leave the output
    lane unproduced (confusing downstream VALIDATION_0005); it now raises
    naming the stage."""
    with pytest.raises(ValidationError, match="P.*empty processor config"):
        _one_stage_port(
            spark, tmp_path,
            "x_fieldhasher_FieldHasherDProcessor",
            {"fieldHasherConfigs": []},
            [("a",)],
            "v string",
        )


def test_port_json_parser_needs_schema(spark, tmp_path):
    with pytest.raises(ValidationError, match="stage_overrides"):
        _one_stage_port(
            spark, tmp_path,
            "x_jsonparser_JsonParserDProcessor",
            {"fieldPathToParse": "/j", "parsedFieldPath": "/p"},
            [('{"k": 1}',)],
            "j string",
        )
    out = _one_stage_port(
        spark, tmp_path,
        "x_jsonparser_JsonParserDProcessor",
        {"fieldPathToParse": "/j", "parsedFieldPath": "/p"},
        [('{"k": 1}',)],
        "j string",
        stage_overrides={"P": {"schema": "k bigint"}},
    )
    assert out.first()["p"]["k"] == 1


def test_port_dedup_and_fanin(spark, tmp_path):
    """DeDup two-lane split + multi-inputLanes fan-in (lane_combiner):
    unique ∪ duplicate == input with multiplicity (CombinerPipe.java)."""
    path = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, k string"
    ).write.parquet(path)
    config = {
        "pipelineConfig": {
            "title": "dedup-fanin",
            "stages": [
                _stage("O", "x_DSource", {}, [], ["l0"]),
                _stage(
                    "D",
                    "x_dedup_DeDupDProcessor",
                    {
                        "compareFields": "SPECIFIED_FIELDS",
                        "fieldsToCompare": ["/k"],
                    },
                    ["l0"],
                    ["lu", "ld"],
                ),
                _stage("T", "x_NullDTarget", {}, ["lu", "ld"], []),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"O": {"path": path}}
    )
    lanes = spec.build(spark)
    assert lanes["lu"].count() == 2  # one winner per k
    assert lanes["ld"].count() == 1
    # the fan-in combiner restored the full batch
    assert sorted(tuple(r) for r in lanes["T"].collect()) == [
        (1, "a"), (2, "a"), (3, "b"),
    ]


def test_port_kv_lookup(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_kv_local_LocalLookupDProcessor",
        {
            "conf.values": [{"key": "a", "value": "Alpha"}],
            "conf.lookups": [
                {
                    "keyExpr": "${str:toLower(record:value('/k'))}",
                    "outputFieldPath": "/label",
                }
            ],
        },
        [("A",), ("z",)],
        "k string",
    )
    rows = {r["k"]: r["label"] for r in out.collect()}
    assert rows == {"A": "Alpha", "z": None}


def test_port_pipeline_metadata_el(spark, tmp_path):
    """pipeline:* EL resolves from the export's own metadata through the
    threaded ELContext."""
    path = str(tmp_path / "in.parquet")
    spark.createDataFrame([(1,)], "id long").write.parquet(path)
    config = {
        "pipelineConfig": {
            "title": "Metadata Pipe",
            "pipelineId": "meta-1",
            "stages": [
                _stage("O", "x_DSource", {}, [], ["l0"]),
                _stage(
                    "E",
                    "x_expression_ExpressionDProcessor",
                    {
                        "expressionProcessorConfigs": [
                            {"fieldToSet": "/pname", "expression": "${pipeline:title()}"},
                            {"fieldToSet": "/pid", "expression": "${pipeline:id()}"},
                        ]
                    },
                    ["l0"],
                    ["l1"],
                ),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"O": {"path": path}}
    )
    row = spec.build(spark)["l1"].first()
    assert row["pname"] == "Metadata Pipe"
    assert row["pid"] == "meta-1"


def test_port_log_parser_regex_and_clf(spark, tmp_path):
    out = _one_stage_port(
        spark, tmp_path,
        "x_logparser_LogParserDProcessor",
        {
            "fieldPathToParse": "/line",
            "parsedFieldPath": "/parsed",
            "logMode": "REGEX",
            "regex": r"(\w+)=(\d+)",
            "fieldPathsToGroupName": [
                {"fieldPath": "/key", "group": 1},
                {"fieldPath": "/num", "group": 2},
            ],
        },
        [("count=42",)],
        "line string",
    )
    row = out.first()
    assert (row["key"], row["num"]) == ("count", "42")

    out2 = _one_stage_port(
        spark, tmp_path,
        "x_logparser_LogParserDProcessor",
        {
            "fieldPathToParse": "/line",
            "parsedFieldPath": "/parsed",
            "logMode": "COMMON_LOG_FORMAT",
        },
        [('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
          '"GET /apache_pb.gif HTTP/1.0" 200 2326',)],
        "line string",
    )
    row = out2.first()
    assert (row["client_ip"], row["method"], row["status"]) == (
        "127.0.0.1", "GET", "200",
    )
    with pytest.raises(ValidationError, match="logMode 'GROK'"):
        _one_stage_port(
            spark, tmp_path,
            "x_logparser_LogParserDProcessor",
            {"fieldPathToParse": "/line", "logMode": "GROK"},
            [("x",)],
            "line string",
        )


def test_port_jdbc_lookup_http_xml(spark, tmp_path):
    """The last three config-portable classes: JDBC lookup (broadcast join
    against a local dimension extract), HTTP client (resourceUrl EL
    template + injectable transport), XML parser (declared schema)."""
    # the dimension extract carries the join key under the fact's name
    dim_path2 = str(tmp_path / "dim2.parquet")
    spark.createDataFrame(
        [(1, "North"), (2, "South")], "rid long, region_name string"
    ).write.parquet(dim_path2)
    out = _one_stage_port(
        spark, tmp_path,
        "x_jdbclookup_JdbcLookupDProcessor",
        {
            "query": "SELECT region_name FROM regions WHERE region_id = "
            "${record:value('/rid')}",
            "columnMappings": [
                {"columnName": "region_name", "field": "/region"}
            ],
        },
        [(10, 1), (11, 2), (12, 9)],
        "id long, rid long",
        stage_overrides={"P": {"path": dim_path2, "on": ["rid"]}},
    )
    rows = {r["id"]: r["region"] for r in out.collect()}
    assert rows == {10: "North", 11: "South", 12: None}

    def fake_transport(urls):
        return [f"resp:{u}" for u in urls]

    out2 = _one_stage_port(
        spark, tmp_path,
        "x_http_HttpDProcessor",
        {
            "conf.resourceUrl": "http://api/v1/${record:value('/id')}",
            "conf.outputField": "/body",
        },
        [(7,), (8,)],
        "id long",
        stage_overrides={"P": {"transport": fake_transport}},
    )
    rows = {r["id"]: r["body"] for r in out2.collect()}
    assert rows == {7: "resp:http://api/v1/7", 8: "resp:http://api/v1/8"}
    assert "__http_url" not in out2.columns

    out3 = _one_stage_port(
        spark, tmp_path,
        "x_xmlparser_XmlParserDProcessor",
        {
            "configs.fieldPathToParse": "/raw",
            "configs.parsedFieldPath": "/doc",
        },
        [("<r><a>5</a></r>",)],
        "raw string",
        stage_overrides={"P": {"schema": "a bigint"}},
    )
    assert out3.first()["doc"]["a"] == 5


def test_port_stage_preconditions_and_required_fields(spark, tmp_path):
    """Per-stage stageRecordPreconditions/stageRequiredFields (every
    exported stage carries them) now port as a precondition_filter BEFORE
    the stage, with the error lane carrying the reference's error-record
    header (PreconditionsPredicate.java / RequiredFieldsPredicate.java).
    Silently dropping a non-empty one would lose a filter the pipeline
    depends on."""
    path = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "c", 500.0)],
        "id long, name string, v double",
    ).write.parquet(path)
    config = {
        "pipelineConfig": {
            "title": "pre",
            "stages": [
                _stage("O", "x_DSource", {}, [], ["l0"]),
                _stage(
                    "E",
                    "x_expression_ExpressionDProcessor",
                    {
                        "expressionProcessorConfigs": [
                            {"fieldToSet": "/v2", "expression": "${record:value('/v') * 2}"}
                        ],
                        "stageRequiredFields": ["/name"],
                        "stageRecordPreconditions": [
                            "${record:value('/v') < 100}"
                        ],
                    },
                    ["l0"],
                    ["l1"],
                ),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"O": {"path": path}}
    )
    lanes = spec.build(spark)
    # only row 1 passes (row 2 fails required field, row 3 the precondition)
    ok = lanes["l1"].collect()
    assert [r["id"] for r in ok] == [1] and ok[0]["v2"] == 10.0
    errs = {r["id"]: r["_error_stage"] for r in lanes["E#errors"].collect()}
    assert errs == {2: "E", 3: "E"}


def test_whole_type_converter_map_values(spark):
    from datacollector_spark.operators.processors import (
        field_type_converter_by_type,
    )

    df = spark.createDataFrame(
        [({"a": "2024-01-02"},)], "m map<string, string>"
    ).selectExpr("transform_values(m, (k, v) -> cast(v AS DATE)) AS m")
    out = field_type_converter_by_type(df, {"date": "string"})
    assert dict(out.dtypes)["m"] == "map<string,string>"
    assert out.first()["m"] == {"a": "2024-01-02"}


# ------------------------------------- event-time assembler vs session_window
def test_event_time_assembler_matches_session_window_oracle(spark, tmp_path):
    """Backfill sessionization claim, proven small-scale: replaying turns
    spanning event-time with AvailableNow, the assembler's emitted
    conversation boundaries equal a BATCH session_window(gap) oracle on
    the same data (the soak in tools/assembler_soak.py is the scale run)."""
    import time
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from datacollector_spark.streaming.stateful import (
        assemble_conversations_event_time,
    )

    gap_s = 60
    base = datetime(2024, 1, 1)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "event_time timestamp"
    )
    src = tmp_path / "turns"
    src.mkdir()

    # 9 session blocks, round-robin over 3 convs, one hour apart — a
    # conv's gap timer fires during a LATER batch carrying another conv's
    # traffic (timers fire for keys without data once the watermark passes
    # their quiet horizon). One file per session, maxFilesPerTrigger=1 =
    # the replay arrives in event-time order, exactly a backfill.
    all_rows = []
    tid = 0
    for block in range(9):
        conv = f"c{block % 3 + 1}"
        start = base + timedelta(hours=block)
        rows = []
        for i in range(4):
            rows.append(
                (
                    conv,
                    tid,
                    "user" if i % 2 == 0 else "assistant",
                    f"{conv}-b{block}-t{i}",
                    start + timedelta(seconds=5 * i),
                )
            )
            tid += 1
        all_rows += rows
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{block}")
        )
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/f*")
    )
    out = assemble_conversations_event_time(stream, gap_ms=gap_s * 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("r5_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT conv_id, first_turn, last_turn, n_turns FROM r5_sessions"
    ).collect()

    turns_df = spark.createDataFrame(all_rows, schema)
    oracle = (
        turns_df.groupBy(
            "conv_id", F.session_window("event_time", f"{gap_s} seconds")
        )
        .agg(
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
            F.count("*").alias("n_turns"),
        )
        .select("conv_id", "first_turn", "last_turn", "n_turns")
        .collect()
    )
    want = set(tuple(r) for r in oracle)
    have = set(tuple(r) for r in got)
    # c3's final session (the stream's last block) is still inside its gap
    # when the drain ends — it stays in state for a checkpoint resume (by
    # design); every other session boundary must equal the batch oracle
    assert have <= want
    missing = want - have
    assert len(missing) == 1 and next(iter(missing))[0] == "c3", (
        f"only c3's trailing session may remain in state, got {missing}"
    )


# ------------------------------------------------ curation report contract
def test_curation_reports_bucket_cap(spark):
    """A capped curation run is visible in its report (ADVICE r4: the cap
    is a recall change, not just a performance guard)."""
    from datacollector_spark.operators.curation import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    survivors, counts = curate_corpus(
        docs, min_quality=0.1, minhash_threshold=0.5, max_bucket_size=500
    )
    survivors.unpersist()
    assert counts["near_dup_bucket_cap"] == 500
    assert counts["input"] == docs.count()
