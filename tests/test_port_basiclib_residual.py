"""from_sdc_config over the last four basic-lib processor classes: Fuzzy
Field, Geolocation, scripting (JavaScript/Jython/Groovy), and XML
Flattener — the engine operators existed; these tests pin the JSON
translation layer (and its refusal modes) for each."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacollector_spark.plans.spec import PipelineSpec, ValidationError


def _stage(name, klass, conf=None, ins=(), outs=()):
    return {
        "instanceName": name,
        "stageName": klass,
        "configuration": [
            {"name": k, "value": v} for k, v in (conf or {}).items()
        ],
        "inputLanes": list(ins),
        "outputLanes": list(outs),
    }


def _pipeline(*stages, title="basiclib-port"):
    return {"pipelineConfig": {"title": title, "stages": list(stages)}}


def _origin(tmp_path, spark, rows, schema, name="Origin_01"):
    path = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    return (
        _stage(
            name,
            "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
            outs=["lane_src"],
        ),
        {name: {"path": path}},
    )


# ------------------------------------------------------------- fuzzy field
def test_fuzzy_field_port_renames_in_place(spark, tmp_path):
    origin, ov = _origin(
        tmp_path, spark,
        [("a@b.c", "Ada", 7)],
        "email_addr string, frst_name string, zip int",
    )
    cfg = _pipeline(
        origin,
        _stage(
            "Fuzzy_01",
            "com_streamsets_pipeline_stage_processor_fuzzy_FuzzyFieldDProcessor",
            {
                "rootFieldPaths": ["/"],
                "outputFieldNames": ["/email", "/first_name"],
                "matchThreshold": 60,
                "allCandidates": False,
                "inPlace": True,
                "preserveUnmatchedFields": True,
            },
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    spec = PipelineSpec.from_sdc_config(cfg, origin_overrides=ov)
    out = spec.build(spark)["lane_out"]
    assert set(out.columns) == {"email", "first_name", "zip"}
    row = out.first()
    assert row["email"] == "a@b.c" and row["first_name"] == "Ada"


def test_fuzzy_field_port_drops_unmatched_and_refuses_candidates(
    spark, tmp_path
):
    origin, ov = _origin(
        tmp_path, spark, [("x", 1)], "email_addr string, noise int"
    )
    cfg = _pipeline(
        origin,
        _stage(
            "Fuzzy_01",
            "com_streamsets_pipeline_stage_processor_fuzzy_FuzzyFieldDProcessor",
            {
                "outputFieldNames": ["/email"],
                "matchThreshold": 60,
                "preserveUnmatchedFields": False,
            },
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    out = PipelineSpec.from_sdc_config(cfg, origin_overrides=ov).build(spark)[
        "lane_out"
    ]
    assert out.columns == ["email"]
    bad = _pipeline(
        origin,
        _stage(
            "Fuzzy_01",
            "com_streamsets_pipeline_stage_processor_fuzzy_FuzzyFieldDProcessor",
            {"outputFieldNames": ["/email"], "allCandidates": True},
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    with pytest.raises(ValidationError, match="allCandidates"):
        PipelineSpec.from_sdc_config(bad, origin_overrides=ov)


# ------------------------------------------------------------- geolocation
GEO_KLASS = (
    "com_streamsets_pipeline_stage_processor_geolocation_GeolocationDProcessor"
)


def _geo_ranges(spark, tmp_path):
    path = str(tmp_path / "geoextract")
    spark.createDataFrame(
        [
            (0, 99, "US", 37.1),
            (100, 199, "DE", 51.2),
            (200, 299, "FR", 46.6),
        ],
        "range_lo long, range_hi long, country_name string, latitude double",
    ).write.mode("overwrite").parquet(path)
    return path


def test_geolocation_port_string_ip_and_attrs(spark, tmp_path):
    origin, ov = _origin(
        tmp_path, spark,
        [(1, "0.0.0.5"), (2, "0.0.0.150"), (3, "0.0.0.250")],
        "id int, client_ip string",
    )
    ranges = _geo_ranges(spark, tmp_path)
    cfg = _pipeline(
        origin,
        _stage(
            "Geo_01",
            GEO_KLASS,
            {
                "fieldTypeConverterConfigs": [
                    {
                        "inputFieldName": "/client_ip",
                        "outputFieldName": "/country",
                        "targetType": "COUNTRY_NAME",
                    },
                    {
                        "inputFieldName": "/client_ip",
                        "outputFieldName": "/lat",
                        "targetType": "LATITUDE",
                    },
                ],
                "missingAddressAction": "REPLACE_WITH_NULLS",
            },
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    spec = PipelineSpec.from_sdc_config(
        cfg,
        origin_overrides=ov,
        stage_overrides={"Geo_01": {"ranges_path": ranges}},
    )
    got = {
        r["id"]: (r["country"], r["lat"])
        for r in spec.build(spark)["lane_out"].collect()
    }
    assert got == {
        1: ("US", 37.1),
        2: ("DE", 51.2),
        3: ("FR", 46.6),
    }


def test_geolocation_port_to_error_lane_and_refusal(spark, tmp_path):
    origin, ov = _origin(
        tmp_path, spark, [(1, 50), (2, 9_999)], "id int, ip long"
    )
    ranges = _geo_ranges(spark, tmp_path)
    cfg = _pipeline(
        origin,
        _stage(
            "Geo_01",
            GEO_KLASS,
            {
                "fieldTypeConverterConfigs": [
                    {
                        "inputFieldName": "/ip",
                        "outputFieldName": "/country",
                        "targetType": "COUNTRY_NAME",
                    }
                ],
                "missingAddressAction": "TO_ERROR",
            },
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    spec = PipelineSpec.from_sdc_config(
        cfg,
        origin_overrides=ov,
        stage_overrides={"Geo_01": {"ranges_path": ranges}},
    )
    lanes = spec.build(spark)
    assert [r["id"] for r in lanes["lane_out"].collect()] == [1]
    assert [r["id"] for r in lanes["Geo_01#errors"].collect()] == [2]
    # without the ranges extract the port refuses by name
    with pytest.raises(ValidationError, match="ranges_path"):
        PipelineSpec.from_sdc_config(cfg, origin_overrides=ov)


# --------------------------------------------------------------- scripting
def test_scripting_port_runs_pandas_equivalent(spark, tmp_path):
    origin, ov = _origin(
        tmp_path, spark, [(1, 10.0), (2, 20.0)], "id int, v double"
    )
    cfg = _pipeline(
        origin,
        _stage(
            "JavaScript_01",
            "com_streamsets_pipeline_stage_processor_javascript_JavaScriptDProcessor",
            {"script": "records.forEach(...)"},
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    with pytest.raises(ValidationError, match="stage_overrides"):
        PipelineSpec.from_sdc_config(cfg, origin_overrides=ov)

    def doubled(pdf):
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] * 2
        return pdf

    spec = PipelineSpec.from_sdc_config(
        cfg,
        origin_overrides=ov,
        stage_overrides={"JavaScript_01": {"func": doubled}},
    )
    got = {
        r["id"]: r["v"] for r in spec.build(spark)["lane_out"].collect()
    }
    assert got == {1: 20.0, 2: 40.0}


# ------------------------------------------------------------ xml flattener
XMLF_KLASS = (
    "com_streamsets_pipeline_stage_processor_xmlflattener_XMLFlatteningDProcessor"
)


def test_xml_flattener_port_flattens_to_root(spark, tmp_path):
    xml = "<contact><name>Ada</name><addr><city>Paris</city></addr></contact>"
    origin, ov = _origin(
        tmp_path, spark, [(1, xml)], "id int, payload string"
    )
    cfg = _pipeline(
        origin,
        _stage(
            "XMLFlat_01",
            XMLF_KLASS,
            {
                "fromField": "/payload",
                "keepOriginalFields": False,
                "fieldDelimiter": ".",
            },
            ins=["lane_src"],
            outs=["lane_out"],
        ),
    )
    schema = "name string, addr struct<city:string>"
    spec = PipelineSpec.from_sdc_config(
        cfg,
        origin_overrides=ov,
        stage_overrides={"XMLFlat_01": {"schema": schema, "root": "contact"}},
    )
    out = spec.build(spark)["lane_out"]
    assert set(out.columns) == {"id", "contact.name", "contact.addr.city"}
    row = out.first()
    assert row["contact.name"] == "Ada"
    assert row["contact.addr.city"] == "Paris"


def test_xml_flattener_port_refusals(spark, tmp_path):
    origin, ov = _origin(tmp_path, spark, [(1, "<a/>")], "id int, p string")
    base = {
        "fromField": "/p",
    }
    no_schema = _pipeline(
        origin,
        _stage("X", XMLF_KLASS, base, ins=["lane_src"], outs=["o"]),
    )
    with pytest.raises(ValidationError, match="schema"):
        PipelineSpec.from_sdc_config(no_schema, origin_overrides=ov)
    multirec = _pipeline(
        origin,
        _stage(
            "X",
            XMLF_KLASS,
            dict(base, recordDelimiter="row"),
            ins=["lane_src"],
            outs=["o"],
        ),
    )
    with pytest.raises(ValidationError, match="recordDelimiter"):
        PipelineSpec.from_sdc_config(
            multirec,
            origin_overrides=ov,
            stage_overrides={"X": {"schema": "x string", "root": "a"}},
        )
