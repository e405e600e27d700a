"""Round-5 stretch (VERDICT r4 #8): a REAL-WORLD-shaped SDC pipeline
export run end to end — the acceptance path a reference user would run on
day one: ``from_sdc_config`` → ``preview`` → batch execution → a
partitioned file-sink write whose directory layout comes from the
reference's time-basis dir-template EL — then diffed against the
hand-written SQL the pipeline is supposed to mean.

The export JSON deliberately carries the noise a real export has: uiInfo
blocks, defaulted configuration entries the port must ignore
(stageOnRecordError, outputLanes ordering, library/version fields), and
dotted nested-bean config names."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _export_json(events_path: str) -> dict:
    """A plausible export: spooldir origin -> selector (clicks vs rest) ->
    expression evaluator -> field hasher (user_id) -> value replacer
    (cap value) -> field remover -> trash; with UI noise everywhere."""

    def cfgs(d):
        return [{"name": k, "value": v} for k, v in d.items()]

    noise = [
        {"name": "stageOnRecordError", "value": "TO_ERROR"},
        {"name": "stageRequiredFields", "value": []},
        {"name": "stageRecordPreconditions", "value": []},
    ]
    return {
        "pipelineConfig": {
            "schemaVersion": 6,
            "version": 14,
            "pipelineId": "clickstream-scrub-v3",
            "title": "Clickstream scrub",
            "description": "mask + cap + route",
            "uuid": "0f0e0d0c-0b0a-0908-0706-050403020100",
            "configuration": [
                {"name": "executionMode", "value": "STANDALONE"},
                {"name": "deliveryGuarantee", "value": "AT_LEAST_ONCE"},
            ],
            "uiInfo": {"previewConfig": {"batchSize": 10}},
            "info": {"name": "clickstream-scrub-v3", "sdcVersion": "3.22.0"},
            "stages": [
                {
                    "instanceName": "SpoolDirOrigin_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
                    "stageVersion": "11",
                    "configuration": cfgs(
                        {
                            "conf.spoolDir": "/data/in",
                            "conf.dataFormat": "DELIMITED",
                        }
                    )
                    + noise,
                    "uiInfo": {"xPos": 60, "yPos": 50, "stageType": "SOURCE"},
                    "inputLanes": [],
                    "outputLanes": ["SpoolDirOrigin_01OutputLane1"],
                },
                {
                    "instanceName": "StreamSelector_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_processor_selector_SelectorDProcessor",
                    "stageVersion": "1",
                    "configuration": cfgs(
                        {
                            "lanePredicates": [
                                {
                                    "outputLane": "StreamSelector_01OutputLane1",
                                    "predicate": "${record:value('/event_type') == 'click'}",
                                },
                                {
                                    "outputLane": "StreamSelector_01OutputLane2",
                                    "predicate": "default",
                                },
                            ]
                        }
                    )
                    + noise,
                    "uiInfo": {"xPos": 260, "yPos": 50, "stageType": "PROCESSOR"},
                    "inputLanes": ["SpoolDirOrigin_01OutputLane1"],
                    "outputLanes": [
                        "StreamSelector_01OutputLane1",
                        "StreamSelector_01OutputLane2",
                    ],
                },
                {
                    "instanceName": "ExpressionEvaluator_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_processor_expression_ExpressionDProcessor",
                    "stageVersion": "2",
                    "configuration": cfgs(
                        {
                            "expressionProcessorConfigs": [
                                {
                                    "fieldToSet": "/day_bucket",
                                    "expression": "${time:extractStringFromDate("
                                    "record:value('/ts'), 'yyyy-MM-dd')}",
                                },
                                {
                                    "fieldToSet": "/src_pipeline",
                                    "expression": "${pipeline:title()}",
                                },
                            ],
                            "headerAttributeConfigs": [],
                        }
                    )
                    + noise,
                    "uiInfo": {"xPos": 460, "yPos": 50, "stageType": "PROCESSOR"},
                    "inputLanes": ["StreamSelector_01OutputLane1"],
                    "outputLanes": ["ExpressionEvaluator_01OutputLane1"],
                },
                {
                    "instanceName": "FieldHasher_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_processor_fieldhasher_FieldHasherDProcessor",
                    "stageVersion": "2",
                    "configuration": cfgs(
                        {
                            "fieldHasherConfigs": [
                                {
                                    "sourceFieldsToHash": ["/user_id"],
                                    "hashType": "SHA2",
                                }
                            ],
                            "hashEntireRecord": False,
                        }
                    )
                    + noise,
                    "uiInfo": {"xPos": 660, "yPos": 50, "stageType": "PROCESSOR"},
                    "inputLanes": ["ExpressionEvaluator_01OutputLane1"],
                    "outputLanes": ["FieldHasher_01OutputLane1"],
                },
                {
                    "instanceName": "ValueReplacer_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_processor_fieldvaluereplacer_FieldValueReplacerDProcessor",
                    "stageVersion": "2",
                    "configuration": cfgs(
                        {
                            "fieldsToReplaceIfNull": [],
                            "fieldsToConditionallyReplace": [
                                {
                                    "fieldNames": ["/value"],
                                    "operator": "GREATER_THAN",
                                    "comparisonValue": "250",
                                    "replacementValue": "250.0",
                                }
                            ],
                            "nullReplacerConditionalConfigs": [],
                        }
                    )
                    + noise,
                    "uiInfo": {"xPos": 860, "yPos": 50, "stageType": "PROCESSOR"},
                    "inputLanes": ["FieldHasher_01OutputLane1"],
                    "outputLanes": ["ValueReplacer_01OutputLane1"],
                },
                {
                    "instanceName": "FieldRemover_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_processor_fieldfilter_FieldRemoverDProcessor",
                    "stageVersion": "1",
                    "configuration": cfgs(
                        {"fields": ["/props"], "filterOperation": "REMOVE"}
                    )
                    + noise,
                    "uiInfo": {"xPos": 1060, "yPos": 50, "stageType": "PROCESSOR"},
                    "inputLanes": ["ValueReplacer_01OutputLane1"],
                    "outputLanes": ["FieldRemover_01OutputLane1"],
                },
                {
                    "instanceName": "Trash_01",
                    "library": "streamsets-datacollector-basic-lib",
                    "stageName": "com_streamsets_pipeline_stage_destination_devnull_NullDTarget",
                    "stageVersion": "1",
                    "configuration": [],
                    "uiInfo": {"xPos": 1260, "yPos": 50, "stageType": "TARGET"},
                    "inputLanes": ["FieldRemover_01OutputLane1"],
                    "outputLanes": [],
                },
            ],
        }
    }


def test_full_export_port_preview_execute_write(spark, tmp_path):
    from datacollector_spark.functions.el import el_dir_template
    from datacollector_spark.plans.spec import PipelineSpec

    sf_dir = "/root/testdata/sf0.001"
    events_path = f"{sf_dir}/events.parquet"
    spec = PipelineSpec.from_sdc_config(
        _export_json(events_path),
        origin_overrides={"SpoolDirOrigin_01": {"path": events_path}},
    )

    # --- preview: limited rows from EVERY lane, nothing written
    pv = spec.preview(spark, limit_rows=5)
    assert len(pv["StreamSelector_01OutputLane1"]) == 5
    assert all(
        r["event_type"] == "click" for r in pv["StreamSelector_01OutputLane1"]
    )
    # the default lane carries the rest
    assert all(
        r["event_type"] != "click" for r in pv["StreamSelector_01OutputLane2"]
    )
    # pipeline metadata EL resolved from the export's own title
    assert pv["ExpressionEvaluator_01OutputLane1"][0]["src_pipeline"] == (
        "Clickstream scrub"
    )

    # --- execute + file-sink write with the reference's time-basis dir
    # template (HdfsTargetConfigBean dirPathTemplate) as partition layout
    final = spec.build(spark)["FieldRemover_01OutputLane1"]
    out_dir = str(tmp_path / "out")
    (
        final.withColumn(
            "dir", el_dir_template("${YYYY()}-${MM()}", "ts")
        ).write.partitionBy("dir").parquet(out_dir)
    )
    # directory layout: one dir per event-time month
    months = sorted(
        d.split("=")[1] for d in os.listdir(out_dir) if d.startswith("dir=")
    )
    assert months and all(len(m) == 7 and m[4] == "-" for m in months)

    # --- diff against the hand-written SQL the pipeline means
    got = spark.read.parquet(out_dir).drop("dir")
    want = spark.read.parquet(events_path).where(
        F.col("event_type") == "click"
    ).select(
        "event_id",
        "ts",
        F.sha2(F.col("user_id").cast("string"), 256).alias("user_id"),
        "event_type",
        F.when(F.col("value") > 250, 250.0).otherwise(F.col("value")).alias("value"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_bucket"),
        F.lit("Clickstream scrub").alias("src_pipeline"),
    )
    assert got.count() == want.count() > 0
    assert set(got.columns) == set(want.columns)
    sel = sorted(got.columns)
    assert (
        got.select(*sel).exceptAll(want.select(*sel)).count() == 0
        and want.select(*sel).exceptAll(got.select(*sel)).count() == 0
    )
