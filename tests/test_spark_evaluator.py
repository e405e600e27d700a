"""Spark Evaluator stage — spark-processor-protolib/.../spark/
SparkProcessor.java: user transformer over the batch, TransformResult
(result, errors) two-lane contract, init params, and the from_sdc_config
port (JVM transformerClass -> injected Python callable)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacollector_spark.operators.processors import spark_evaluator
from datacollector_spark.plans.spec import PipelineSpec, ValidationError


def test_transform_result_two_lanes(spark):
    df = spark.range(10).withColumnRenamed("id", "v")

    def transformer(d):
        return d.where("v % 2 = 0"), d.where("v % 2 = 1")

    ok, err = spark_evaluator(df, transformer)
    assert sorted(r.v for r in ok.collect()) == [0, 2, 4, 6, 8]
    assert sorted(r.v for r in err.collect()) == [1, 3, 5, 7, 9]


def test_init_params_and_single_lane(spark):
    df = spark.range(5).withColumnRenamed("id", "v")

    def transformer(d, factor):
        return d.withColumn("v", F.col("v") * factor)

    out, err = spark_evaluator(df, transformer, init_params={"factor": 10})
    assert err is None
    assert sorted(r.v for r in out.collect()) == [0, 10, 20, 30, 40]


def _write_src(spark, tmp_path, n=4):
    src = str(tmp_path / "se_src")
    spark.range(n).withColumnRenamed("id", "v").write.mode("overwrite").parquet(src)
    return src


def test_spec_stage_and_error_lane(spark, tmp_path):
    def transformer(d):
        return d.where("v >= 2"), d.where("v < 2")

    spec = PipelineSpec(
        {
            "pipeline": "se",
            "stages": [
                {"name": "src", "type": "parquet_origin",
                 "path": _write_src(spark, tmp_path), "out": "main"},
                {"name": "se", "type": "spark_evaluator", "in": "main",
                 "out": "ok", "error_lane": "errs", "transformer": transformer},
            ],
        }
    )
    lanes = spec.build(spark)
    assert sorted(r.v for r in lanes["ok"].collect()) == [2, 3]
    assert sorted(r.v for r in lanes["errs"].collect()) == [0, 1]


def test_spec_requires_callable(spark, tmp_path):
    with pytest.raises(ValidationError, match="VALIDATION_0003"):
        PipelineSpec(
            {
                "pipeline": "bad",
                "stages": [
                    {"name": "src", "type": "parquet_origin",
                     "path": _write_src(spark, tmp_path), "out": "main"},
                    {"name": "se", "type": "spark_evaluator", "in": "main",
                     "out": "ok", "transformer": "NotACallable"},
                ],
            }
        ).build(spark)


def test_from_sdc_config_port(spark, tmp_path):
    spark.range(3).withColumnRenamed("id", "v").write.mode("overwrite").parquet(
        str(tmp_path / "src")
    )
    config = {
        "pipelineConfig": {
            "title": "spark-eval-port",
            "stages": [
                {
                    "instanceName": "Origin_01",
                    "stageName": "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
                    "configuration": [],
                    "inputLanes": [],
                    "outputLanes": ["L_o"],
                },
                {
                    "instanceName": "Spark_01",
                    "stageName": "com_streamsets_pipeline_stage_processor_spark_StandaloneSparkDProcessor",
                    "configuration": [
                        {"name": "sparkProcessorConfigBean.transformerClass",
                         "value": "com.example.MyTransformer"}
                    ],
                    "inputLanes": ["L_o"],
                    "outputLanes": ["L_s"],
                },
            ],
        }
    }
    # without the injected callable: clear VALIDATION_0009 naming the class
    with pytest.raises(ValidationError, match="VALIDATION_0009.*MyTransformer"):
        PipelineSpec.from_sdc_config(
            config, origin_overrides={"Origin_01": {"path": str(tmp_path / "src")}}
        )
    spec = PipelineSpec.from_sdc_config(
        config,
        origin_overrides={"Origin_01": {"path": str(tmp_path / "src")}},
        stage_overrides={
            "Spark_01": {
                "transformer": lambda d: d.withColumn("doubled", F.col("v") * 2)
            }
        },
    )
    out = spec.build(spark)["L_s"]
    assert sorted((r.v, r.doubled) for r in out.collect()) == [(0, 0), (1, 2), (2, 4)]
