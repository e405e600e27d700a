from datacollector_spark.plans.spec import PipelineSpec, ValidationError  # noqa: F401
