from datacollector_spark.streaming.pipeline import CdcIngestPipeline  # noqa: F401
