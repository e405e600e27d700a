from datacollector_spark.lake.table import LakeTable, MergeResult  # noqa: F401
