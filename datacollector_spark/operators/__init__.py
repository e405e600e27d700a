from datacollector_spark.operators.collapse import lww_collapse  # noqa: F401
