from datacollector_spark.functions.hashing import md5_long, word_shingles  # noqa: F401
