"""Directory spooler origin — the reference's SpoolDirSource
(basic-lib/.../origin/spooldir/SpoolDirSource.java:65,348-419 +
lib/dirspooler/DirectorySpooler.java): read files from a directory in
order, remember position, survive restart.

Spark's file stream source already IS this operator: ordered discovery,
`file::offset` durability (the checkpoint's file log), backlog control via
maxFilesPerTrigger, archiving via cleanSource. This wrapper pins the
mapping and applies a format parse (sources/formats.py) in the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def spool_dir_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    file_format: str = "parquet",
    max_files_per_trigger: int | None = None,
    newest_first: bool = False,
    archive_mode: str | None = None,  # None | "delete" | "archive"
    with_file_info: bool = False,
    **format_options,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if newest_first:
        reader = reader.option("latestFirst", "true")
    if archive_mode:
        reader = reader.option("cleanSource", archive_mode)
    for k, v in format_options.items():
        reader = reader.option(k, v)
    df = reader.format(file_format).load(path)
    if with_file_info:
        # the reference records file+offset per record in the header; the
        # Spark analog is input_file_name per row
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def spool_dir_batch(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    file_format: str = "parquet",
    **format_options,
) -> DataFrame:
    """Bounded read of the same layout (preview mode / backfill)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in format_options.items():
        reader = reader.option(k, v)
    return reader.format(file_format).load(path)
