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


def file_tail_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    rolled_pattern: str = "*.[0-9]*",
    file_format: str = "text",
    max_files_per_trigger: int | None = None,
    max_file_age: str | None = None,
    **format_options,
) -> DataFrame:
    """File Tail origin with rolling patterns (basic-lib/.../origin/
    filetail/FileTailSource.java): tail a log that rotates through archived
    names (app.log -> app.log.1 / app.log.2025-01-01 ...).

    Spark mapping: the file stream source tails the DIRECTORY; the rolled
    pattern becomes ``pathGlobFilter`` so only rotated (complete, immutable)
    files enter the stream — the correct at-scale semantics, because a file
    handed to a distributed reader must not be mid-append (the reference
    tails the live file byte-wise from one process; a cluster cannot).
    ``rolled_pattern`` must therefore EXCLUDE the live file: the default
    '*.[0-9]*' matches rotation-shaped names (app.log.1, app.log.2025-01-01)
    and not the bare live log; pass your rotation scheme's glob explicitly
    when it differs.
    The live file's tail is picked up when it rotates; ``max_file_age``
    bounds how far back the first run reads (spooler's initial-file analog).
    Every row carries ``_source_file`` + ``_line_offset`` header analogs
    when the format is 'text'."""
    reader = spark.readStream.schema(schema)
    reader = reader.option("pathGlobFilter", rolled_pattern)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_file_age is not None:
        reader = reader.option("maxFileAge", max_file_age)
    for k, v in format_options.items():
        reader = reader.option(k, v)
    df = reader.format(file_format).load(path)
    return df.withColumn("_source_file", F.input_file_name())


def tcp_socket_origin(
    spark: SparkSession,
    host: str,
    port: int,
    include_timestamp: bool = False,
) -> DataFrame:
    """TCP text-stream origin (basic-lib/.../origin/tcp/TCPServerSource.java
    shape): newline-delimited records over a socket. Spark's socket source
    is the exact operator — each line becomes a row in `value`; parse with
    sources/formats (JSON/CSV/LOG) in the same projection.

    Direction note: the reference LISTENS (server); Spark's source CONNECTS
    (client) — in production the listener is a lightweight relay or the
    sender exposes a socket. Development/testing source per Spark docs; at
    scale the durable path is Kafka (sources/kafka.py) — sockets have no
    replay."""
    reader = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
    )
    if include_timestamp:
        reader = reader.option("includeTimestamp", "true")
    return reader.load()


def whole_file_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """WHOLE_FILE data format (commonlib/.../config/DataFormat.java:29-39;
    SpoolDir/SFTP whole-file transfer): each record is one complete file —
    opaque bytes + file metadata, never parsed. Spark's binaryFile source is
    exactly this record shape: (path, modificationTime, length, content)."""
    reader = spark.readStream.format("binaryFile").option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def whole_file_batch(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Bounded whole-file read (preview/backfill of the same layout)."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


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
