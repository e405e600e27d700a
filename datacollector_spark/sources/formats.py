"""Data formats: parse/generate — the reference's cross-cutting format axis
(commonlib/.../config/DataFormat.java:29-39: TEXT, JSON, DELIMITED, XML,
SDC_RECORD, LOG, AVRO, BINARY, PROTOBUF, DATAGRAM, WHOLE_FILE; parsers in
commonlib/.../lib/parser/*, generators in lib/generator/*).

Spark-native mapping: every parser is a columnar expression over a string /
binary column (from_json, from_csv, from_xml, regexp_extract, base64), so a
format parse is part of the scan projection — no record-at-a-time step.
AVRO/PROTOBUF need their runtime jars; they are capability-gated and raise
a clear error when the jar is absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Apache/combined log pattern — the LOG format's most used mode
# (commonlib/.../lib/parser/log/ApacheCustomAccessLogHelper.java analog)
APACHE_COMMON_LOG = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\S+)'
)
APACHE_COMMON_GROUPS = {
    "client_ip": 1,
    "ident": 2,
    "auth_user": 3,
    "ts_raw": 4,
    "method": 5,
    "path": 6,
    "protocol": 7,
    "status": 8,
    "bytes": 9,
}

# syslog RFC3164-ish (the UDP origin's datagram parse fast-path analog)
SYSLOG_PATTERN = r"^<(\d+)>(\w{3}\s+\d+ \d{2}:\d{2}:\d{2}) (\S+) ([^:\[]+)(?:\[(\d+)\])?: (.*)$"
SYSLOG_GROUPS = {
    "pri": 1,
    "ts_raw": 2,
    "host": 3,
    "app": 4,
    "pid": 5,
    "message": 6,
}


def parse_json(col: Column, schema: T.StructType | str) -> Column:
    return F.from_json(col, schema)


def parse_delimited(
    col: Column, schema: str, sep: str = ",", header_mode: str = "NO_HEADER"
) -> Column:
    """DELIMITED format (CSV dialect) — opencsv parser analog."""
    return F.from_csv(col, F.lit(schema), {"sep": sep})


def parse_xml(col: Column, schema: T.StructType | str) -> Column:
    return F.from_xml(col, schema)


def parse_log(df: DataFrame, column: str, pattern: str, groups: dict[str, int]) -> DataFrame:
    out = {
        name: F.regexp_extract(F.col(column), pattern, idx)
        for name, idx in groups.items()
    }
    return df.withColumns(out)


def parse_binary_base64(col: Column) -> Column:
    return F.unbase64(col)


def generate_json(col: Column) -> Column:
    return F.to_json(col)


def generate_delimited(col: Column, sep: str = ",") -> Column:
    return F.to_csv(col, {"sep": sep})


def avro_available(spark) -> bool:
    """AVRO needs the spark-avro jar (absent in this sandbox)."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct(F.lit(1).alias("a")))).collect()
        return True
    except Exception:
        return False


def parse_avro(col: Column, json_schema: str) -> Column:
    """Raises a clear error when the avro data source is not loaded — the
    reference ships avro support as a stage library too."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(col, json_schema)


def protobuf_available(spark) -> bool:
    """PROTOBUF needs the spark-protobuf jar (absent in this sandbox)."""
    try:
        from pyspark.sql.protobuf.functions import to_protobuf

        spark.range(1).select(
            to_protobuf(
                F.struct(F.lit(1).alias("a")), "M", binaryDescriptorSet=b""
            )
        ).collect()
        return True
    except Exception:
        return False


def parse_protobuf(
    col: Column, message_name: str, descriptor_set: bytes
) -> Column:
    """PROTOBUF format (commonlib/.../parser/protobuf/ProtobufDataParser.
    java analog): decode a binary column against a compiled FileDescriptorSet
    (the reference's descriptor-file config). Raises a clear error when the
    spark-protobuf module is not on the classpath."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, message_name, binaryDescriptorSet=descriptor_set)


def generate_protobuf(
    col: Column, message_name: str, descriptor_set: bytes
) -> Column:
    """PROTOBUF generate — ProtobufDataGenerator analog."""
    from pyspark.sql.protobuf.functions import to_protobuf

    return to_protobuf(col, message_name, binaryDescriptorSet=descriptor_set)
