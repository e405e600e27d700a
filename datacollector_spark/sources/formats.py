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
    """JVM path (spark-avro jar). When the jar is absent, use the pure-Python
    codec instead: ``sources.avro_py.from_avro_py`` (single-datum messages)
    and ``sources.avro_py.read_avro_files`` (object container files) decode
    the same wire format Arrow-batched with no jar — AVRO is fully supported
    either way; this column function simply requires the native source."""
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


NETFLOW5_SCHEMA = T.StructType(
    [
        T.StructField("flow_sequence", T.LongType(), True),
        T.StructField("unix_secs", T.LongType(), True),
        T.StructField("engine_id", T.IntegerType(), True),
        T.StructField("srcaddr", T.StringType(), True),
        T.StructField("dstaddr", T.StringType(), True),
        T.StructField("packets", T.LongType(), True),
        T.StructField("octets", T.LongType(), True),
        T.StructField("srcport", T.IntegerType(), True),
        T.StructField("dstport", T.IntegerType(), True),
        T.StructField("proto", T.IntegerType(), True),
        T.StructField("tcp_flags", T.IntegerType(), True),
    ]
)


def parse_netflow_v5(df: DataFrame, column: str = "payload") -> DataFrame:
    """DATAGRAM format, NetFlow v5 mode (basic-lib/.../origin/udp/UDPSource
    .java + net/netflow/NetflowParser.java): one UDP datagram -> up to 30
    flow records. 24-byte big-endian header (version, count, uptime,
    unix_secs, nsecs, flow_sequence, engine, sampling) then 48-byte records.

    Vectorization: mapInPandas over Arrow batches; inside, numpy frombuffer
    decodes each datagram's record block in one shot (no per-record python).
    Malformed datagrams (bad version / truncated) are dropped, matching the
    reference's onParseError=DISCARD mode."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {name: [] for name in NETFLOW5_SCHEMA.fieldNames()}
            for raw in pdf[column]:
                if raw is None or len(raw) < 24:
                    continue
                head = np.frombuffer(raw[:24], dtype=">u2")
                version, count = int(head[0]), int(head[1])
                if version != 5 or len(raw) < 24 + count * 48:
                    continue
                words32 = np.frombuffer(raw[4:24], dtype=">u4")
                unix_secs, flow_seq = int(words32[1]), int(words32[3])
                engine_id = raw[21]
                rec = raw[24 : 24 + count * 48]
                u32 = np.frombuffer(rec, dtype=">u4").reshape(count, 12)
                u16 = np.frombuffer(rec, dtype=">u2").reshape(count, 24)
                u8 = np.frombuffer(rec, dtype=np.uint8).reshape(count, 48)
                ips_src, ips_dst = u32[:, 0], u32[:, 1]

                def dotted(vals):
                    return [
                        f"{v >> 24 & 255}.{v >> 16 & 255}.{v >> 8 & 255}.{v & 255}"
                        for v in vals
                    ]

                out["flow_sequence"].extend([flow_seq] * count)
                out["unix_secs"].extend([unix_secs] * count)
                out["engine_id"].extend([int(engine_id)] * count)
                out["srcaddr"].extend(dotted(ips_src))
                out["dstaddr"].extend(dotted(ips_dst))
                out["packets"].extend(u32[:, 4].tolist())
                out["octets"].extend(u32[:, 5].tolist())
                out["srcport"].extend(u16[:, 16].tolist())
                out["dstport"].extend(u16[:, 17].tolist())
                out["proto"].extend(u8[:, 38].tolist())
                out["tcp_flags"].extend(u8[:, 37].tolist())
            yield pd.DataFrame(out)

    return df.select(column).mapInPandas(run, NETFLOW5_SCHEMA)


COLLECTD_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), True),
        T.StructField("time_s", T.LongType(), True),
        T.StructField("interval_s", T.LongType(), True),
        T.StructField("plugin", T.StringType(), True),
        T.StructField("plugin_instance", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("type_instance", T.StringType(), True),
        T.StructField("value_idx", T.IntegerType(), True),
        T.StructField("value_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_COLLECTD_VALUE_TYPES = {0: "counter", 1: "gauge", 2: "derive", 3: "absolute"}


def parse_collectd(df: DataFrame, column: str = "payload") -> DataFrame:
    """DATAGRAM format, collectd mode (basic-lib/.../origin/udp/ +
    net/collectd/CollectdParser.java): the collectd binary network protocol.

    A packet is a sequence of TLV parts (2-byte type, 2-byte length incl.
    the 4-byte header, big-endian). String/number parts (HOST, TIME,
    PLUGIN, TYPE, INTERVAL, ...) update parser state; every VALUES part
    (type 0x0006: 2-byte count, count 1-byte value-types, count 8-byte
    values) emits one row per value under the current state. Number parts
    are uint64 BE; GAUGE values are little-endian doubles (x86 wire quirk,
    per the public spec); high-res TIME/INTERVAL (0x0008/0x0009) are
    2^-30-second units. Encrypted/signed parts (0x0200/0x0210) and
    malformed packets are skipped — the reference's onParseError=DISCARD.

    Runs inside mapInPandas over Arrow batches; the per-part loop is
    bounded by datagram size (<= 1452 bytes on the wire), the same shape as
    the reference's per-packet parser."""
    import struct

    import pandas as pd

    def parse_packet(raw: bytes, out: dict) -> None:
        state: dict[str, object] = {}
        pos, n = 0, len(raw)
        while pos + 4 <= n:
            ptype, plen = struct.unpack_from(">HH", raw, pos)
            if plen < 4 or pos + plen > n:
                return  # truncated/garbage part: discard the rest
            body = raw[pos + 4 : pos + plen]
            pos += plen
            if ptype in (0x0000, 0x0002, 0x0003, 0x0004, 0x0005):
                key = {
                    0x0000: "host",
                    0x0002: "plugin",
                    0x0003: "plugin_instance",
                    0x0004: "type",
                    0x0005: "type_instance",
                }[ptype]
                state[key] = body.rstrip(b"\0").decode("utf-8", "replace")
            elif ptype in (0x0001, 0x0007, 0x0008, 0x0009) and len(body) == 8:
                (v,) = struct.unpack(">Q", body)
                if ptype in (0x0008, 0x0009):  # high-res: 2^-30 s units
                    v >>= 30
                state["time_s" if ptype in (0x0001, 0x0008) else "interval_s"] = v
            elif ptype == 0x0006 and len(body) >= 2:
                (cnt,) = struct.unpack_from(">H", body, 0)
                if len(body) < 2 + cnt * 9:
                    continue
                vtypes = body[2 : 2 + cnt]
                vals = body[2 + cnt :]
                for i in range(cnt):
                    vt = vtypes[i]
                    chunk = vals[i * 8 : i * 8 + 8]
                    if vt == 1:  # gauge: little-endian double
                        (val,) = struct.unpack("<d", chunk)
                    elif vt == 2:  # derive: signed BE
                        (val,) = struct.unpack(">q", chunk)
                    else:  # counter/absolute: unsigned BE
                        (val,) = struct.unpack(">Q", chunk)
                    out["host"].append(state.get("host"))
                    out["time_s"].append(state.get("time_s"))
                    out["interval_s"].append(state.get("interval_s"))
                    out["plugin"].append(state.get("plugin"))
                    out["plugin_instance"].append(state.get("plugin_instance"))
                    out["type"].append(state.get("type"))
                    out["type_instance"].append(state.get("type_instance"))
                    out["value_idx"].append(i)
                    out["value_type"].append(_COLLECTD_VALUE_TYPES.get(vt, "unknown"))
                    out["value"].append(float(val))
            # else: unknown/encrypted part — skip (length already consumed)

    def run(batches):
        for pdf in batches:
            out = {name: [] for name in COLLECTD_SCHEMA.fieldNames()}
            for raw in pdf[column]:
                if raw:
                    parse_packet(bytes(raw), out)
            yield pd.DataFrame(out)

    return df.select(column).mapInPandas(run, COLLECTD_SCHEMA)
