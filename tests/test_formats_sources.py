"""Data-format parsers/generators + spool-dir origin semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacollector_spark.sources import formats as FM


def test_json_roundtrip(spark):
    df = spark.createDataFrame([('{"a": 1, "b": "x"}',)], "js string")
    parsed = df.select(FM.parse_json(F.col("js"), "a INT, b STRING").alias("r"))
    row = parsed.select("r.a", "r.b").first()
    assert row["a"] == 1 and row["b"] == "x"
    back = parsed.select(FM.generate_json(F.col("r")).alias("js")).first()["js"]
    assert '"a":1' in back


def test_delimited_parse_and_generate(spark):
    df = spark.createDataFrame([("x,1",)], "line string")
    parsed = df.select(FM.parse_delimited(F.col("line"), "name STRING, v INT").alias("r"))
    assert parsed.select("r.v").first()[0] == 1
    gen = parsed.select(FM.generate_delimited(F.col("r")).alias("line")).first()["line"]
    assert gen == "x,1"


def test_xml_parse(spark):
    df = spark.createDataFrame([("<rec><a>7</a><b>hi</b></rec>",)], "xml string")
    parsed = df.select(FM.parse_xml(F.col("xml"), "a INT, b STRING").alias("r"))
    row = parsed.select("r.a", "r.b").first()
    assert row["a"] == 7 and row["b"] == "hi"


def test_apache_log_parse(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x.gif HTTP/1.0" 200 2326'
    df = spark.createDataFrame([(line,)], "raw string")
    out = FM.parse_log(df, "raw", FM.APACHE_COMMON_LOG, FM.APACHE_COMMON_GROUPS).first()
    assert out["client_ip"] == "127.0.0.1"
    assert out["method"] == "GET" and out["status"] == "200"


def test_syslog_parse(spark):
    line = "<34>Oct 11 22:14:15 myhost su[230]: 'su root' failed"
    df = spark.createDataFrame([(line,)], "raw string")
    out = FM.parse_log(df, "raw", FM.SYSLOG_PATTERN, FM.SYSLOG_GROUPS).first()
    assert out["host"] == "myhost" and out["app"] == "su" and out["pid"] == "230"


def test_avro_gated(spark):
    # the sandbox ships no spark-avro jar: the capability check must say so
    assert FM.avro_available(spark) is False


def test_spooldir_stream_ordered_delivery(spark, tmp_path):
    """Files written later are delivered in later micro-batches with
    maxFilesPerTrigger=1 — the reference's ordered spool semantics."""
    from datacollector_spark.sources.spooldir import spool_dir_batch, spool_dir_stream

    src = str(tmp_path / "spool")
    for i in range(3):
        spark.createDataFrame([(i,)], "v int").coalesce(1).write.mode("append").parquet(src)

    seen: list[list[int]] = []

    def sink(df, _bid):
        seen.append([r["v"] for r in df.select("v").collect()])

    q = (
        spool_dir_stream(
            spark,
            src,
            spark.createDataFrame([(0,)], "v int").schema,
            max_files_per_trigger=1,
            with_file_info=True,
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) == 3 and sorted(sum(seen, [])) == [0, 1, 2]
    assert spool_dir_batch(spark, src).count() == 3


def test_jdbc_reader_option_wiring(spark):
    """No DB/driver in the sandbox: JDBC load() resolves the schema eagerly,
    so the observable contract here is that the configured driver class is
    what Spark tries to load — proving the options reach the JDBC source."""
    from datacollector_spark.sources.jdbc import jdbc_partitioned_table

    with pytest.raises(Exception) as ei:
        jdbc_partitioned_table(
            spark,
            "jdbc:postgresql://nowhere/db",
            "events",
            "event_id",
            0,
            1000,
            8,
            properties={"driver": "org.postgresql.NoSuchDriver"},
        )
    assert "NoSuchDriver" in str(ei.value)


def test_parse_netflow_v5(spark):
    """Synthetic NetFlow v5 datagrams (struct.pack ground truth): 2 flows in
    one datagram + a malformed datagram that must be discarded."""
    import struct

    from datacollector_spark.sources.formats import parse_netflow_v5

    def flow(src, dst, pkts, octets, sport, dport, proto, flags):
        return struct.pack(
            ">IIIHHIIIIHHBBBBHHBBH",
            src, dst, 0, 1, 2, pkts, octets, 100, 200,
            sport, dport, 0, flags, proto, 0, 65001, 65002, 24, 24, 0,
        )

    def ip(a, b, c, d):
        return (a << 24) | (b << 16) | (c << 8) | d

    header = struct.pack(
        ">HHIIIIBBH", 5, 2, 12345, 1735732800, 0, 777, 0, 9, 0
    )
    dgram = header + flow(
        ip(10, 0, 0, 1), ip(192, 168, 1, 2), 7, 4200, 443, 55000, 6, 0x18
    ) + flow(ip(10, 0, 0, 3), ip(8, 8, 8, 8), 1, 76, 53, 41000, 17, 0)
    bad = b"\x00\x09" + b"\x00" * 30  # version 9: discarded

    df = spark.createDataFrame([(dgram,), (bad,)], "payload binary")
    got = parse_netflow_v5(df).orderBy("srcport").collect()
    assert len(got) == 2
    dns, https = got
    assert https.srcaddr == "10.0.0.1" and https.dstaddr == "192.168.1.2"
    assert https.packets == 7 and https.octets == 4200
    assert https.srcport == 443 and https.proto == 6 and https.tcp_flags == 0x18
    assert dns.srcport == 53 and dns.proto == 17
    assert https.flow_sequence == 777 and https.unix_secs == 1735732800
    assert https.engine_id == 9


def test_whole_file_batch_and_stream(spark, tmp_path):
    from datacollector_spark.sources.spooldir import whole_file_batch

    (tmp_path / "a.bin").write_bytes(b"\x01\x02\x03")
    (tmp_path / "b.bin").write_bytes(b"hello")
    (tmp_path / "skip.txt").write_text("no")
    got = whole_file_batch(spark, str(tmp_path), glob="*.bin").orderBy("length")
    rows = got.collect()
    assert [bytes(r["content"]) for r in rows] == [b"\x01\x02\x03", b"hello"]
    assert rows[0]["path"].endswith("a.bin") and rows[0]["length"] == 3


def test_tcp_socket_origin(spark, tmp_path):
    """Live socket origin: a local TCP server emits newline records; the
    stream must deliver them as rows (SDC TCP source shape)."""
    import socket
    import threading
    import time as _time

    from datacollector_spark.sources.spooldir import tcp_socket_origin

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"alpha\nbeta\ngamma\n")
            _time.sleep(8)  # keep the connection open while batches drain

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    out = str(tmp_path / "out")
    q = (
        tcp_socket_origin(spark, "127.0.0.1", port)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        rows = set()
        while _time.time() < deadline and len(rows) < 3:
            _time.sleep(1)
            try:
                rows = {r["value"] for r in spark.read.parquet(out).collect()}
            except Exception:
                pass
        assert rows == {"alpha", "beta", "gamma"}
    finally:
        q.stop()
        srv.close()
