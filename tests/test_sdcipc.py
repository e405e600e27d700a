"""SDC RPC origin/destination pair + pure-Python snappy framed codec.

Reference: basic-lib origin/sdcipc (IpcServlet.java) + destination/sdcipc
(SdcIpcTarget.java, Configs.java, Constants.java)."""
from __future__ import annotations

import json
import struct
import urllib.request

import pytest
from pyspark.sql import functions as F

from datacollector_spark.functions import snappy_codec as sc
from datacollector_spark.sources.sdcipc import (
    HostPortSelector,
    SdcIpcOrigin,
    backoff_wait_ms,
    sdc_ipc_target,
    send_record_batch,
    validate_connectivity,
)


# ------------------------------------------------------------- snappy codec
def test_crc32c_known_vector():
    # the canonical CRC-32C check value (RFC 3720 appendix B / public tables)
    assert sc.crc32c(b"123456789") == 0xE3069283


def test_block_roundtrip_and_framed_roundtrip():
    for data in (b"", b"a", b"hello world" * 500, bytes(range(256)) * 400):
        assert sc.block_decompress(sc.block_compress(data)) == data
        assert sc.framed_decompress(sc.framed_compress(data)) == data


def test_block_decoder_copy_tags():
    # hand-assembled vectors that a real compressor would emit: copies
    # (the literal-only encoder never produces these, so pin them here)
    lit = lambda b: bytes([(len(b) - 1) << 2]) + b
    # copy1: 4+len3 bits, offset 2 -> "abab" + 8 copied = "abababababab"
    v1 = sc._put_uvarint(12) + lit(b"abab") + bytes([((8 - 4) << 2) | 1, 2])
    assert sc.block_decompress(v1) == b"abababababab"
    # copy2: len 5, 2-byte LE offset 10
    v2 = (
        sc._put_uvarint(15)
        + lit(b"0123456789")
        + bytes([((5 - 1) << 2) | 2])
        + struct.pack("<H", 10)
    )
    assert sc.block_decompress(v2) == b"012345678901234"
    # copy4 + overlapping run (offset 1 < length): "z" then 7 copies
    v3 = (
        sc._put_uvarint(8) + lit(b"z") + bytes([((7 - 1) << 2) | 3]) + struct.pack("<I", 1)
    )
    assert sc.block_decompress(v3) == b"z" * 8


def test_framed_checksum_tamper_detected():
    enc = bytearray(sc.framed_compress(b"payload bytes"))
    enc[-1] ^= 0x55
    with pytest.raises(ValueError, match="checksum|declared"):
        sc.framed_decompress(bytes(enc))


def test_framed_skippable_and_unskippable_chunks():
    good = sc.framed_compress(b"data")
    # splice a padding chunk (0xfe) after the stream id: must be skipped
    pad = bytes([0xFE]) + (3).to_bytes(3, "little") + b"\x00\x00\x00"
    spliced = good[:10] + pad + good[10:]
    assert sc.framed_decompress(spliced) == b"data"
    # unskippable reserved chunk (0x02) must raise
    bad = good[:10] + bytes([0x02]) + (1).to_bytes(3, "little") + b"x" + good[10:]
    with pytest.raises(ValueError, match="unskippable"):
        sc.framed_decompress(bad)


# --------------------------------------------------------- protocol servlet
def _post(url, body, headers):
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_servlet_validation_matrix(tmp_path):
    origin = SdcIpcOrigin(str(tmp_path / "spool"), app_id="s3cr3t")
    try:
        url = f"http://{origin.host_port}/ipc/v1"
        ok_headers = {
            "Content-Type": "application/binary",
            "X-SDC-APPLICATION-ID": "s3cr3t",
        }
        # wrong content type -> 400 (IpcServlet.java:90-93)
        assert _post(url, b"{}", {**ok_headers, "Content-Type": "text/plain"}) == 400
        # wrong app id -> 403 (IpcServlet.java:94-96)
        assert _post(url, b"{}", {**ok_headers, "X-SDC-APPLICATION-ID": "no"}) == 403
        # unsupported compression -> 415 (IpcServlet.java:108-111)
        assert (
            _post(url, b"{}", {**ok_headers, "X-SDC-COMPRESSION": "lz4"}) == 415
        )
        # good POST lands a file
        assert _post(url, b'{"a": 1}\n', ok_headers) == 200
        files = list((tmp_path / "spool").glob("ipc-*.json"))
        assert len(files) == 1 and files[0].read_bytes() == b'{"a": 1}\n'
        # snappy-compressed POST decompresses before landing
        comp = sc.framed_compress(b'{"a": 2}\n')
        assert (
            _post(url, comp, {**ok_headers, "X-SDC-COMPRESSION": "snappy"}) == 200
        )
        landed = sorted((tmp_path / "spool").glob("ipc-*.json"))[-1]
        assert landed.read_bytes() == b'{"a": 2}\n'
        # ping validation (doGet)
        issues = validate_connectivity([origin.host_port], "s3cr3t")
        assert issues == []
        issues = validate_connectivity([origin.host_port], "wrong")
        assert len(issues) == 1 and "403" in issues[0]
    finally:
        origin.stop()


# ------------------------------------------------- failover / retry / backoff
def test_host_port_selector_split_and_failover():
    # single host: always returned, even after errors
    s = HostPortSelector(["a:1"])
    assert s.get() == "a:1" and s.get(previous_had_error=True) == "a:1"
    # 8 hosts -> int(log 8)+1 = 3 active (min 2), 5 standby
    s = HostPortSelector([f"h{i}:1" for i in range(8)], seed=7)
    assert len(s.active) == 3 and len(s.standby) == 5
    # round robin cycles actives
    seen = {s.get() for _ in range(6)}
    assert seen == set(s.active)
    # an error swaps the current active out for the standby head
    demoted = s.active[s.last_active]
    promoted = s.standby[0]
    got = s.get(previous_had_error=True)
    assert got == promoted and demoted in s.standby and promoted in s.active


def test_backoff_schedule_matches_reference():
    # Configs.backOffWait: 0 for first try or disabled; back_off^retry capped
    assert backoff_wait_ms(10, 0) == 0
    assert backoff_wait_ms(0, 5) == 0
    assert backoff_wait_ms(10, 1) == 10
    assert backoff_wait_ms(10, 2) == 100
    assert backoff_wait_ms(10, 3) == 1000
    assert backoff_wait_ms(10, 9) == 5 * 60 * 1000  # capped at 5 min


def test_send_retries_then_fails_with_ipc_dest_20():
    calls = []

    def flaky(url, body, headers, timeout_s):
        calls.append(url)
        return 500, "boom"

    slept = []
    with pytest.raises(IOError, match="IPC_DEST_20"):
        send_record_batch(
            ['{"x":1}'],
            ["h0:1", "h1:1", "h2:1"],
            "app",
            retries_per_batch=2,
            back_off=10,
            transport=flaky,
            _sleep=slept.append,
        )
    assert len(calls) == 3  # initial + 2 retries
    assert slept == [0.01, 0.1]  # 10ms then 100ms (exponential)


def test_send_fails_over_to_healthy_host():
    """First host erroring triggers standby promotion; batch still lands."""
    attempts = []

    def transport(url, body, headers, timeout_s):
        attempts.append(url)
        return (500, "down") if len(attempts) == 1 else (200, "OK")

    sel = HostPortSelector(["h0:1", "h1:1", "h2:1", "h3:1"], seed=3)
    sent = send_record_batch(
        ['{"x":1}', '{"x":2}'],
        ["unused"],
        "app",
        retries_per_batch=3,
        transport=transport,
        selector=sel,
    )
    assert sent == 2 and len(attempts) == 2
    assert attempts[0] != attempts[1]  # retried on a different peer


# ------------------------------------------------------ end-to-end via Spark
def test_distributed_roundtrip_pipeline_to_pipeline(spark, tmp_path):
    """Sender pipeline (foreachPartition, executor-side POSTs, snappy on)
    -> receiver origin -> Spark read-back equals the sent frame."""
    origin = SdcIpcOrigin(str(tmp_path / "spool"), app_id="pipe2pipe")
    try:
        df = (
            spark.range(500)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("v"),
                F.concat(F.lit("row-"), F.col("id")).alias("tag"),
            )
            .repartition(8)
        )
        sdc_ipc_target(
            df, [origin.host_port], "pipe2pipe", compression=True, batch_size=64
        )
        back = origin.read(spark, schema="k long, v long, tag string")
        assert back.count() == 500
        assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
        # multiple spool files landed (≥8 partitions worth of batches)
        assert len(list((tmp_path / "spool").glob("ipc-*.json"))) >= 8
    finally:
        origin.stop()
