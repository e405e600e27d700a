"""WebSocket server push origin: RFC 6455 handshake (pinned to the RFC's own
worked example), masked frames, extended lengths, fragmentation, ping/pong,
close, app-id validation — driven by a hand-rolled raw-socket client.

Reference: basic-lib/.../origin/websocketserver/WebSocketServerPushSource.java,
PushWebSocketReceiver.java, WebSocketReceiverServlet.java:119."""
from __future__ import annotations

import json
import os
import socket

from datacollector_spark.sources.http import WebSocketServerOrigin
from datacollector_spark.sources.spooldir import spool_dir_batch


def _connect(origin, extra_headers="", path="/"):
    s = socket.create_connection((origin.host, origin.port), timeout=10)
    # the RFC 6455 §1.3 worked example key — the server MUST answer with
    # accept s3pPLMBiTxaQ9kYGzzhZRbK+xOo=
    s.sendall(
        (
            f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            f"Sec-WebSocket-Version: 13\r\n{extra_headers}\r\n"
        ).encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = s.recv(4096)
        if not chunk:
            break
        resp += chunk
    return s, resp.decode("latin1")


def _masked_frame(payload: bytes, opcode=0x1, fin=True, mask=b"\x37\xfa\x21\x3d"):
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([0x80 | n])
    elif n < 1 << 16:
        head += bytes([0x80 | 126]) + n.to_bytes(2, "big")
    else:
        head += bytes([0x80 | 127]) + n.to_bytes(8, "big")
    body = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return head + mask + body


def test_handshake_accept_matches_rfc_worked_example(tmp_path):
    origin = WebSocketServerOrigin(str(tmp_path / "ws"))
    try:
        s, resp = _connect(origin)
        assert "101 Switching Protocols" in resp
        assert "Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in resp
        s.close()
    finally:
        origin.stop()


def test_app_id_validation(tmp_path):
    origin = WebSocketServerOrigin(
        str(tmp_path / "ws"), app_id="secret", app_id_via_query_param=True
    )
    try:
        _s, resp = _connect(origin)
        assert "403" in resp
        _s.close()
        s, resp = _connect(origin, extra_headers="X-SDC-APPLICATION-ID: secret\r\n")
        assert "101" in resp
        s.close()
        s, resp = _connect(origin, path="/?sdcApplicationId=secret")
        assert "101" in resp
        s.close()
    finally:
        origin.stop()


def test_frames_fragmentation_ping_and_spark_read(spark, tmp_path):
    spool = tmp_path / "ws"
    origin = WebSocketServerOrigin(str(spool))
    try:
        s, resp = _connect(origin)
        assert "101" in resp
        # single text frame
        s.sendall(_masked_frame(json.dumps({"id": 1, "name": "a"}).encode()))
        # fragmented message: text frame FIN=0 + continuation FIN=1
        half = json.dumps({"id": 2, "name": "b"}).encode()
        s.sendall(_masked_frame(half[:5], opcode=0x1, fin=False))
        s.sendall(_masked_frame(half[5:], opcode=0x0, fin=True))
        # extended 126-length frame (>125 bytes payload)
        big = json.dumps({"id": 3, "name": "c" * 150}).encode()
        assert len(big) > 125
        s.sendall(_masked_frame(big))
        # ping -> expect pong echo
        s.sendall(_masked_frame(b"hb", opcode=0x9))
        pong = s.recv(64)
        assert pong[:2] == b"\x8a\x02" and pong[2:4] == b"hb"
        # close handshake
        s.sendall(_masked_frame(b"", opcode=0x8))
        assert s.recv(16)[:1] == b"\x88"
        s.close()
        # wait for the three landed files (atomic renames)
        import time

        for _ in range(50):
            if len(list(spool.glob("ws-*.json"))) >= 3:
                break
            time.sleep(0.1)
        out = spool_dir_batch(
            spark, str(spool), schema="id int, name string", file_format="json"
        )
        got = sorted((r.id, r.name) for r in out.collect())
        assert got == [(1, "a"), (2, "b"), (3, "c" * 150)]
    finally:
        origin.stop()
