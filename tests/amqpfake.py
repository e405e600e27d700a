"""In-process fake RabbitMQ broker speaking real AMQP 0-9-1 over TCP — the
loopback peer for the rabbitmq origin/target tests.  Implements the broker
side of the full protocol slice the client uses: handshake (Start/StartOk
PLAIN validation, Tune/TuneOk, Open/OpenOk), channel open, exchange/queue
declare + bind, publish routing (default / direct / fanout / topic with
``*``/``#`` patterns), basic.get with per-connection delivery tags,
manual ack with ``multiple``, basic.return for unroutable mandatory
publishes, and REQUEUE of unacked deliveries when a connection drops (the
at-least-once behavior the origin's crash-redelivery depends on).

Broker state (queues/exchanges/bindings) is shared across connections and
lock-guarded, so competing consumers on executor tasks exercise the same
contention a real broker arbitrates."""

from __future__ import annotations

import collections
import socketserver
import struct
import threading

from datacollector_spark.sources.rabbitmq import (
    FRAME_BODY,
    FRAME_END,
    FRAME_HEADER,
    FRAME_HEARTBEAT,
    FRAME_METHOD,
    PROTOCOL_HEADER,
    _longstr,
    _Reader,
    _shortstr,
    encode_table,
)


def _topic_match(pattern: str, key: str) -> bool:
    """AMQP topic matching: ``*`` = exactly one word, ``#`` = zero+ words."""
    pp, kk = pattern.split("."), key.split(".")

    def rec(i: int, j: int) -> bool:
        if i == len(pp):
            return j == len(kk)
        if pp[i] == "#":
            return any(rec(i + 1, j2) for j2 in range(j, len(kk) + 1))
        if j == len(kk):
            return False
        if pp[i] == "*" or pp[i] == kk[j]:
            return rec(i + 1, j + 1)
        return False

    return rec(0, 0)


class FakeBroker:
    def __init__(self, username: str = "guest", password: str = "guest", vhost: str = "/"):
        self.username, self.password, self.vhost = username, password, vhost
        self.lock = threading.Lock()
        self.queues: dict[str, collections.deque] = {}
        self.queue_meta: dict[str, dict] = {}
        self.exchanges: dict[str, str] = {}  # name -> type
        self.bindings: list[tuple[str, str, str]] = []  # (exchange, queue, key)
        self.acked: list[int] = []
        self.connections = 0
        self._srv: socketserver.ThreadingTCPServer | None = None
        self.port: int | None = None

    # ------------------------------------------------------------- routing

    def route(self, exchange: str, key: str) -> list[str]:
        if exchange == "":
            return [key] if key in self.queues else []
        ex_type = self.exchanges.get(exchange)
        out = []
        for ex, q, bkey in self.bindings:
            if ex != exchange:
                continue
            if ex_type == "fanout":
                out.append(q)
            elif ex_type == "direct" and bkey == key:
                out.append(q)
            elif ex_type == "topic" and _topic_match(bkey, key):
                out.append(q)
        return out

    # ---------------------------------------------------------------- wire

    def start(self) -> int:
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def _recv_exact(self, n):
                if not hasattr(self, "_rbuf"):
                    self._rbuf = b""
                while len(self._rbuf) < n:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        raise ConnectionError
                    self._rbuf += chunk
                out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
                return out

            def _read_frame(self):
                hdr = self._recv_exact(7)
                ftype, ch, size = struct.unpack(">BHI", hdr)
                payload = self._recv_exact(size)
                assert self._recv_exact(1)[0] == FRAME_END
                return ftype, ch, payload

            def _send_frame(self, ftype, ch, payload):
                self.request.sendall(
                    struct.pack(">BHI", ftype, ch, len(payload))
                    + payload
                    + bytes([FRAME_END])
                )

            def _send_method(self, ch, cid, mid, args=b""):
                self._send_frame(
                    FRAME_METHOD, ch, struct.pack(">HH", cid, mid) + args
                )

            def _read_content(self):
                ftype, _ch, payload = self._read_frame()
                assert ftype == FRAME_HEADER
                _cid, _w, size = struct.unpack_from(">HHQ", payload)
                props_raw = payload[12:]
                body = b""
                while len(body) < size:
                    ftype, _ch, chunk = self._read_frame()
                    assert ftype == FRAME_BODY
                    body += chunk
                return props_raw, body

            def _deliver_content(self, ch, props_raw, body):
                self._send_frame(
                    FRAME_HEADER,
                    ch,
                    struct.pack(">HHQ", 60, 0, len(body)) + props_raw,
                )
                if body:
                    self._send_frame(FRAME_BODY, ch, body)

            def handle(self):
                unacked: dict[int, tuple[str, tuple]] = {}
                next_tag = 0
                try:
                    assert self._recv_exact(8) == PROTOCOL_HEADER
                    with broker.lock:
                        broker.connections += 1
                    self._send_method(
                        0, 10, 10,
                        bytes([0, 9])
                        + encode_table({"product": "fake-broker"})
                        + _longstr(b"PLAIN AMQPLAIN")
                        + _longstr(b"en_US"),
                    )
                    ftype, _ch, payload = self._read_frame()
                    r = _Reader(payload[4:])
                    r.table()  # client properties
                    mech = r.shortstr()
                    resp = r.longstr()
                    assert mech == "PLAIN"
                    _, user, pw = resp.split(b"\x00")
                    if (
                        user.decode() != broker.username
                        or pw.decode() != broker.password
                    ):
                        # connection.close 403 ACCESS_REFUSED
                        self._send_method(
                            0, 10, 50,
                            struct.pack(">H", 403)
                            + _shortstr("ACCESS_REFUSED")
                            + struct.pack(">HH", 10, 11),
                        )
                        return
                    self._send_method(
                        0, 10, 30, struct.pack(">HIH", 2047, 131072, 0)
                    )
                    self._read_frame()  # tune-ok
                    ftype, _ch, payload = self._read_frame()  # connection.open
                    r = _Reader(payload[4:])
                    assert r.shortstr() == broker.vhost
                    self._send_method(0, 10, 41, _shortstr(""))

                    while True:
                        ftype, ch, payload = self._read_frame()
                        if ftype == FRAME_HEARTBEAT:
                            self._send_frame(FRAME_HEARTBEAT, 0, b"")
                            continue
                        cid, mid = struct.unpack_from(">HH", payload)
                        r = _Reader(payload[4:])
                        if (cid, mid) == (20, 10):  # channel.open
                            r.shortstr()
                            self._send_method(ch, 20, 11, _longstr(b""))
                        elif (cid, mid) == (40, 10):  # exchange.declare
                            r.short()
                            name, ex_type = r.shortstr(), r.shortstr()
                            r.octet()
                            with broker.lock:
                                broker.exchanges[name] = ex_type
                            self._send_method(ch, 40, 11)
                        elif (cid, mid) == (50, 10):  # queue.declare
                            r.short()
                            qname = r.shortstr()
                            bits = r.octet()
                            with broker.lock:
                                q = broker.queues.setdefault(
                                    qname, collections.deque()
                                )
                                broker.queue_meta[qname] = {
                                    "durable": bool(bits & 0x02),
                                    "exclusive": bool(bits & 0x04),
                                    "auto_delete": bool(bits & 0x08),
                                }
                                n = len(q)
                            self._send_method(
                                ch, 50, 11,
                                _shortstr(qname) + struct.pack(">II", n, 0),
                            )
                        elif (cid, mid) == (50, 20):  # queue.bind
                            r.short()
                            qname, ex, key = (
                                r.shortstr(),
                                r.shortstr(),
                                r.shortstr(),
                            )
                            with broker.lock:
                                b = (ex, qname, key)
                                if b not in broker.bindings:
                                    broker.bindings.append(b)
                            self._send_method(ch, 50, 21)
                        elif (cid, mid) == (60, 40):  # basic.publish
                            r.short()
                            ex, key = r.shortstr(), r.shortstr()
                            mandatory = bool(r.octet() & 0x01)
                            props_raw, body = self._read_content()
                            with broker.lock:
                                targets = broker.route(ex, key)
                                for q in targets:
                                    broker.queues[q].append(
                                        (body, props_raw, key)
                                    )
                            if mandatory and not targets:
                                self._send_method(
                                    ch, 60, 50,
                                    struct.pack(">H", 312)
                                    + _shortstr("NO_ROUTE")
                                    + _shortstr(ex)
                                    + _shortstr(key),
                                )
                                self._deliver_content(ch, props_raw, body)
                        elif (cid, mid) == (60, 70):  # basic.get
                            r.short()
                            qname = r.shortstr()
                            no_ack = bool(r.octet() & 0x01)
                            with broker.lock:
                                q = broker.queues.get(qname)
                                msg = q.popleft() if q else None
                                remaining = len(q) if q else 0
                            if msg is None:
                                self._send_method(
                                    ch, 60, 72, _shortstr("")
                                )
                            else:
                                next_tag += 1
                                if not no_ack:
                                    unacked[next_tag] = (qname, msg)
                                body, props_raw, key = msg
                                self._send_method(
                                    ch, 60, 71,
                                    struct.pack(">Q", next_tag)
                                    + b"\x00"
                                    + _shortstr("")
                                    + _shortstr(key)
                                    + struct.pack(">I", remaining),
                                )
                                self._deliver_content(ch, props_raw, body)
                        elif (cid, mid) == (60, 10):  # basic.qos (fence)
                            self._send_method(ch, 60, 11)
                        elif (cid, mid) == (60, 80):  # basic.ack
                            tag = r.longlong()
                            multiple = bool(r.octet() & 0x01)
                            with broker.lock:
                                if multiple:
                                    for t in [t for t in unacked if t <= tag]:
                                        del unacked[t]
                                        broker.acked.append(t)
                                elif tag in unacked:
                                    del unacked[tag]
                                    broker.acked.append(tag)
                        elif (cid, mid) == (10, 50):  # connection.close
                            self._send_method(0, 10, 51)
                            return
                        else:
                            raise AssertionError(
                                f"fake broker: method ({cid},{mid})"
                            )
                except ConnectionError:
                    pass
                finally:
                    # requeue unacked deliveries — at-least-once redelivery,
                    # original order restored (reverse-tag appendleft)
                    with broker.lock:
                        for tag in sorted(unacked, reverse=True):
                            qname, msg = unacked[tag]
                            broker.queues.setdefault(
                                qname, collections.deque()
                            ).appendleft(msg)

        class Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Srv(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self.port

    def stop(self) -> None:
        if self._srv:
            self._srv.shutdown()
            self._srv.server_close()
