"""RabbitMQ origin + destination over a from-scratch AMQP 0-9-1 client —
jar-free, written directly against the public protocol spec
(amqp0-9-1.xml / the AMQP 0-9-1 specification, "General Frame Format" §2.3
and the connection/channel/exchange/queue/basic method classes).

Reference semantics (rabbitmq-lib):

- Stage init declares every configured exchange, declares the queue, and
  binds the queue to each exchange with ``routingKey or queue-name``
  (RabbitUtil.initRabbitConf / bindQueue).
- The origin consumes with MANUAL ack; each record carries its
  ``deliveryTag`` and the committed offset acks with ``multiple=true``
  (RabbitSource.java:93-106) — at-least-once.
- The target publishes each serialized batch/record to EVERY configured
  exchange with ``routingKey or queue-name`` (RabbitTarget.handleDelivery),
  optional AMQP basic properties, optional ``mandatory`` flag whose
  ``basic.return`` failures surface as errors.

Wire protocol implemented here: frames ``type(1) channel(2) size(4)
payload frame-end(0xCE)``; method/content-header/content-body/heartbeat
frame types; shortstr/longstr/field-table codecs; connection handshake
(protocol header ``AMQP\\x00\\x00\\x09\\x01`` → Start/StartOk with PLAIN
``\\0user\\0pass`` → Tune/TuneOk → Open/OpenOk), channel open,
exchange.declare, queue.declare/bind, basic.publish (+ content header with
property flags), basic.get/get-ok/get-empty, basic.consume/deliver,
basic.ack (multiple).

Scale shape: one AMQP connection per executor task.  Draining uses
COMPETING CONSUMERS — every partition opens its own channel on the same
queue and ``basic.get``-drains until empty, so a 1000-task read splits the
backlog exactly the way a 1000-consumer RabbitMQ deployment would; acks
are per-task after its page lands.  Publishing is ``foreachPartition``.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_HEARTBEAT = 8
FRAME_END = 0xCE

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"


class AmqpError(Exception):
    pass


# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------

def _shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(b)]) + b


def _longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def encode_table(d: dict) -> bytes:
    out = b""
    for k, v in (d or {}).items():
        out += _shortstr(str(k))
        if isinstance(v, bool):
            out += b"t" + (b"\x01" if v else b"\x00")
        elif isinstance(v, int):
            out += b"l" + struct.pack(">q", v)
        elif isinstance(v, float):
            out += b"d" + struct.pack(">d", v)
        elif isinstance(v, dict):
            out += b"F" + encode_table(v)
        elif v is None:
            out += b"V"
        else:
            out += b"S" + _longstr(str(v).encode("utf-8"))
    return _longstr(out)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def octet(self) -> int:
        v = self.d[self.p]
        self.p += 1
        return v

    def short(self) -> int:
        v = struct.unpack_from(">H", self.d, self.p)[0]
        self.p += 2
        return v

    def long(self) -> int:
        v = struct.unpack_from(">I", self.d, self.p)[0]
        self.p += 4
        return v

    def longlong(self) -> int:
        v = struct.unpack_from(">Q", self.d, self.p)[0]
        self.p += 8
        return v

    def shortstr(self) -> str:
        n = self.octet()
        v = self.d[self.p : self.p + n].decode("utf-8")
        self.p += n
        return v

    def longstr(self) -> bytes:
        n = self.long()
        v = self.d[self.p : self.p + n]
        self.p += n
        return v

    def table(self) -> dict:
        raw = self.longstr()
        sub = _Reader(raw)
        out: dict[str, Any] = {}
        while sub.p < len(sub.d):
            key = sub.shortstr()
            out[key] = sub._value()
        return out

    def _value(self) -> Any:
        t = chr(self.octet())
        if t == "t":
            return bool(self.octet())
        if t == "b":
            return struct.unpack(">b", bytes([self.octet()]))[0]
        if t == "B":
            return self.octet()
        if t in ("s", "u"):
            return self.short()
        if t in ("I", "i"):
            return self._long_signed()
        if t in ("l", "L", "T"):
            return self.longlong()
        if t == "f":
            v = struct.unpack_from(">f", self.d, self.p)[0]
            self.p += 4
            return v
        if t == "d":
            v = struct.unpack_from(">d", self.d, self.p)[0]
            self.p += 8
            return v
        if t == "D":
            scale = self.octet()
            return self._long_signed() / (10 ** scale)
        if t == "S":
            return self.longstr().decode("utf-8", "replace")
        if t == "x":
            return self.longstr()
        if t == "A":
            raw = self.longstr()
            sub = _Reader(raw)
            arr = []
            while sub.p < len(sub.d):
                arr.append(sub._value())
            return arr
        if t == "F":
            return self.table()
        if t == "V":
            return None
        raise AmqpError(f"unknown field-table value type {t!r}")

    def _long_signed(self) -> int:
        v = struct.unpack_from(">i", self.d, self.p)[0]
        self.p += 4
        return v


# basic-properties flag bit -> (name, codec) in descending bit order
_BASIC_PROPS = [
    (15, "content_type", "shortstr"),
    (14, "content_encoding", "shortstr"),
    (13, "headers", "table"),
    (12, "delivery_mode", "octet"),
    (11, "priority", "octet"),
    (10, "correlation_id", "shortstr"),
    (9, "reply_to", "shortstr"),
    (8, "expiration", "shortstr"),
    (7, "message_id", "shortstr"),
    (6, "timestamp", "longlong"),
    (5, "type", "shortstr"),
    (4, "user_id", "shortstr"),
    (3, "app_id", "shortstr"),
    (2, "cluster_id", "shortstr"),
]


def encode_properties(props: dict) -> bytes:
    flags = 0
    body = b""
    for bit, name, kind in _BASIC_PROPS:
        v = props.get(name)
        if v is None:
            continue
        flags |= 1 << bit
        if kind == "shortstr":
            body += _shortstr(str(v))
        elif kind == "octet":
            body += bytes([int(v)])
        elif kind == "longlong":
            body += struct.pack(">Q", int(v))
        elif kind == "table":
            body += encode_table(v)
    return struct.pack(">H", flags) + body


def decode_properties(data: bytes) -> dict:
    r = _Reader(data)
    flags = r.short()
    out: dict[str, Any] = {}
    for bit, name, kind in _BASIC_PROPS:
        if not flags & (1 << bit):
            continue
        if kind == "shortstr":
            out[name] = r.shortstr()
        elif kind == "octet":
            out[name] = r.octet()
        elif kind == "longlong":
            out[name] = r.longlong()
        elif kind == "table":
            out[name] = r.table()
    return out


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

@dataclass
class RabbitConfig:
    uri: str = "amqp://127.0.0.1:5672/"
    username: str = "guest"
    password: str = "guest"
    queue: str = ""
    queue_durable: bool = True
    queue_exclusive: bool = False
    queue_auto_delete: bool = False
    exchanges: list[dict] = field(default_factory=list)
    # each: {"name", "type": direct|fanout|topic, "routingKey", "durable",
    #        "autoDelete"}
    mandatory: bool = False
    properties: dict = field(default_factory=dict)
    single_message_per_batch: bool = False


def parse_amqp_uri(uri: str) -> tuple[str, int, str]:
    """AMQP URI semantics: the vhost is the RAW path segment, percent-
    decoded — ``amqp://h/prod`` means vhost ``prod`` (not ``/prod``), an
    empty path means the default vhost ``/``, and ``amqp://h/%2F`` is an
    explicit default."""
    from urllib.parse import unquote

    rest = uri.split("://", 1)[-1]
    if "@" in rest:
        rest = rest.split("@", 1)[1]
    hostport, sep, vhost = rest.partition("/")
    host, _, port = hostport.partition(":")
    return (
        host or "127.0.0.1",
        int(port or 5672),
        unquote(vhost) if sep and vhost else "/",
    )


class AmqpClient:
    """Blocking single-channel AMQP 0-9-1 client."""

    def __init__(
        self,
        host: str,
        port: int,
        vhost: str = "/",
        username: str = "guest",
        password: str = "guest",
        timeout: float = 15.0,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.buf = b""
        self.returned: list[dict] = []  # basic.return notices (mandatory)
        self.server_properties: dict = {}
        self._handshake(vhost, username, password)
        self._channel_open()

    # ------------------------------------------------------------- frames

    def _recv_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("AMQP connection closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_frame(self) -> tuple[int, int, bytes]:
        hdr = self._recv_exact(7)
        ftype, channel, size = struct.unpack(">BHI", hdr)
        payload = self._recv_exact(size)
        end = self._recv_exact(1)[0]
        if end != FRAME_END:
            raise AmqpError(f"bad frame-end 0x{end:02x}")
        return ftype, channel, payload

    def send_frame(self, ftype: int, channel: int, payload: bytes) -> None:
        self.sock.sendall(
            struct.pack(">BHI", ftype, channel, len(payload))
            + payload
            + bytes([FRAME_END])
        )

    def send_method(self, channel: int, class_id: int, method_id: int, args: bytes) -> None:
        self.send_frame(
            FRAME_METHOD, channel, struct.pack(">HH", class_id, method_id) + args
        )

    def _wait_method(self, want: tuple[int, int]) -> _Reader:
        """Read frames until the wanted method arrives; heartbeats are
        answered, basic.return (+ its content) is buffered."""
        while True:
            ftype, _ch, payload = self.read_frame()
            if ftype == FRAME_HEARTBEAT:
                self.send_frame(FRAME_HEARTBEAT, 0, b"")
                continue
            if ftype != FRAME_METHOD:
                raise AmqpError(f"unexpected frame type {ftype}")
            cid, mid = struct.unpack_from(">HH", payload)
            r = _Reader(payload[4:])
            if (cid, mid) == want:
                return r
            if (cid, mid) == (60, 50):  # basic.return
                notice = {
                    "reply_code": r.short(),
                    "reply_text": r.shortstr(),
                    "exchange": r.shortstr(),
                    "routing_key": r.shortstr(),
                }
                notice["body"] = self._read_content()[1]
                self.returned.append(notice)
                continue
            if (cid, mid) == (10, 50):  # connection.close
                code, text = r.short(), r.shortstr()
                self.send_method(0, 10, 51, b"")
                raise AmqpError(f"connection closed by server: {code} {text}")
            if (cid, mid) == (20, 40):  # channel.close
                code, text = r.short(), r.shortstr()
                self.send_method(1, 20, 41, b"")
                raise AmqpError(f"channel closed by server: {code} {text}")
            raise AmqpError(f"unexpected method ({cid},{mid}) while waiting for {want}")

    def _read_content(self) -> tuple[dict, bytes]:
        ftype, _ch, payload = self.read_frame()
        if ftype != FRAME_HEADER:
            raise AmqpError("expected content header")
        _cid, _weight, body_size = struct.unpack_from(">HHQ", payload)
        props = decode_properties(payload[12:])
        body = b""
        while len(body) < body_size:
            ftype, _ch, chunk = self.read_frame()
            if ftype != FRAME_BODY:
                raise AmqpError("expected content body")
            body += chunk
        return props, body

    # ---------------------------------------------------------- handshake

    def _handshake(self, vhost: str, username: str, password: str) -> None:
        self.sock.sendall(PROTOCOL_HEADER)
        r = self._wait_method((10, 10))  # connection.start
        _vmaj, _vmin = r.octet(), r.octet()
        self.server_properties = r.table()
        mechanisms = r.longstr().split()
        if b"PLAIN" not in mechanisms:
            raise AmqpError(f"server offers no PLAIN auth: {mechanisms}")
        client_props = encode_table({"product": "datacollector-spark"})
        response = b"\x00" + username.encode() + b"\x00" + password.encode()
        self.send_method(
            0, 10, 11,
            client_props + _shortstr("PLAIN") + _longstr(response) + _shortstr("en_US"),
        )
        r = self._wait_method((10, 30))  # connection.tune
        channel_max, frame_max, _heartbeat = r.short(), r.long(), r.short()
        # tune-ok echoes (heartbeat 0 = disabled on our side)
        self.send_method(
            0, 10, 31, struct.pack(">HIH", channel_max, frame_max or 131072, 0)
        )
        self.frame_max = frame_max or 131072
        self.send_method(0, 10, 40, _shortstr(vhost) + _shortstr("") + b"\x00")
        self._wait_method((10, 41))  # open-ok

    def _channel_open(self) -> None:
        self.send_method(1, 20, 10, _shortstr(""))
        self._wait_method((20, 11))

    # ------------------------------------------------------------ methods

    def exchange_declare(
        self,
        name: str,
        ex_type: str = "direct",
        durable: bool = False,
        auto_delete: bool = False,
    ) -> None:
        bits = (0x02 if durable else 0) | (0x04 if auto_delete else 0)
        self.send_method(
            1, 40, 10,
            struct.pack(">H", 0)
            + _shortstr(name)
            + _shortstr(ex_type)
            + bytes([bits])
            + encode_table({}),
        )
        self._wait_method((40, 11))

    def queue_declare(
        self,
        name: str,
        durable: bool = True,
        exclusive: bool = False,
        auto_delete: bool = False,
    ) -> tuple[str, int, int]:
        bits = (
            (0x02 if durable else 0)
            | (0x04 if exclusive else 0)
            | (0x08 if auto_delete else 0)
        )
        self.send_method(
            1, 50, 10,
            struct.pack(">H", 0) + _shortstr(name) + bytes([bits]) + encode_table({}),
        )
        r = self._wait_method((50, 11))
        return r.shortstr(), r.long(), r.long()

    def queue_bind(self, queue: str, exchange: str, routing_key: str) -> None:
        self.send_method(
            1, 50, 20,
            struct.pack(">H", 0)
            + _shortstr(queue)
            + _shortstr(exchange)
            + _shortstr(routing_key)
            + b"\x00"
            + encode_table({}),
        )
        self._wait_method((50, 21))

    def basic_publish(
        self,
        body: bytes,
        exchange: str = "",
        routing_key: str = "",
        properties: dict | None = None,
        mandatory: bool = False,
    ) -> None:
        self.send_method(
            1, 60, 40,
            struct.pack(">H", 0)
            + _shortstr(exchange)
            + _shortstr(routing_key)
            + bytes([0x01 if mandatory else 0x00]),
        )
        header = struct.pack(">HHQ", 60, 0, len(body)) + encode_properties(
            properties or {}
        )
        self.send_frame(FRAME_HEADER, 1, header)
        limit = max(4096, self.frame_max - 8)
        for i in range(0, len(body), limit):
            self.send_frame(FRAME_BODY, 1, body[i : i + limit])
        if not body:
            pass  # zero-length content is header-only per spec

    def basic_get(self, queue: str, no_ack: bool = False):
        """Returns None (get-empty) or a dict with delivery_tag / body /
        properties / exchange / routing_key / message_count."""
        self.send_method(
            1, 60, 70,
            struct.pack(">H", 0) + _shortstr(queue) + (b"\x01" if no_ack else b"\x00"),
        )
        while True:
            ftype, _ch, payload = self.read_frame()
            if ftype == FRAME_HEARTBEAT:
                self.send_frame(FRAME_HEARTBEAT, 0, b"")
                continue
            cid, mid = struct.unpack_from(">HH", payload)
            r = _Reader(payload[4:])
            if (cid, mid) == (60, 72):  # get-empty
                return None
            if (cid, mid) == (60, 71):  # get-ok
                msg = {
                    "delivery_tag": r.longlong(),
                    "redelivered": bool(r.octet()),
                    "exchange": r.shortstr(),
                    "routing_key": r.shortstr(),
                    "message_count": r.long(),
                }
                props, body = self._read_content()
                msg["properties"] = props
                msg["body"] = body
                return msg
            raise AmqpError(f"unexpected method ({cid},{mid}) for basic.get")

    def basic_qos(self, prefetch_count: int = 0) -> None:
        """basic.qos → qos-ok — side-effect-free and SYNCHRONOUS, which
        makes it the channel fence after async publishes: the broker
        processes channel frames in order, so any basic.return raised by
        an earlier publish is on the wire (and buffered by _wait_method)
        before the qos-ok arrives."""
        self.send_method(
            1, 60, 10, struct.pack(">IHB", 0, prefetch_count, 0)
        )
        self._wait_method((60, 11))

    def poll_returns(self, timeout: float = 0.1) -> None:
        """Drain any pending async frames (basic.return notices arrive
        AFTER publishes, unprompted) into ``self.returned``."""
        old = self.sock.gettimeout()
        self.sock.settimeout(timeout)
        try:
            while True:
                ftype, _ch, payload = self.read_frame()
                if ftype == FRAME_HEARTBEAT:
                    continue
                cid, mid = struct.unpack_from(">HH", payload)
                if (cid, mid) == (60, 50):
                    r = _Reader(payload[4:])
                    notice = {
                        "reply_code": r.short(),
                        "reply_text": r.shortstr(),
                        "exchange": r.shortstr(),
                        "routing_key": r.shortstr(),
                    }
                    notice["body"] = self._read_content()[1]
                    self.returned.append(notice)
                else:
                    raise AmqpError(f"unexpected async method ({cid},{mid})")
        except (socket.timeout, TimeoutError):
            pass
        finally:
            self.sock.settimeout(old)

    def basic_ack(self, delivery_tag: int, multiple: bool = True) -> None:
        self.send_method(
            1, 60, 80,
            struct.pack(">Q", delivery_tag) + (b"\x01" if multiple else b"\x00"),
        )

    def close(self) -> None:
        try:
            self.send_method(0, 10, 50, struct.pack(">H", 200) + _shortstr("bye") + struct.pack(">HH", 0, 0))
            self._wait_method((10, 51))
        except Exception:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# stage-level helpers
# ---------------------------------------------------------------------------

def _connect(cfg: RabbitConfig) -> AmqpClient:
    host, port, vhost = parse_amqp_uri(cfg.uri)
    return AmqpClient(host, port, vhost, cfg.username, cfg.password)


def declare_topology(client: AmqpClient, cfg: RabbitConfig) -> None:
    """RabbitUtil.initRabbitConf: declare exchanges, declare the queue,
    bind the queue to each exchange with routingKey-or-queue-name."""
    for ex in cfg.exchanges:
        client.exchange_declare(
            ex["name"],
            ex.get("type", "direct").lower(),
            durable=bool(ex.get("durable", False)),
            auto_delete=bool(ex.get("autoDelete", False)),
        )
    if cfg.queue:
        client.queue_declare(
            cfg.queue,
            durable=cfg.queue_durable,
            exclusive=cfg.queue_exclusive,
            auto_delete=cfg.queue_auto_delete,
        )
        for ex in cfg.exchanges:
            client.queue_bind(
                cfg.queue, ex["name"], ex.get("routingKey") or cfg.queue
            )


def rabbit_origin_batch(
    spark: SparkSession,
    cfg: RabbitConfig,
    record_schema: T.StructType,
    consumers: int = 4,
    max_records_per_consumer: int | None = None,
    page_size: int = 5000,
) -> DataFrame:
    """Drain the queue once with ``consumers`` COMPETING consumer tasks:
    each executor task opens its own connection/channel, ``basic.get``-loops
    until the queue answers get-empty (or its record cap), parses the JSON
    bodies against ``record_schema``, and acks each PAGE's highest
    deliveryTag with ``multiple=true`` AFTER yielding it downstream — the
    reference's manual-ack commit (RabbitSource.commit), per page.  Memory
    is bounded at ``page_size`` rows per consumer (one Arrow batch per
    page), and a task crash before a page's ack redelivers that page —
    at-least-once.

    Consumption is destructive: callers that run more than one action over
    the result must persist it first (PipelineSpec.build does)."""
    import json as _json

    out_fields = [
        T.StructField("_delivery_tag", T.LongType(), False),
        T.StructField("_routing_key", T.StringType(), True),
    ] + list(record_schema.fields)
    out_schema = T.StructType(out_fields)
    names = [f.name for f in record_schema.fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for _cid in pdf["_consumer"]:
                client = _connect(cfg)
                try:
                    declare_topology(client, cfg)
                    rows: list[list] = []
                    total = 0
                    last_tag = None
                    drained = False
                    while not drained:
                        msg = client.basic_get(cfg.queue, no_ack=False)
                        if msg is None:
                            drained = True
                        else:
                            last_tag = msg["delivery_tag"]
                            doc = _json.loads(msg["body"].decode("utf-8"))
                            rows.append(
                                [last_tag, msg["routing_key"]]
                                + [doc.get(n) for n in names]
                            )
                            total += 1
                            if (
                                max_records_per_consumer
                                and total >= max_records_per_consumer
                            ):
                                drained = True
                        if rows and (drained or len(rows) >= page_size):
                            yield pd.DataFrame(
                                rows, columns=[f.name for f in out_fields]
                            ).astype(object)
                            # ack AFTER the page went downstream
                            client.basic_ack(last_tag, multiple=True)
                            rows = []
                finally:
                    client.close()

    seeds = spark.createDataFrame(
        [(i,) for i in range(consumers)], "_consumer int"
    ).repartition(consumers, "_consumer")
    return seeds.mapInPandas(run, out_schema)


def rabbit_target(df: DataFrame, cfg: RabbitConfig) -> None:
    """RabbitTarget.write: serialize rows as JSON and publish to every
    configured exchange with routingKey-or-queue-name (handleDelivery); an
    empty exchange list publishes through the DEFAULT exchange straight to
    the queue (the name-as-routing-key route the broker always provides —
    the reference's literal loop would no-op, which is never what a user
    wants).  ``single_message_per_batch`` concatenates each PARTITION's
    rows into one newline-delimited message, mirroring the reference's
    one-message-per-batch.  Mandatory-flag basic.return notices raise."""
    import json as _json

    cfg_routes = [
        (ex["name"], ex.get("routingKey") or cfg.queue) for ex in cfg.exchanges
    ] or [("", cfg.queue)]
    columns = [f.name for f in df.schema.fields]

    def write_partition(rows: Iterator) -> None:
        client = _connect(cfg)
        try:
            declare_topology(client, cfg)
            payloads: list[bytes] = []
            for row in rows:
                d = row.asDict(recursive=True)
                payloads.append(
                    _json.dumps({c: d.get(c) for c in columns}, default=str).encode()
                )
            if cfg.single_message_per_batch and payloads:
                payloads = [b"\n".join(payloads)]
            for body in payloads:
                for ex_name, rk in cfg_routes:
                    client.basic_publish(
                        body,
                        exchange=ex_name,
                        routing_key=rk,
                        properties=cfg.properties or None,
                        mandatory=cfg.mandatory,
                    )
            if cfg.mandatory:
                # deterministic sync point: basic.qos is processed after
                # every earlier publish on the channel, so its qos-ok
                # arrives after any basic.return those publishes raised
                # (buffered by _wait_method); the poll sweeps stragglers
                client.basic_qos(0)
                client.poll_returns()
            if client.returned:
                n = client.returned[0]
                raise AmqpError(
                    f"RABBITMQ_08: basic.return {n['reply_code']} "
                    f"{n['reply_text']} exchange={n['exchange']!r} "
                    f"routingKey={n['routing_key']!r}"
                )
        finally:
            client.close()

    df.foreachPartition(write_partition)
