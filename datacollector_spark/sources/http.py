"""HTTP origins: polling client origin + push server origin.

Reference semantics:
 - HTTP Client origin: ``basic-lib/.../stage/origin/http/HttpClientSource.java``
   — polled/paginated HTTP resource; pagination modes in ``PaginationMode.java``
   (NONE, LINK_HEADER, BY_PAGE, BY_OFFSET); the ``${startAt}`` EL variable is
   substituted into the resource URL / request body (HttpClientSource.java:404-420);
   ``resultFieldPath`` splits a paginated envelope into one record per list
   element (HttpClientSource.java:636, 720-723); the durable source offset is
   (url, parameter-hash, startAt, counter) — ``HttpSourceOffset.java``.
 - HTTP Server (push) origin: ``basic-lib/.../stage/origin/httpserver/
   PushHttpReceiver.java`` + ``httpcommonlib/.../HttpReceiverServlet.java`` —
   POST bodies are parsed into records and dispatched as a batch; requests are
   validated by the ``X-SDC-APPLICATION-ID`` header (or ``sdcApplicationId``
   query param), ``X-SDC-PING`` is answered without processing, gzip bodies are
   accepted via ``X-SDC-COMPRESSION``, and bodies are size-capped
   (PushHttpReceiver.java:118-124).

Spark-first shape (NOT a translation of the Jersey/Jetty code):

 * The client origin fetches page *payloads* on the driver — polling a single
   HTTP endpoint is inherently sequential, exactly as the reference's
   single-threaded ``produce()`` loop is — but parsing is DISTRIBUTED: raw
   page bodies are parallelized into a DataFrame and exploded/parsed with
   ``from_json`` JVM-side. Driver memory holds only the bounded page window
   (``max_pages`` × page size), never parsed records.
 * For backfills where the page range is known up front (the 100×-scale path),
   ``http_page_range_fetch`` fans the *fetching itself* out across executors
   with ``mapInPandas`` — one task per page span, transport injected, so a
   10^6-page backfill is cluster-parallel instead of a driver loop.
 * The server origin is a real listener (``ThreadingHTTPServer``) that lands
   each validated POST atomically into a spool directory; the pipeline consumes
   it with ``spool_dir_stream`` (Structured Streaming file source), which gives
   replay + exactly-once downstream — the durability the reference's in-memory
   push batch lacks.

``transport`` is injectable everywhere (this sandbox has no external network);
tests wire the client origin to the server origin over loopback for a live
end-to-end round trip.
"""
from __future__ import annotations

import gzip
import io
import json
import re
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Callable, Iterator, Optional
from urllib import request as _urlrequest

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

X_SDC_APPLICATION_ID_HEADER = "X-SDC-APPLICATION-ID"
SDC_APPLICATION_ID_QUERY_PARAM = "sdcApplicationId"
X_SDC_PING_HEADER = "X-SDC-PING"
X_SDC_COMPRESSION_HEADER = "X-SDC-COMPRESSION"

# transport: (method, url, headers, body) -> (status, headers, body_bytes)
Transport = Callable[[str, str, dict, Optional[bytes]], tuple[int, dict, bytes]]


def urllib_transport(
    method: str, url: str, headers: dict, body: Optional[bytes]
) -> tuple[int, dict, bytes]:
    """Default transport over urllib — works for loopback in this sandbox and
    for real endpoints in production. Injectable for offline tests."""
    req = _urlrequest.Request(url, data=body, headers=headers, method=method)
    with _urlrequest.urlopen(req, timeout=30) as resp:  # noqa: S310 — caller-supplied URL by design (origin config)
        return resp.status, dict(resp.headers.items()), resp.read()


# --------------------------------------------------------------------------
# Durable offset — HttpSourceOffset.java
# --------------------------------------------------------------------------
@dataclass
class HttpSourceOffset:
    """(url, parameter-hash, startAt, counter) — HttpSourceOffset.java. The
    string form is what a checkpoint/offset store persists so a restarted
    pipeline resumes pagination where it left off."""

    url: str
    start_at: int = 0
    counter: int = 0

    def to_string(self) -> str:
        return f"url::{self.url}::startAt::{self.start_at}::count::{self.counter}"

    @classmethod
    def from_string(cls, s: str) -> "HttpSourceOffset":
        m = re.match(r"url::(.*)::startAt::(-?\d+)::count::(\d+)$", s)
        if not m:
            raise ValueError(f"malformed HTTP source offset: {s!r}")
        return cls(url=m.group(1), start_at=int(m.group(2)), counter=int(m.group(3)))


def _to_struct(record_schema: str | T.StructType) -> T.StructType:
    if isinstance(record_schema, T.StructType):
        return record_schema
    return T.StructType.fromDDL(record_schema)


def _substitute_start_at(template: str, start_at: int) -> str:
    """``${startAt}`` EL variable — HttpClientSource.java:404-420 sets it in
    scope for both the resource URL and the request body."""
    return template.replace("${startAt}", str(start_at))


def _link_header_next(headers: dict) -> Optional[str]:
    """RFC 5988 Link header rel="next" — LINK_HEADER pagination
    (HttpClientSource.java:390)."""
    link = next((v for k, v in headers.items() if k.lower() == "link"), None)
    if not link:
        return None
    for part in link.split(","):
        m = re.match(r'\s*<([^>]+)>\s*;\s*rel="?next"?', part)
        if m:
            return m.group(1)
    return None


# --------------------------------------------------------------------------
# HTTP Client origin (polled / paginated)
# --------------------------------------------------------------------------
def http_client_origin_batch(
    spark: SparkSession,
    resource_url: str,
    record_schema: str | T.StructType,
    *,
    transport: Transport | None = None,
    method: str = "GET",
    headers: Optional[dict] = None,
    request_body: Optional[str] = None,
    pagination_mode: str = "NONE",
    start_at: int = 0,
    result_field_path: Optional[str] = None,
    keep_envelope: bool = False,
    max_pages: int = 100,
    offset: Optional[HttpSourceOffset] = None,
) -> tuple[DataFrame, HttpSourceOffset]:
    """One polling pass of the HTTP Client origin (HttpClientSource.java).

    Fetches up to ``max_pages`` pages (driver-side, like the reference's
    single-threaded ``produce()``), then hands the RAW bodies to Spark and
    parses/explodes them distributed. Returns ``(records_df, next_offset)``;
    persist ``next_offset.to_string()`` to resume (BY_OFFSET/BY_PAGE modes).

    Pagination (PaginationMode.java):
      NONE         — single request.
      LINK_HEADER  — follow ``Link: <...>; rel="next"`` until absent.
      BY_PAGE      — ``${startAt}`` += 1 per page.
      BY_OFFSET    — ``${startAt}`` += records-in-page.

    ``result_field_path`` ('' / None means the body IS the record array): the
    JSON field holding the page's record list; each element becomes one record
    (HttpClientSource.java:720-723 ``parseResultList``). ``keep_envelope``
    adds the page envelope minus the result field as a JSON string column
    (the reference's keepAllFields merge, kept explicit here).
    """
    if pagination_mode not in ("NONE", "LINK_HEADER", "BY_PAGE", "BY_OFFSET"):
        raise ValueError(f"unknown pagination mode {pagination_mode}")
    fetch = transport or urllib_transport
    off = offset or HttpSourceOffset(url=resource_url, start_at=start_at)

    pages: list[tuple[int, str, str]] = []  # (page_idx, url, body)
    url = _substitute_start_at(resource_url, off.start_at)
    for page_idx in range(max_pages):
        body_bytes = (
            _substitute_start_at(request_body, off.start_at).encode()
            if request_body is not None
            else None
        )
        status, resp_headers, payload = fetch(method, url, dict(headers or {}), body_bytes)
        if status == 204 or not payload:
            break
        if status >= 400:
            raise RuntimeError(f"HTTP origin: {status} from {url}")
        body = payload.decode("utf-8")
        # count records in the page driver-side only for BY_OFFSET arithmetic
        # (cheap: one json.loads of the envelope; the record PARSE is Spark's)
        n_in_page = None
        if result_field_path is not None or pagination_mode != "NONE":
            try:
                doc = json.loads(body)
                lst = doc.get(result_field_path, []) if result_field_path else doc
                n_in_page = len(lst) if isinstance(lst, list) else 1
            except (json.JSONDecodeError, AttributeError):
                n_in_page = 1
        if n_in_page == 0:
            break
        pages.append((page_idx, url, body))
        off.counter += 1
        if pagination_mode == "NONE":
            break
        if pagination_mode == "LINK_HEADER":
            nxt = _link_header_next(resp_headers)
            if not nxt:
                break
            url = nxt
        elif pagination_mode == "BY_PAGE":
            off.start_at += 1
            url = _substitute_start_at(resource_url, off.start_at)
        elif pagination_mode == "BY_OFFSET":
            off.start_at += n_in_page or 0
            url = _substitute_start_at(resource_url, off.start_at)

    page_schema = "page int, url string, body string"
    if not pages:
        raw = spark.createDataFrame([], page_schema)
    else:
        raw = spark.createDataFrame(pages, page_schema)

    arr_type = T.ArrayType(_to_struct(record_schema))
    if result_field_path:
        arr_col = F.from_json(
            F.get_json_object(F.col("body"), f"$.{result_field_path}"), arr_type
        )
    else:
        arr_col = F.from_json(F.col("body"), arr_type)
    out = raw.select(
        F.col("page"),
        F.col("url").alias("request_url"),
        *( [F.col("body").alias("_envelope")] if keep_envelope else [] ),
        F.posexplode(arr_col).alias("pos_in_page", "record"),
    ).select(
        "page",
        "request_url",
        *(["_envelope"] if keep_envelope else []),
        "pos_in_page",
        "record.*",
    )
    if keep_envelope and result_field_path:
        # envelope minus the result list — keepAllFields without duplicating
        # every record's payload into its siblings
        out = out.withColumn(
            "envelope",
            F.to_json(
                F.from_json(F.col("_envelope"), "map<string,string>")
            ),
        ).drop("_envelope")
    elif keep_envelope:
        out = out.withColumnRenamed("_envelope", "envelope")
    return out, off


def http_page_range_fetch(
    spark: SparkSession,
    url_template: str,
    record_schema: str | T.StructType,
    *,
    start: int,
    end: int,
    step: int = 1,
    transport: Transport | None = None,
    headers: Optional[dict] = None,
    result_field_path: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed backfill of a KNOWN page/offset range — the 100×-scale
    companion to the polling origin. ``url_template`` contains ``${startAt}``;
    every page in ``range(start, end, step)`` is fetched inside ``mapInPandas``
    (one Arrow batch of page numbers per task), so fetch concurrency equals
    cluster parallelism instead of a driver loop. Parsing/exploding stays
    JVM-side, identical to the polling path.

    This is the shape the reference cannot express (its origin is a
    single-threaded loop); at 10^6 pages the driver loop is the bottleneck and
    this is the operator you want.
    """
    fetch = transport or urllib_transport
    hdrs = dict(headers or {})
    n_parts = num_partitions or spark.sparkContext.defaultParallelism

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["id"].tolist():
                url = _substitute_start_at(url_template, int(p))
                status, _h, payload = fetch("GET", url, dict(hdrs), None)
                if status == 204 or not payload:
                    continue
                if status >= 400:
                    raise RuntimeError(f"HTTP fetch: {status} from {url}")
                rows.append((int(p), url, payload.decode("utf-8")))
            yield pd.DataFrame(rows, columns=["page", "url", "body"])

    raw = (
        spark.range(start, end, step, numPartitions=n_parts)
        .mapInPandas(run, "page long, url string, body string")
    )
    arr_type = T.ArrayType(_to_struct(record_schema))
    arr_col = (
        F.from_json(F.get_json_object(F.col("body"), f"$.{result_field_path}"), arr_type)
        if result_field_path
        else F.from_json(F.col("body"), arr_type)
    )
    return raw.select(
        "page",
        F.col("url").alias("request_url"),
        F.posexplode(arr_col).alias("pos_in_page", "record"),
    ).select("page", "request_url", "pos_in_page", "record.*")


# --------------------------------------------------------------------------
# HTTP Server (push) origin
# --------------------------------------------------------------------------
class HttpServerOrigin:
    """HTTP push origin (HttpServerPushSource.java / PushHttpReceiver.java):
    a listener that validates and lands each POST body atomically into a spool
    directory; consume with ``spool_dir_stream(spool_dir)`` (file source →
    replayable, exactly-once downstream — stronger than the reference's
    in-memory dispatch).

    Validation mirrors HttpReceiverServlet.java / HttpConstants.java:
      * app id must match via ``X-SDC-APPLICATION-ID`` header or
        ``sdcApplicationId`` query param → else 403;
      * ``X-SDC-PING`` GETs are acknowledged without landing a file;
      * ``X-SDC-COMPRESSION: gzip`` bodies are decompressed;
      * bodies over ``max_request_size`` → 413 (PushHttpReceiver's
        OverrunInputStream cap).
    """

    def __init__(
        self,
        spool_dir: str,
        app_id: Optional[str] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        max_request_size: int = 100 * 1024 * 1024,
        suffix: str = "json",
    ) -> None:
        self.spool_dir = Path(spool_dir)
        self.spool_dir.mkdir(parents=True, exist_ok=True)
        self._seq = 0
        self._seq_lock = threading.Lock()
        origin = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _app_id_ok(self) -> bool:
                if app_id is None:
                    return True
                got = self.headers.get(X_SDC_APPLICATION_ID_HEADER)
                if got is None and "?" in self.path:
                    q = self.path.split("?", 1)[1]
                    for kv in q.split("&"):
                        if kv.startswith(SDC_APPLICATION_ID_QUERY_PARAM + "="):
                            got = kv.split("=", 1)[1]
                return got == app_id

            def do_GET(self):
                if self.headers.get(X_SDC_PING_HEADER):
                    self.send_response(200)
                    self.end_headers()
                    return
                self.send_response(405)
                self.end_headers()

            def do_POST(self):
                if not self._app_id_ok():
                    self.send_response(403)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length > max_request_size:
                    self.send_response(413)
                    self.end_headers()
                    return
                body = self.rfile.read(length)
                if self.headers.get(X_SDC_COMPRESSION_HEADER, "").lower() == "gzip":
                    body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
                origin._land(body)
                self.send_response(200)
                self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        self._suffix = suffix
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def _land(self, body: bytes) -> None:
        """Atomic tmp-write + rename so the streaming file source never sees a
        partial file (same contract as spooldir closed-file semantics)."""
        with self._seq_lock:
            self._seq += 1
            seq = self._seq
        final = self.spool_dir / f"push-{seq:010d}.{self._suffix}"
        tmp = self.spool_dir / f".push-{seq:010d}.tmp"
        tmp.write_bytes(body)
        tmp.rename(final)

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/"

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


# --------------------------------------------------------------------------
# WebSocket Server (push) origin — RFC 6455, no jar, no framework
# --------------------------------------------------------------------------
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WebSocketServerOrigin:
    """WebSocket push origin (basic-lib/.../origin/websocketserver/
    WebSocketServerPushSource.java + PushWebSocketReceiver.java): every
    complete text/binary message becomes one landed spool file (the
    reference parses each message into a record batch the same way —
    PushWebSocketReceiver.process). Validation matches
    WebSocketReceiverServlet.java:119: the ``X-SDC-APPLICATION-ID``
    handshake header, or the ``sdcApplicationId`` query param when
    ``app_id_via_query_param`` is set (WebSocketConfigs.appIdViaQueryParamAllowed).

    The protocol layer is a from-scratch minimal RFC 6455 server: 101
    upgrade with ``Sec-WebSocket-Accept = b64(sha1(key + GUID))``, masked
    client frames (unmasking required by spec), 126/127 extended lengths,
    continuation-frame reassembly, ping→pong, close handshake. Downstream
    durability is the same spool-dir → Structured Streaming file source as
    the HTTP push origin (replayable, unlike the reference's in-memory
    dispatch)."""

    def __init__(
        self,
        spool_dir: str,
        app_id: Optional[str] = None,
        app_id_via_query_param: bool = False,
        host: str = "127.0.0.1",
        port: int = 0,
        suffix: str = "json",
        max_message_size: int = 100 * 1024 * 1024,
    ) -> None:
        import base64
        import hashlib
        import socketserver

        self.spool_dir = Path(spool_dir)
        self.spool_dir.mkdir(parents=True, exist_ok=True)
        self._seq = 0
        self._seq_lock = threading.Lock()
        origin = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                # ---- HTTP upgrade handshake
                request_line = self.rfile.readline().decode("latin1").strip()
                headers: dict[str, str] = {}
                while True:
                    line = self.rfile.readline().decode("latin1").strip()
                    if not line:
                        break
                    k, _, v = line.partition(":")
                    headers[k.strip().lower()] = v.strip()
                path = request_line.split(" ")[1] if " " in request_line else "/"
                ok_app = True
                if app_id is not None:
                    got = headers.get(X_SDC_APPLICATION_ID_HEADER.lower())
                    if got is None and app_id_via_query_param and "?" in path:
                        for kv in path.split("?", 1)[1].split("&"):
                            if kv.startswith(SDC_APPLICATION_ID_QUERY_PARAM + "="):
                                got = kv.split("=", 1)[1]
                    ok_app = got == app_id
                key = headers.get("sec-websocket-key")
                if headers.get("upgrade", "").lower() != "websocket" or not key:
                    self.wfile.write(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                    return
                if not ok_app:
                    self.wfile.write(b"HTTP/1.1 403 Forbidden\r\n\r\n")
                    return
                accept = base64.b64encode(
                    hashlib.sha1((key + _WS_GUID).encode()).digest()
                ).decode()
                self.wfile.write(
                    (
                        "HTTP/1.1 101 Switching Protocols\r\n"
                        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                        f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
                    ).encode()
                )
                # ---- frame loop
                fragments: list[bytes] = []
                while True:
                    head = self.rfile.read(2)
                    if len(head) < 2:
                        return
                    fin = head[0] & 0x80
                    opcode = head[0] & 0x0F
                    masked = head[1] & 0x80
                    length = head[1] & 0x7F
                    if length == 126:
                        length = int.from_bytes(self.rfile.read(2), "big")
                    elif length == 127:
                        length = int.from_bytes(self.rfile.read(8), "big")
                    if length > max_message_size:
                        return  # 1009 in spirit; just drop the connection
                    mask = self.rfile.read(4) if masked else b""
                    payload = self.rfile.read(length)
                    if masked:
                        payload = bytes(
                            b ^ mask[i % 4] for i, b in enumerate(payload)
                        )
                    if opcode == 0x8:  # close: echo and end
                        self.wfile.write(b"\x88\x00")
                        return
                    if opcode == 0x9:  # ping -> pong with same payload
                        self.wfile.write(
                            b"\x8a" + bytes([len(payload)]) + payload
                        )
                        continue
                    if opcode in (0x1, 0x2, 0x0):  # text/binary/continuation
                        fragments.append(payload)
                        if fin:
                            origin._land(b"".join(fragments))
                            fragments = []

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        self._suffix = suffix
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def _land(self, body: bytes) -> None:
        with self._seq_lock:
            self._seq += 1
            seq = self._seq
        final = self.spool_dir / f"ws-{seq:010d}.{self._suffix}"
        tmp = self.spool_dir / f".ws-{seq:010d}.tmp"
        tmp.write_bytes(body)
        tmp.rename(final)

    @property
    def url(self) -> str:
        return f"ws://{self.host}:{self.port}/"

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
