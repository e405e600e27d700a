"""SDC RPC — the reference's inter-pipeline transport, re-expressed.

Reference behavior (basic-lib, all cited file:line):

* origin/sdcipc/IpcServlet.java:63-73 — GET validation: app id via
  ``X-SDC-APPLICATION-ID`` else 403; OK responds ``X-SDC-PING: ping``.
* IpcServlet.java:77-117 — POST ``/ipc/v1``: content-type must be
  ``application/binary`` else 400; app id else 403; ``X-SDC-COMPRESSION``
  may be ``snappy`` (framed, checksums verified) — anything else 415.
* destination/sdcipc/SdcIpcTarget.java:76-98 — hostPorts shuffled and split
  into active (``int(log n)+1``, min 2) and standby lists.
* SdcIpcTarget.java:100-118 — round-robin over actives; an erroring active
  is swapped out for the head standby.
* SdcIpcTarget.java:132-187 — per-batch retry loop (``retriesPerBatch``)
  with exponential backoff ``backOff^retryCount`` ms capped at 5 min
  (Configs.java:232-253), one POST per batch, 200 == success.
* Configs.java validateConnectivity — a ping GET per hostPort; reachable
  means the ``X-SDC-PING`` response header equals ``ping``.

Spark-first shape: the RECEIVER lands each POST atomically into a spool
directory (same contract as the HTTP push origin) so the batch source /
Structured Streaming file source replays it exactly-once — stronger than the
reference's in-memory BlockingQueue handoff. The SENDER is a per-partition
``foreachPartition`` loop, so a 1000-executor job fans out POSTs without any
driver collect; every argument it closes over is plain data.

Record framing: the reference serializes its internal SDC_RECORD JVM wire
format (declared n/a in COVERAGE.md §2.9). This engine's record frame is
JSON-lines — one ``df.toJSON()`` document per record — which is what the
receiving side's Spark reader consumes natively.
"""
from __future__ import annotations

import io
import math
import random
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from datacollector_spark.functions.snappy_codec import (
    framed_compress,
    framed_decompress,
)

# destination/sdcipc/Constants.java
X_SDC_APPLICATION_ID_HEADER = "X-SDC-APPLICATION-ID"
X_SDC_PING_HEADER = "X-SDC-PING"
X_SDC_PING_VALUE = "ping"
X_SDC_COMPRESSION_HEADER = "X-SDC-COMPRESSION"
SNAPPY_COMPRESSION = "snappy"
APPLICATION_BINARY = "application/binary"
X_SDC_JSON1_FRAGMENTABLE_HEADER = "X-SDC-JSON1-FRAGMENTABLE"
PING_PATH = "/ping"
IPC_PATH = "/ipc/v1"

_MAX_BACKOFF_WAIT_MS = 5 * 60 * 1000  # Configs.java:61


# --------------------------------------------------------------------------
# Receiver (origin)
# --------------------------------------------------------------------------
class SdcIpcOrigin:
    """SDC RPC listener: validates, decompresses, and lands each batch POST
    atomically into ``spool_dir`` for the file source to consume."""

    def __init__(
        self,
        spool_dir: str,
        app_id: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_record_size_mb: int = 10,
    ) -> None:
        self.spool_dir = Path(spool_dir)
        self.spool_dir.mkdir(parents=True, exist_ok=True)
        self._seq = 0
        self._seq_lock = threading.Lock()
        max_bytes = max_record_size_mb * 1000 * 1000  # IpcServlet.java:58
        origin = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _app_id(self) -> Optional[str]:
                return self.headers.get(X_SDC_APPLICATION_ID_HEADER)

            def do_GET(self):
                # IpcServlet.doGet: validation ping
                if self.path.split("?")[0] != PING_PATH:
                    self.send_error(404)
                    return
                if self._app_id() != app_id:
                    self.send_error(403, "Invalid 'appId'")
                    return
                self.send_response(200)
                self.send_header(X_SDC_PING_HEADER, X_SDC_PING_VALUE)
                self.end_headers()

            def do_POST(self):
                if self.path.split("?")[0] != IPC_PATH:
                    self.send_error(404)
                    return
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype != APPLICATION_BINARY:
                    self.send_error(
                        400,
                        f"Wrong content-type '{ctype}', "
                        f"expected '{APPLICATION_BINARY}'",
                    )
                    return
                if self._app_id() != app_id:
                    self.send_error(403, "Invalid 'appId'")
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length > max_bytes:
                    self.send_error(413)
                    return
                body = self.rfile.read(length)
                compression = self.headers.get(X_SDC_COMPRESSION_HEADER)
                if compression is not None:
                    if compression != SNAPPY_COMPRESSION:
                        # IpcServlet.java:108-111
                        self.send_error(
                            415, f"Unsupported compression: {compression}"
                        )
                        return
                    try:
                        body = framed_decompress(body)
                    except ValueError as e:
                        self.send_error(400, f"Corrupt snappy body: {e}")
                        return
                origin._land(body)
                self.send_response(200)
                self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def host_port(self) -> str:
        return f"{self.host}:{self.port}"

    def _land(self, body: bytes) -> None:
        with self._seq_lock:
            self._seq += 1
            seq = self._seq
        final = self.spool_dir / f"ipc-{seq:010d}.json"
        tmp = self.spool_dir / f".ipc-{seq:010d}.tmp"
        tmp.write_bytes(body)
        tmp.rename(final)

    def read(self, spark: SparkSession, schema=None) -> DataFrame:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(str(self.spool_dir))

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


# --------------------------------------------------------------------------
# Sender (destination)
# --------------------------------------------------------------------------
def _default_transport(
    url: str, body: bytes, headers: dict[str, str], timeout_s: float
) -> tuple[int, str]:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.reason or ""
    except urllib.error.HTTPError as e:
        return e.code, str(e.reason)


class HostPortSelector:
    """SdcIpcTarget.java:76-118 — shuffled active/standby split with
    round-robin and error-triggered standby promotion."""

    def __init__(self, host_ports: list[str], seed: Optional[int] = None):
        if not host_ports:
            raise ValueError("IPC_DEST_00: at least one hostPort required")
        hp = list(host_ports)
        if len(hp) == 1:
            self.active, self.standby = hp, []
        else:
            random.Random(seed).shuffle(hp)
            n_active = max(2, int(math.log(len(hp))) + 1)
            self.active, self.standby = hp[:n_active], hp[n_active:]
        self.last_active = 0

    def get(self, previous_had_error: bool = False) -> str:
        if len(self.active) == 1 and not self.standby:
            return self.active[0]
        if previous_had_error and self.standby:
            going_in = self.standby.pop(0)
            going_out = self.active[self.last_active]
            self.active[self.last_active] = going_in
            self.standby.append(going_out)
        else:
            self.last_active = (self.last_active + 1) % len(self.active)
        return self.active[self.last_active]


def backoff_wait_ms(back_off: int, retry_count: int) -> int:
    """Configs.backOffWait: back_off^retry_count ms capped at 5 min."""
    if retry_count <= 0 or back_off <= 0:
        return 0
    try:
        wait = back_off**retry_count
    except OverflowError:
        wait = _MAX_BACKOFF_WAIT_MS
    return min(wait, _MAX_BACKOFF_WAIT_MS)


def send_record_batch(
    lines: Iterable[str],
    host_ports: list[str],
    app_id: str,
    compression: bool = False,
    retries_per_batch: int = 3,
    back_off: int = 0,
    batch_size: int = 1000,
    timeout_s: float = 5.0,
    transport: Optional[Callable] = None,
    selector: Optional[HostPortSelector] = None,
    _sleep: Callable[[float], None] = time.sleep,
) -> int:
    """POST records in batches of ``batch_size`` to the peer, mirroring
    SdcIpcTarget.write's retry/backoff/failover loop. Returns records sent;
    raises on a batch that exhausts its retries (IPC_DEST_20)."""
    transport = transport or _default_transport
    selector = selector or HostPortSelector(host_ports)
    sent = 0
    buf: list[str] = []

    def flush(buf: list[str]) -> None:
        if not buf:
            return
        payload = ("\n".join(buf) + "\n").encode("utf-8")
        headers = {
            "Content-Type": APPLICATION_BINARY,
            X_SDC_JSON1_FRAGMENTABLE_HEADER: "true",
            X_SDC_APPLICATION_ID_HEADER: app_id,
        }
        if compression:
            headers[X_SDC_COMPRESSION_HEADER] = SNAPPY_COMPRESSION
            payload = framed_compress(payload)
        retry = 0
        reason = None
        ok = False
        while not ok and retry <= retries_per_batch:
            wait = backoff_wait_ms(back_off, retry)
            if wait:
                _sleep(wait / 1000.0)
            host_port = selector.get(previous_had_error=retry > 0)
            try:
                status, reason = transport(
                    f"http://{host_port}{IPC_PATH}", payload, headers, timeout_s
                )
                ok = status == 200
            except OSError as e:  # connection refused / reset / timeout
                reason = str(e)
            retry += 1
        if not ok:
            raise IOError(f"IPC_DEST_20: could not write batch: {reason}")

    for line in lines:
        buf.append(line)
        if len(buf) >= batch_size:
            flush(buf)
            sent += len(buf)
            buf = []
    flush(buf)
    sent += len(buf)
    return sent


def sdc_ipc_target(
    df: DataFrame,
    host_ports: list[str],
    app_id: str,
    compression: bool = False,
    retries_per_batch: int = 3,
    back_off: int = 0,
    batch_size: int = 1000,
    timeout_s: float = 5.0,
) -> None:
    """Distributed sender: each partition streams its rows as JSON-lines
    batches straight from the executor — no driver collect, scales with the
    partition count like the reference scales with pipeline runners."""

    def send_partition(rows):
        send_record_batch(
            rows,
            host_ports,
            app_id,
            compression=compression,
            retries_per_batch=retries_per_batch,
            back_off=back_off,
            batch_size=batch_size,
            timeout_s=timeout_s,
        )

    df.toJSON().foreachPartition(send_partition)


def validate_connectivity(
    host_ports: list[str],
    app_id: str,
    timeout_s: float = 5.0,
    transport_get: Optional[Callable] = None,
) -> list[str]:
    """Configs.validateConnectivity: ping every hostPort; an empty issue
    list means at least the reachable peers all authenticated the app id."""

    def default_get(url: str, headers: dict[str, str]) -> tuple[int, dict]:
        req = urllib.request.Request(url, headers=headers, method="GET")
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.status, dict(resp.headers)
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers or {})

    get = transport_get or default_get
    issues = []
    for hp in host_ports:
        try:
            status, headers = get(
                f"http://{hp}{PING_PATH}",
                {X_SDC_APPLICATION_ID_HEADER: app_id},
            )
        except OSError as e:
            issues.append(f"IPC_DEST_15: {hp}: {e}")
            continue
        if status != 200:
            issues.append(f"IPC_DEST_16: {hp}: HTTP {status}")
        elif headers.get(X_SDC_PING_HEADER) != X_SDC_PING_VALUE:
            issues.append(f"IPC_DEST_17: {hp}: not an SDC RPC endpoint")
    return issues
