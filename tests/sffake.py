"""In-process fake Salesforce for the Bulk-API origin tests: real HTTP,
real SOAP login envelope (fault on bad credentials), real Bulk API 1.0
XML job/batch lifecycle with session-header enforcement, PK chunking
(``Sforce-Enable-PKChunking`` splits the query into per-Id-range batches
and marks the original batch NotProcessed, like the real service), and
CSV results with the documented empty-result sentinel.  SOQL evaluation
is the minimal slice the origin emits: ``SELECT f1,f2 FROM obj``,
optional ``WHERE <col> > '<val>'``, optional ``ORDER BY <col>``."""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ASYNC_NS = "http://www.force.com/2009/06/asyncapi/dataload"


class FakeSalesforce:
    def __init__(
        self,
        rows: list[dict],
        username: str = "ann@example.com",
        password: str = "pw+token",
    ):
        self.rows = rows  # each needs an "Id"
        self.username, self.password = username, password
        self.lock = threading.Lock()
        self.jobs: dict[str, dict] = {}
        self.next_id = 0
        self.result_fetches: list[tuple[str, str]] = []
        self.session_id = "SESSION-00Dxx"
        self._srv: ThreadingHTTPServer | None = None
        self.port: int | None = None

    # ------------------------------------------------------------- helpers

    def _eval_soql(self, soql: str) -> tuple[list[str], list[dict]]:
        m = re.match(
            r"\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(.*)", soql, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError(f"fake SOQL parse: {soql!r}")
        fields = [f.strip() for f in m.group(1).split(",")]
        rest = m.group(3)
        rows = list(self.rows)
        w = re.search(r"WHERE\s+(\w+)\s*>\s*'([^']*)'", rest, re.IGNORECASE)
        if w:
            col, val = w.group(1), w.group(2)
            rows = [r for r in rows if str(r.get(col, "")) > val]
        o = re.search(r"ORDER\s+BY\s+(\w+)", rest, re.IGNORECASE)
        if o:
            rows = sorted(rows, key=lambda r: str(r.get(o.group(1), "")))
        return fields, rows

    @staticmethod
    def _csv(fields: list[str], rows: list[dict]) -> str:
        if not rows:
            return '"Records not found for this query"'
        import csv as _csv
        import io as _io

        buf = _io.StringIO()
        wtr = _csv.writer(buf)
        wtr.writerow(fields)
        for r in rows:
            wtr.writerow(["" if r.get(f) is None else r.get(f) for f in fields])
        return buf.getvalue()

    # ---------------------------------------------------------------- http

    def start(self) -> int:
        fake = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, body: str, ctype="application/xml"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self) -> str:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n).decode() if n else ""

            def _check_session(self) -> bool:
                if self.headers.get("X-SFDC-Session") != fake.session_id:
                    self._reply(
                        401,
                        f'<error xmlns="{ASYNC_NS}"><exceptionCode>'
                        "InvalidSessionId</exceptionCode></error>",
                    )
                    return False
                return True

            def do_POST(self):
                body = self._body()
                if self.path.startswith("/services/Soap/u/"):
                    u = re.search(r"<urn:username>(.*?)</urn:username>", body)
                    p = re.search(r"<urn:password>(.*?)</urn:password>", body)
                    if (
                        not u
                        or not p
                        or u.group(1) != fake.username
                        or p.group(1) != fake.password
                    ):
                        return self._reply(
                            500,
                            "<soapenv:Envelope xmlns:soapenv="
                            '"http://schemas.xmlsoap.org/soap/envelope/">'
                            "<soapenv:Body><soapenv:Fault>"
                            "<faultcode>INVALID_LOGIN</faultcode>"
                            "<faultstring>INVALID_LOGIN: Invalid username, "
                            "password, security token; or user locked out."
                            "</faultstring>"
                            "</soapenv:Fault></soapenv:Body></soapenv:Envelope>",
                        )
                    host = f"http://127.0.0.1:{fake.port}"
                    return self._reply(
                        200,
                        "<soapenv:Envelope xmlns:soapenv="
                        '"http://schemas.xmlsoap.org/soap/envelope/" '
                        'xmlns="urn:partner.soap.sforce.com">'
                        "<soapenv:Body><loginResponse><result>"
                        f"<serverUrl>{host}/services/Soap/u/52.0/00Dxx"
                        "</serverUrl>"
                        f"<sessionId>{fake.session_id}</sessionId>"
                        "</result></loginResponse>"
                        "</soapenv:Body></soapenv:Envelope>",
                        ctype="text/xml",
                    )
                if not self._check_session():
                    return
                m = re.match(r"/services/async/[\d.]+/job/([\w-]+)/batch$", self.path)
                if m:
                    # add batch: body is the SOQL
                    with fake.lock:
                        job = fake.jobs[m.group(1)]
                        fields, rows = fake._eval_soql(body)
                        fake.next_id += 1
                        original = f"batch-{fake.next_id}"
                        if job["chunk"]:
                            # PK chunking: server splits by Id ranges and
                            # marks the ORIGINAL batch NotProcessed
                            job["batches"][original] = {
                                "state": "NotProcessed",
                                "fields": fields,
                                "rows": [],
                            }
                            rows = sorted(rows, key=lambda r: str(r["Id"]))
                            size = job["chunk"]
                            for i in range(0, max(len(rows), 1), size):
                                fake.next_id += 1
                                job["batches"][f"batch-{fake.next_id}"] = {
                                    "state": "Completed",
                                    "fields": fields,
                                    "rows": rows[i : i + size],
                                }
                        else:
                            job["batches"][original] = {
                                "state": "Completed",
                                "fields": fields,
                                "rows": rows,
                            }
                    return self._reply(
                        201,
                        f'<batchInfo xmlns="{ASYNC_NS}"><id>{original}</id>'
                        f"<state>Queued</state></batchInfo>",
                    )
                m = re.match(r"/services/async/[\d.]+/job/([\w-]+)$", self.path)
                if m and "<state>Closed</state>" in body:
                    with fake.lock:
                        fake.jobs[m.group(1)]["state"] = "Closed"
                    return self._reply(
                        200, f'<jobInfo xmlns="{ASYNC_NS}"><id>{m.group(1)}</id>'
                        "<state>Closed</state></jobInfo>"
                    )
                if self.path.rstrip("/").endswith("/job"):
                    chunk = None
                    pk = self.headers.get("Sforce-Enable-PKChunking", "")
                    cm = re.search(r"chunkSize=(\d+)", pk)
                    if cm:
                        chunk = int(cm.group(1))
                    with fake.lock:
                        fake.next_id += 1
                        job_id = f"job-{fake.next_id}"
                        fake.jobs[job_id] = {
                            "state": "Open",
                            "chunk": chunk,
                            "batches": {},
                        }
                    return self._reply(
                        201,
                        f'<jobInfo xmlns="{ASYNC_NS}"><id>{job_id}</id>'
                        "<operation>query</operation><state>Open</state>"
                        "</jobInfo>",
                    )
                self._reply(404, "<error/>")

            def do_GET(self):
                if not self._check_session():
                    return
                m = re.match(
                    r"/services/async/[\d.]+/job/([\w-]+)/batch/([\w-]+)/result/([\w-]+)$",
                    self.path,
                )
                if m:
                    job_id, batch_id, _rid = m.groups()
                    with fake.lock:
                        b = fake.jobs[job_id]["batches"][batch_id]
                        fake.result_fetches.append((batch_id, _rid))
                    return self._reply(
                        200, fake._csv(b["fields"], b["rows"]), ctype="text/csv"
                    )
                m = re.match(
                    r"/services/async/[\d.]+/job/([\w-]+)/batch/([\w-]+)/result$",
                    self.path,
                )
                if m:
                    job_id, batch_id = m.groups()
                    return self._reply(
                        200,
                        f'<result-list xmlns="{ASYNC_NS}">'
                        f"<result>res-{batch_id}</result></result-list>",
                    )
                m = re.match(r"/services/async/[\d.]+/job/([\w-]+)/batch$", self.path)
                if m:
                    with fake.lock:
                        parts = []
                        for bid, b in fake.jobs[m.group(1)]["batches"].items():
                            parts.append(
                                f"<batchInfo><id>{bid}</id>"
                                f"<state>{b['state']}</state></batchInfo>"
                            )
                    return self._reply(
                        200,
                        f'<batchInfoList xmlns="{ASYNC_NS}">'
                        + "".join(parts)
                        + "</batchInfoList>",
                    )
                self._reply(404, "<error/>")

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self.port

    def stop(self) -> None:
        if self._srv:
            self._srv.shutdown()
            self._srv.server_close()
