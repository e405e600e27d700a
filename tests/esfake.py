"""In-process fake Elasticsearch for the sliced-scroll origin tests: real
HTTP, real scroll-cursor state machine (initial search → scroll pages →
empty page → DELETE), slice partitioning, optional basic auth, and a
minimal query evaluator (match_all + range) so incremental ${offset}
queries actually filter."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit


class FakeEs:
    def __init__(self, docs: list[tuple[str, dict]], require_auth: tuple | None = None):
        self.docs = docs  # [(id, source)]
        self.require_auth = require_auth
        self.lock = threading.Lock()
        self.scrolls: dict[str, dict] = {}
        self.deleted: list[str] = []
        self.searches: list[dict] = []
        self.next_id = 0
        self._srv: ThreadingHTTPServer | None = None
        self.port: int | None = None

    # ------------------------------------------------------------ matching

    @staticmethod
    def _matches(query: dict, src: dict) -> bool:
        q = query.get("query", {"match_all": {}})
        if "match_all" in q:
            return True
        if "range" in q:
            ((fld, cond),) = q["range"].items()
            v = src.get(fld)
            if v is None:
                return False
            for op, bound in cond.items():
                if op == "gt" and not v > bound:
                    return False
                if op == "gte" and not v >= bound:
                    return False
                if op == "lt" and not v < bound:
                    return False
                if op == "lte" and not v <= bound:
                    return False
            return True
        raise ValueError(f"fake does not evaluate query {q!r}")

    def _page(self, state: dict) -> dict:
        docs = state["docs"]
        pos = state["pos"]
        page = docs[pos : pos + state["size"]]
        state["pos"] = pos + len(page)
        return {
            "_scroll_id": state["id"],
            "hits": {
                "total": {"value": len(docs)},
                "hits": [
                    {"_index": state["index"], "_id": i, "_source": s}
                    for i, s in page
                ],
            },
        }

    # ---------------------------------------------------------------- http

    def start(self) -> int:
        fake = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, obj: dict) -> None:
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n).decode()) if n else {}

            def _authed(self) -> bool:
                if fake.require_auth is None:
                    return True
                user, pw = fake.require_auth
                want = "Basic " + base64.b64encode(
                    f"{user}:{pw}".encode()
                ).decode()
                return self.headers.get("Authorization") == want

            def do_POST(self):
                if not self._authed():
                    return self._reply(401, {"error": "unauthorized"})
                parts = urlsplit(self.path)
                body = self._body()
                with fake.lock:
                    if parts.path == "/_search/scroll":
                        sid = body["scroll_id"]
                        state = fake.scrolls.get(sid)
                        if state is None:
                            return self._reply(
                                404, {"error": "scroll expired"}
                            )
                        return self._reply(200, fake._page(state))
                    # initial search: /{index}[/{mapping}]/_search
                    segs = [s for s in parts.path.split("/") if s]
                    assert segs[-1] == "_search"
                    q = dict(parse_qsl(parts.query))
                    assert "scroll" in q, "scroll timeout param required"
                    fake.searches.append(body)
                    matched = [
                        (i, s)
                        for i, s in fake.docs
                        if fake._matches(body, s)
                    ]
                    sl = body.get("slice")
                    if sl:
                        # real ES slices on a hash of _id — STABLE across
                        # queries (a positional split would re-deal docs
                        # between slices when the query changes, breaking
                        # per-slice incremental offsets)
                        import hashlib

                        def owner(doc_id: str) -> int:
                            h = hashlib.md5(doc_id.encode()).hexdigest()
                            return int(h, 16) % sl["max"]

                        matched = [
                            (i, s) for i, s in matched if owner(i) == sl["id"]
                        ]
                    sid = f"scroll-{fake.next_id}"
                    fake.next_id += 1
                    state = {
                        "id": sid,
                        "docs": matched,
                        "pos": 0,
                        "size": int(body.get("size", 10)),
                        "index": segs[0],
                    }
                    fake.scrolls[sid] = state
                    return self._reply(200, fake._page(state))

            def do_DELETE(self):
                body = self._body()
                with fake.lock:
                    for sid in body.get("scroll_id", []):
                        fake.scrolls.pop(sid, None)
                        fake.deleted.append(sid)
                return self._reply(200, {"succeeded": True})

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self.port

    def stop(self) -> None:
        if self._srv:
            self._srv.shutdown()
            self._srv.server_close()
