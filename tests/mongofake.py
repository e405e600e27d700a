"""In-memory loopback mongod speaking OP_MSG + BSON, for connector tests and
the gate queries.  Implements the command subset the connector uses:
insert / update (replace, upsert) / delete / find (equality + $gt/$lte
range filter, single-field sort, skip/limit/projection, batchSize cursors) /
getMore / count.  The store keeps insertion order; _id is added when
missing, duplicate _id inserts produce writeErrors — mirroring server
behavior at the fidelity the tests assert.

BSON/OP_MSG parsing here reuses the connector's codec; the codec itself is
ground-truthed separately against the byte strings published in the BSON
spec (test_mongodb.py::test_bson_spec_pinned_bytes), so the round-trip is
not self-certifying.
"""

from __future__ import annotations

import socketserver
import struct
import threading
from typing import Any

from datacollector_spark.sources.mongodb import (
    OP_MSG,
    ObjectId,
    bson_decode,
    bson_encode,
)


def _match(doc: dict, q: dict) -> bool:
    for k, cond in q.items():
        v = doc.get(k)
        if isinstance(cond, dict) and any(key.startswith("$") for key in cond):
            for op, rhs in cond.items():
                if op == "$gt":
                    if v is None or not v > rhs:
                        return False
                elif op == "$gte":
                    if v is None or not v >= rhs:
                        return False
                elif op == "$lt":
                    if v is None or not v < rhs:
                        return False
                elif op == "$lte":
                    if v is None or not v <= rhs:
                        return False
                elif op == "$in":
                    if v not in rhs:
                        return False
                else:
                    raise ValueError(f"fake mongod: unsupported operator {op}")
        elif v != cond:
            return False
    return True


class FakeMongod:
    def __init__(self):
        self.collections: dict[tuple[str, str], list[dict]] = {}
        self.cursors: dict[int, list[dict]] = {}
        self._next_cursor = 1000
        self.lock = threading.Lock()
        self.commands_seen: list[str] = []

        fake = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    while True:
                        head = self._recv(16)
                        if head is None:
                            return
                        length, rid, _rto, opcode = struct.unpack("<iiii", head)
                        frame = self._recv(length - 16)
                        assert opcode == OP_MSG and frame[4] == 0
                        cmd = bson_decode(frame[5:])
                        reply = fake.dispatch(cmd)
                        body = struct.pack("<i", 0) + b"\x00" + bson_encode(reply)
                        self.request.sendall(
                            struct.pack("<iiii", 16 + len(body), 0, rid, OP_MSG)
                            + body
                        )
                except (ConnectionError, OSError):
                    return

            def _recv(self, n):
                buf = bytearray()
                while len(buf) < n:
                    chunk = self.request.recv(n - len(buf))
                    if not chunk:
                        return None
                    buf += chunk
                return bytes(buf)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()

    def docs(self, db: str, coll: str) -> list[dict]:
        with self.lock:
            return [dict(d) for d in self.collections.get((db, coll), [])]

    def seed(self, db: str, coll: str, docs: list[dict]) -> None:
        with self.lock:
            store = self.collections.setdefault((db, coll), [])
            for d in docs:
                d = dict(d)
                d.setdefault("_id", ObjectId())
                store.append(d)

    # ------------------------------------------------------------ dispatch

    def dispatch(self, cmd: dict) -> dict:
        name = next(iter(cmd))
        db = cmd.get("$db", "test")
        with self.lock:
            self.commands_seen.append(name)
            if name in ("hello", "isMaster", "ismaster"):
                return {"ok": 1, "maxWireVersion": 17}
            if name == "insert":
                return self._insert(db, cmd)
            if name == "update":
                return self._update(db, cmd)
            if name == "delete":
                return self._delete(db, cmd)
            if name == "find":
                return self._find(db, cmd)
            if name == "getMore":
                return self._get_more(cmd)
            if name == "count":
                store = self.collections.get((db, cmd["count"]), [])
                q = cmd.get("query", {})
                return {"ok": 1, "n": sum(1 for d in store if _match(d, q))}
            return {"ok": 0, "errmsg": f"no such command: {name}", "codeName": "CommandNotFound"}

    def _insert(self, db: str, cmd: dict) -> dict:
        store = self.collections.setdefault((db, cmd["insert"]), [])
        seen_ids = {repr(d["_id"]) for d in store if "_id" in d}
        n, errors = 0, []
        for i, doc in enumerate(cmd["documents"]):
            doc = dict(doc)
            doc.setdefault("_id", ObjectId())
            if repr(doc["_id"]) in seen_ids:
                errors.append({"index": i, "code": 11000, "errmsg": "duplicate key"})
                if cmd.get("ordered", True):
                    break
                continue
            seen_ids.add(repr(doc["_id"]))
            store.append(doc)
            n += 1
        reply: dict[str, Any] = {"ok": 1, "n": n}
        if errors:
            reply["writeErrors"] = errors
        return reply

    def _update(self, db: str, cmd: dict) -> dict:
        store = self.collections.setdefault((db, cmd["update"]), [])
        n = 0
        upserted = []
        for i, u in enumerate(cmd["updates"]):
            q, repl = u["q"], u["u"]
            hit = next((d for d in store if _match(d, q)), None)
            if hit is not None:
                keep_id = hit.get("_id")
                hit.clear()
                hit.update(repl)
                if "_id" not in hit and keep_id is not None:
                    hit["_id"] = keep_id
                n += 1
            elif u.get("upsert"):
                doc = dict(repl)
                for k, v in q.items():
                    doc.setdefault(k, v)
                doc.setdefault("_id", ObjectId())
                store.append(doc)
                upserted.append({"index": i, "_id": doc["_id"]})
                n += 1
        reply: dict[str, Any] = {"ok": 1, "n": n, "nModified": n - len(upserted)}
        if upserted:
            reply["upserted"] = upserted
        return reply

    def _delete(self, db: str, cmd: dict) -> dict:
        store = self.collections.setdefault((db, cmd["delete"]), [])
        n = 0
        for spec in cmd["deletes"]:
            q, limit = spec["q"], spec.get("limit", 1)
            removed = 0
            for d in list(store):
                if _match(d, q):
                    store.remove(d)
                    removed += 1
                    n += 1
                    if limit and removed >= limit:
                        break
        return {"ok": 1, "n": n}

    def _find(self, db: str, cmd: dict) -> dict:
        coll = cmd["find"]
        store = self.collections.get((db, coll), [])
        rows = [dict(d) for d in store if _match(d, cmd.get("filter", {}))]
        sort = cmd.get("sort")
        if sort:
            ((field, direction),) = sort.items()
            rows.sort(key=lambda d: d.get(field), reverse=direction < 0)
        if cmd.get("skip"):
            rows = rows[cmd["skip"] :]
        if cmd.get("limit"):
            rows = rows[: cmd["limit"]]
        proj = cmd.get("projection")
        if proj:
            keep = {k for k, v in proj.items() if v} | {"_id"}
            rows = [{k: v for k, v in d.items() if k in keep} for d in rows]
        batch = int(cmd.get("batchSize", 101))
        first, rest = rows[:batch], rows[batch:]
        cid = 0
        if rest:
            self._next_cursor += 1
            cid = self._next_cursor
            self.cursors[cid] = rest
        return {
            "ok": 1,
            "cursor": {"id": cid, "ns": f"{db}.{coll}", "firstBatch": first},
        }

    def _get_more(self, cmd: dict) -> dict:
        cid = cmd["getMore"]
        rows = self.cursors.get(cid, [])
        batch = int(cmd.get("batchSize", 101))
        out, rest = rows[:batch], rows[batch:]
        if rest:
            self.cursors[cid] = rest
            next_id = cid
        else:
            self.cursors.pop(cid, None)
            next_id = 0
        return {"ok": 1, "cursor": {"id": next_id, "nextBatch": out}}
