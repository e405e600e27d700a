"""In-process fake Redis speaking real RESP2 over TCP — the loopback peer
for the redis lookup/target tests (the same live-protocol pattern as the
S3 / Cassandra / Solr fakes).  Parses genuine RESP request arrays and
answers with genuine typed replies, so the client's encoder AND parser are
both exercised; unknown commands return ``-ERR`` so protocol drift fails
loudly instead of silently passing."""

from __future__ import annotations

import socketserver
import threading


class FakeRedis:
    def __init__(self):
        self.lock = threading.Lock()
        self.strings: dict[str, str] = {}
        self.lists: dict[str, list[str]] = {}
        self.sets: dict[str, set[str]] = {}
        self.hashes: dict[str, dict[str, str]] = {}
        self.ttls: dict[str, int] = {}
        self.published: list[tuple[str, str]] = []
        self.commands: list[list[str]] = []
        self._srv: socketserver.ThreadingTCPServer | None = None
        self.port: int | None = None

    # ------------------------------------------------------------ handlers

    def execute(self, args: list[str]):
        cmd = args[0].upper()
        with self.lock:
            self.commands.append(args)
            if cmd == "PING":
                return "+PONG"
            if cmd == "SELECT":
                self.selected_db = int(args[1])
                return "+OK"
            if cmd == "SET":
                self.strings[args[1]] = args[2]
                return "+OK"
            if cmd == "GET":
                return ("$", self.strings.get(args[1]))
            if cmd == "MGET":
                return ("*", [("$", self.strings.get(k)) for k in args[1:]])
            if cmd == "LPUSH":
                lst = self.lists.setdefault(args[1], [])
                for v in args[2:]:
                    lst.insert(0, v)
                return (":", len(lst))
            if cmd == "LRANGE":
                lst = self.lists.get(args[1], [])
                start, stop = int(args[2]), int(args[3])
                stop = len(lst) if stop == -1 else stop + 1
                return ("*", [("$", v) for v in lst[start:stop]])
            if cmd == "LLEN":
                return (":", len(self.lists.get(args[1], [])))
            if cmd == "SADD":
                s = self.sets.setdefault(args[1], set())
                added = 0
                for v in args[2:]:
                    if v not in s:
                        s.add(v)
                        added += 1
                return (":", added)
            if cmd == "SMEMBERS":
                return ("*", [("$", v) for v in sorted(self.sets.get(args[1], ()))])
            if cmd == "HSET":
                h = self.hashes.setdefault(args[1], {})
                n = 0
                for k, v in zip(args[2::2], args[3::2]):
                    if k not in h:
                        n += 1
                    h[k] = v
                return (":", n)
            if cmd == "HGETALL":
                h = self.hashes.get(args[1], {})
                flat: list = []
                for k, v in h.items():
                    flat += [("$", k), ("$", v)]
                return ("*", flat)
            if cmd == "EXPIRE":
                self.ttls[args[1]] = int(args[2])
                return (":", 1)
            if cmd == "PUBLISH":
                self.published.append((args[1], args[2]))
                return (":", 1)
            if cmd == "DEL":
                n = 0
                for k in args[1:]:
                    for store in (self.strings, self.lists, self.sets, self.hashes):
                        if k in store:
                            del store[k]
                            n += 1
                return (":", n)
            return f"-ERR unknown command '{cmd}'"

    # ------------------------------------------------------------- wire

    @staticmethod
    def _render(rep) -> bytes:
        if isinstance(rep, str):
            return rep.encode() + b"\r\n"
        tag, val = rep
        if tag == ":":
            return b":%d\r\n" % val
        if tag == "$":
            if val is None:
                return b"$-1\r\n"
            b = val.encode()
            return b"$%d\r\n%s\r\n" % (len(b), b)
        if tag == "*":
            return b"*%d\r\n" % len(val) + b"".join(FakeRedis._render(v) for v in val)
        raise ValueError(tag)

    def start(self) -> int:
        fake = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    if not line.startswith(b"*"):
                        self.wfile.write(b"-ERR protocol error\r\n")
                        return
                    n = int(line[1:].strip())
                    args = []
                    for _ in range(n):
                        hdr = self.rfile.readline()
                        assert hdr.startswith(b"$")
                        ln = int(hdr[1:].strip())
                        data = self.rfile.read(ln)
                        self.rfile.read(2)  # \r\n
                        args.append(data.decode())
                    self.wfile.write(fake._render(fake.execute(args)))

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
