"""Redis lookup processor + destination over a from-scratch RESP client —
jar-free, same pattern as the Cassandra CQL and Solr sinks.

Reference semantics (redis-lib):

- Lookup (``processor/kv/redis/RedisStore.java:54-79``): per (key, DataType)
  STRING → ``GET``, LIST → ``LRANGE key 0 len``, HASH → ``HGETALL``,
  SET → ``SMEMBERS``; parameters are ``{keyExpr, outputFieldPath,
  dataType}`` (RedisLookupParameterConfig.java).
- Destination BATCH mode (``destination/redis/RedisTarget.java:195-276``):
  per record, per field mapping ``{keyExpr, valExpr, dataType, ttl}``:
  STRING → ``SET``, LIST → ``LPUSH`` per element, SET → ``SADD`` per
  element, HASH → ``HSET`` per entry; ``ttl > 0`` appends ``EXPIRE``.
  Everything rides ONE Jedis pipeline per batch and the replies are
  validated ("OK" or an integer — RedisTarget.java:241-246).
- Destination PUBLISH mode: serialized record → ``PUBLISH channel payload``.

The wire protocol is public RESP2 (redis.io/docs/reference/protocol-spec):
requests are arrays of bulk strings, replies are ``+simple``, ``-error``,
``:integer``, ``$bulk`` (``$-1`` nil) or ``*array`` (``*-1`` nil).

Scale shape: lookups are an Arrow-batched ``mapInPandas`` — each executor
task opens ONE connection and pipelines its partition's keys in chunks
(STRING lookups collapse to one ``MGET`` per chunk); the destination is a
``foreachPartition`` with the same chunked pipelining.  No driver data
path; concurrency = partitions, exactly the KV-store fan-out a 1000-executor
cluster needs.
"""

from __future__ import annotations

import socket
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class RespError(Exception):
    """A ``-ERR ...`` reply from the server."""


class RespClient:
    """Minimal RESP2 client: encode command arrays, parse typed replies,
    pipeline N commands per round trip."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.buf = b""

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    # -------------------------------------------------------------- encode

    @staticmethod
    def encode(args: list) -> bytes:
        out = [b"*%d\r\n" % len(args)]
        for a in args:
            if isinstance(a, bytes):
                b = a
            else:
                b = str(a).encode("utf-8")
            out.append(b"$%d\r\n%s\r\n" % (len(b), b))
        return b"".join(out)

    # -------------------------------------------------------------- decode

    def _read_line(self) -> bytes:
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-reply")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self.buf) < n + 2:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-bulk")
            self.buf += chunk
        data, self.buf = self.buf[:n], self.buf[n + 2 :]
        return data

    def read_reply(self) -> Any:
        line = self._read_line()
        tp, rest = line[:1], line[1:]
        if tp == b"+":
            return rest.decode("utf-8")
        if tp == b"-":
            return RespError(rest.decode("utf-8"))
        if tp == b":":
            return int(rest)
        if tp == b"$":
            n = int(rest)
            if n == -1:
                return None
            return self._read_exact(n).decode("utf-8")
        if tp == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self.read_reply() for _ in range(n)]
        raise ValueError(f"bad RESP type byte {tp!r}")

    # ------------------------------------------------------------- execute

    def command(self, *args) -> Any:
        reply = self.pipeline([list(args)])[0]
        if isinstance(reply, RespError):
            raise reply
        return reply

    def pipeline(self, cmds: list[list]) -> list[Any]:
        """Send N commands in one write, read N replies (the Jedis
        Pipeline.syncAndReturnAll analog).  Error replies come back as
        RespError VALUES (not raised) so callers can map them to their
        records, like the reference's per-reply validation."""
        if not cmds:
            return []
        self.sock.sendall(b"".join(self.encode(c) for c in cmds))
        return [self.read_reply() for _ in cmds]


def parse_redis_uri(uri: str) -> tuple[str, int, int]:
    """``redis://host:port/db`` (the conf.uri form) -> (host, port, db).
    The path segment is the DATABASE INDEX the reference's Jedis URI
    selects — dropping it would silently read/write database 0."""
    rest = uri.split("://", 1)[-1]
    if "@" in rest:
        rest = rest.split("@", 1)[1]
    hostport, _, path = rest.partition("/")
    db = int(path) if path.strip().isdigit() else 0
    if ":" in hostport:
        host, port = hostport.rsplit(":", 1)
        return host, int(port), db
    return hostport, 6379, db


def _connect_uri(uri: str) -> RespClient:
    host, port, db = parse_redis_uri(uri)
    client = RespClient(host, port)
    if db:
        client.command("SELECT", db)
    return client


_LOOKUP_TYPES = {
    "STRING": T.StringType(),
    "LIST": T.ArrayType(T.StringType()),
    "SET": T.ArrayType(T.StringType()),
    "HASH": T.MapType(T.StringType(), T.StringType()),
}


def redis_kv_lookup(
    df: DataFrame,
    key_column: str,
    uri: str,
    into: str = "value",
    data_type: str = "STRING",
    chunk_size: int = 512,
) -> DataFrame:
    """The Redis Lookup processor (RedisLookupProcessor / RedisStore):
    adds ``into`` with the looked-up value for ``key_column``.  STRING
    chunks collapse to one ``MGET`` per *chunk_size* keys; LIST / SET /
    HASH pipeline ``LRANGE 0 -1`` / ``SMEMBERS`` / ``HGETALL``.  Missing
    STRING keys yield null; missing collection keys yield EMPTY
    collections — exactly what Redis itself answers (and what Jedis hands
    the reference's RedisStore).  One
    connection per executor task, keys deduplicated within each Arrow
    batch before hitting the server (the reference fronts Redis with a
    per-batch cache — RedisLookupProcessor uses a guava LoadingCache)."""
    data_type = data_type.upper()
    if data_type not in _LOOKUP_TYPES:
        raise ValueError(f"REDIS_05: unsupported lookup DataType {data_type!r}")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(into, _LOOKUP_TYPES[data_type], True)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        client = _connect_uri(uri)
        try:
            for pdf in batches:
                keys = pdf[key_column].astype(object)
                uniq = [k for k in keys.dropna().unique()]
                found: dict[Any, Any] = {}
                for i in range(0, len(uniq), chunk_size):
                    chunk = uniq[i : i + chunk_size]
                    if data_type == "STRING":
                        vals = client.command("MGET", *[str(k) for k in chunk])
                        found.update(dict(zip(chunk, vals)))
                    else:
                        cmd = {
                            "LIST": lambda k: ["LRANGE", str(k), 0, -1],
                            "SET": lambda k: ["SMEMBERS", str(k)],
                            "HASH": lambda k: ["HGETALL", str(k)],
                        }[data_type]
                        replies = client.pipeline([cmd(k) for k in chunk])
                        for k, rep in zip(chunk, replies):
                            if isinstance(rep, RespError):
                                raise rep
                            # keep empty collections AS empties — Redis
                            # answers HGETALL/LRANGE/SMEMBERS on a missing
                            # key with an empty reply, and Jedis (the
                            # reference'"'"'s client) surfaces exactly that
                            if data_type == "HASH":
                                rep = dict(zip(rep[::2], rep[1::2]))
                            elif data_type == "SET":
                                rep = sorted(rep)
                            found[k] = rep
                out = pdf[in_cols].copy()
                out[into] = keys.map(lambda k: found.get(k))
                yield out
        finally:
            client.close()

    return df.mapInPandas(run, out_schema)


def redis_target(
    df: DataFrame,
    uri: str,
    field_mappings: list[dict],
    mode: str = "BATCH",
    channel: str | None = None,
    batch_size: int = 1000,
) -> None:
    """The Redis destination (RedisTarget.java).  BATCH mode: per row, per
    mapping ``{"key": col, "value": col, "data_type": STRING|LIST|SET|HASH,
    "ttl": int}`` emit SET / LPUSH / SADD / HSET (+ EXPIRE when ttl > 0),
    pipelined *batch_size* commands per flush with reply validation
    ("OK" or integer — RedisTarget.java:241-246; anything else raises
    naming the key).  PUBLISH mode: one ``PUBLISH channel json-row`` per
    record.  Runs ``foreachPartition`` — one connection per partition,
    straight from executors."""
    mode = mode.upper()
    if mode == "BATCH" and not field_mappings:
        raise ValueError("REDIS_04: redisFieldMapping is required for Batch Mode")
    if mode == "PUBLISH" and not channel:
        raise ValueError("REDIS_03: channel is required for Publish Mode")
    columns = [f.name for f in df.schema.fields]

    def write_partition(rows: Iterator) -> None:
        import json as _json

        client = _connect_uri(uri)
        pending: list[tuple[list, str]] = []  # (command, key) for validation

        def flush() -> None:
            if not pending:
                return
            replies = client.pipeline([c for c, _ in pending])
            for (cmd, key), rep in zip(pending, replies):
                ok = rep == "OK" or isinstance(rep, int)
                if not ok:
                    raise RespError(
                        f"REDIS_03: {cmd[0]} {key!r} failed: {rep}"
                    )
            pending.clear()

        try:
            for row in rows:
                d = row.asDict()
                if mode == "PUBLISH":
                    payload = _json.dumps(
                        {c: d.get(c) for c in columns}, default=str
                    )
                    pending.append((["PUBLISH", channel, payload], channel))
                else:
                    for m in field_mappings:
                        key = d.get(m["key"])
                        val = d.get(m["value"])
                        if key is None or val is None:
                            continue  # RedisTarget.java:229 warn-and-skip
                        key = str(key)
                        dtp = m.get("data_type", "STRING").upper()
                        if dtp == "STRING":
                            pending.append((["SET", key, str(val)], key))
                        elif dtp == "LIST":
                            for el in val:
                                if el is not None:
                                    pending.append((["LPUSH", key, str(el)], key))
                        elif dtp == "SET":
                            for el in val:
                                if el is not None:
                                    pending.append((["SADD", key, str(el)], key))
                        elif dtp == "HASH":
                            items = val.items() if hasattr(val, "items") else val
                            for hk, hv in items:
                                pending.append(
                                    (["HSET", key, str(hk), str(hv)], key)
                                )
                        else:
                            raise ValueError(
                                f"REDIS_05: unsupported DataType {dtp!r}"
                            )
                        ttl = int(m.get("ttl", -1) or -1)
                        if ttl > 0:
                            pending.append((["EXPIRE", key, ttl], key))
                if len(pending) >= batch_size:
                    flush()
            flush()
        finally:
            client.close()

    df.foreachPartition(write_partition)
