"""Amazon S3 origin — pure-Python SigV4 REST client against an in-process
S3-compatible fake that RECOMPUTES each request's SigV4 signature with the
shared secret and 403s on mismatch (so the signer is proven, not assumed).

Reference: aws-lib origin/s3 (AmazonS3Util.java listing/ordering,
AbstractAmazonS3Source.java offsets, S3Spooler.java post-processing)."""
from __future__ import annotations

import datetime as dt
import hashlib
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from tests.awsfake import verify_sigv4

from datacollector_spark.sources.s3 import (
    S3Client,
    S3ClientConfig,
    S3Offset,
    ant_path_match,
    list_eligible_objects,
    post_process_objects,
    s3_spool_batch,
    sigv4_headers,
)

ACCESS, SECRET, REGION = "AKTEST", "s3cretkey", "us-east-1"


# ---------------------------------------------------------------- fake S3
def _verify_sigv4(handler, payload: bytes) -> bool:
    return verify_sigv4(handler, payload, ACCESS, SECRET)


class FakeS3:
    """Minimal path-style S3: ListObjectsV2 (XML, paginated), Get/Put/Delete
    object, copy via x-amz-copy-source. Every request is SigV4-verified."""

    def __init__(self):
        self.buckets: dict[str, dict[str, tuple[bytes, str, str]]] = {}
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _split(self):
                parts = urllib.parse.urlsplit(self.path)
                segs = parts.path.lstrip("/").split("/", 1)
                bucket = segs[0]
                key = urllib.parse.unquote(segs[1]) if len(segs) > 1 else ""
                return bucket, key, dict(
                    urllib.parse.parse_qsl(parts.query, keep_blank_values=True)
                )

            def _deny(self):
                self.send_error(403, "SignatureDoesNotMatch")

            def do_GET(self):
                if not _verify_sigv4(self, b""):
                    return self._deny()
                bucket, key, q = self._split()
                objs = fake.buckets.get(bucket)
                if objs is None:
                    return self.send_error(404, "NoSuchBucket")
                if key:
                    if key not in objs:
                        return self.send_error(404, "NoSuchKey")
                    data, _, _ = objs[key]
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                # ListObjectsV2
                prefix = q.get("prefix", "")
                start_after = q.get("continuation-token") or q.get("start-after", "")
                max_keys = int(q.get("max-keys", "1000"))
                keys = sorted(
                    k for k in objs if k.startswith(prefix) and k > start_after
                )
                page, rest = keys[:max_keys], keys[max_keys:]
                xml = ["<ListBucketResult>"]
                for k in page:
                    data, mtime, etag = objs[k]
                    xml.append(
                        f"<Contents><Key>{k}</Key><LastModified>{mtime}"
                        f"</LastModified><ETag>&quot;{etag}&quot;</ETag>"
                        f"<Size>{len(data)}</Size></Contents>"
                    )
                xml.append(f"<IsTruncated>{'true' if rest else 'false'}</IsTruncated>")
                if rest:
                    xml.append(f"<NextContinuationToken>{page[-1]}</NextContinuationToken>")
                xml.append("</ListBucketResult>")
                body = "".join(xml).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(length)
                if not _verify_sigv4(self, payload):
                    return self._deny()
                bucket, key, _ = self._split()
                objs = fake.buckets.setdefault(bucket, {})
                src = self.headers.get("x-amz-copy-source")
                if src:
                    sb, sk = src.lstrip("/").split("/", 1)
                    if sk not in fake.buckets.get(sb, {}):
                        return self.send_error(404, "NoSuchKey")
                    objs[key] = fake.buckets[sb][sk]
                else:
                    mtime = dt.datetime.now(dt.timezone.utc).strftime(
                        "%Y-%m-%dT%H:%M:%S.000Z"
                    )
                    objs[key] = (payload, mtime, hashlib.md5(payload).hexdigest())
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_DELETE(self):
                if not _verify_sigv4(self, b""):
                    return self._deny()
                bucket, key, _ = self._split()
                fake.buckets.get(bucket, {}).pop(key, None)
                self.send_response(204)
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self._server.server_address[1]}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def put(self, bucket: str, key: str, data: bytes, mtime: str) -> None:
        self.buckets.setdefault(bucket, {})[key] = (
            data,
            mtime,
            hashlib.md5(data).hexdigest(),
        )

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


@pytest.fixture()
def fake_s3():
    s = FakeS3()
    yield s
    s.stop()


def _cfg(fake: FakeS3) -> S3ClientConfig:
    return S3ClientConfig(fake.endpoint, ACCESS, SECRET, REGION)


# ----------------------------------------------------------------- tests
def test_sigv4_known_vector():
    """Pin the signer against AWS's published GET example (the canonical
    'GET /?Param2=value2&Param1=value1' service=service test vector)."""
    h = sigv4_headers(
        "GET",
        "https://example.amazonaws.com/?Param2=value2&Param1=value1",
        b"",
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="service",
        amz_date="20150830T123600Z",
        sign_payload_header=False,  # the generic vectors sign host;x-amz-date only
    )
    assert h["Authorization"].endswith(
        "Signature=b97d918cfa904a5beff61c982a1b6f458b799221646efd99d3219ec94cdf2500"
    )


def test_client_crud_roundtrip_signature_verified(fake_s3):
    client = S3Client(_cfg(fake_s3))
    client.put_object("b", "dir/a.txt", b"alpha")
    assert client.get_object("b", "dir/a.txt") == b"alpha"
    client.copy_object("b", "dir/a.txt", "b", "arch/a.txt")
    assert client.get_object("b", "arch/a.txt") == b"alpha"
    client.delete_object("b", "dir/a.txt")
    with pytest.raises(IOError, match="404"):
        client.get_object("b", "dir/a.txt")
    # a client with the wrong secret is rejected by the server-side recompute
    bad = S3Client(S3ClientConfig(fake_s3.endpoint, ACCESS, "wrong", REGION))
    with pytest.raises(IOError, match="403"):
        bad.get_object("b", "arch/a.txt")


def test_list_objects_v2_pagination(fake_s3):
    for i in range(25):
        fake_s3.put("b", f"p/k{i:03d}", b"x", "2026-01-01T00:00:00.000Z")
    client = S3Client(_cfg(fake_s3))
    got = [o["key"] for o in client.list_objects_v2("b", prefix="p/", max_keys=7)]
    assert got == sorted(got) and len(got) == 25  # 4 pages stitched


def test_ant_path_matcher():
    assert ant_path_match("*.csv", "data.csv")
    assert not ant_path_match("*.csv", "sub/data.csv")  # * stays in-segment
    assert ant_path_match("**/*.csv", "a/b/data.csv")
    assert ant_path_match("**/*.csv", "data.csv")  # **/ matches zero dirs
    assert ant_path_match("log-?.txt", "log-7.txt")
    assert not ant_path_match("log-?.txt", "log-77.txt")
    assert ant_path_match("**", "anything/at/all")


def test_lexicographic_listing_resumes_from_offset(fake_s3):
    for name in ("c1.csv", "c2.csv", "c3.csv", "skip.json"):
        fake_s3.put("b", f"in/{name}", b"x", "2026-01-01T00:00:00.000Z")
    client = S3Client(_cfg(fake_s3))
    objs = list_eligible_objects(client, "b", "in/", "*.csv")
    assert [o["key"] for o in objs] == ["in/c1.csv", "in/c2.csv", "in/c3.csv"]
    # resume after c2: marker excludes <= key (AmazonS3Util.java:78-80)
    objs = list_eligible_objects(
        client, "b", "in/", "*.csv", offset=S3Offset(key="in/c2.csv")
    )
    assert [o["key"] for o in objs] == ["in/c3.csv"]


def test_timestamp_ordering_and_eligibility(fake_s3):
    fake_s3.put("b", "in/old.csv", b"1", "2026-01-01T00:00:00.000Z")
    fake_s3.put("b", "in/tie-a.csv", b"2", "2026-01-02T00:00:00.000Z")
    fake_s3.put("b", "in/tie-b.csv", b"3", "2026-01-02T00:00:00.000Z")
    fake_s3.put("b", "in/new.csv", b"4", "2026-01-03T00:00:00.000Z")
    client = S3Client(_cfg(fake_s3))
    objs = list_eligible_objects(client, "b", "in/", "*.csv", ordering="TIMESTAMP")
    assert [o["key"] for o in objs] == [
        "in/old.csv", "in/tie-a.csv", "in/tie-b.csv", "in/new.csv",
    ]
    # offset at tie-a's (ts, key): same-mtime later keys and newer mtimes
    # remain eligible (AmazonS3Util.java:171-188)
    ts = int(
        dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    objs = list_eligible_objects(
        client, "b", "in/", "*.csv", ordering="TIMESTAMP",
        offset=S3Offset(key="in/tie-a.csv", timestamp=str(ts)),
    )
    assert [o["key"] for o in objs] == ["in/tie-b.csv", "in/new.csv"]


def test_offset_string_roundtrip():
    o = S3Offset("in/k.csv", "-1", "etag123", "1700000000000")
    assert o.to_string() == "in/k.csv::-1::etag123::1700000000000"
    assert S3Offset.from_string(o.to_string()) == o
    assert S3Offset.from_string(None).key is None
    with pytest.raises(ValueError, match="S3_SPOOLDIR_21"):
        S3Offset.from_string("only::three::parts")


def test_spool_batch_distributed_fetch_and_resume(spark, fake_s3):
    for i in range(12):
        fake_s3.put("b", f"in/f{i:02d}.csv", f"id,v\n{i},{i*10}\n".encode(),
                    "2026-01-01T00:00:00.000Z")
    cfg = _cfg(fake_s3)
    df, off1 = s3_spool_batch(
        spark, cfg, "b", "in/", "*.csv", max_objects=8, fetch_partitions=4
    )
    rows = df.collect()
    assert len(rows) == 8
    assert rows[0].body.decode().startswith("id,v")
    assert off1.startswith("in/f07.csv::-1::")
    # second batch resumes from the durable offset and drains the rest
    df2, off2 = s3_spool_batch(
        spark, cfg, "b", "in/", "*.csv", last_offset=off1, max_objects=8
    )
    keys2 = sorted(r.key for r in df2.collect())
    assert keys2 == [f"in/f{i:02d}.csv" for i in range(8, 12)]
    # third batch: nothing new; offset unchanged
    df3, off3 = s3_spool_batch(
        spark, cfg, "b", "in/", "*.csv", last_offset=off2, max_objects=8
    )
    assert df3.count() == 0 and off3 == off2


def test_s3_target_roundtrip(spark, fake_s3):
    """Destination writes partition objects from executors; origin reads
    them back equal."""
    from datacollector_spark.sources.s3 import s3_target
    from pyspark.sql import functions as F

    cfg = _cfg(fake_s3)
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(5)
    s3_target(df, cfg, "out", "exp/")
    keys = sorted(fake_s3.buckets["out"])
    assert len(keys) == 5 and all(k.startswith("exp/part-") for k in keys)
    back_df, _ = s3_spool_batch(spark, cfg, "out", "exp/", "*.json")
    back = spark.read.json(
        spark.sparkContext.parallelize(
            [r.body.decode() for r in back_df.collect()]
        ).flatMap(lambda s: s.splitlines())
    )
    assert back.count() == 200
    assert back.selectExpr("k", "v").exceptAll(df).count() == 0


def test_post_processing_archive_and_delete(fake_s3):
    client = S3Client(_cfg(fake_s3))
    for name in ("a.csv", "b.csv"):
        fake_s3.put("b", f"in/{name}", b"x", "2026-01-01T00:00:00.000Z")
    post_process_objects(
        client, "b", ["in/a.csv"], post_processing="ARCHIVE",
        archiving_option="MOVE_TO_PREFIX", post_process_folder="done/",
    )
    assert "done/a.csv" in fake_s3.buckets["b"] and "in/a.csv" not in fake_s3.buckets["b"]
    post_process_objects(client, "b", ["in/b.csv"], post_processing="DELETE")
    assert "in/b.csv" not in fake_s3.buckets["b"]
    # COPY keeps the source
    fake_s3.put("b", "in/c.csv", b"x", "2026-01-01T00:00:00.000Z")
    post_process_objects(
        client, "b", ["in/c.csv"], post_processing="ARCHIVE",
        archiving_option="COPY_TO_BUCKET", post_process_bucket="b2",
        post_process_folder="bak/",
    )
    assert "in/c.csv" in fake_s3.buckets["b"] and "bak/c.csv" in fake_s3.buckets["b2"]
