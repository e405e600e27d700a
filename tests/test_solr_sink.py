"""Solr destination — live loopback fake implementing the public JSON
update API. Reference: solr-protolib/.../destination/solr/SolrTarget.java
(fieldNamesMap, RECORD vs BATCH indexing modes, commit handling)."""
from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from datacollector_spark.operators.processors import solr_sink


class FakeSolr:
    def __init__(self):
        self.committed: list[dict] = []
        self.pending: list[dict] = []
        self.update_calls: list[bool] = []  # commit flag per call
        self._lock = threading.Lock()
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_POST(self):
                parts = urllib.parse.urlsplit(self.path)
                if not parts.path.endswith("/update"):
                    return self.send_error(404)
                q = dict(urllib.parse.parse_qsl(parts.query))
                docs = json.loads(
                    self.rfile.read(int(self.headers.get("Content-Length", 0)))
                )
                commit = q.get("commit") == "true"
                with fake._lock:
                    fake.pending.extend(docs)
                    fake.update_calls.append(commit)
                    if commit:
                        fake.committed.extend(fake.pending)
                        fake.pending = []
                body = b'{"responseHeader":{"status":0}}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.uri = f"http://127.0.0.1:{self._server.server_address[1]}/solr"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


@pytest.fixture()
def fake_solr():
    s = FakeSolr()
    yield s
    s.stop()


def _src(spark):
    return spark.range(40).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("name-"), F.col("id")).alias("title"),
        F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id") * 2).alias("score"),
    )


def test_batch_mode_indexes_all_with_field_mapping(spark, fake_solr):
    meters = solr_sink(
        _src(spark).coalesce(1),
        fake_solr.uri,
        "docs",
        {"pk": "id", "title": "title_s", "score": "score_l"},
        indexing_mode="BATCH",
        batch_size=16,
    ).collect()
    assert sum(m.docs_indexed for m in meters) == 40
    assert len(fake_solr.committed) == 40 and not fake_solr.pending
    # field names are the SOLR names; nulls skipped per doc (id % 4 == 0)
    by_id = {d["id"]: d for d in fake_solr.committed}
    assert by_id[1]["title_s"] == "name-1" and by_id[1]["score_l"] == 2
    assert "score_l" not in by_id[0]
    # BATCH: only the final update call of the partition carries commit=true
    assert fake_solr.update_calls == [False, False, True]


def test_record_mode_commits_every_update(spark, fake_solr):
    solr_sink(
        _src(spark).coalesce(1),
        fake_solr.uri,
        "docs",
        {"pk": "id"},
        indexing_mode="RECORD",
        batch_size=10,
    ).collect()
    assert fake_solr.update_calls == [True, True, True, True]
    assert len(fake_solr.committed) == 40


def test_missing_mapped_field_fails_validation(spark, fake_solr):
    with pytest.raises(ValueError, match="SOLR_06.*nope"):
        solr_sink(_src(spark), fake_solr.uri, "docs", {"nope": "x"})
