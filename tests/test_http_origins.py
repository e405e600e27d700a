"""HTTP client origin (pagination, ${startAt}, offsets, distributed range
fetch) and HTTP server push origin (validation, gzip, atomic spool landing) —
including a LIVE loopback round trip server→client with no fakes.

Reference: basic-lib/.../origin/http/HttpClientSource.java,
PaginationMode.java, HttpSourceOffset.java; basic-lib/.../origin/httpserver/
PushHttpReceiver.java; httpcommonlib/.../HttpConstants.java.
"""
from __future__ import annotations

import gzip
import json
import urllib.error
import urllib.request

import pytest

from datacollector_spark.sources.http import (
    HttpServerOrigin,
    HttpSourceOffset,
    http_client_origin_batch,
    http_page_range_fetch,
)
from datacollector_spark.sources.spooldir import spool_dir_batch

REC_SCHEMA = "id int, name string"


def _pages_transport(pages, link_base=None):
    """Fake transport serving `pages` (list of JSON-able payloads) keyed by
    startAt (?startAt=N in the URL) or sequentially for LINK_HEADER."""

    calls = []

    def fetch(method, url, headers, body):
        calls.append(url)
        import re as _re

        m = _re.search(r"startAt=(\d+)", url)
        idx = int(m.group(1)) if m else len(calls) - 1
        if link_base is not None:
            # LINK_HEADER mode: /p/N paths
            m2 = _re.search(r"/p/(\d+)$", url)
            idx = int(m2.group(1)) if m2 else 0
            hdrs = {}
            if idx + 1 < len(pages):
                hdrs["Link"] = f'<{link_base}/p/{idx + 1}>; rel="next"'
            return 200, hdrs, json.dumps(pages[idx]).encode()
        if idx >= len(pages) or (isinstance(pages[idx], list) and not pages[idx]):
            return 200, {}, json.dumps([]).encode()
        return 200, {}, json.dumps(pages[idx]).encode()

    fetch.calls = calls
    return fetch


def test_by_offset_pagination_and_offset_resume(spark):
    # BY_OFFSET: ${startAt} advances by records-per-page (HttpClientSource.java:668-671)
    pages = {0: [{"id": 0, "name": "a"}, {"id": 1, "name": "b"}],
             2: [{"id": 2, "name": "c"}],
             3: []}
    fetch = _pages_transport([])

    def by_offset(method, url, headers, body):
        import re as _re

        s = int(_re.search(r"startAt=(\d+)", url).group(1))
        return 200, {}, json.dumps(pages.get(s, [])).encode()

    df, off = http_client_origin_batch(
        spark,
        "http://x/api?startAt=${startAt}",
        REC_SCHEMA,
        transport=by_offset,
        pagination_mode="BY_OFFSET",
    )
    rows = sorted((r.id, r.name) for r in df.collect())
    assert rows == [(0, "a"), (1, "b"), (2, "c")]
    assert off.start_at == 3  # resumes AFTER the last consumed record
    # resume from the persisted offset string: no new records → empty batch
    off2 = HttpSourceOffset.from_string(off.to_string())
    df2, off3 = http_client_origin_batch(
        spark,
        "http://x/api?startAt=${startAt}",
        REC_SCHEMA,
        transport=by_offset,
        pagination_mode="BY_OFFSET",
        offset=off2,
    )
    assert df2.count() == 0 and off3.start_at == 3


def test_by_page_pagination(spark):
    pages = [[{"id": 0, "name": "a"}], [{"id": 1, "name": "b"}], []]
    fetch = _pages_transport(pages)
    df, off = http_client_origin_batch(
        spark,
        "http://x/api?startAt=${startAt}",
        REC_SCHEMA,
        transport=fetch,
        pagination_mode="BY_PAGE",
    )
    assert df.count() == 2
    assert off.start_at == 2


def test_link_header_pagination_and_result_field_path(spark):
    pages = [
        {"total": 3, "items": [{"id": 0, "name": "a"}, {"id": 1, "name": "b"}]},
        {"total": 3, "items": [{"id": 2, "name": "c"}]},
    ]
    fetch = _pages_transport(pages, link_base="http://x")
    df, _ = http_client_origin_batch(
        spark,
        "http://x/p/0",
        REC_SCHEMA,
        transport=fetch,
        pagination_mode="LINK_HEADER",
        result_field_path="items",
    )
    got = sorted((r.id, r.name, r.page) for r in df.collect())
    assert got == [(0, "a", 0), (1, "b", 0), (2, "c", 1)]


def test_page_range_fetch_is_distributed(spark):
    # the backfill path: fetch runs inside mapInPandas tasks
    def fetch(method, url, headers, body):
        import re as _re

        p = int(_re.search(r"startAt=(\d+)", url).group(1))
        return 200, {}, json.dumps(
            {"items": [{"id": p * 10 + i, "name": f"r{p}-{i}"} for i in range(3)]}
        ).encode()

    df = http_page_range_fetch(
        spark,
        "http://x/api?startAt=${startAt}",
        REC_SCHEMA,
        start=0,
        end=8,
        transport=fetch,
        result_field_path="items",
        num_partitions=4,
    )
    assert df.count() == 24
    assert df.selectExpr("count(distinct page)").first()[0] == 8
    # fetch happened in tasks, not on the driver: the plan is a mapInPandas scan
    assert "MapInPandas" in df._jdf.queryExecution().executedPlan().toString()


def test_server_origin_validation_gzip_and_live_roundtrip(spark, tmp_path):
    spool = tmp_path / "push"
    srv = HttpServerOrigin(str(spool), app_id="secret")
    try:
        # ping — acknowledged, nothing landed (HttpConstants X_SDC_PING)
        req = urllib.request.Request(srv.url, headers={"X-SDC-PING": "1"})
        assert urllib.request.urlopen(req).status == 200
        # wrong app id → 403 (HttpReceiverServlet validation)
        body = json.dumps([{"id": 1, "name": "a"}]).encode()
        req = urllib.request.Request(srv.url, data=body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 403
        # header auth
        req = urllib.request.Request(
            srv.url, data=body, method="POST",
            headers={"X-SDC-APPLICATION-ID": "secret"},
        )
        assert urllib.request.urlopen(req).status == 200
        # query-param auth + gzip body (X_SDC_COMPRESSION)
        gz = gzip.compress(json.dumps([{"id": 2, "name": "b"}]).encode())
        req = urllib.request.Request(
            srv.url + "?sdcApplicationId=secret", data=gz, method="POST",
            headers={"X-SDC-COMPRESSION": "gzip"},
        )
        assert urllib.request.urlopen(req).status == 200
        # live client-origin poll AGAINST the server's spool via HTTP? No —
        # the push origin's consumer is the spool dir (replayable file source):
        out = spool_dir_batch(spark, str(spool), schema="id int, name string",
                              file_format="json")
        assert sorted((r.id, r.name) for r in out.collect()) == [(1, "a"), (2, "b")]
    finally:
        srv.stop()


def test_from_sdc_config_http_client_origin(spark):
    """An exported pipeline whose ORIGIN is the HTTP Client
    (HttpClientDSource) ports end to end: pagination bean + resultFieldPath
    translated, transport injected via origin_overrides, downstream
    processor stages run on the parsed records."""
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    pages = [
        {"items": [{"id": 0, "name": "a"}, {"id": 1, "name": "bee"}]},
        {"items": [{"id": 2, "name": "sea"}]},
        {"items": []},
    ]

    def fetch(method, url, headers, body):
        import re as _re

        p = int(_re.search(r"startAt=(\d+)", url).group(1))
        return 200, {}, json.dumps(pages[min(p, len(pages) - 1)]).encode()

    config = {
        "pipelineConfig": {
            "title": "http-origin-port",
            "stages": [
                {
                    "instanceName": "Http_01",
                    "stageName": "com_streamsets_pipeline_stage_origin_http_HttpClientDSource",
                    "configuration": [
                        {"name": "conf.resourceUrl", "value": "http://x/api?startAt=${startAt}"},
                        {"name": "conf.pagination.mode", "value": "BY_PAGE"},
                        {"name": "conf.pagination.startAt", "value": 0},
                        {"name": "conf.pagination.resultFieldPath", "value": "/items"},
                    ],
                    "inputLanes": [],
                    "outputLanes": ["L_http"],
                },
                {
                    "instanceName": "Expr_01",
                    "stageName": "com_streamsets_pipeline_stage_processor_expression_ExpressionDProcessor",
                    "configuration": [
                        {
                            "name": "expressionProcessorConfigs",
                            "value": [
                                {
                                    "fieldToSet": "/name_len",
                                    "expression": "${str:length(record:value('/name'))}",
                                }
                            ],
                        }
                    ],
                    "inputLanes": ["L_http"],
                    "outputLanes": ["L_expr"],
                },
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config,
        origin_overrides={
            "Http_01": {"record_schema": REC_SCHEMA, "transport": fetch}
        },
    )
    out = spec.build(spark)["L_expr"]
    got = sorted((r.id, r.name, r.name_len) for r in out.collect())
    assert got == [(0, "a", 1), (1, "bee", 3), (2, "sea", 3)]
    # page/pos internals are NOT leaked to downstream stages
    assert set(out.columns) == {"id", "name", "name_len"}
    # missing record_schema raises the clear validation error
    with pytest.raises(ValidationError, match="VALIDATION_0008"):
        PipelineSpec.from_sdc_config(config, origin_overrides={"Http_01": {}})


def test_live_loopback_client_to_server(spark, tmp_path):
    """End-to-end over real loopback HTTP: a paginated JSON API served by a
    local HTTP server, polled by the client origin with the DEFAULT urllib
    transport (no fakes anywhere)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import re as _re
    import threading

    data = [{"id": i, "name": f"n{i}"} for i in range(10)]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            s = int(_re.search(r"startAt=(\d+)", self.path).group(1))
            page = data[s : s + 4]
            body = json.dumps(page).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        df, off = http_client_origin_batch(
            spark,
            f"http://127.0.0.1:{port}/api?startAt=${{startAt}}",
            REC_SCHEMA,
            pagination_mode="BY_OFFSET",
        )
        assert sorted(r.id for r in df.collect()) == list(range(10))
        assert off.start_at == 10
    finally:
        httpd.shutdown()
        httpd.server_close()
