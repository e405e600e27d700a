"""Salesforce origin over the public SOAP-login + Bulk API 1.0 REST/XML
protocol — jar-free, no vendor client library.

Reference semantics (salesforce-lib/.../origin/salesforce/ForceSource.java):

- ``bulkProduce`` (:356-): create a Bulk job ``{operation: query,
  object: <sobject>, contentType: CSV}`` (createJob :helper), add ONE
  batch whose content is the SOQL text with ``${offset}`` substituted
  (prepareQuery — initial offset on first run, the last record id after),
  poll ``getBatchInfo`` until Completed/Failed, then walk
  ``getQueryResultList`` and stream each result's CSV (header row first,
  ``"Records not found for this query"`` sentinel for empty).
- The wire protocol is Salesforce's documented public API: SOAP login
  (``POST /services/Soap/u/<ver>`` → sessionId + serverUrl), then Bulk
  REST under ``/services/async/<ver>`` with the ``X-SFDC-Session`` header
  and XML ``jobInfo``/``batchInfo``/``result-list`` bodies.
- PK CHUNKING (the documented ``Sforce-Enable-PKChunking:
  chunkSize=N`` job header): the server splits the query into MANY
  batches, one per primary-key range, and marks the original batch
  ``NotProcessed``.  The reference drains them serially on one thread;
  here every (batch, result) pair becomes ONE EXECUTOR TASK — the
  driver only creates the job and polls the batch list, executors fetch
  the result CSVs in parallel.  That is the 100 TB shape: a 10^9-row
  sobject with chunkSize 250k yields 4 000 independent result fetches
  spread across the cluster.
"""

from __future__ import annotations

import csv
import io
import re
import time
import urllib.error
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SOAP_NS = "urn:partner.soap.sforce.com"
ASYNC_NS = "http://www.force.com/2009/06/asyncapi/dataload"


class ForceError(Exception):
    pass


def _post(url: str, body: bytes, headers: dict[str, str]) -> bytes:
    req = urllib.request.Request(url, data=body, method="POST")
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


def _get(url: str, headers: dict[str, str]) -> bytes:
    req = urllib.request.Request(url, method="GET")
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


# ---------------------------------------------------------------------------
# SOAP login
# ---------------------------------------------------------------------------

_LOGIN_TEMPLATE = """<?xml version="1.0" encoding="utf-8"?>
<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/"
    xmlns:urn="urn:partner.soap.sforce.com">
  <soapenv:Body>
    <urn:login>
      <urn:username>{username}</urn:username>
      <urn:password>{password}</urn:password>
    </urn:login>
  </soapenv:Body>
</soapenv:Envelope>"""


def soap_login(
    login_url: str, username: str, password: str, api_version: str = "52.0"
) -> tuple[str, str]:
    """``POST /services/Soap/u/<ver>`` → (session_id, server_base_url).
    The password carries the security token appended, exactly as the
    reference's ConnectorConfig does; a SOAP fault (INVALID_LOGIN)
    raises ForceError with the fault string."""
    body = _LOGIN_TEMPLATE.format(
        username=_xml_escape(username), password=_xml_escape(password)
    ).encode()
    try:
        raw = _post(
            f"{login_url.rstrip('/')}/services/Soap/u/{api_version}",
            body,
            {"Content-Type": "text/xml; charset=UTF-8", "SOAPAction": "login"},
        )
    except urllib.error.HTTPError as e:
        raw = e.read()
    root = ET.fromstring(raw)
    fault = root.find(".//faultstring")
    if fault is not None:
        raise ForceError(f"FORCE_00: login failed: {fault.text}")
    sid = root.find(f".//{{{SOAP_NS}}}sessionId")
    server = root.find(f".//{{{SOAP_NS}}}serverUrl")
    if sid is None or server is None:
        raise ForceError("FORCE_00: malformed login response")
    m = re.match(r"(https?://[^/]+)", server.text or "")
    if not m:
        raise ForceError(f"FORCE_00: bad serverUrl {server.text!r}")
    return sid.text, m.group(1)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# ---------------------------------------------------------------------------
# Bulk API client
# ---------------------------------------------------------------------------

@dataclass
class ForceConfig:
    login_url: str
    username: str
    password: str
    api_version: str = "52.0"
    soql_query: str = ""
    sobject: str = ""                 # derived from the query if empty
    initial_offset: str = "000000000000000"
    offset_column: str = "Id"
    pk_chunk_size: int | None = None  # Sforce-Enable-PKChunking chunkSize
    poll_interval_s: float = 0.5
    poll_timeout_s: float = 600.0


class BulkClient:
    """Minimal Bulk API 1.0 client (XML jobs/batches, CSV results)."""

    def __init__(self, host: str, session_id: str, api_version: str = "52.0"):
        self.base = f"{host.rstrip('/')}/services/async/{api_version}"
        self.headers = {
            "X-SFDC-Session": session_id,
            "Content-Type": "application/xml; charset=UTF-8",
        }

    @staticmethod
    def _text(el: ET.Element | None) -> str:
        return el.text if el is not None and el.text else ""

    def create_query_job(
        self, sobject: str, pk_chunk_size: int | None = None
    ) -> str:
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<jobInfo xmlns="{ASYNC_NS}">'
            f"<operation>query</operation>"
            f"<object>{_xml_escape(sobject)}</object>"
            f"<contentType>CSV</contentType>"
            f"</jobInfo>"
        ).encode()
        headers = dict(self.headers)
        if pk_chunk_size:
            headers["Sforce-Enable-PKChunking"] = f"chunkSize={pk_chunk_size}"
        raw = _post(f"{self.base}/job", body, headers)
        job_id = self._text(ET.fromstring(raw).find(f"{{{ASYNC_NS}}}id"))
        if not job_id:
            raise ForceError("FORCE_01: job create returned no id")
        return job_id

    def add_query_batch(self, job_id: str, soql: str) -> str:
        headers = dict(self.headers)
        headers["Content-Type"] = "text/csv; charset=UTF-8"
        raw = _post(f"{self.base}/job/{job_id}/batch", soql.encode(), headers)
        return self._text(ET.fromstring(raw).find(f"{{{ASYNC_NS}}}id"))

    def batch_list(self, job_id: str) -> list[dict]:
        raw = _get(f"{self.base}/job/{job_id}/batch", self.headers)
        out = []
        for b in ET.fromstring(raw).findall(f"{{{ASYNC_NS}}}batchInfo"):
            out.append(
                {
                    "id": self._text(b.find(f"{{{ASYNC_NS}}}id")),
                    "state": self._text(b.find(f"{{{ASYNC_NS}}}state")),
                    "message": self._text(
                        b.find(f"{{{ASYNC_NS}}}stateMessage")
                    ),
                }
            )
        return out

    def result_ids(self, job_id: str, batch_id: str) -> list[str]:
        raw = _get(
            f"{self.base}/job/{job_id}/batch/{batch_id}/result", self.headers
        )
        return [
            r.text
            for r in ET.fromstring(raw).findall(f"{{{ASYNC_NS}}}result")
            if r.text
        ]

    def result_csv(self, job_id: str, batch_id: str, result_id: str) -> bytes:
        return _get(
            f"{self.base}/job/{job_id}/batch/{batch_id}/result/{result_id}",
            self.headers,
        )

    def close_job(self, job_id: str) -> None:
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<jobInfo xmlns="{ASYNC_NS}"><state>Closed</state></jobInfo>'
        ).encode()
        _post(f"{self.base}/job/{job_id}", body, self.headers)


# ---------------------------------------------------------------------------
# Spark origin
# ---------------------------------------------------------------------------

def _sobject_of(soql: str) -> str:
    m = re.search(r"\bFROM\s+(\w+)", soql, re.IGNORECASE)
    if not m:
        raise ForceError(f"FORCE_25: cannot find sobject in query {soql!r}")
    return m.group(1)


def _coerce_csv(v: str, dt: T.DataType):
    if v == "":
        return None
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return v.lower() == "true"
    return v


def force_bulk_query(
    spark: SparkSession,
    cfg: ForceConfig,
    record_schema: T.StructType,
    last_offset: str | None = None,
) -> DataFrame:
    """Run the configured SOQL query through a Bulk API job and return the
    results as a DataFrame.

    Driver side: SOAP login, create job (with the PK-chunking header when
    ``pk_chunk_size`` is set), add the ``${offset}``-substituted SOQL
    batch, poll the batch list until every batch is Completed (the
    original NotProcessed batch under PK chunking is skipped, Failed
    raises with the server's message), list (batch, result) pairs, close
    the job.  Executor side: ONE TASK PER RESULT fetches and parses its
    CSV — with PK chunking the server has already range-partitioned the
    query, so this is an embarrassingly parallel scan."""
    offset = last_offset if last_offset is not None else cfg.initial_offset
    soql = cfg.soql_query.replace("${offset}", offset)
    sobject = cfg.sobject or _sobject_of(soql)

    session_id, host = soap_login(
        cfg.login_url, cfg.username, cfg.password, cfg.api_version
    )
    client = BulkClient(host, session_id, cfg.api_version)
    job_id = client.create_query_job(sobject, cfg.pk_chunk_size)
    original_batch = client.add_query_batch(job_id, soql)

    deadline = time.monotonic() + cfg.poll_timeout_s
    while True:
        batches = client.batch_list(job_id)
        for b in batches:
            if b["state"] == "Failed":
                raise ForceError(
                    f"FORCE_03: batch {b['id']} failed: {b['message']}"
                )
        live = [b for b in batches if b["state"] != "NotProcessed"]
        if live and all(b["state"] == "Completed" for b in live):
            break
        if time.monotonic() > deadline:
            raise ForceError("FORCE_02: bulk job poll timeout")
        time.sleep(cfg.poll_interval_s)

    pairs = []
    for b in live:
        for rid in client.result_ids(job_id, b["id"]):
            pairs.append((b["id"], rid))
    client.close_job(job_id)

    names = [f.name for f in record_schema.fields]
    api_version = cfg.api_version

    def run(batches_iter: Iterator) -> Iterator:
        import pandas as pd

        fetch = BulkClient(host, session_id, api_version)
        for pdf in batches_iter:
            for batch_id, rid in zip(pdf["_batch"], pdf["_result"]):
                raw = fetch.result_csv(job_id, batch_id, rid).decode("utf-8")
                rows = list(csv.reader(io.StringIO(raw)))
                if not rows:
                    continue
                header = rows[0]
                if header == ["Records not found for this query"]:
                    continue
                idx = {h: i for i, h in enumerate(header)}
                missing = [n for n in names if n not in idx]
                if missing:
                    raise ForceError(
                        f"FORCE_06: result header {header} lacks {missing}"
                    )
                out = [
                    [
                        _coerce_csv(row[idx[f.name]], f.dataType)
                        for f in record_schema.fields
                    ]
                    for row in rows[1:]
                ]
                yield pd.DataFrame(out, columns=names).astype(object)

    if not pairs:
        return spark.createDataFrame([], record_schema)
    seeds = spark.createDataFrame(
        pairs, "_batch string, _result string"
    ).repartition(len(pairs))
    return seeds.mapInPandas(run, record_schema)


def force_next_offset(df: DataFrame, offset_column: str) -> str | None:
    """The reference's record-id incremental offset: the max of the offset
    column (ForceSource tracks the last record's id; results are
    id-ordered, so max == last)."""
    from pyspark.sql import functions as F

    row = df.agg(F.max(offset_column).alias("m")).collect()[0]
    return row["m"]
