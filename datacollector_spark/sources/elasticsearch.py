"""Elasticsearch scroll origin — the reference's multithreaded sliced-scroll
reader re-expressed as one-executor-task-per-slice.

Reference (elasticsearch-protolib/.../origin/elasticsearch/
ElasticsearchSource.java):

- ``getNumberOfThreads() == conf.numSlices`` — each worker thread owns ONE
  scroll slice; the initial request is ``POST /{index}/{mapping}/_search``
  with the user query plus ``{"size": batchSize, "slice": {"id": i,
  "max": numSlices}}`` (:263-271) and ``?scroll=<cursorTimeout>``.
- Pages continue via ``POST /_search/scroll`` with ``{"scroll": timeout,
  "scroll_id": id}`` (:292-301); an empty ``hits.hits`` ends the slice and
  the cursor is deleted with ``DELETE /_search/scroll`` (:315-321).
- Incremental mode replaces the ``${offset}`` placeholder in the query
  with the slice's last offset — unquoted when it parses as a long, quoted
  otherwise (:254-261) — and tracks ``/_source/<offsetField>`` per record
  (:238-250); offsets checkpoint per-slice (ELASTICSEARCH_26 refuses a
  slice-count change).

Spark shape: the driver ships only slice ids; each task runs its slice's
ENTIRE scroll loop inside ``mapInPandas`` (urllib, loopback-testable),
yielding one Arrow batch per page.  At 1000 executors this is the same
fan-out the reference gets from its thread pool, but across machines —
and the cluster-size change hazard is the same, hence the identical
offset-count check."""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class EsScrollConfig:
    http_uri: str                       # http://host:port
    index: str
    mapping: str | None = None          # legacy type path segment
    query: str = '{\n  "query": {\n    "match_all": {}\n  }\n}'
    num_slices: int = 1
    max_batch_size: int = 1000
    cursor_timeout: str = "1m"
    delete_cursor: bool = True
    username: str | None = None
    password: str | None = None
    params: dict = field(default_factory=dict)
    incremental: bool = False
    offset_field: str = "timestamp"
    initial_offset: str = ""


def _auth_header(cfg: EsScrollConfig) -> dict[str, str]:
    if not cfg.username:
        return {}
    raw = f"{cfg.username}:{cfg.password or ''}".encode()
    return {"Authorization": "Basic " + base64.b64encode(raw).decode()}


def _http_json(
    method: str, url: str, body: dict | None, headers: dict[str, str]
) -> dict:
    import urllib.request

    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def _fill_offset(query: str, offset: str) -> str:
    """ElasticsearchSource.java:254-261: numeric offsets substitute bare,
    anything else substitutes double-quoted."""
    try:
        int(offset)
        return query.replace("${offset}", offset)
    except (TypeError, ValueError):
        return query.replace("${offset}", json.dumps(offset))


def es_scroll_batch(
    spark: SparkSession,
    cfg: EsScrollConfig,
    record_schema: T.StructType,
    last_offsets: dict[str, str] | None = None,
) -> DataFrame:
    """Drain the query once across ``num_slices`` parallel scroll cursors,
    one executor task per slice.  Output columns: ``_slice`` (int),
    ``_id`` (string), then ``record_schema``'s fields taken from each
    hit's ``_source``.  In incremental mode pass the previous run's
    per-slice offsets (``es_scroll_offsets``) — a changed slice count
    raises, mirroring ELASTICSEARCH_26."""
    if cfg.incremental and "${offset}" not in cfg.query:
        raise ValueError(
            "ELASTICSEARCH_25: incremental mode requires ${offset} in the query"
        )
    if isinstance(last_offsets, str):
        # the spec's durable-offset convention is an opaque string
        # (json.dumps of the per-slice map) — accept it back directly
        last_offsets = json.loads(last_offsets)
    last_offsets = dict(last_offsets or {})
    if last_offsets and len(last_offsets) != cfg.num_slices:
        raise ValueError(
            f"ELASTICSEARCH_26: offsets were written by {len(last_offsets)} "
            f"slices but numSlices is now {cfg.num_slices}; reset the origin"
        )
    headers = _auth_header(cfg)
    search_path = "/".join(
        p for p in (cfg.index, cfg.mapping, "_search") if p
    )
    qparams = dict(cfg.params)
    qparams["scroll"] = cfg.cursor_timeout
    qs = "&".join(f"{k}={v}" for k, v in qparams.items())
    base = cfg.http_uri.rstrip("/")

    out_fields = [
        T.StructField("_slice", T.IntegerType(), False),
        T.StructField("_id", T.StringType(), True),
    ] + list(record_schema.fields)
    out_schema = T.StructType(out_fields)
    src_names = [f.name for f in record_schema.fields]

    cfg_query = cfg.query
    n_slices = cfg.num_slices
    batch_size = cfg.max_batch_size
    cursor_timeout = cfg.cursor_timeout
    delete_cursor = cfg.delete_cursor
    incremental = cfg.incremental

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for slice_id in pdf["_slice"]:
                slice_id = int(slice_id)
                query = cfg_query
                if incremental:
                    query = _fill_offset(
                        query, last_offsets.get(str(slice_id), cfg.initial_offset)
                    )
                body = json.loads(query)
                body["size"] = batch_size
                if n_slices > 1:
                    body["slice"] = {"id": slice_id, "max": n_slices}
                resp = _http_json(
                    "POST", f"{base}/{search_path}?{qs}", body, headers
                )
                scroll_id = resp.get("_scroll_id")
                while True:
                    hits = resp.get("hits", {}).get("hits", [])
                    if not hits:
                        break
                    rows = []
                    for h in hits:
                        src = h.get("_source") or {}
                        rows.append(
                            [slice_id, h.get("_id")]
                            + [src.get(n) for n in src_names]
                        )
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in out_fields]
                    ).astype(object)
                    resp = _http_json(
                        "POST",
                        f"{base}/_search/scroll",
                        {"scroll": cursor_timeout, "scroll_id": scroll_id},
                        headers,
                    )
                    scroll_id = resp.get("_scroll_id", scroll_id)
                if scroll_id and delete_cursor:
                    _http_json(
                        "DELETE",
                        f"{base}/_search/scroll",
                        {"scroll_id": [scroll_id]},
                        headers,
                    )

    slices = spark.createDataFrame(
        [(i,) for i in range(n_slices)], "_slice int"
    ).repartition(n_slices, "_slice")
    return slices.mapInPandas(run, out_schema)


def es_scroll_offsets(
    df: DataFrame,
    offset_field: str,
    cfg: EsScrollConfig | None = None,
    previous: dict[str, str] | str | None = None,
) -> dict[str, str]:
    """Per-slice incremental offsets from a drained batch: the max of the
    offset field per slice (the batch analog of the reference's per-record
    updateTimeOffset), keyed by slice id for the next run's
    ``last_offsets``.

    A slice with NO new rows is absent from the groupBy — its offset must
    CARRY OVER, not vanish (a shrunken map would trip the
    ELASTICSEARCH_26 slice-count check next run, and an empty one would
    silently restart every slice from the initial offset).  Pass
    ``previous`` (the prior run's map, dict or the stored JSON string)
    and/or ``cfg`` so quiet slices keep their old offset / initial."""
    if isinstance(previous, str):
        previous = json.loads(previous)
    rows = df.groupBy("_slice").agg(
        # max over the column's NATIVE type — a string cast first would
        # order "999" above "1000" (the width hazard the Kinesis origin's
        # sequence tracking guards against too)
        F.max(offset_field).alias("_off")
    ).collect()
    out = dict(previous or {})
    out.update(
        {str(r["_slice"]): str(r["_off"]) for r in rows if r["_off"] is not None}
    )
    if cfg is not None:
        for i in range(cfg.num_slices):
            out.setdefault(str(i), cfg.initial_offset)
    return out
