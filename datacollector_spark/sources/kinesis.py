"""Amazon Kinesis Data Streams origin/destination — jar-free JSON API.

Reference semantics (aws-lib, cited file:line):

* origin/kinesis/KinesisSource.java:120-168 — KCL worker with a record
  processor PER SHARD, initial position LATEST / TRIM_HORIZON, per-shard
  sequence-number checkpoints (StreamSetsRecordProcessor.java:103-131).
* destination/kinesis/KinesisTarget.java — PutRecords batches with a
  partition-key expression per record.

Protocol: the PUBLIC Kinesis Data Streams API — JSON over HTTP POST with
``X-Amz-Target: Kinesis_20131202.<Op>`` and
``Content-Type: application/x-amz-json-1.1``, SigV4-signed with
``service="kinesis"`` (the same from-scratch signer as the S3 client,
`functions/aws_sigv4.py`). Record payloads are base64 in the JSON frames.

Spark-first shape: the driver lists shards (metadata only); each SHARD is
one executor task inside ``mapInPandas`` — the exact parallelism unit the
reference's KCL assigns a record processor to — looping GetRecords until
the batch cap or the shard tip. Offsets are a JSON map
``{shard_id: last_sequence_number}``; resume uses AFTER_SEQUENCE_NUMBER,
first read uses the configured initial position. At 1000 executors a
1000-shard stream drains fully in parallel and no record body ever
transits the driver.
"""
from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacollector_spark.functions.aws_sigv4 import sigv4_headers

_TARGET_PREFIX = "Kinesis_20131202."
_JSON_CT = "application/x-amz-json-1.1"


@dataclass(frozen=True)
class KinesisClientConfig:
    """Plain data — picklable into executor tasks."""

    endpoint: str
    access_key: str
    secret_key: str
    region: str = "us-east-1"
    timeout_s: float = 10.0


class KinesisClient:
    def __init__(self, config: KinesisClientConfig):
        self.c = config

    def _call(self, op: str, payload: dict) -> dict:
        body = json.dumps(payload).encode("utf-8")
        headers = sigv4_headers(
            "POST",
            self.c.endpoint + "/",
            body,
            self.c.access_key,
            self.c.secret_key,
            region=self.c.region,
            service="kinesis",
            extra_headers={
                "x-amz-target": _TARGET_PREFIX + op,
                "content-type": _JSON_CT,
            },
        )
        req = urllib.request.Request(
            self.c.endpoint + "/", data=body, headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=self.c.timeout_s) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            raise IOError(f"Kinesis {op}: HTTP {e.code}: {e.read()[:200]!r}")

    def list_shards(self, stream: str) -> list[str]:
        shards = []
        token = None
        while True:
            payload = (
                {"NextToken": token} if token else {"StreamName": stream}
            )
            out = self._call("ListShards", payload)
            shards += [s["ShardId"] for s in out.get("Shards", [])]
            token = out.get("NextToken")
            if not token:
                return shards

    def get_shard_iterator(
        self,
        stream: str,
        shard_id: str,
        iterator_type: str,
        starting_sequence_number: Optional[str] = None,
    ) -> str:
        payload = {
            "StreamName": stream,
            "ShardId": shard_id,
            "ShardIteratorType": iterator_type,
        }
        if starting_sequence_number is not None:
            payload["StartingSequenceNumber"] = starting_sequence_number
        return self._call("GetShardIterator", payload)["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 1000) -> dict:
        return self._call(
            "GetRecords", {"ShardIterator": iterator, "Limit": limit}
        )

    def put_records(self, stream: str, records: list[tuple[str, bytes]]) -> dict:
        """records = [(partition_key, data_bytes)]; ≤500 per call (API cap)."""
        out = {"FailedRecordCount": 0}
        for pos in range(0, len(records), 500):
            chunk = records[pos : pos + 500]
            resp = self._call(
                "PutRecords",
                {
                    "StreamName": stream,
                    "Records": [
                        {
                            "PartitionKey": pk,
                            "Data": base64.b64encode(data).decode("ascii"),
                        }
                        for pk, data in chunk
                    ],
                },
            )
            out["FailedRecordCount"] += resp.get("FailedRecordCount", 0)
        return out


# ----------------------------------------------------------------- origin
def kinesis_origin_batch(
    spark: SparkSession,
    config: KinesisClientConfig,
    stream: str,
    initial_position: str = "TRIM_HORIZON",
    last_offsets: Optional[str] = None,
    max_records_per_shard: int = 10_000,
    get_records_limit: int = 1000,
) -> tuple[DataFrame, str]:
    """One origin batch: every shard drains in its own executor task up to
    ``max_records_per_shard``; returns (records_df, new_offsets_json).

    The DataFrame is persisted before the offset aggregation (a network
    source re-fetch would be non-deterministic); the caller unpersists when
    done with the batch.
    """
    offsets: dict[str, str] = json.loads(last_offsets) if last_offsets else {}
    shard_ids = KinesisClient(config).list_shards(stream)
    meta = spark.createDataFrame(
        [(s, offsets.get(s)) for s in shard_ids], "shard_id string, after_seq string"
    ).repartition(max(len(shard_ids), 1), "shard_id")

    def drain(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = KinesisClient(config)
        for pdf in batches:
            for shard_id, after in zip(pdf["shard_id"], pdf["after_seq"]):
                if after is not None and not pd.isna(after):
                    it = client.get_shard_iterator(
                        stream, shard_id, "AFTER_SEQUENCE_NUMBER", after
                    )
                else:
                    it = client.get_shard_iterator(
                        stream, shard_id, initial_position
                    )
                taken = 0
                rows: dict[str, list] = {
                    "shard_id": [], "sequence_number": [],
                    "partition_key": [], "data": [],
                }
                while it and taken < max_records_per_shard:
                    out = client.get_records(
                        it, min(get_records_limit, max_records_per_shard - taken)
                    )
                    recs = out.get("Records", [])
                    for r in recs:
                        rows["shard_id"].append(shard_id)
                        rows["sequence_number"].append(r["SequenceNumber"])
                        rows["partition_key"].append(r["PartitionKey"])
                        rows["data"].append(base64.b64decode(r["Data"]))
                    taken += len(recs)
                    it = out.get("NextShardIterator")
                    if not recs and out.get("MillisBehindLatest", 0) == 0:
                        break  # caught up to the shard tip
                if rows["shard_id"]:
                    yield pd.DataFrame(rows)

    df = meta.mapInPandas(
        drain,
        "shard_id string, sequence_number string, partition_key string, data binary",
    ).persist()
    # new offset per shard = numerically-largest sequence number; sequence
    # numbers are decimal strings of varying width, so order by
    # (length, lexicographic) — equal-width lex == numeric
    tips = {
        r["shard_id"]: r["tip"]["sequence_number"]
        for r in df.groupBy("shard_id")
        .agg(
            F.max(
                F.struct(
                    F.length("sequence_number").alias("w"),
                    F.col("sequence_number"),
                )
            ).alias("tip")
        )
        .collect()
    }
    new_offsets = {**offsets, **tips}
    return df, json.dumps(new_offsets, sort_keys=True)


# ------------------------------------------------------------- destination
def kinesis_target(
    df: DataFrame,
    config: KinesisClientConfig,
    stream: str,
    partition_key_col: str,
) -> None:
    """KinesisTarget.java: PutRecords from the executors — each partition
    batches its rows (≤500/call) with the row's partition-key column, JSON
    record framing like the reference's DataGeneratorFormat JSON mode."""
    pk = partition_key_col

    def send(rows):
        client = KinesisClient(config)
        batch: list[tuple[str, bytes]] = []
        for row in rows:
            d = row.asDict(recursive=True)
            key = str(d[pk])
            batch.append((key, json.dumps(d, sort_keys=True, default=str).encode()))
            if len(batch) >= 500:
                client.put_records(stream, batch)
                batch = []
        if batch:
            client.put_records(stream, batch)

    df.foreachPartition(send)
