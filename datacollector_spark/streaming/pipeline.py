"""The CDC ingest pipeline: Structured Streaming changelog tail -> transform
-> LWW collapse -> MERGE into the lake table, with lineage and exactly-once.

This is the engine's equivalent of the reference's production run loop
(container/.../execution/runner/common/ProductionPipelineRunner.java:454-502):
  * micro-batch            = SDC batch (FullPipeBatch)
  * checkpointLocation     = SDC's offset.json
    (runner/production/ProductionSourceOffsetTracker.java:59-85)
  * foreachBatch body      = the stage DAG (transform stages -> target)
  * commit-key + LSN guard = delivery guarantee, upgraded from SDC's
    AT_LEAST_ONCE (ProductionPipelineRunner.java:709-716) to exactly-once:
    a replayed micro-batch is a no-op at the table
  * lineage table          = SDC's per-batch meters + event records
    (ProductionPipelineRunner.java:723-745, EventSink)
  * maxFilesPerTrigger     = SDC's rate limiter (PipelineConfigBean.java:255)

Schema drift: new payload columns arriving in the stream are ALTER-ADDed to
the table inside the micro-batch, before MERGE (the Hive drift-sink flow,
SURVEY.md §2.6). A drift that changes the SOURCE schema requires a stream
restart with the widened read schema — the same contract as the reference's
Oracle CDC origin, which emits a DDL event and refreshes its schema cache
(jdbc-lib/.../cdc/oracle/OracleCDCSource.java:460-462): position is held in
the checkpoint, so the restart resumes losslessly.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.lake.table import LakeTable
from datacollector_spark.model import changelog_schema, payload_columns_of
from datacollector_spark.operators.collapse import lww_collapse

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("commit_key", T.StringType()),
        T.StructField("table_version", T.LongType()),
        T.StructField("bucket", T.IntegerType()),  # null => batch-level row
        T.StructField("rows_source", T.LongType()),
        T.StructField("min_lsn", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("rows_inserted", T.LongType()),
        T.StructField("rows_updated", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("rows_lww_skipped", T.LongType()),
        T.StructField("noop", T.BooleanType()),
        T.StructField("evolved_columns", T.ArrayType(T.StringType())),
        T.StructField("wall_s", T.DoubleType()),
        # per-stage timers (ProductionPipelineRunner.java:723-745 batch
        # processing timer, split by merge phase)
        T.StructField(
            "phase_timings", T.MapType(T.StringType(), T.DoubleType()), True
        ),
    ]
)


from dataclasses import dataclass


@dataclass
class DataRule:
    """A data rule: SQL condition sampled over every micro-batch; fires an
    alert when at least ``min_count`` rows match
    (container/.../config/DataRuleDefinition.java:28-66).

    ``sampling_pct`` (0..1] mirrors the reference's samplingPercentage: the
    rule is evaluated on a uniform sample of the batch (one shared seeded
    draw per batch, projected as a column — nondeterministic expressions
    are illegal inside CollectMetrics), and ``min_count`` applies to the
    SAMPLED match count, as in the reference. Costs nothing extra: the
    sample predicate folds into the existing observe() pass.

    ``window_batches`` > 1 is the reference's moving-window alert meter
    (DataObserverRunner's EWMA/window meters, simplified to a rolling sum):
    the alert fires when the SUM of match counts over the last K
    micro-batches reaches ``min_count`` — a slow drip of bad records
    trips the alert even though no single batch does."""

    name: str
    condition: str  # SQL boolean expression over the changelog columns
    min_count: int = 1
    level: str = "warn"
    sampling_pct: float = 1.0
    window_batches: int = 1


class CdcIngestPipeline:
    """Tail a changelog directory of parquet 'binlog segments' and apply it
    to a LakeTable exactly once."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        table: LakeTable,
        checkpoint_dir: str,
        source_schema: T.StructType | None = None,
        transforms=None,  # Callable[[DataFrame], DataFrame] over the batch
        lineage_dir: str | None = None,
        max_files_per_trigger: int | None = None,
        salt_buckets: int | None = None,
        per_bucket_lineage: bool = True,
        lineage_flush_rows: int = 1,
        late_limit_s: float | None = None,
        late_dir: str | None = None,
        data_rules: list["DataRule"] | None = None,
        expire_keep: int | None = None,
        merge_mode: str = "cow",
        mor_compact_every: int | None = None,
        dedup_within: str | None = None,
        dedup_fields: list[str] | None = None,
        file_events_dir: str | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.source_schema = source_schema or changelog_schema()
        self.transforms = transforms
        self.lineage_dir = lineage_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.salt_buckets = salt_buckets
        self.per_bucket_lineage = per_bucket_lineage
        # lineage rows buffer: flushed when the buffer reaches this many rows
        # and at end-of-run (bounded loss on crash: lineage is observability,
        # table correctness never depends on it)
        self.lineage_flush_rows = lineage_flush_rows
        self._lineage_buffer: list[dict] = []
        self.batches_applied = 0
        self.on_batch_applied = None  # test hook (fault injection)
        # Late-record policy (HDFS target timeDriver + lateRecordsLimit,
        # hdfs-protolib/.../HdfsTargetConfigBean.java:213,339-395): events
        # whose commit_ts lags the batch high-water mark by more than the
        # limit are split to a side output instead of merged.
        self.late_limit_s = late_limit_s
        self.late_dir = late_dir
        # Data rules (container/.../config/DataRuleDefinition.java:28-66 +
        # DataObserverRunner): SQL condition + threshold, evaluated per
        # micro-batch; firings append alert rows to <lineage_dir>/../alerts.
        self.data_rules = data_rules or []
        self.alerts: list[dict] = []
        # rolling per-rule match counts for moving-window meters (bounded:
        # each deque holds at most window_batches entries)
        from collections import deque

        self._rule_windows: list = [
            deque(maxlen=max(r.window_batches, 1)) for r in self.data_rules
        ]
        # auto-expire old snapshots every batch (COW storage hygiene); keep
        # enough versions for the exactly-once replay window
        self.expire_keep = expire_keep
        # merge_mode='mor': append-only ingest (merge-on-read deltas), with
        # automatic delta compaction every `mor_compact_every` batches —
        # the 10^10-scale ingest shape (see LakeTable.merge docstring)
        self.merge_mode = merge_mode
        self.mor_compact_every = mor_compact_every
        # Streaming dedup window (DeDupProcessor.java:122-143's time window):
        # duplicate deliveries of the same (lsn, seq_in_tx) are dropped
        # ACROSS micro-batches while their event time is within
        # ``dedup_within`` of the stream's watermark — Spark keeps the seen
        # keys in checkpointed state and expires them with the watermark, so
        # state is bounded (the reference's maxRecordsToCompare analog).
        # In-batch duplicates are collapsed by lww_collapse regardless; the
        # LSN guard at the table catches anything beyond the window.
        self.dedup_within = dedup_within
        self.dedup_fields = dedup_fields or ["lsn", "seq_in_tx"]
        # Stage lifecycle event records (EventCreator.java:45 — the spooler
        # emits new-file / finished-file events): per micro-batch, the set
        # of source files is captured by the SAME CollectMetrics node as the
        # data rules (no extra pass); each file yields a new-file event when
        # first seen and a finished-file event when its batch commits (file
        # sources deliver a file in exactly one micro-batch).
        self.file_events_dir = file_events_dir
        # Commit keys are namespaced by the checkpoint identity: stable
        # across RESTARTS of the same stream (exactly-once replay dedupe),
        # distinct across DIFFERENT streams into the same table.
        import hashlib

        self.stream_id = hashlib.sha1(
            checkpoint_dir.rstrip("/").encode()
        ).hexdigest()[:12]
        # The late-record high-water mark is durable: real Structured
        # Streaming watermarks are checkpointed, so ours lives next to the
        # checkpoint and is restored on restart — otherwise a restart would
        # silently merge arbitrarily late records.
        self._watermark = self._load_watermark()

    # --------------------------------------------------- watermark durability
    def _watermark_path(self) -> str:
        import os

        return os.path.join(self.checkpoint_dir, "dcs_watermark.json")

    def _load_watermark(self):
        import datetime as _dt
        import json
        import os

        try:
            with open(self._watermark_path()) as f:
                raw = json.load(f)["watermark"]
            return _dt.datetime.fromisoformat(raw)
        except (OSError, KeyError, ValueError):
            return None

    def _save_watermark(self) -> None:
        import json
        import os

        if self._watermark is None:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        tmp = self._watermark_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": self._watermark.isoformat()}, f)
        os.replace(tmp, self._watermark_path())

    # ------------------------------------------------------------ plumbing
    def _read_stream(self) -> DataFrame:
        reader = self.spark.readStream.schema(self.source_schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(self.source_dir)
        if self.dedup_within is not None:
            df = df.withWatermark("commit_ts", self.dedup_within)
            df = df.dropDuplicatesWithinWatermark(self.dedup_fields)
        return df

    def _write_lineage(self, rows: list[dict], flush: bool = False) -> None:
        if not self.lineage_dir:
            return
        self._lineage_buffer.extend(rows)
        if not flush and len(self._lineage_buffer) < self.lineage_flush_rows:
            return
        if not self._lineage_buffer:
            return
        # Driver-direct parquet append (pyarrow), not a Spark job: lineage is
        # a few hundred metadata rows per flush, but createDataFrame + a
        # 1-task write job costs seconds of job-scheduling/committer overhead
        # per flush (measured 5.9 s at the end of a 28 s ingest run — guide
        # §5: the driver should do almost no data work, and conversely tiny
        # metadata should not be pushed through the cluster machinery).
        # Schema (incl. the map<string,double> phase timings) matches
        # LINEAGE_SCHEMA bit-for-bit, so Spark reads the directory unchanged.
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        buf = self._lineage_buffer
        arrow_schema = _pa.schema(
            [
                _pa.field("batch_id", _pa.int64()),
                _pa.field("commit_key", _pa.string()),
                _pa.field("table_version", _pa.int64()),
                _pa.field("bucket", _pa.int32()),
                _pa.field("rows_source", _pa.int64()),
                _pa.field("min_lsn", _pa.int64()),
                _pa.field("max_lsn", _pa.int64()),
                _pa.field("rows_inserted", _pa.int64()),
                _pa.field("rows_updated", _pa.int64()),
                _pa.field("rows_deleted", _pa.int64()),
                _pa.field("rows_lww_skipped", _pa.int64()),
                _pa.field("noop", _pa.bool_()),
                _pa.field("evolved_columns", _pa.list_(_pa.string())),
                _pa.field("wall_s", _pa.float64()),
                _pa.field(
                    "phase_timings", _pa.map_(_pa.string(), _pa.float64())
                ),
            ]
        )
        cols = []
        for f in arrow_schema:
            vals = [r.get(f.name) for r in buf]
            if f.name == "phase_timings":
                vals = [
                    sorted(v.items()) if isinstance(v, dict) else v for v in vals
                ]
            cols.append(_pa.array(vals, type=f.type))
        table = _pa.Table.from_arrays(cols, schema=arrow_schema)
        import os

        os.makedirs(self.lineage_dir, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.snappy.parquet"
        tmp = os.path.join(self.lineage_dir, "." + name + ".tmp")
        _pq.write_table(table, tmp, compression="snappy")
        os.replace(tmp, os.path.join(self.lineage_dir, name))
        self._lineage_buffer = []

    # ----------------------------------------------------------- the batch
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One micro-batch: transform -> collapse -> merge. Public so batch
        (non-streaming) backfills can reuse the identical code path."""
        t0 = time.time()
        commit_key = f"{self.stream_id}:microbatch-{batch_id}"
        if self.table.committed(commit_key):
            # replayed after a crash that hit AFTER table commit but BEFORE
            # the checkpoint advanced — the exactly-once window
            self._write_lineage(
                [
                    {
                        "batch_id": batch_id,
                        "commit_key": commit_key,
                        "table_version": self.table.version,
                        "noop": True,
                        "wall_s": time.time() - t0,
                    }
                ]
            )
            return

        df = batch_df

        # ---- observer: data rules + event-time high-water mark, one
        # CollectMetrics node evaluated inside the collapse job (no extra
        # pass; only attached when a feature needs it)
        obs = None
        if self.data_rules or self.late_limit_s is not None or self.file_events_dir:
            from pyspark.sql import Observation

            metrics = [F.max("commit_ts").alias("_max_ts")]
            sampled = any(r.sampling_pct < 1.0 for r in self.data_rules)
            if sampled:
                # rand() is nondeterministic — illegal directly inside
                # CollectMetrics; project the draw, reference the column
                df = df.withColumn("_sample_u", F.rand(seed=batch_id))
            for i, rule in enumerate(self.data_rules):
                cond = F.expr(rule.condition)
                if rule.sampling_pct < 1.0:
                    cond = cond & (F.col("_sample_u") < rule.sampling_pct)
                metrics.append(
                    F.sum(F.when(cond, 1).otherwise(0)).alias(f"_rule_{i}")
                )
            if self.file_events_dir:
                # input_file_name is nondeterministic — illegal directly
                # inside CollectMetrics; project it, aggregate the column
                df = df.withColumn("_source_file", F.input_file_name())
                metrics.append(F.collect_set("_source_file").alias("_files"))
            obs = Observation(f"rules-{batch_id}")
            df = df.observe(obs, *metrics)
            if self.file_events_dir:
                df = df.drop("_source_file")
            if sampled:
                df = df.drop("_sample_u")

        # ---- late-record policy: Structured-Streaming watermark semantics
        # (threshold = max event time seen in PRIOR batches minus limit);
        # late rows go to the side output, on-time rows continue
        watermark = self._watermark
        if self.late_limit_s is not None and watermark is not None:
            late = df.where(F.col("commit_ts") < F.lit(watermark))
            if self.late_dir:
                late.write.mode("append").parquet(self.late_dir)
            df = df.where(
                F.col("commit_ts").isNull() | (F.col("commit_ts") >= F.lit(watermark))
            )

        payload_cols = [
            c for c in payload_columns_of(df.schema) if c in df.columns
        ]
        keys = self.table.key_columns
        collapsed = lww_collapse(
            df,
            key_columns=keys,
            carry_columns=["op", "lsn"] + [c for c in payload_cols if c not in keys],
            salt_buckets=self.salt_buckets,
        )
        # Transform AFTER collapse: per-record transforms (mask/normalize)
        # are row-pure and never touch keys/op/lsn, so they commute with
        # last-writer-wins — and only the collapse survivors pay the Arrow
        # round-trip (at a 2% dup + heavy-update rate that is a large cut
        # in pandas-UDF work). The contract: pipeline transforms must be
        # per-row pure and key/order-preserving.
        if self.transforms is not None:
            collapsed = self.transforms(collapsed)
        # merge() persists the normalized batch internally and returns the
        # per-bucket source stats from its bucket-discovery job — the
        # per-partition lineage (offsets applied per bucket) costs no extra job
        res = self.table.merge(collapsed, commit_key=commit_key, mode=self.merge_mode)
        if (
            self.merge_mode == "mor"
            and self.mor_compact_every
            and (self.batches_applied + 1) % self.mor_compact_every == 0
        ):
            self.table.compact_deltas()

        if obs is not None:
            m = obs.get
            max_ts = m.get("_max_ts")
            if self.late_limit_s is not None and max_ts is not None:
                import datetime as _dt

                cand = max_ts - _dt.timedelta(seconds=self.late_limit_s)
                prev = self._watermark
                self._watermark = max(prev, cand) if prev else cand
                self._save_watermark()
            for i, rule in enumerate(self.data_rules):
                n = int(m.get(f"_rule_{i}") or 0)
                self._rule_windows[i].append(n)
                windowed = sum(self._rule_windows[i])
                if windowed >= rule.min_count:
                    alert = {
                        "batch_id": batch_id,
                        "rule": rule.name,
                        "level": rule.level,
                        "count": n,
                    }
                    if rule.window_batches > 1:
                        alert["window_count"] = windowed
                        alert["window_batches"] = rule.window_batches
                    if rule.sampling_pct < 1.0:
                        alert["sampling_pct"] = rule.sampling_pct
                    self.alerts.append(alert)
            if self.file_events_dir and m.get("_files"):
                rows = [
                    (batch_id, f, ev)
                    for f in sorted(m["_files"])
                    for ev in ("new-file", "finished-file")
                ]
                self.spark.createDataFrame(
                    rows, "batch_id long, file string, event string"
                ).coalesce(1).write.mode("append").parquet(self.file_events_dir)

        per_bucket: list[dict] = []
        if self.per_bucket_lineage:
            per_bucket = [
                {
                    "batch_id": batch_id,
                    "commit_key": commit_key,
                    "bucket": b["bucket"],
                    "rows_source": b["rows_source"],
                    "min_lsn": b["min_lsn"],
                    "max_lsn": b["max_lsn"],
                }
                for b in res.bucket_stats
            ]
        batch_row = {
            "batch_id": batch_id,
            "commit_key": commit_key,
            "table_version": res.version,
            "rows_source": res.rows_source,
            "max_lsn": res.max_lsn,
            "rows_inserted": res.rows_inserted,
            "rows_updated": res.rows_updated,
            "rows_deleted": res.rows_deleted,
            "rows_lww_skipped": res.rows_lww_skipped,
            "noop": res.noop,
            "evolved_columns": res.evolved_columns,
            "wall_s": time.time() - t0,
            "phase_timings": res.phase_timings or None,
        }
        for row in per_bucket:
            row["table_version"] = res.version
        self._write_lineage([batch_row] + per_bucket)
        if self.expire_keep is not None and not res.noop:
            self.table.expire_snapshots(keep_last=self.expire_keep)
        self.batches_applied += 1
        if self.on_batch_applied is not None:
            self.on_batch_applied(self, batch_id)

    # -------------------------------------------------------------- drivers
    def run_available_now(self, timeout_s: float | None = None) -> None:
        """Drain everything currently in the source, then stop — SDC's
        'reset to end of data' bounded run; Trigger.AvailableNow still honors
        maxFilesPerTrigger, so the drain is a sequence of micro-batches."""
        q = (
            self._read_stream()
            .writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s) if timeout_s else q.awaitTermination()
        self._write_lineage([], flush=True)

    def run_continuous(self, processing_time: str = "5 seconds"):
        """Tail indefinitely (the production mode). Returns the query."""
        return (
            self._read_stream()
            .writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
