"""LakeTable — an Iceberg-style versioned, bucketed, copy-on-write table.

No Iceberg runtime jar ships in this sandbox, so the engine provides the
subset of Iceberg semantics the CDC sink needs, in pure PySpark + manifest
JSON. The public surface is deliberately shaped like the Iceberg operations
named in the north star, and the module is swappable for a real Iceberg
catalog (issue `MERGE INTO ... WHEN MATCHED ...` instead of `merge()`) with
no change to the rest of the engine:

  * snapshot isolation + time travel   -> versioned manifests, atomic pointer
  * `MERGE INTO` row-level upsert      -> :meth:`LakeTable.merge` (COW)
  * `bucket(N, conv_id)` partitioning  -> xxhash64 key buckets; a merge
    rewrites ONLY the buckets its source touches (partition pruning at the
    write side — the property that bounds rewrite cost at 10^10 rows)
  * schema evolution / mergeSchema     -> :meth:`LakeTable.evolve_schema`
    (add-column + int->long / float->double widening, mirroring the Hive
    drift sink, hive-protolib/.../HiveMetastoreTarget.java:228-255)
  * exactly-once sink                  -> commit keys recorded per snapshot;
    replaying a committed micro-batch is a no-op (the reference's offset
    tracker, ProductionSourceOffsetTracker.java:59-85, upgraded from
    at-least-once to exactly-once)

MERGE semantics implemented (the JDBC/Kudu target op-code contract,
jdbc-lib/.../lib/jdbc/JdbcRecordReader.java:48-77 and
kudu-protolib/.../kudu/KuduTarget.java:338-372):

    MERGE INTO t USING s ON <keys>
      WHEN MATCHED AND s.ord > t._lsn AND s.op = 2  THEN DELETE
      WHEN MATCHED AND s.ord > t._lsn               THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op != 2                THEN INSERT *

where `ord` (stored as `_lsn`) is the SAME total order the in-batch collapse
uses: lsn<<16 | seq_in_tx when the batch carries seq_in_tx, bare lsn
otherwise. The `s.ord > t._lsn` guard makes replays idempotent even without
the commit key (defense in depth: at-least-once delivery collapses to
exactly-once state), and stays correct across micro-batch boundaries when
two changes to one key share an lsn but differ in seq_in_tx.

Concurrency contract: single writer (the streaming query); readers see
committed snapshots only (manifest pointer flips atomically via rename).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacollector_spark.model import LSN_COLUMN, OP_DELETE

_BUCKET_COL = "_bucket"
DELETED_COLUMN = "_deleted"

# legal type widenings (Hive/Iceberg-style promotion only). Every pair here
# must keep OLD data files readable through the widened schema: Spark's
# parquet reader accepts int->long, float->double (SPARK-40876) and
# date->timestamp_ntz, but NOT date->timestamp (LTZ) — that pair fails with
# PARQUET_COLUMN_DATA_TYPE_MISMATCH on the un-rewritten files, so it is
# deliberately absent. Guarded by test_widenings_keep_old_files_readable.
_WIDENINGS = {
    ("integer", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("float", "double"),
    ("date", "timestamp_ntz"),
}

# manifest bounds: the manifest is rewritten per commit, so everything in it
# must be O(buckets), never O(stream length). Full lineage lives in the
# parquet lineage table (streaming/pipeline.py); full replay protection for
# numeric commit keys lives in the per-stream high-water mark.
_KEYS_KEEP = 1024
_LINEAGE_KEEP = 64

# Manifest format version. Bumped when the on-disk meaning of stored fields
# changes; opening a table written by an incompatible format raises instead
# of silently misreading it. History:
#   2 — _lsn stores the PACKED order (lsn<<16|seq_in_tx); date widens to
#       timestamp_ntz; binlog lsn_bits default 32. A v<2 table's bare-lsn
#       values would lose every LWW comparison against packed _ord values
#       (~65536x larger), letting stale events overwrite newer rows.
_FORMAT_VERSION = 2


def _split_commit_key(key: str) -> tuple[str, int] | None:
    """'ns:microbatch-17' -> ('ns:microbatch', 17); None otherwise.

    Restricted to the INTERNAL streaming key shape ('<stream>:microbatch-N',
    used by CdcIngestPipeline and MultiTableCdcPipeline, which commit batch
    ids in order): merge() is a public API, and a batch caller committing
    arbitrary numeric-tailed keys out of order ('backfill-10' then
    'backfill-5') must not have the later merge silently skipped as a replay
    by the high-water mark. User keys get exact-match replay protection via
    the bounded ring only."""
    head, sep, tail = key.rpartition("-")
    if sep and tail.isdigit() and head.endswith(":microbatch"):
        return head, int(tail)
    return None


@dataclass
class MergeResult:
    """Per-merge lineage record (the reference's per-batch meters,
    ProductionPipelineRunner.java:723-745)."""

    version: int
    commit_key: str | None
    mode: str = "cow"
    noop: bool = False
    rows_source: int = 0
    rows_inserted: int = 0
    rows_updated: int = 0
    rows_deleted: int = 0
    rows_lww_skipped: int = 0  # stale source rows rejected by the lsn guard
    buckets_touched: int = 0
    max_lsn: int | None = None
    evolved_columns: list[str] = field(default_factory=list)
    # per-bucket source stats (offsets applied per partition) — computed in
    # the same job that discovers touched buckets, free for lineage
    bucket_stats: list[dict] = field(default_factory=list)
    # per-phase wall times (stats job / write job / obs / manifest) — the
    # reference's per-stage batch timers (ProductionPipelineRunner.java:723)
    phase_timings: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        d = dict(self.__dict__)
        d.pop("bucket_stats", None)  # kept out of the manifest (size)
        d.pop("phase_timings", None)
        return d


class LakeTable:
    """A bucketed copy-on-write table rooted at a directory.

    Layout::

        <root>/_manifests/v{N:010d}.json   immutable snapshot manifests
        <root>/_manifests/VERSION          atomic current-version pointer
        <root>/data/v{N}/_bucket=<b>/*.parquet   data files (immutable)
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._manifest = self._load_manifest()

    # ---------------------------------------------------------------- setup
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_columns: list[str],
        num_buckets: int = 32,
        overwrite: bool = False,
    ) -> "LakeTable":
        root = path.rstrip("/")
        if os.path.exists(root):
            if not overwrite:
                raise FileExistsError(root)
            shutil.rmtree(root)
        os.makedirs(os.path.join(root, "_manifests"))
        os.makedirs(os.path.join(root, "data"))
        meta_fields = [
            T.StructField(LSN_COLUMN, T.LongType(), True),
            T.StructField(DELETED_COLUMN, T.BooleanType(), True),
        ]
        names = set(schema.fieldNames())
        schema = T.StructType(
            list(schema.fields) + [f for f in meta_fields if f.name not in names]
        )
        manifest = {
            "version": 0,
            "format_version": _FORMAT_VERSION,
            "schema": schema.jsonValue(),
            "key_columns": key_columns,
            "num_buckets": num_buckets,
            "files": {},  # bucket(str) -> [relative paths] (base files)
            "deltas": {},  # bucket(str) -> [relative paths] (MOR delta files)
            "committed_keys": [],  # bounded ring of the last _KEYS_KEEP keys
            "committed_hw": {},  # key-prefix -> max numeric suffix committed
            "lineage": [],  # bounded tail; full history in the lineage table
        }
        cls._write_manifest(root, manifest)
        return cls(spark, root)

    @staticmethod
    def _manifest_path(root: str, version: int) -> str:
        return os.path.join(root, "_manifests", f"v{version:010d}.json")

    @classmethod
    def _write_manifest(cls, root: str, manifest: dict) -> None:
        v = manifest["version"]
        mpath = cls._manifest_path(root, v)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        vtmp = os.path.join(root, "_manifests", "VERSION.tmp")
        with open(vtmp, "w") as f:
            f.write(str(v))
        os.replace(vtmp, os.path.join(root, "_manifests", "VERSION"))

    def _load_manifest(self, version: int | None = None) -> dict:
        if version is None:
            with open(os.path.join(self.path, "_manifests", "VERSION")) as f:
                version = int(f.read().strip())
        with open(self._manifest_path(self.path, version)) as f:
            manifest = json.load(f)
        fv = manifest.get("format_version", 1)
        if fv != _FORMAT_VERSION:
            raise ValueError(
                f"table at {self.path} has manifest format_version={fv}; this "
                f"engine reads/writes format_version={_FORMAT_VERSION} "
                "(packed-order _lsn encoding). Opening it would silently "
                "mis-order LWW merges — rewrite the table (read old engine -> "
                "write new) to migrate."
            )
        return manifest

    def refresh(self) -> "LakeTable":
        self._manifest = self._load_manifest()
        return self

    # ------------------------------------------------------------ accessors
    @property
    def version(self) -> int:
        return self._manifest["version"]

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._manifest["schema"])

    @property
    def key_columns(self) -> list[str]:
        return list(self._manifest["key_columns"])

    @property
    def num_buckets(self) -> int:
        return self._manifest["num_buckets"]

    @property
    def lineage(self) -> list[dict]:
        return list(self._manifest["lineage"])

    def committed(self, commit_key: str) -> bool:
        """O(1)-ish replay check: recent keys live in a bounded ring; keys
        with a numeric tail (the streaming 'ns:microbatch-N' shape, which
        commits in order) are additionally covered arbitrarily far back by a
        per-prefix high-water mark — so the manifest stays O(buckets) while
        the replay window stays unbounded for ordered streams."""
        parsed = _split_commit_key(commit_key)
        if parsed is not None:
            prefix, n = parsed
            if n <= self._manifest.get("committed_hw", {}).get(prefix, -1):
                return True
        return commit_key in self._manifest["committed_keys"]

    def _commit_bookkeeping(self, commit_key: str | None) -> tuple[list, dict]:
        """New (committed_keys ring, committed_hw) after recording a key."""
        keys = list(self._manifest["committed_keys"])
        hw = dict(self._manifest.get("committed_hw", {}))
        if commit_key is not None:
            keys = (keys + [commit_key])[-_KEYS_KEEP:]
            parsed = _split_commit_key(commit_key)
            if parsed is not None:
                prefix, n = parsed
                hw[prefix] = max(hw.get(prefix, -1), n)
        return keys, hw

    def bucket_expr(self, *key_cols: str):
        """bucket(N, key) — same role as Iceberg's bucket transform."""
        cols = list(key_cols) or [self.key_columns[0]]
        return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(self.num_buckets))

    # ----------------------------------------------------------------- read
    def _files_for(
        self,
        manifest: dict,
        buckets: list[int] | None = None,
        which: str = "files",
    ) -> list[str]:
        out: list[str] = []
        for b, rels in manifest.get(which, {}).items():
            if buckets is None or int(b) in buckets:
                out.extend(os.path.join(self.path, r) for r in rels)
        return out

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_meta: bool = False,
    ) -> DataFrame:
        """Current (or time-travel) snapshot as a DataFrame.

        Old data files that predate an evolved schema are read through the
        current schema — missing columns surface as NULL, exactly like
        Iceberg's add-column evolution.

        Merge-on-read: when delta files exist (merge(mode='mor')), the
        snapshot is reconstructed by a read-side LWW collapse over base +
        delta rows (winner = max _lsn per key), exactly Iceberg-v2/Hudi MOR
        semantics with an equality-delete generalization.
        """
        manifest = self._manifest if version is None else self._load_manifest(version)
        schema = T.StructType.fromJson(manifest["schema"])
        base = self._files_for(manifest, buckets, "files")
        deltas = self._files_for(manifest, buckets, "deltas")
        files = base + deltas
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*files)
        if deltas:
            keys = manifest["key_columns"]
            # read-side LWW winner as a rank-1 window (round 6): one scan +
            # one exchange with a map-side WindowGroupLimit pre-filter,
            # replacing the winners aggregate + join + full-width duplicate
            # removal (same shape change as operators/collapse.py; replayed
            # deltas tie the base row at equal _lsn with identical content,
            # so the arbitrary rank-1 pick among ties is value-identical)
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col(LSN_COLUMN).desc())
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        if not include_meta:
            # live rows only: delete tombstones are an implementation detail
            df = df.where(
                ~F.coalesce(F.col(DELETED_COLUMN), F.lit(False))
            ).drop(LSN_COLUMN, DELETED_COLUMN)
        return df

    def delta_file_count(self, buckets: list[int] | None = None) -> int:
        return len(self._files_for(self._manifest, buckets, "deltas"))

    # ------------------------------------------------------ schema evolution
    def evolve_schema(self, source_schema: T.StructType) -> list[str]:
        """Diff an incoming batch schema against the table schema; add new
        columns and apply legal widenings. Returns the evolved column names.

        The HiveMetadataProcessor drift-detection + HiveMetastoreTarget
        ALTER TABLE ADD COLUMNS flow (SURVEY.md §2.6), as in-place manifest
        schema replacement — old files need no rewrite because reads go
        through the current schema.
        """
        current = {f.name: f for f in self.schema.fields}
        evolved: list[str] = []
        new_fields = [f for f in self.schema.fields]
        for f_new in source_schema.fields:
            if f_new.name.startswith("_"):
                continue
            cur = current.get(f_new.name)
            if cur is None:
                new_fields.append(T.StructField(f_new.name, f_new.dataType, True))
                evolved.append(f_new.name)
            elif cur.dataType != f_new.dataType:
                pair = (cur.dataType.typeName(), f_new.dataType.typeName())
                if pair in _WIDENINGS:
                    idx = [x.name for x in new_fields].index(f_new.name)
                    new_fields[idx] = T.StructField(f_new.name, f_new.dataType, True)
                    evolved.append(f_new.name)
        if evolved:
            # keep LSN column last for readability
            new_fields.sort(key=lambda x: x.name == LSN_COLUMN)
            self._manifest["schema"] = T.StructType(new_fields).jsonValue()
        return evolved

    # ---------------------------------------------------------------- merge
    def merge(
        self,
        source: DataFrame,
        commit_key: str | None = None,
        evolve: bool = True,
        mode: str = "cow",
    ) -> MergeResult:
        """Apply a COLLAPSED change batch (one row per key, with `op` and
        `lsn` columns) to the table.

        mode='cow': copy-on-write at bucket granularity — touched buckets are
        rewritten (join + rewrite; read stays a plain scan). Any pending MOR
        deltas in the touched buckets are folded in by the same pass.

        mode='mor': merge-on-read — the batch is APPENDED as bucketed delta
        files (no join, no rewrite; ingest cost ∝ batch size only). Reads
        reconstruct via LWW collapse over base+deltas; call
        :meth:`compact_deltas` (or let the pipeline do it every K batches)
        to fold deltas into the base. This is the Iceberg-v2 / Hudi MOR
        shape — the ingest mode for 10^10-event scale, where rewriting the
        table per micro-batch is the bottleneck.

        The caller collapses first (operators.collapse.lww_collapse); the
        cross-batch LWW guard (s.lsn > t._lsn) is enforced at the join in
        COW mode and at read-time winner selection in MOR mode.
        """
        import os as _os, time as _time
        _dbg = _os.environ.get("DCS_MERGE_DEBUG") == "1"
        _t = _time.time()
        _timings: dict[str, float] = {}
        def _mark(label):
            nonlocal _t
            _timings[label] = round(_time.time() - _t, 3)
            if _dbg:
                print(f"[merge-debug] {label}: {_timings[label]:.2f}s", flush=True)
            _t = _time.time()
        if commit_key is not None and self.committed(commit_key):
            return MergeResult(
                version=self.version, commit_key=commit_key, noop=True
            )

        evolved: list[str] = []
        if evolve:
            envelope = {"op", "lsn", "seq_in_tx", "src_table", "server_id", "commit_ts"}
            payload_schema = T.StructType(
                [
                    f
                    for f in source.schema.fields
                    if f.name not in envelope and not f.name.startswith("old_")
                ]
            )
            evolved = self.evolve_schema(payload_schema)

        schema = self.schema
        keys = self.key_columns
        meta = (LSN_COLUMN, DELETED_COLUMN)
        data_cols = [f.name for f in schema.fields if f.name not in meta]
        non_key_cols = [c for c in data_cols if c not in keys]

        # normalize source: every table column present (nulls for columns the
        # batch doesn't carry), correct types. One select, not a withColumn
        # per field: each withColumn eagerly re-analyzes the whole (deep)
        # batch plan through py4j, which costs driver latency once per
        # micro-batch for zero plan difference.
        norm_cols = [
            (
                F.col(f_.name).cast(f_.dataType).alias(f_.name)
                if f_.name in source.columns
                else F.lit(None).cast(f_.dataType).alias(f_.name)
            )
            for f_ in schema.fields
            if f_.name not in meta
        ]
        # The stored per-key order (_lsn) is the SAME total order the
        # in-batch collapse uses: lsn<<16 | seq_in_tx when the batch carries
        # seq_in_tx, bare lsn otherwise. Storing the packed order keeps the
        # cross-batch guard (s._ord > t._lsn) and the MOR read winner
        # consistent with (lsn, seq_in_tx) when two changes to one key share
        # an lsn but land in different micro-batches.
        if "seq_in_tx" in source.columns:
            # shared guarded packing (operators/collapse.py): raises on
            # lsn >= 2^47 instead of silently wrapping int64 into wrong
            # LWW winners (decoders emitting pre-packed offsets — e.g. a raw
            # BSON ts — would otherwise corrupt order with no error)
            from datacollector_spark.operators.collapse import packed_order

            order_expr = packed_order(
                F.col("lsn"), F.coalesce(F.col("seq_in_tx").cast("long"), F.lit(0))
            )
        else:
            order_expr = F.col("lsn").cast("long")
        # Bucket-partition the collapsed batch ONCE, before it is persisted:
        # every downstream consumer is keyed by the bucket — the stats job
        # groups by it, the COW join is co-partitioned on it (see below), and
        # the writer lays files out by it — so the single narrow exchange of
        # collapsed rows here replaces the full-width exchange of the whole
        # merged result that used to sit in front of the write (guide §2.4:
        # operations keyed the same way share one exchange; §3.3: key the
        # join so its output partitioning is the one the writer needs).
        s = (
            source.select(
                F.col("op"), F.col("lsn"), order_expr.alias("_ord"), *norm_cols
            )
            .withColumn(_BUCKET_COL, self.bucket_expr(*keys))
            .repartition(self.num_buckets, F.col(_BUCKET_COL))
            .persist()
        )

        # One small job discovers the touched buckets AND yields the
        # per-bucket lineage stats (offsets applied per partition). The
        # result is <= num_buckets rows — a metadata collect.
        stats_rows = (
            s.groupBy(_BUCKET_COL)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("lsn").alias("min_lsn"),
                F.max("lsn").alias("max_lsn"),
                F.sum(F.when(F.col("op") == OP_DELETE, 1).otherwise(0)).alias("dels"),
            )
            .collect()
        )
        _mark("stats_job")
        touched = [int(r[_BUCKET_COL]) for r in stats_rows]
        bucket_stats = [
            {
                "bucket": int(r[_BUCKET_COL]),
                "rows_source": int(r["rows"]),
                "min_lsn": int(r["min_lsn"]),
                "max_lsn": int(r["max_lsn"]),
            }
            for r in stats_rows
        ]
        if not touched:
            s.unpersist()
            return MergeResult(version=self.version, commit_key=commit_key, noop=True)

        n_deletes = sum(int(r["dels"]) for r in stats_rows)

        if mode == "mor":
            # append the batch as base-shaped delta rows; no target read
            is_del = F.col("op") == OP_DELETE
            result = s.select(
                F.col(_BUCKET_COL),
                *[F.col(k) for k in keys],
                *[
                    F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c)
                    for c in non_key_cols
                ],
                F.col("_ord").alias(LSN_COLUMN),
                is_del.alias(DELETED_COLUMN),
            )
            new_version = self.version + 1
            out_dir_rel = os.path.join("data", f"v{new_version}")
            out_dir = os.path.join(self.path, out_dir_rel)
            # s is bucket-partitioned in the cache; append deltas directly
            (
                result.write.partitionBy(_BUCKET_COL)
                .mode("overwrite")
                .parquet(out_dir)
            )
            _mark("write_job")
            s.unpersist()
            new_files = self._scan_written(out_dir, out_dir_rel)
            deltas = {k: list(v) for k, v in self._manifest.get("deltas", {}).items()}
            for b, rels in new_files.items():
                deltas[b] = deltas.get(b, []) + rels
            res = MergeResult(
                version=new_version,
                commit_key=commit_key,
                mode="mor",
                rows_source=sum(b_["rows_source"] for b_ in bucket_stats),
                rows_inserted=sum(b_["rows_source"] for b_ in bucket_stats)
                - n_deletes,  # upserts: insert/update resolved at read
                rows_deleted=n_deletes,
                buckets_touched=len(touched),
                max_lsn=max(b_["max_lsn"] for b_ in bucket_stats),
                evolved_columns=evolved,
                bucket_stats=bucket_stats,
                phase_timings=_timings,
            )
            manifest = dict(self._manifest)
            manifest["version"] = new_version
            manifest["deltas"] = deltas
            keys, hw = self._commit_bookkeeping(commit_key)
            manifest["committed_keys"], manifest["committed_hw"] = keys, hw
            manifest["lineage"] = (list(self._manifest["lineage"]) + [res.as_dict()])[
                -_LINEAGE_KEEP:
            ]
            self._write_manifest(self.path, manifest)
            self._manifest = manifest
            _mark("manifest")
            return res

        target_files = self._files_for(self._manifest, touched) + self._files_for(
            self._manifest, touched, "deltas"
        )
        # read() folds pending MOR deltas into the view, so a COW merge over
        # delta-carrying buckets doubles as their compaction
        target = self.read(buckets=touched, include_meta=True).withColumn(
            _BUCKET_COL, self.bucket_expr(*keys)
        )

        if not target_files:
            # Fast path (no join): none of the touched buckets has data yet,
            # so every source row lands directly — live rows for op!=2,
            # tombstones for op=2 (tombstones still matter: they carry the
            # LSN high-water mark against later out-of-order stale inserts).
            is_del = F.col("op") == OP_DELETE
            result = s.select(
                F.when(is_del, F.lit("delete")).otherwise(F.lit("insert")).alias(
                    "_action"
                ),
                F.col(_BUCKET_COL),
                *[F.col(k) for k in keys],
                *[
                    F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c)
                    for c in non_key_cols
                ],
                F.col("_ord").alias(LSN_COLUMN),
                is_del.alias(DELETED_COLUMN),
            )
        else:
            s_pref = s.select(
                *[F.col(k).alias(f"s_{k}") for k in keys],
                F.col(_BUCKET_COL).alias("s__bucket"),
                "op",
                "_ord",
                *[F.col(c).alias(f"s_{c}") for c in non_key_cols],
            )
            # plain equality: key columns are non-null by contract (primary
            # key); eqNullSafe costs ~30% extra join time for nothing here.
            # The bucket equality leads the condition: bucket = f(keys) on
            # both sides, so it never changes the match set, but it lets the
            # join co-partition on the bucket alone (the source side is
            # already bucket-partitioned in the cache;
            # requireAllClusterKeysForCoPartition=false in session.py) —
            # the join output then lands partitioned exactly as the writer
            # needs it and the old full-width result repartition is gone.
            cond = [F.col("s__bucket") == F.col(_BUCKET_COL)] + [
                F.col(f"s_{k}") == F.col(k) for k in keys
            ]
            # SHUFFLE_HASH: build the hash map on the (collapsed, cached)
            # batch side instead of sort-merging — skips the two full sorts
            # (guide §3.1; preferSortMergeJoin=false alone does not pick SHJ
            # for this full-outer shape, and AQE's SMJ->SHJ rewrite is off
            # by default). The batch side is bounded by micro-batch size, so
            # the per-partition build map is small by construction.
            joined = target.join(
                s_pref.hint("SHUFFLE_HASH"), on=cond, how="full_outer"
            )

            src_matched = F.col("_ord").isNotNull()
            tgt_matched = F.col(LSN_COLUMN).isNotNull()  # live row OR tombstone
            fresh = src_matched & (~tgt_matched | (F.col("_ord") > F.col(LSN_COLUMN)))

            # Deletes always materialize a tombstone (even for never-seen
            # keys): the tombstone carries the per-key LSN high-water mark,
            # so a stale out-of-order insert arriving in a LATER micro-batch
            # is rejected by the same `s.lsn > t._lsn` guard instead of
            # resurrecting the row.
            action = (
                F.when(~src_matched, F.lit("keep"))
                .when(~fresh, F.lit("stale"))
                .when(F.col("op") == OP_DELETE, F.lit("delete"))
                .when(tgt_matched, F.lit("update"))  # incl. tombstone resurrection
                .otherwise(F.lit("insert"))
            )

            from_src = F.col("_action").isin("insert", "update", "delete")
            is_tombstone = F.col("_action") == "delete"
            out_cols = [
                F.when(from_src, F.col(f"s_{k}")).otherwise(F.col(k)).alias(k)
                for k in keys
            ]
            out_cols += [
                F.when(is_tombstone, F.lit(None))
                .when(from_src, F.col(f"s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in non_key_cols
            ]
            out_cols.append(
                F.when(from_src, F.col("_ord"))
                .otherwise(F.col(LSN_COLUMN))
                .alias(LSN_COLUMN)
            )
            out_cols.append(
                F.when(is_tombstone, F.lit(True))
                .when(from_src, F.lit(False))
                .otherwise(F.coalesce(F.col(DELETED_COLUMN), F.lit(False)))
                .alias(DELETED_COLUMN)
            )
            result = joined.withColumn("_action", action).select(
                "_action",
                F.coalesce(F.col(_BUCKET_COL), F.col("s__bucket")).alias(_BUCKET_COL),
                *out_cols,
            )

        from pyspark.sql import Observation

        obs = Observation(f"merge-{uuid.uuid4().hex[:8]}")
        result = result.observe(
            obs,
            F.sum(F.when(F.col("_action") == "insert", 1).otherwise(0)).alias("ins"),
            F.sum(F.when(F.col("_action") == "update", 1).otherwise(0)).alias("upd"),
            F.sum(F.when(F.col("_action") == "delete", 1).otherwise(0)).alias("del"),
            F.sum(F.when(F.col("_action") == "stale", 1).otherwise(0)).alias("stale"),
        )

        new_version = self.version + 1
        out_dir_rel = os.path.join("data", f"v{new_version}")
        out_dir = os.path.join(self.path, out_dir_rel)
        # no repartition: the join output (and the fast path's projection of
        # s) is already hash-partitioned by the bucket, so each task holds
        # whole buckets and partitionBy still writes one file per bucket
        (
            result.drop("_action")
            .write.partitionBy(_BUCKET_COL)
            .mode("overwrite")
            .parquet(out_dir)
        )
        _mark("write_job")
        m = obs.get
        _mark("obs_get")
        s.unpersist()

        new_files = self._scan_written(out_dir, out_dir_rel)
        files = dict(self._manifest["files"])
        deltas = {k: list(v) for k, v in self._manifest.get("deltas", {}).items()}
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)  # folded into the new base files

        res = MergeResult(
            version=new_version,
            commit_key=commit_key,
            rows_source=sum(b["rows_source"] for b in bucket_stats),
            rows_inserted=int(m["ins"] or 0),
            rows_updated=int(m["upd"] or 0),
            rows_deleted=int(m["del"] or 0),
            rows_lww_skipped=int(m["stale"] or 0),
            buckets_touched=len(touched),
            max_lsn=max(b["max_lsn"] for b in bucket_stats),
            evolved_columns=evolved,
            bucket_stats=bucket_stats,
            phase_timings=_timings,
        )
        manifest = dict(self._manifest)
        manifest["version"] = new_version
        manifest["files"] = files
        manifest["deltas"] = deltas
        keys, hw = self._commit_bookkeeping(commit_key)
        manifest["committed_keys"], manifest["committed_hw"] = keys, hw
        manifest["lineage"] = (list(self._manifest["lineage"]) + [res.as_dict()])[
            -_LINEAGE_KEEP:
        ]
        self._write_manifest(self.path, manifest)
        self._manifest = manifest
        _mark("manifest")
        return res

    @staticmethod
    def _scan_written(out_dir: str, out_dir_rel: str) -> dict[str, list[str]]:
        """Collect {bucket: [relpaths]} from a partitionBy(_bucket) write."""
        new_files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{_BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_dir, entry)
            rels = [
                os.path.join(out_dir_rel, entry, fn)
                for fn in os.listdir(bdir)
                if fn.endswith(".parquet")
            ]
            if rels:
                new_files[b] = rels
        return new_files

    def compact_deltas(self, buckets: list[int] | None = None) -> int:
        """Fold MOR delta files into base files (Iceberg rewrite of v2
        deletes / Hudi compaction). Returns the number of buckets compacted.
        The read-side collapse does the heavy lifting; this just persists
        its result as the new base."""
        delta_buckets = [
            int(b) for b, rels in self._manifest.get("deltas", {}).items() if rels
        ]
        if buckets is not None:
            delta_buckets = [b for b in delta_buckets if b in buckets]
        if not delta_buckets:
            return 0
        keys = self.key_columns
        collapsed = self.read(buckets=delta_buckets, include_meta=True).withColumn(
            _BUCKET_COL, self.bucket_expr(*keys)
        )
        new_version = self.version + 1
        out_dir_rel = os.path.join("data", f"v{new_version}")
        out_dir = os.path.join(self.path, out_dir_rel)
        (
            collapsed.repartition(max(len(delta_buckets), 1), F.col(_BUCKET_COL))
            .write.partitionBy(_BUCKET_COL)
            .mode("overwrite")
            .parquet(out_dir)
        )
        new_files = self._scan_written(out_dir, out_dir_rel)
        files = dict(self._manifest["files"])
        deltas = {k: list(v) for k, v in self._manifest.get("deltas", {}).items()}
        for b in delta_buckets:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)
        manifest = dict(self._manifest)
        manifest["version"] = new_version
        manifest["files"] = files
        manifest["deltas"] = deltas
        self._write_manifest(self.path, manifest)
        self._manifest = manifest
        return len(delta_buckets)

    # ------------------------------------------------------------- maintain
    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data files no kept snapshot references — Iceberg's
        expire_snapshots. Time travel to expired versions stops working
        (same contract as Iceberg). Returns the number of files deleted.

        COW merges leave every previous version's files on disk; a
        long-running stream MUST expire periodically or storage grows with
        versions, not data (CdcIngestPipeline.expire_keep automates this).
        """
        current = self.version
        cutoff = max(current - keep_last + 1, 0)
        keep_versions = list(range(cutoff, current + 1))
        referenced: set[str] = set()
        for v in keep_versions:
            try:
                m = self._load_manifest(v)
            except FileNotFoundError:
                continue
            for rels in m["files"].values():
                referenced.update(rels)
            for rels in m.get("deltas", {}).values():
                referenced.update(rels)
        deleted = 0
        data_root = os.path.join(self.path, "data")
        for dirpath, _dirs, files in os.walk(data_root):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.path)
                if rel not in referenced and fn.endswith(".parquet"):
                    os.remove(full)
                    deleted += 1
        mdir = os.path.join(self.path, "_manifests")
        for fn in os.listdir(mdir):
            if fn.startswith("v") and fn.endswith(".json"):
                v = int(fn[1:-5])
                if v < cutoff:
                    os.remove(os.path.join(mdir, fn))
        return deleted

    def compact(self, max_files_per_bucket: int = 1) -> int:
        """Rewrite buckets whose file count exceeds the threshold — Iceberg's
        rewrite_data_files; the reference analog is the MapReduce
        Avro→Parquet converter executor (SURVEY.md §2.5). Returns the number
        of buckets rewritten."""
        victims = [
            int(b)
            for b, rels in self._manifest["files"].items()
            if len(rels) > max_files_per_bucket
        ]
        if not victims:
            return 0
        schema = self.schema
        df = self.spark.read.schema(schema).parquet(
            *self._files_for(self._manifest, victims)
        ).withColumn(_BUCKET_COL, self.bucket_expr(*self.key_columns))
        new_version = self.version + 1
        out_dir_rel = os.path.join("data", f"v{new_version}")
        out_dir = os.path.join(self.path, out_dir_rel)
        (
            df.repartition(len(victims), F.col(_BUCKET_COL))
            .write.partitionBy(_BUCKET_COL)
            .mode("overwrite")
            .parquet(out_dir)
        )
        files = dict(self._manifest["files"])
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{_BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_dir, entry)
            files[b] = [
                os.path.join(out_dir_rel, entry, fn)
                for fn in os.listdir(bdir)
                if fn.endswith(".parquet")
            ]
        manifest = dict(self._manifest)
        manifest["version"] = new_version
        manifest["files"] = files
        self._write_manifest(self.path, manifest)
        self._manifest = manifest
        return len(victims)
