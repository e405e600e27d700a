"""SparkSession factory tuned for the CDC ingest workload.

Local-mode defaults are sized for the sandbox (local[32], 128 GiB); on a real
cluster every knob here is either harmless or overridden by spark-submit conf.
AQE is on so skewed shuffles re-plan at runtime; Arrow is on so every
pandas-UDF boundary is columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datacollector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the sandbox).
    ``shuffle_partitions`` defaults to the core count — at cluster scale the
    caller sets it to ~2-3x total cores; AQE coalesces small partitions
    either way.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; on a cluster pass an explicit value.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)

    # Shuffle/spill scratch space. Spark's default local dir (/tmp) sits on
    # the sandbox's ONE virtual disk — the same disk-bound failure mode the
    # bench avoids for table/segment data by pointing its WORKDIR at
    # /dev/shm; shuffle files are the remaining multi-GB-per-batch disk
    # traffic, and a noisy neighbor on the shared disk stalls fetches even
    # when CPU is quiet. Parameterised: DCS_SPARK_LOCAL_DIR overrides; on a
    # real cluster you point this at the node's fast local SSD array (or
    # leave the platform default) — tmpfs is only the local-mode analog of
    # 'fast local scratch'. Spark removes its scratch subdirs on session
    # stop, so tmpfs does not accumulate across runs.
    local_dir = os.environ.get("DCS_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/dcs-spark-local"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # MERGE's full-outer join can't broadcast; shuffled-hash beats
        # sort-merge for it (no sort of the rewritten buckets)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Allow a join child whose existing hash partitioning covers a
        # SUBSET of the join keys to be used as-is (the other side shuffles
        # to match) instead of re-shuffling both sides by all keys. The lake
        # MERGE relies on this: the collapsed batch is bucket-partitioned
        # once, the bucket leads the join condition, and the join output
        # lands partitioned exactly as the bucketed writer needs — deleting
        # a full-width exchange of the merged result per micro-batch.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("DCS_SESSION_WARMUP", "1") != "0":
        _warm_session(spark)
    return spark


_WARMED: set[str] = set()


def _warm_session(spark: SparkSession) -> None:
    """One-time per-context warmup of the engine's common codepaths.

    A fresh JVM pays first-use costs on its first real query: task-scheduler
    and shuffle-infra spin-up, whole-stage-codegen compiler + Janino JIT,
    parquet reader/writer init, the noop/parquet datasource lookups, and
    broadcast machinery. On a long-running service these constants vanish;
    on short-lived sessions they land on whichever query runs first and
    distort its latency. The standard fix (same reason the CDC bench legs
    run an untimed warmup merge) is to exercise the paths once at session
    creation. Costs ~2 s once per SparkContext; disable with
    DCS_SESSION_WARMUP=0."""
    app_id = spark.sparkContext.applicationId
    if app_id in _WARMED:
        return
    _WARMED.add(app_id)
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        df = spark.range(1_000_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").cast("double").alias("v")
        )
        # exchange + partial/final hash aggregate + noop sink
        df.repartition(8, "k").groupBy("k").agg(F.sum("v").alias("s")).write.format(
            "noop"
        ).mode("overwrite").save()
        # window + sort + WindowGroupLimit (the LWW-collapse shape) — first
        # use otherwise pays its codegen inside whichever query runs first
        from pyspark.sql import Window as _W

        (
            df.withColumn(
                "_rn",
                F.row_number().over(_W.partitionBy("k").orderBy(F.col("v").desc())),
            )
            .where("_rn = 1")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        # generate (explode) + object-hash aggregate (collect_list) — the
        # bucket-expansion shape every LSH/dedup operator uses
        (
            df.select("k", F.explode(F.array(F.col("v"), F.col("v"))).alias("e"))
            .groupBy("k")
            .agg(F.collect_list("e").alias("es"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        # parquet write/read + broadcast hash join + codegen'd filter
        d = tempfile.mkdtemp(prefix="dcs-warm-")
        try:
            spark.range(10_000).write.mode("overwrite").parquet(d)
            (
                spark.read.parquet(d)
                .join(F.broadcast(spark.range(100)), "id")
                .where("id % 7 != 0")
                .count()
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass  # warmup is best-effort; never fail session creation
