"""Kafka origin + producer — Spark Structured Streaming mapping of the
reference's most-used connector pair.

Reference surface:
  * Kafka Consumer origin — kafka_source-protolib/.../origin/kafka/
    BaseKafkaSource.java (topic, consumer group, offsets, data format) and
    its cluster mode, where the pipeline is shipped to Spark Streaming one
    task per Kafka partition (cluster-bootstrap/.../SparkStreamingBinding.
    java:158-176). In this engine Spark IS the runtime, so "cluster mode"
    is simply `readStream.format("kafka")` — one Spark input partition per
    TopicPartition, offsets checkpointed by Structured Streaming instead of
    the reference's ZK/consumer-group offset store.
  * Kafka Producer destination — kafka_target-protolib/.../destination/
    kafka/KafkaTargetConfig.java:160-181 with partition strategies from
    sdc-kafka-api/.../PartitionStrategy.java:26-31 (RANDOM, ROUND_ROBIN,
    EXPRESSION, DEFAULT).

The spark-sql-kafka connector jar is not in this sandbox, so the
reader/writer builders are exercised by option-wiring tests (same pattern
as sources/jdbc.py); `encode_for_kafka` / `decode_kafka_records` — the
record <-> wire-format mapping, including the partition strategies — run
and are tested jar-free on any DataFrame with the Kafka wire schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Spark's fixed schema for `format("kafka")` sources (what decode takes).
KAFKA_SOURCE_COLUMNS = [
    "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
]

PARTITION_STRATEGIES = ("RANDOM", "ROUND_ROBIN", "EXPRESSION", "DEFAULT")


def kafka_origin_options(
    bootstrap_servers: str,
    topics: str | list[str] | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    consumer_config: dict[str, str] | None = None,
) -> dict[str, str]:
    """The option map for a Kafka origin (KafkaConfigBean analog):
    topic(s)/pattern, offset reset, batch-size cap (maxRatePerPartition
    analog), passthrough consumer properties (kafka.* prefix)."""
    if (topics is None) == (topic_pattern is None):
        raise ValueError("exactly one of topics / topic_pattern is required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics is not None:
        opts["subscribe"] = topics if isinstance(topics, str) else ",".join(topics)
    else:
        opts["subscribePattern"] = topic_pattern  # type: ignore[assignment]
    opts["startingOffsets"] = starting_offsets
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (consumer_config or {}).items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = str(v)
    return opts


def kafka_stream_origin(spark: SparkSession, **kwargs):
    """readStream.format("kafka") with the origin options wired; returns the
    (lazy) DataStreamReader — call .load() where the connector jar exists."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_origin_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader


def kafka_batch_origin(spark: SparkSession, **kwargs):
    """Bounded (batch) Kafka read — the reference's standalone consumer with
    a stop-at-current-offsets semantic (endingOffsets=latest)."""
    reader = spark.read.format("kafka").option("endingOffsets", "latest")
    for k, v in kafka_origin_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader


def decode_kafka_records(
    df: DataFrame,
    value_schema: str,
    value_format: str = "json",
    keep_metadata: bool = True,
) -> DataFrame:
    """Kafka wire record -> typed columns (the origin's data-format parse,
    DataFormatChooserValues.java). Works on any DataFrame with the Kafka
    source schema; value bytes decode JVM-side (from_json/from_csv)."""
    raw = F.col("value").cast("string")
    if value_format == "json":
        parsed = F.from_json(raw, value_schema)
    elif value_format in ("csv", "delimited"):
        parsed = F.from_csv(raw, value_schema)
    else:
        raise ValueError(f"unsupported value_format: {value_format}")
    out = df.withColumn("_r", parsed)
    meta = (
        [F.col("topic"), F.col("partition"), F.col("offset"), F.col("timestamp")]
        if keep_metadata
        else []
    )
    return out.select(*meta, F.col("_r.*"))


def _partition_column(
    strategy: str, num_partitions: int, partition_expr: str | None
) -> Column | None:
    """PartitionStrategy.java:26-31 -> a partition column (or None for
    DEFAULT, which delegates to Kafka's key-hash partitioner in the sink)."""
    if strategy == "RANDOM":
        return (F.rand() * num_partitions).cast("int")
    if strategy == "ROUND_ROBIN":
        # per-executor round-robin: even spread without a global counter
        # (a global row_number would serialize the write on one partition)
        return F.pmod(
            F.monotonically_increasing_id(), F.lit(num_partitions)
        ).cast("int")
    if strategy == "EXPRESSION":
        if not partition_expr:
            raise ValueError("EXPRESSION strategy requires partition_expr")
        return F.expr(partition_expr).cast("int")
    if strategy == "DEFAULT":
        return None
    raise ValueError(f"unknown partition strategy: {strategy}")


def encode_for_kafka(
    df: DataFrame,
    topic: str,
    key_expr: str | None = None,
    value_format: str = "json",
    partition_strategy: str = "DEFAULT",
    num_partitions: int = 1,
    partition_expr: str | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Typed rows -> Kafka producer frame (key/value binary, topic,
    optional explicit partition) per KafkaTargetConfig.java:160-181.

    DEFAULT leaves partition unset: the Kafka client hashes the key, exactly
    like the reference's default partitioner path."""
    cols = df.columns
    value: Column
    if value_format == "json":
        value = F.to_json(F.struct(*cols))
    elif value_format in ("csv", "delimited"):
        value = F.concat_ws(delimiter, *cols)
    else:
        raise ValueError(f"unsupported value_format: {value_format}")
    # partition expression evaluates over the SOURCE columns (the
    # reference's record-EL partition expression), so it is projected in
    # the same select that drops them
    part = _partition_column(partition_strategy, num_partitions, partition_expr)
    cols_out = [
        (F.expr(key_expr).cast("string") if key_expr else F.lit(None))
        .cast("binary")
        .alias("key"),
        value.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    ]
    if part is not None:
        cols_out.append(part.alias("partition"))
    return df.select(*cols_out)


def kafka_producer_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    producer_config: dict[str, str] | None = None,
):
    """writeStream.format("kafka") wiring for an encoded frame (streaming
    KafkaTarget). Returns the DataStreamWriter — .start() where the jar
    exists."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in (producer_config or {}).items():
        writer = writer.option(k if k.startswith("kafka.") else f"kafka.{k}", str(v))
    return writer
