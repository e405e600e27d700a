"""datacollector_spark — a from-scratch, PySpark-native CDC ingest engine.

Capability-parity re-expression (NOT a port) of StreamSets Data Collector
(reference at /root/reference, surveyed in SURVEY.md): a Structured-Streaming
changelog tailer emits typed change events (insert/update/delete with LSN
ordering), deduplicates and collapses them per primary key via
last-writer-wins on (lsn, seq_in_tx), and applies them to a bucketed,
snapshot-versioned lake table through key-partitioned MERGE upserts with
salted repartitioning for hot-key skew, schema evolution, exactly-once
idempotent commits, and per-partition lineage metrics.

Everything is expressed with the public DataFrame API and vectorized
pandas/Arrow UDFs — no per-row Python in any hot path.
"""

__version__ = "0.1.0"

from datacollector_spark.session import get_spark  # noqa: F401
