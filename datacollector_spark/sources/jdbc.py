"""JDBC origins — the reference's JDBC Query Consumer
(jdbc-lib/.../origin/jdbc/JdbcSource.java:71-96 — incremental offset-column
polling) and JDBC Multitable (table/TableJdbcSource.java:141-161 — N tables,
K threads, per-table partition ranges).

Spark-native mapping: `spark.read.jdbc` with predicate pushdown does the
single-query case; `partitionColumn/lowerBound/upperBound/numPartitions`
IS the multithreaded-partitioned read. Incremental mode = a high-watermark
filter, persisted by the caller (our streaming checkpoint analog for
databases Spark cannot stream from directly).

No database ships in this sandbox, so these build the reader plans but are
exercised only by plan-shape tests; the code path is identical on a real
cluster with a JDBC driver jar on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_query(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    offset_column: str | None = None,
    last_offset=None,
    max_batch: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental JDBC poll: WHERE offset_col > ${OFFSET} ORDER BY offset —
    the reference's ${OFFSET} substitution (JdbcSource.java:120-133) as a
    pushed-down filter."""
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if table_or_query.strip().lower().startswith("select"):
        reader = reader.option("query", table_or_query)
    else:
        reader = reader.option("dbtable", table_or_query)
    df = reader.load()
    if offset_column and last_offset is not None:
        df = df.where(df[offset_column] > last_offset)  # pushed to the DB
    if offset_column:
        df = df.orderBy(offset_column)
    if max_batch:
        df = df.limit(max_batch)
    return df


def jdbc_partitioned_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound,
    upper_bound,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """The Multitable origin's per-table parallel read: K partition ranges
    read concurrently (MultithreadedTableProvider analog — Spark executors
    replace the reference's thread pool)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
