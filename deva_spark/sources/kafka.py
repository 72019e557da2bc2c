"""Kafka sink: record serialization, key partitioning, gated writers.

Reference surface: ``to_kafka`` (`/root/reference/deva/endpoints.py:67-158`)
— a confluent-kafka producer with delivery futures and an explicit
``flush``. The Spark-native equivalents:

* streaming: ``writeStream.format("kafka")`` — delivery/retry/flush are
  the connector's job, exactly-once-per-batch via checkpointed offsets
  (the delivery-future bookkeeping the reference hand-rolls);
* batch: ``df.write.format("kafka")`` — one producer per task, flushed on
  task commit.

Both need the spark-sql-kafka package on the classpath, absent in this
container, so the writers are gated like the reader
(`readers.py:86`). What IS testable brokerless — and what this module
makes first-class — is the record contract: key/value serialization to
the connector's expected schema, and Kafka's default key→partition
assignment (murmur2), which lets a job repartition BY TARGET KAFKA
PARTITION before the write so each task produces to one broker partition
(sequential appends per partition instead of all-tasks-to-all-partitions
fan-out).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_kafka_records(
    df: DataFrame,
    value: str | Column,
    key: str | Column | None = None,
    topic: str | None = None,
) -> DataFrame:
    """Project a DataFrame onto the kafka connector's record schema:
    ``value`` (required), optional ``key`` and per-row ``topic``, all cast
    to STRING (the connector accepts string or binary; string keeps the
    contract engine-checkable). Complex values should be serialized first
    (``F.to_json(F.struct(...))``)."""
    cols = [F.col(value).cast("string").alias("value") if isinstance(value, str) else value.cast("string").alias("value")]
    if key is not None:
        k = F.col(key) if isinstance(key, str) else key
        cols.append(k.cast("string").alias("key"))
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    return df.select(*cols)


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (32-bit, seed 0x9747b28c) — the default producer
    partitioner's hash, reimplemented from the published algorithm so a
    Spark job can predict broker partition placement without a client lib.
    """
    length = len(data)
    m = 0x5BD1E995
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = ((h * m) & 0xFFFFFFFF) ^ k
        i += 4
    rem = length - i
    if rem == 3:
        h ^= data[i + 2] << 16
    if rem >= 2:
        h ^= data[i + 1] << 8
    if rem >= 1:
        h = ((h ^ data[i]) * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for_key(key: str | bytes, num_partitions: int) -> int:
    """Default-partitioner placement: ``toPositive(murmur2(key)) % n``."""
    data = key.encode() if isinstance(key, str) else key
    return (murmur2(data) & 0x7FFFFFFF) % num_partitions


def repartition_for_kafka(records: DataFrame, num_partitions: int, key_col: str = "key") -> DataFrame:
    """Align Spark partitioning with broker partitioning: compute each
    record's target Kafka partition (murmur2 of the key) and repartition on
    it. All records bound for one broker partition then land in ONE Spark
    task (hash-shuffle on ``_kpart`` keeps equal values together), so each
    broker partition is written by exactly one producer — per-partition
    ordering preserved, no task fans out to every partition. Note the map
    is not one-to-one: Spark hashes ``_kpart`` with murmur3, so several
    broker partitions may share a task (and some tasks stay empty); the
    ordering guarantee is unaffected. The vectorized UDF is one Arrow
    pass; the murmur2 loop is per-key but keys are short."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    @pandas_udf(IntegerType())
    def _part(keys: pd.Series) -> pd.Series:
        return keys.map(lambda k: None if k is None else partition_for_key(k, num_partitions))

    out = records.withColumn("_kpart", _part(F.col(key_col)))
    return out.repartition(num_partitions, "_kpart").drop("_kpart")


def _is_missing_kafka_source(e: Exception) -> bool:
    """True iff the failure is Spark's missing-data-source error for
    format("kafka") — the one case the package-gate message explains."""
    s = str(e)
    return (
        "Failed to find data source: kafka" in s
        or "FAILED_TO_LOAD_DATA_SOURCE" in s
        or "DATA_SOURCE_NOT_FOUND" in s
    )


def kafka_sink(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    value: str = "value",
    key: str | None = None,
):
    """``to_kafka`` streaming analog: checkpointed kafka writer. Gated —
    needs spark-sql-kafka on the classpath (same contract as the reader).
    Delivery guarantees (acks, retries, flush-on-commit) live in the
    connector; the reference's explicit ``flush()`` maps to epoch commit.
    """
    records = to_kafka_records(stream_df, value, key)
    try:
        return (
            records.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    except Exception as e:  # noqa: BLE001 — classify before rewording
        # only the missing-data-source failure is the package gate; a
        # broker/config/analysis error must keep its own message (r11
        # review: everything was rewritten as "package missing",
        # sending operators down the wrong debugging path)
        if _is_missing_kafka_source(e):
            raise RuntimeError(
                "Kafka sink requires the spark-sql-kafka package on the "
                "classpath "
                "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
            ) from e
        raise


def kafka_write(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    value: str = "value",
    key: str | None = None,
) -> None:
    """Batch ``to_kafka``: one producer per task, flushed at task commit.
    Gated like :func:`kafka_sink`."""
    records = to_kafka_records(df, value, key, topic=topic)
    try:
        records.write.format("kafka").option(
            "kafka.bootstrap.servers", bootstrap_servers
        ).save()
    except Exception as e:  # noqa: BLE001 — classify before rewording
        if _is_missing_kafka_source(e):
            raise RuntimeError(
                "Kafka sink requires the spark-sql-kafka package on the "
                "classpath "
                "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
            ) from e
        raise
