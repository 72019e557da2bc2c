"""Live-broker integration tests (VERDICT r5 #5): the Kafka and Redis
paths are contract-tested elsewhere (murmur2 partitioner parity,
XADD/XREAD semantics via FileTopicBroker), but an end-to-end round-trip
needs a real broker. These run only where one exists:

- ``pytest -m integration`` with ``DEVA_KAFKA_BOOTSTRAP=<host:port>`` set
  and the spark-sql-kafka package on the classpath exercises
  ``kafka_write`` -> batch ``kafka`` read-back.
- A reachable Redis (``DEVA_REDIS_HOST``/``DEVA_REDIS_PORT``, default
  localhost:6379) plus the ``redis`` package exercises
  ``RedisTopicBroker`` xadd/xread/trim and ``publish``/``read_topic``.

Without brokers every test here SKIPS, so the default suite stays green
in this container (neither the packages nor the brokers are bundled).
"""

from __future__ import annotations

import os
import uuid

import pytest

from deva_spark.sources import kafka as dk
from deva_spark.sources.topic import RedisTopicBroker, publish, read_topic

pytestmark = pytest.mark.integration


def _redis_available():
    host = os.environ.get("DEVA_REDIS_HOST", "localhost")
    port = int(os.environ.get("DEVA_REDIS_PORT", "6379"))
    try:
        import redis  # noqa: PLC0415
    except ImportError:
        return None
    try:
        client = redis.Redis(host=host, port=port, socket_connect_timeout=1)
        client.ping()
    except Exception:  # noqa: BLE001 — any connect failure means "absent"
        return None
    return host, port


_REDIS = _redis_available()
_KAFKA = os.environ.get("DEVA_KAFKA_BOOTSTRAP")


@pytest.mark.skipif(_REDIS is None, reason="no reachable Redis (set DEVA_REDIS_HOST)")
def test_redis_topic_roundtrip(spark):
    host, port = _REDIS
    broker = RedisTopicBroker(host=host, port=port)
    topic = f"deva-it-{uuid.uuid4().hex[:8]}"
    for i in range(5):
        broker.xadd(topic, f"msg-{i}", max_len=100)
    got = broker.xread(topic)
    assert [v for _id, v in got] == [f"msg-{i}" for i in range(5)]
    # cursor semantics: resume strictly after the 3rd id
    tail = broker.xread(topic, last_id=got[2][0])
    assert [v for _id, v in tail] == ["msg-3", "msg-4"]
    broker.trim(topic, max_len=2)


@pytest.mark.skipif(_REDIS is None, reason="no reachable Redis (set DEVA_REDIS_HOST)")
def test_redis_publish_from_executors(spark):
    host, port = _REDIS
    topic = f"deva-it-{uuid.uuid4().hex[:8]}"
    df = spark.range(10).selectExpr("CAST(id AS STRING) AS value")
    publish(df, lambda: RedisTopicBroker(host=host, port=port), topic, max_len=1000)
    out = read_topic(spark, RedisTopicBroker(host=host, port=port), topic)
    assert sorted(r.value for r in out.collect()) == sorted(str(i) for i in range(10))


@pytest.mark.skipif(_KAFKA is None, reason="no Kafka (set DEVA_KAFKA_BOOTSTRAP)")
def test_kafka_batch_roundtrip(spark):
    topic = f"deva-it-{uuid.uuid4().hex[:8]}"
    df = spark.range(20).selectExpr(
        "CAST(id AS STRING) AS value", "CAST(id % 4 AS STRING) AS key"
    )
    dk.kafka_write(df, _KAFKA, topic, value="value", key="key")
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", _KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")
    )
    rows = back.collect()
    assert sorted(r.value for r in rows) == sorted(str(i) for i in range(20))
    # every value rode with the key the producer computed from it
    assert all(r.key == str(int(r.value) % 4) for r in rows)
