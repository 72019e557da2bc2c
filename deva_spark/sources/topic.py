"""Cross-process topic connector (Redis Streams parity).

Reference surface: ``RedisStream``/``Topic``/``NT``
(`/root/reference/deva/core/sources.py:767-999`,
`/root/reference/deva/endpoints.py:160-210`) — XADD with approximate
``maxlen`` trim, XREAD from a last-seen id, consumer-side retries; topics
are the reference's cross-process pub/sub workflow.

Spark-native shape: a small broker interface with two implementations —

* :class:`RedisTopicBroker` — real Redis Streams via redis-py, gated
  behind an import (no broker in this container);
* :class:`FileTopicBroker` — a durable spool-directory broker with the
  SAME id/read/trim contract. One file per entry with a sortable id, so
  producers in ANY process can XADD while a Structured Streaming file
  source (or an XREAD poll) consumes — cross-process like Redis, zero
  dependencies.

Producers publish from executors via ``foreachPartition`` (the broker
handle is constructed per partition from picklable config). Consumers are
either a streaming file source over the topic directory (scales with
Spark's file-source batching) or an explicit :func:`read_topic` batch
XREAD.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class FileTopicBroker:
    """Spool-dir broker with Redis-Stream semantics: XADD appends one
    atomically-renamed file per entry under ``root/topic/``; ids are
    zero-padded nanosecond timestamps (+pid+uuid for uniqueness) so
    lexicographic file order IS arrival order; ``maxlen`` trims oldest
    entries, approximate like Redis' ``~`` trim (trim runs on the producer
    that exceeds the cap)."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, topic: str) -> str:
        d = os.path.join(self.root, topic)
        os.makedirs(d, exist_ok=True)
        return d

    def xadd(self, topic: str, value: str, max_len: int | None = 100) -> str:
        d = self._dir(topic)
        entry_id = f"{time.time_ns():020d}-{os.getpid():08d}-{uuid.uuid4().hex[:8]}"
        tmp = os.path.join(d, f".{entry_id}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"id": entry_id, "value": value}, f)
        os.rename(tmp, os.path.join(d, f"{entry_id}.json"))  # atomic publish
        if max_len is not None:
            self.trim(topic, max_len)
        return entry_id

    def xread(self, topic: str, last_id: str = "", count: int | None = None) -> list[tuple[str, str]]:
        d = self._dir(topic)
        names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
        out: list[tuple[str, str]] = []
        for n in names:
            entry_id = n[: -len(".json")]
            if entry_id <= last_id:
                continue
            try:
                with open(os.path.join(d, n), encoding="utf-8") as f:
                    rec = json.load(f)
            except FileNotFoundError:  # trimmed concurrently
                continue
            out.append((entry_id, rec["value"]))
            if count is not None and len(out) >= count:
                break
        return out

    def trim(self, topic: str, max_len: int) -> int:
        d = self._dir(topic)
        names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
        dropped = 0
        for n in names[: max(0, len(names) - max_len)]:
            try:
                os.remove(os.path.join(d, n))
                dropped += 1
            except FileNotFoundError:
                pass
        return dropped

    def stream(self, spark: SparkSession, topic: str) -> DataFrame:
        """Structured Streaming consumer: file source tailing the topic dir
        (id + value columns), the NT live-consumer path."""
        d = self._dir(topic)
        return spark.readStream.schema("id string, value string").json(d)


class RedisTopicBroker:
    """Real Redis Streams broker (gated: redis-py is not bundled here).
    Same contract as :class:`FileTopicBroker`; connection config is
    picklable, the client connects lazily per process."""

    def __init__(self, host: str = "localhost", port: int = 6379, db: int = 0, password: str | None = None):
        self.host, self.port, self.db, self.password = host, port, db, password
        self._client = None

    def _redis(self):
        if self._client is None:
            try:
                import redis  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "RedisTopicBroker requires the redis package "
                    "(pip install redis); use FileTopicBroker offline"
                ) from e
            self._client = redis.Redis(
                host=self.host, port=self.port, db=self.db, password=self.password
            )
        return self._client

    def xadd(self, topic: str, value: str, max_len: int | None = 100) -> str:
        kwargs = {"maxlen": max_len, "approximate": True} if max_len else {}
        return self._redis().xadd(topic, {"data": value}, **kwargs).decode()

    def xread(self, topic: str, last_id: str = "0-0", count: int | None = None) -> list[tuple[str, str]]:
        res = self._redis().xread({topic: last_id or "0-0"}, count=count)
        out = []
        for _stream, messages in res:
            for msg_id, fields in messages:
                out.append((msg_id.decode(), fields[b"data"].decode()))
        return out

    def trim(self, topic: str, max_len: int) -> int:
        return self._redis().xtrim(topic, maxlen=max_len, approximate=True)

    def __getstate__(self):  # executor pickling: drop the live connection
        state = dict(self.__dict__)
        state["_client"] = None
        return state


def topic_sink(
    stream_df: DataFrame,
    broker_factory: Callable[[], object],
    topic: str,
    value_col: str = "value",
    max_len: int | None = 100,
    available_now: bool = False,
):
    """``to_redis`` analog: each micro-batch row XADDs from the executors
    (``foreachPartition``) — at-least-once, trimmed to ``max_len``.
    ``broker_factory`` is a picklable zero-arg constructor so each
    partition builds its own broker handle (no shared driver connection).
    """

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        def _part(rows) -> None:
            broker = broker_factory()
            for row in rows:
                broker.xadd(topic, str(row[value_col]), max_len=max_len)

        bdf.select(value_col).foreachPartition(_part)

    w = stream_df.writeStream.foreachBatch(_sink)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def publish(df: DataFrame, broker_factory: Callable[[], object], topic: str, value_col: str = "value", max_len: int | None = 100) -> None:
    """Batch publish: XADD every row from the executors."""

    def _part(rows) -> None:
        broker = broker_factory()
        for row in rows:
            broker.xadd(topic, str(row[value_col]), max_len=max_len)

    df.select(value_col).foreachPartition(_part)


def read_topic(spark: SparkSession, broker, topic: str, last_id: str = "", count: int | None = None) -> DataFrame:
    """Batch XREAD → DataFrame(id, value). For continuous consumption use
    ``FileTopicBroker.stream`` (file source) or re-call with the max id
    seen (the reference's ``_last_id`` cursor)."""
    rows = broker.xread(topic, last_id=last_id, count=count)
    return spark.createDataFrame(rows or [], "id string, value string")
