"""Pluggable persistence-backend surface (reference A15 fidelity).

The reference exposes an ABC with save/load of an opaque state blob and
four backends — File, Kafka ("last message of the snapshot topic wins",
drain3/kafka_persistence.py:26-34), Redis (SET/GET one key,
drain3/redis_persistence.py:10-34), and in-memory
(drain3/memory_buffer_persistence.py:8-16).

Here state is relational (drain3_spark.state.store.CheckpointStore owns
the cluster-table protocol); these backends cover the same "where does
the latest snapshot blob live" choice for deployments that want the
reference's blob semantics (e.g. shipping the collected cluster rows as
JSON to Redis for a low-latency online matcher).  Kafka/Redis clients
are absent in this sandbox, so those backends raise ImportError lazily.
"""

from __future__ import annotations

import abc
import os
from typing import Optional


class StateBackend(abc.ABC):
    """Opaque snapshot blob store (reference drain3/persistence_handler.py:7-15)."""

    @abc.abstractmethod
    def save_state(self, state: bytes) -> None: ...

    @abc.abstractmethod
    def load_state(self) -> Optional[bytes]: ...


class FileBackend(StateBackend):
    """Single-file snapshot (reference drain3/file_persistence.py:10-21)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def save_state(self, state: bytes) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(state)
        os.replace(tmp, self.path)

    def load_state(self) -> Optional[bytes]:
        if not os.path.exists(self.path):
            return None
        with open(self.path, "rb") as f:
            return f.read()


class MemoryBackend(StateBackend):
    """In-process buffer (reference drain3/memory_buffer_persistence.py:8-16)."""

    def __init__(self) -> None:
        self._buf: Optional[bytes] = None

    def save_state(self, state: bytes) -> None:
        self._buf = state

    def load_state(self) -> Optional[bytes]:
        return self._buf


class KafkaBackend(StateBackend):
    """Latest-message-of-topic snapshot (reference drain3/kafka_persistence.py:10-39).

    Client factories are injectable so the last-message-wins protocol is
    testable without a broker; the defaults require ``kafka-python``
    (absent in this sandbox)."""

    def __init__(self, topic: str,
                 producer_factory=None, consumer_factory=None,
                 **kafka_kwargs) -> None:
        if producer_factory is None or consumer_factory is None:
            try:
                import kafka  # noqa: F401
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError("KafkaBackend requires kafka-python "
                                  "(or injected client factories)") from e
        self.topic = topic
        self.kafka_kwargs = kafka_kwargs
        self._producer_factory = producer_factory
        self._consumer_factory = consumer_factory

    def _producer(self):
        if self._producer_factory is not None:
            return self._producer_factory(**self.kafka_kwargs)
        from kafka import KafkaProducer  # pragma: no cover
        return KafkaProducer(**self.kafka_kwargs)  # pragma: no cover

    def _consumer(self):
        if self._consumer_factory is not None:
            return self._consumer_factory(**self.kafka_kwargs)
        from kafka import KafkaConsumer  # pragma: no cover
        return KafkaConsumer(**self.kafka_kwargs)  # pragma: no cover

    @staticmethod
    def _tp(topic):
        try:
            from kafka import TopicPartition
        except ImportError:
            return (topic, 0)  # fake clients accept the plain tuple
        return TopicPartition(topic, 0)  # pragma: no cover

    def save_state(self, state: bytes) -> None:
        producer = self._producer()
        producer.send(self.topic, state)
        producer.flush()

    def load_state(self) -> Optional[bytes]:
        consumer = self._consumer()
        tp = self._tp(self.topic)
        consumer.assign([tp])
        end = consumer.end_offsets([tp])[tp]
        if end == 0:
            return None
        consumer.seek(tp, end - 1)  # last message wins
        for record in consumer:
            return record.value
        return None


class RedisBackend(StateBackend):
    """One SET/GET key (reference drain3/redis_persistence.py:10-34).

    ``client`` is injectable for broker-less testing; the default
    requires ``redis`` (absent in this sandbox)."""

    def __init__(self, key: str, client=None, **redis_kwargs) -> None:
        if client is None:
            try:
                import redis  # noqa: F401
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError("RedisBackend requires redis "
                                  "(or an injected client)") from e
        self.key = key
        self.redis_kwargs = redis_kwargs
        self._client = client

    def _redis(self):
        if self._client is not None:
            return self._client
        import redis  # pragma: no cover
        return redis.Redis(**self.redis_kwargs)  # pragma: no cover

    def save_state(self, state: bytes) -> None:
        self._redis().set(self.key, state)

    def load_state(self) -> Optional[bytes]:
        return self._redis().get(self.key)


def snapshot_blob(cluster_rows, counter: int, compress: bool = True) -> bytes:
    """Serialize the relational state as the reference's blob shape
    (JSON + zlib + base64; drain3/template_miner.py:112-122)."""
    import base64
    import json
    import zlib
    raw = json.dumps({"counter": counter,
                      "clusters": [list(r) for r in cluster_rows]}).encode()
    return base64.b64encode(zlib.compress(raw)) if compress else raw


def load_snapshot_blob(blob: bytes, compressed: bool = True):
    import base64
    import json
    import zlib
    raw = zlib.decompress(base64.b64decode(blob)) if compressed else blob
    obj = json.loads(raw)
    return [tuple(r) for r in obj["clusters"]], int(obj["counter"])
