"""Custom Python DataSource WRITER (batch + streaming): an audit sink
that demonstrates the v2 two-phase commit protocol end to end.

Each write task folds its partition into a constant-size
``WriterCommitMessage`` (row count, key sum, an order-independent
XOR-of-CRC32 content checksum); the DRIVER's ``commit`` aggregates the
messages and atomically publishes ONE manifest (write-temp + rename).
``abort`` publishes a tombstone instead.  This is the
write-audit-publish pattern reduced to its commit skeleton:

- executors never publish anything — a task that retries just
  re-produces its message, and a task that fails leaves no trace;
- the manifest appears atomically and only on success, so a reader
  polling the path can never observe a half-committed result;
- the STREAMING writer keys the manifest by batch_id
  (``commit(messages, batchId)``) — re-running a micro-batch after a
  crash overwrites its own manifest with identical content, making the
  sink exactly-once under foreachBatch-style at-least-once delivery.

At 100 TB the per-task state is still three integers: the audit cost
is one streaming pass over rows already in memory, zero shuffle, and
a driver-side reduce over #tasks messages.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartStats(WriterCommitMessage):
    n: int
    key_sum: int
    checksum: int


def _fold(iterator) -> _PartStats:
    n = key_sum = checksum = 0
    for row in iterator:
        n += 1
        first = row[0]
        if isinstance(first, int):
            key_sum += first
        checksum ^= zlib.crc32(repr(tuple(row)).encode())
    return _PartStats(n=n, key_sum=key_sum, checksum=checksum)


def _publish(path: str, name: str, payload: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(path, name))  # atomic publish


def _aggregate(messages) -> dict:
    out = {"n": 0, "key_sum": 0, "checksum": 0, "tasks": 0}
    for m in messages:
        if m is None:
            continue
        out["n"] += m.n
        out["key_sum"] += m.key_sum
        out["checksum"] ^= m.checksum
        out["tasks"] += 1
    return out


class _BatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _fold(iterator)

    def commit(self, messages):
        _publish(self.path, "manifest.json", _aggregate(messages))

    def abort(self, messages):
        _publish(self.path, "aborted.json", {"aborted": True})


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _fold(iterator)

    def commit(self, messages, batchId: int):
        _publish(
            self.path,
            f"batch-{batchId}.json",
            {"batch_id": batchId, **_aggregate(messages)},
        )

    def abort(self, messages, batchId: int):
        _publish(
            self.path,
            f"batch-{batchId}.aborted.json",
            {"batch_id": batchId, "aborted": True},
        )


class AuditSinkDataSource(DataSource):
    """format("auditsink") — option: path (manifest directory)."""

    @classmethod
    def name(cls):
        return "auditsink"

    def schema(self):
        return "ignored string"  # writers accept the incoming schema

    def writer(self, schema, overwrite: bool):
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _StreamWriter(self.options)
