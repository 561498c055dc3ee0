"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`):
a deterministic synthetic event generator with BOTH a batch and a
streaming reader — the connector surface for sources Spark has no
built-in reader for (internal APIs, proprietary formats, test-data
generators), implemented Spark-first:

- the DRIVER plans only ranges (InputPartition carries two ints);
  every row is generated executor-side from its global index, so the
  source scales to any size with zero driver memory and no shuffle;
- the streaming reader's offset is the global row index — a retried
  or restarted micro-batch regenerates byte-identical rows for the
  same offset range (the generator is a pure function of the index),
  which makes checkpoint replay exactly-once BY CONSTRUCTION, with no
  sink-side dedup needed;
- row and partition counts are options, so the same source serves
  unit tests (100 rows, 2 partitions) and soak tests (10⁹ rows, 512
  partitions).

Usage:
    spark.dataSource.register(EventGenDataSource)
    spark.read.format("eventgen").option("rows", 1000).load()
    spark.readStream.format("eventgen").option("maxRows", 1000).load()
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)
_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _mix(i: int, seed: int) -> int:
    """Deterministic 64-bit mix of the global row index — the ONLY
    source of randomness, so any (start, end) slice regenerates
    identically on any executor, any retry, any restart."""
    x = (i + seed) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _gen(lo: int, hi: int, seed: int):
    for i in range(lo, hi):
        h = _mix(i, seed)
        yield (
            i,
            _EPOCH + timedelta(seconds=i * 3 + (h & 0x3)),
            h % 1000,
            _TYPES[(h >> 8) % len(_TYPES)],
            round(((h >> 16) % 100_000) / 100.0, 2),
        )


def _gen_arrow(lo: int, hi: int, seed: int):
    """Arrow fast path: emit one RecordBatch per partition instead of
    per-row tuples — the Python-source analogue of whole-stage Arrow
    transfer (tuples serialize row-at-a-time through the Python
    worker; a RecordBatch crosses in one columnar block).  Values are
    IDENTICAL to the tuple generator — both derive from _mix."""
    import pyarrow as pa

    rows = list(_gen(lo, hi, seed))
    if not rows:
        return
    cols = list(zip(*rows))
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(cols[0], pa.int64()),
            pa.array(cols[1], pa.timestamp("us", tz="UTC")),
            pa.array(cols[2], pa.int64()),
            pa.array(cols[3], pa.string()),
            pa.array(cols[4], pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


def _split(lo: int, hi: int, n: int) -> list[_Range]:
    total = hi - lo
    n = max(1, min(n, total)) if total else 1
    step = total // n
    extra = total % n
    out, cur = [], lo
    for p in range(n):
        w = step + (1 if p < extra else 0)
        out.append(_Range(cur, cur + w))
        cur += w
    return out


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return _split(0, self.rows, self.n_parts)

    def read(self, partition: _Range):
        return _gen_arrow(partition.lo, partition.hi, self.seed)


class _StreamReader(DataSourceStreamReader):
    """Bounded deterministic replay: every trigger exposes ALL not-yet-
    committed rows up to ``maxRows`` (the offset protocol never tells
    ``latestOffset`` the committed position, so a stepwise per-trigger
    counter could report an end BEHIND the checkpointed start after a
    restart — a constant high-water mark is the restart-safe design;
    micro-batch chunking, when a test needs it, comes from the
    file-replay harness instead).  Offsets are pure row indexes and
    rows are a pure function of the index, so checkpoint replay is
    exactly-once by construction."""

    def __init__(self, options):
        self.max_rows = int(options.get("maxRows", 0))
        if self.max_rows <= 0:
            raise ValueError(
                "eventgen streaming requires maxRows > 0 — it replays a "
                "bounded deterministic dataset"
            )
        self.n_parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": self.max_rows}

    def partitions(self, start, end):
        return _split(start["index"], end["index"], self.n_parts)

    def read(self, partition: _Range):
        return _gen_arrow(partition.lo, partition.hi, self.seed)

    def commit(self, end):
        pass


class EventGenDataSource(DataSource):
    """format("eventgen") — options: rows (batch) / maxRows (stream) /
    numPartitions / seed."""

    @classmethod
    def name(cls):
        return "eventgen"

    def schema(self):
        return _SCHEMA

    def reader(self, schema: StructType):
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType):
        return _StreamReader(self.options)
