"""Custom source via the Python DataSource API (Spark 4): the
extension seam for systems with no built-in connector (the reference
hard-codes one source, MySQL, at ``mysql_operations.py:25-27``; this
is the general answer).

`SyntheticLogDataSource` is a deterministic changelog generator used
as the reference implementation + test fixture: N shards × M rows,
content a pure function of (shard, seq), so reads are reproducible
across runs/partitionings — the property a replayable source needs.

Scale notes: `partitions()` returns one InputPartition per shard, so
Spark schedules each shard as an independent task (the same mechanism
a real connector uses to map splits/segments/tablets to tasks);
`read()` is a generator — rows stream out in Arrow batches without
materializing a shard in memory. Options are validated up front:
misconfiguration fails at planning time, not mid-job.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "shard int, seq bigint, event_ts_offset_s bigint, payload string"


def _payload(shard: int, seq: int) -> str:
    return hashlib.md5(f"{shard}:{seq}".encode()).hexdigest()[:12]


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, rows: int):
        self.shard = shard
        self.rows = rows


class SyntheticLogReader(DataSourceReader):
    def __init__(self, options: dict):
        try:
            self.shards = int(options.get("shards", "4"))
            self.rows_per_shard = int(options.get("rows_per_shard", "1000"))
        except ValueError as exc:
            raise ValueError(f"synthlog options must be integers: {exc}") from exc
        if self.shards <= 0 or self.rows_per_shard < 0:
            raise ValueError("synthlog requires shards > 0 and rows_per_shard >= 0")

    def partitions(self) -> list[InputPartition]:
        return [_ShardPartition(i, self.rows_per_shard) for i in range(self.shards)]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        shard = partition.shard
        for seq in range(partition.rows):
            # 10 s cadence per shard, deterministic content
            yield (shard, seq, seq * 10, _payload(shard, seq))


class SyntheticLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthlog"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticLogReader:
        return SyntheticLogReader(dict(self.options))

    def simpleStreamReader(self, schema):
        # defined below; same deterministic log exposed as a stream
        return SyntheticLogStreamReader(dict(self.options))


def register(spark) -> None:
    """Idempotent registration: `spark.read.format('synthlog')`."""
    spark.dataSource.register(SyntheticLogDataSource)


# ----------------------------------------------------- streaming side ----

try:  # SimpleDataSourceStreamReader: Spark 4 streaming extension seam
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older Spark
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]


class SyntheticLogStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same deterministic log:
    each micro-batch advances a single monotonic `seq` offset by
    `batch_rows` (capped at `max_rows`), emitting every shard's row for
    each seq — so the stream's cumulative output is a prefix of the
    batch read's output, which is what the exactly-once test asserts.

    The offset protocol (initialOffset / read(start) → (rows, next) /
    readBetweenOffsets for replay-after-failure) is the whole point:
    Spark checkpoints these offsets, giving a custom Python source the
    same resume semantics a Kafka source has. `readBetweenOffsets` must
    be a pure function of the offset range — it re-derives rows
    deterministically rather than replaying captured state."""

    def __init__(self, options: dict):
        self.shards = int(options.get("shards", "4"))
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.max_rows = int(options.get("max_rows", "1000"))
        if self.shards <= 0 or self.batch_rows <= 0 or self.max_rows < 0:
            raise ValueError("synthlog stream requires positive sizing options")

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _rows(self, start_seq: int, end_seq: int) -> list[tuple]:
        # materialized list, not a generator: the simple-reader protocol
        # pickles the batch into the checkpoint for prefetch/replay
        return [
            (shard, seq, seq * 10, _payload(shard, seq))
            for seq in range(start_seq, end_seq)
            for shard in range(self.shards)
        ]

    def read(self, start: dict):
        start_seq = int(start["seq"])
        end_seq = min(start_seq + self.batch_rows, self.max_rows)
        return self._rows(start_seq, end_seq), {"seq": end_seq}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["seq"]), int(end["seq"]))
