"""WebDataset tar shards as a first-class Spark data source.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets a
format plug into the planner properly — ``spark.read.format(
"webdataset").load(dir)`` — instead of every caller hand-composing
the binaryFile + mapInPandas pipeline (`operators/training_prep.py::
read_webdataset`, which remains the no-registration route). What the
API buys over the hand-composed form:

  * **partition planning is explicit**: one InputPartition per .tar
    shard, planned driver-side from directory metadata only (no blob
    is read at plan time), so a 10 000-shard corpus fans out to
    10 000 tasks with per-task archive locality — the exact task
    granularity WebDataset's writer sized the shards for,
  * **schema is declared once** by the source, not re-typed per call,
  * the reader **streams members** through ``tarfile`` member-at-a-
    time per task — peak memory is one member, not one shard.

The member schema matches ``read_webdataset`` (WebDataset convention:
sample key = basename before the first dot, extension names the
modality) plus the raw payload, so downstream decode UDFs can consume
either route interchangeably.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_SCHEMA = (
    "shard string, member_name string, key string, ext string, "
    "n_bytes long, payload binary"
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetDataSource(DataSource):
    """``spark.read.format("webdataset").load("/path/to/shards")``.

    Options:
      * ``path`` — directory containing ``*.tar`` shards (or a single
        shard file).
    """

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "WebDatasetReader":
        return WebDatasetReader(self.options)

    def streamReader(self, schema) -> "WebDatasetStreamReader":
        return WebDatasetStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "WebDatasetBatchWriter":
        return WebDatasetBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "WebDatasetStreamWriter":
        return WebDatasetStreamWriter(self.options)


class WebDatasetReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires a path")
        self._path = path

    def partitions(self):
        # driver-side METADATA listing only: shard paths, never bytes.
        if os.path.isdir(self._path):
            shards = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if f.endswith(".tar")
            )
        else:
            shards = [self._path]
        if not shards:
            raise ValueError(f"no .tar shards under {self._path}")
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition):
        # executor-side: stream ONE archive member-at-a-time. tarfile
        # in "r:" mode seeks through the file; memory is one member.
        import tarfile

        shard = os.path.basename(partition.path)
        with tarfile.open(partition.path, mode="r:") as tf:
            for ti in tf:
                if not ti.isfile():
                    continue
                f = tf.extractfile(ti)
                data = f.read() if f is not None else b""
                base = os.path.basename(ti.name)
                key, _, ext = base.partition(".")
                yield (shard, ti.name, key, ext, len(data), data)


class WebDatasetStreamReader(DataSourceStreamReader):
    """Micro-batch reader over an APPEND-ONLY shard directory.

    Offset model: shards are planned in sorted-name order and the
    offset is ``{"n": <count of shards already processed>}`` — valid
    because a WebDataset landing zone is append-only with
    monotonically named shards (the writer's `shard-%06d.tar`
    contract; a renamed or deleted old shard would violate the
    landing-zone contract, not this reader). That makes the offset a
    total order, replay between two offsets deterministic, and the
    checkpoint tiny — exactly the properties Structured Streaming
    needs for end-to-end exactly-once into an idempotent sink.

    Each micro-batch fans out one InputPartition per NEW shard; the
    member streaming is the batch reader's code path.
    """

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset stream requires a path")
        self._path = path

    def _shards(self):
        if not os.path.isdir(self._path):
            return []
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".tar")
        )

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._shards())}

    def partitions(self, start: dict, end: dict):
        new = self._shards()[start["n"] : end["n"]]
        # an empty batch still needs >=1 (empty) partition in some
        # planner paths; Spark handles [] fine for microbatches, so
        # return the real list.
        return [_ShardPartition(p) for p in new]

    def read(self, partition: _ShardPartition):
        return WebDatasetReader({"path": partition.path}).read(partition)

    def commit(self, end: dict) -> None:
        # offsets are directory positions; nothing external to clean up
        pass


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_path: str
    partition_id: int
    n_members: int


def _write_members_tar(rows, tmp_dir: str, partition_id: int) -> _ShardCommit:
    """Executor-side: drain one partition's (key, ext, payload) rows
    into a deterministic USTAR blob staged under a temp name; the
    driver-side commit renames it to its final shard name. Members
    sort by (key, ext) so a shard's bytes are a pure function of its
    row set regardless of upstream ordering."""
    from ..operators.training_prep import build_tar

    members = sorted(
        ((f"{r['key']}.{r['ext']}", bytes(r["payload"])) for r in rows),
        key=lambda m: m[0],
    )
    os.makedirs(tmp_dir, exist_ok=True)
    tmp = os.path.join(tmp_dir, f"_staging-p{partition_id:05d}.tar")
    with open(tmp, "wb") as f:
        f.write(build_tar(members))
    return _ShardCommit(tmp_path=tmp, partition_id=partition_id, n_members=len(members))


class WebDatasetBatchWriter(DataSourceWriter):
    """``df.write.format("webdataset").mode(...).save(dir)`` — one
    shard per partition, staged-then-renamed so a failed job leaves no
    partial shard visible (the temp-stage + driver-commit pattern every
    atomic committer uses; on object stores the rename becomes a
    copy-commit, same protocol)."""

    def __init__(self, options, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("webdataset writer requires a path")
        self._overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        return _write_members_tar(iterator, self._path, pid)

    def commit(self, messages):
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self._path, f"part-{m.partition_id:05d}.tar")
            os.replace(m.tmp_path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class WebDatasetStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("webdataset")`` — each micro-batch's
    partitions land as ``shard-b<batch>-p<partition>.tar``. The final
    name embeds the batch id and the rename happens at COMMIT time, so
    a replayed micro-batch (failure before commit) overwrites its own
    shards instead of duplicating them — idempotent exactly-once on
    top of the checkpointed source offsets, the same contract the
    repo's foreachBatch parquet sinks test."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("webdataset stream writer requires a path")

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        return _write_members_tar(iterator, self._path, pid)

    def commit(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            final = os.path.join(
                self._path, f"shard-b{batchId:06d}-p{m.partition_id:05d}.tar"
            )
            os.replace(m.tmp_path, final)

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
