"""WebDataset tar shards as a first-class Spark data source.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets a
format plug into the planner properly — ``spark.read.format(
"webdataset").load(dir)`` — instead of every caller hand-composing
the binaryFile + mapInPandas pipeline (`operators/training_prep.py::
read_webdataset`, which remains the no-registration route AND the
object-store route: binaryFile reads bytes through Hadoop's
FileSystem, so it works on s3a://-style paths where this source's
member-streaming ``tarfile.open`` needs a locally-mounted file). What
the API buys over the hand-composed form:

  * **partition planning is explicit**: one InputPartition per .tar
    shard, planned driver-side from directory metadata only (no blob
    is read at plan time), so a 10 000-shard corpus fans out to
    10 000 tasks with per-task archive locality — the exact task
    granularity WebDataset's writer sized the shards for,
  * **schema is declared once** by the source, not re-typed per call,
  * the reader **streams members** through ``tarfile`` member-at-a-
    time per task — peak memory is one member, not one shard.

Directory metadata (listing) and the commit protocol (rename/delete)
go through ``shard_fs.fs_for`` — local ``os`` calls for plain paths,
Hadoop ``FileSystem`` via the driver JVM for URI paths — so the
driver-side planning and commit work against any Hadoop-connector
path. The *staging byte write* is executor-side Python and therefore
local-filesystem-bound (Python workers have no JVM gateway); writers
reject non-``file:`` URI targets explicitly rather than corrupting
them.

Commit protocol: executors stage to ``<dir>/.staging/`` under a
task-attempt-unique name (retries and speculative attempts never
collide), the driver renames to committed names (``part-*.tar`` /
``shard-b*-p*.tar``) at commit. Readers list only non-hidden
``*.tar`` directly under the directory, so in-flight or orphaned
staging shards are never visible as data and the stream reader's
sorted-count offset model only ever sees committed names.

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

from .shard_fs import fs_for, has_uri_scheme, strip_file_scheme

_SCHEMA = (
    "shard string, member_name string, key string, ext string, "
    "n_bytes long, payload binary"
)

_STAGING_DIR = ".staging"


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _require_local(path: str, what: str) -> str:
    """Writers/readers that open bytes with Python need a local path;
    ``file:`` URIs are normalized, other schemes rejected with the
    supported alternative named."""
    if has_uri_scheme(path) and not path.startswith("file:"):
        raise ValueError(
            f"webdataset {what} opens archive bytes with local Python IO; "
            f"for object-store paths like {path!r} use the binaryFile-based "
            "operators.training_prep.read_webdataset / write via a "
            "foreachBatch committer instead"
        )
    return strip_file_scheme(path)


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
        # list_tars filters hidden (., _) names, so staging shards and
        # committer metadata are never planned as data.
        fs = fs_for(self._path)
        if fs.is_dir(self._path):
            shards = [fs.join(self._path, f) for f in fs.list_tars(self._path)]
        else:
            shards = [self._path]
        if not shards:
            raise ValueError(f"no .tar shards under {self._path}")
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition):
        # executor-side: stream ONE archive member-at-a-time. tarfile
        # in "r:" mode seeks through the file; memory is one member.
        import tarfile

        local = _require_local(partition.path, "reader")
        shard = os.path.basename(local)
        with tarfile.open(local, mode="r:") as tf:
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
    Hidden-name filtering in ``list_tars`` keeps in-flight staging
    shards out of the count, so the offset only ever advances over
    committed shards.

    Each micro-batch fans out one InputPartition per NEW shard; the
    member streaming is the batch reader's code path.
    """

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset stream requires a path")
        self._path = path

    def _shards(self):
        fs = fs_for(self._path)
        return [fs.join(self._path, f) for f in fs.list_tars(self._path)]

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


def _write_members_tar(rows, out_dir: str, partition_id: int) -> _ShardCommit:
    """Executor-side: drain one partition's (key, ext, payload) rows
    into a deterministic USTAR blob staged under
    ``<dir>/.staging/p<pid>-a<taskAttempt>.tar``; the driver-side
    commit renames it to its final shard name. The attempt id in the
    name means a retried or speculative task never clobbers another
    attempt's in-flight file, and the hidden ``.staging`` dir keeps
    every reader (batch and stream) blind to uncommitted bytes.
    Members sort by (key, ext) so a shard's bytes are a pure function
    of its row set regardless of upstream ordering."""
    from pyspark import TaskContext

    from ..operators.training_prep import build_tar

    attempt = TaskContext.get().taskAttemptId()
    members = sorted(
        ((f"{r['key']}.{r['ext']}", bytes(r["payload"])) for r in rows),
        key=lambda m: m[0],
    )
    staging = os.path.join(out_dir, _STAGING_DIR)
    os.makedirs(staging, exist_ok=True)
    tmp = os.path.join(staging, f"p{partition_id:05d}-a{attempt}.tar")
    with open(tmp, "wb") as f:
        f.write(build_tar(members))
    return _ShardCommit(tmp_path=tmp, partition_id=partition_id, n_members=len(members))


class WebDatasetBatchWriter(DataSourceWriter):
    """``df.write.format("webdataset").mode(...).save(dir)`` — one
    shard per partition, staged under ``.staging/`` then renamed so a
    failed job leaves no partial shard visible (the temp-stage +
    driver-commit pattern every atomic committer uses). In overwrite
    mode the commit also deletes every previously-committed ``*.tar``
    this job did not write, so a re-run with fewer partitions cannot
    leave stale shards mixed into the corpus."""

    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset writer requires a path")
        self._path = _require_local(path, "writer")
        self._overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        return _write_members_tar(iterator, self._path, pid)

    def commit(self, messages):
        fs = fs_for(self._path)
        written = set()
        for m in messages:
            if m is None:
                continue
            final_name = f"part-{m.partition_id:05d}.tar"
            fs.rename_over(m.tmp_path, fs.join(self._path, final_name))
            written.add(final_name)
        if self._overwrite:
            for stale in fs.list_tars(self._path):
                if stale not in written:
                    fs.delete(fs.join(self._path, stale))
        # drop the staging dir: committed files are out, anything left
        # is an orphan from a failed/speculative attempt.
        fs.delete(fs.join(self._path, _STAGING_DIR))

    def abort(self, messages):
        fs = fs_for(self._path)
        fs.delete(fs.join(self._path, _STAGING_DIR))


class WebDatasetStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("webdataset")`` — each micro-batch's
    partitions land as ``shard-b<batch>-p<partition>.tar``. The final
    name embeds the batch id and the rename happens at COMMIT time, so
    a replayed micro-batch (failure before commit) overwrites its own
    shards instead of duplicating them — idempotent exactly-once on
    top of the checkpointed source offsets, the same contract the
    repo's foreachBatch parquet sinks test. Staging files live in the
    hidden ``.staging`` dir with attempt-unique names and the dir is
    cleared at each commit — safe because micro-batch commits are
    serialized (batch N commits before batch N+1's tasks write)."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset stream writer requires a path")
        self._path = _require_local(path, "stream writer")

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        return _write_members_tar(iterator, self._path, pid)

    def commit(self, messages, batchId):
        fs = fs_for(self._path)
        for m in messages:
            if m is None:
                continue
            final = fs.join(
                self._path, f"shard-b{batchId:06d}-p{m.partition_id:05d}.tar"
            )
            fs.rename_over(m.tmp_path, final)
        fs.delete(fs.join(self._path, _STAGING_DIR))

    def abort(self, messages, batchId):
        fs = fs_for(self._path)
        fs.delete(fs.join(self._path, _STAGING_DIR))
