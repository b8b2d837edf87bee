"""Python Data Source WRITER: a task-committed JSON-lines sink.

Completes the engine's coverage of the Spark 4 Python Data Source API —
batch reader + streaming reader live in ``sources/connectors.py``; this is
the WRITE leg (``df.write.format("jsonl_files")``), with the API's
two-phase commit done honestly:

- each TASK writes ``part-<partitionId>.jsonl.tmp-<uuid>`` and returns a
  commit message naming it — a re-attempted task leaves only orphan tmp
  files, never a visible partial part;
- the DRIVER's ``commit`` renames every staged file to its final
  ``part-<partitionId>.jsonl`` name only after ALL tasks succeeded
  (rename is atomic per file; a crash mid-commit leaves a prefix of final
  files plus the staged rest — rerunnable, never corrupt);
- ``abort`` deletes the staged files, so a failed job leaves nothing
  visible.

Like every file sink here, the target directory must be on a filesystem
all executors share (local mode / NFS / fused object store). Values are
serialized with the stdlib json encoder; binary columns are not supported
(use write_binary_files / parquet for those).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str, final: str, n_rows: int):
        self.staged = staged
        self.final = final
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("jsonl_files: the path option is required")

    def write(self, rows):
        from pyspark import TaskContext

        os.makedirs(self.dir, exist_ok=True)
        pid = TaskContext.get().partitionId()
        final = os.path.join(self.dir, f"part-{pid:05d}.jsonl")
        staged = f"{final}.tmp-{uuid.uuid4().hex}"
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged, final, n)

    def commit(self, messages):
        # only reached when EVERY task succeeded; per-file rename is atomic
        for m in messages:
            os.replace(m.staged, m.final)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.staged)
            except OSError:
                pass


class _JsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING leg of the sink: per micro-batch, tasks stage files and
    ``commit(messages, batchId)`` renames them to
    ``part-<batchId>-<partitionId>.jsonl`` — batch-scoped names, so a
    REPLAYED micro-batch (failure before the checkpoint advanced)
    re-stages and renames onto the SAME final names instead of appending
    duplicates: exactly-once output files without any log compaction."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("jsonl_files stream: the path option is required")

    def write(self, iterator):
        from pyspark import TaskContext

        os.makedirs(self.dir, exist_ok=True)
        pid = TaskContext.get().partitionId()
        # final name is completed at commit time when batchId is known
        staged = os.path.join(
            self.dir, f"stage-{uuid.uuid4().hex}-p{pid:05d}.jsonl.tmp"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for r in iterator:
                fh.write(json.dumps(r.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged, f"p{pid:05d}", n)

    def commit(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            final = os.path.join(
                self.dir, f"part-{int(batchId):08d}-{m.final}.jsonl"
            )
            os.replace(m.staged, final)

    def abort(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.staged)
            except OSError:
                pass


class JsonlFilesDataSource(DataSource):
    """``df.write.format("jsonl_files").option("path", dir).mode("append")``
    — and ``df.writeStream.format("jsonl_files")`` for the streaming leg."""

    @classmethod
    def name(cls):
        return "jsonl_files"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlFilesDataSource)
