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


class JsonlFilesDataSource(DataSource):
    """``df.write.format("jsonl_files").option("path", dir).mode("append")``."""

    @classmethod
    def name(cls):
        return "jsonl_files"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlFilesDataSource)
