"""Python Data Source WRITER: a task-committed JSON-lines sink.

Completes the engine's coverage of the Spark 4 Python Data Source API —
batch reader + streaming reader live in ``sources/connectors.py``; this is
the WRITE leg (``df.write.format("jsonl_files")``), with the API's
two-phase commit done honestly:

- each TASK writes ``part-<job>-<partitionId>.jsonl.tmp-<uuid>`` and
  returns a commit message naming it — a re-attempted task leaves only
  orphan tmp files, never a visible partial part;
- the DRIVER's ``commit`` renames every staged file to its final
  ``part-<job>-<partitionId>.jsonl`` name only after ALL tasks succeeded
  (rename is atomic per file; a crash mid-commit leaves a prefix of final
  files plus the staged rest — rerunnable, never corrupt);
- ``abort`` deletes the staged files, so a failed job leaves nothing
  visible. Per the pyspark DataSourceWriter contract, FAILED tasks
  contribute ``None`` commit-message slots — both abort legs skip them.

Save-mode semantics (mirroring the built-in file sinks):

- ``mode("append")``: final names carry a job-unique token generated on
  the driver, so a second append can never clobber a previous job's parts.
- ``mode("overwrite")``: the driver-side commit first deletes every
  pre-existing ``part-*.jsonl`` not produced by THIS job, then renames —
  a re-write with fewer partitions cannot leave stale parts behind.

The STREAMING leg names parts ``part-<batchId>-<partitionId>.jsonl``
(batch-scoped, replay-safe); its commit also sweeps same-batch parts from
an earlier failed attempt that the replay did not reproduce (the replayed
micro-batch may have fewer partitions after an AQE / repartition change).

Like every file sink here, the target directory must be on a filesystem
all executors share (local mode / NFS / fused object store). Values are
serialized with the stdlib json encoder; binary columns are not supported
(use write_binary_files / parquet for those).
"""

from __future__ import annotations

import glob
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
    def __init__(self, options, overwrite: bool = False):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("jsonl_files: the path option is required")
        self.overwrite = bool(overwrite)
        # job-unique token minted ONCE on the driver and pickled into every
        # task: append jobs get collision-free final names, and overwrite's
        # commit can tell this job's parts apart from stale ones.
        self.token = uuid.uuid4().hex[:12]

    def write(self, rows):
        from pyspark import TaskContext

        os.makedirs(self.dir, exist_ok=True)
        pid = TaskContext.get().partitionId()
        final = os.path.join(self.dir, f"part-{self.token}-{pid:05d}.jsonl")
        staged = f"{final}.tmp-{uuid.uuid4().hex}"
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged, final, n)

    def commit(self, messages):
        # only reached when EVERY task succeeded; per-file rename is atomic
        if self.overwrite:
            keep = {m.final for m in messages if m is not None}
            for old in glob.glob(os.path.join(self.dir, "part-*.jsonl")):
                if old not in keep:
                    try:
                        os.remove(old)
                    except OSError:
                        pass
        for m in messages:
            if m is None:
                continue
            os.replace(m.staged, m.final)

    def abort(self, messages):
        for m in messages:
            if m is None:
                # a FAILED task's slot (pyspark contract) — nothing staged
                # under a name we know; its tmp file is an orphan by design
                continue
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
    duplicates: exactly-once output files without any log compaction.
    Commit also deletes same-batch finals from an earlier attempt that the
    replay did not reproduce (replay with fewer partitions)."""

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
        prefix = f"part-{int(batchId):08d}-"
        finals = set()
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.dir, f"{prefix}{m.final}.jsonl")
            finals.add(final)
            os.replace(m.staged, final)
        # replay sweep: an earlier FAILED attempt of this batch may have
        # committed parts for partition ids this attempt no longer has
        for old in glob.glob(os.path.join(self.dir, f"{prefix}*.jsonl")):
            if old not in finals:
                try:
                    os.remove(old)
                except OSError:
                    pass

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
        return _JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlFilesDataSource)
