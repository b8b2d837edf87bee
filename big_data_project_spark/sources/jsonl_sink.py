"""Python Data Source: a task-committed JSON-lines sink + a
filter-pushdown READER for the files it writes.

Completes the engine's coverage of the Spark 4 Python Data Source API —
batch reader + streaming reader for the feed formats live in
``sources/connectors.py``; this module carries the WRITE legs
(``df.write.format("jsonl_files")`` and the streaming twin) with the
API's two-phase commit done honestly, plus the 4.1 ``pushFilters`` READ
leg (predicates evaluated at the source, unsupported ones handed back —
see ``_JsonlReader``). Write-leg protocol:

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
- ``mode("overwrite")``: the driver-side commit renames THIS job's parts
  in first, then deletes every pre-existing ``part-*.jsonl`` it did not
  produce — a re-write with fewer partitions cannot leave stale parts
  behind, and a crash mid-commit leaves old+new mixed (rerunnable), never
  an emptied directory.

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
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
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
        # only reached when EVERY task succeeded; per-file rename is atomic.
        # Order matters for overwrite: RENAME the new parts first, sweep
        # the old ones after (the streaming leg's order) — a crash
        # mid-commit then leaves old+new mixed (rerunnable), never an
        # empty directory with the previous dataset already destroyed.
        keep = {m.final for m in messages if m is not None}
        for m in messages:
            if m is None:
                continue
            os.replace(m.staged, m.final)
        if self.overwrite:
            for old in glob.glob(os.path.join(self.dir, "part-*.jsonl")):
                if old not in keep:
                    try:
                        os.remove(old)
                    except OSError:
                        pass

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


class _JsonlFilePartition(InputPartition):
    """One part file + the filters pushed by the scan build that planned
    it. Filters are snapshotted here (not read from the mutable reader at
    execution time) so a scan keeps the exact predicates it was planned
    with — see the scan-reuse note in ``_JsonlReader``."""

    def __init__(self, path: str, filters: tuple = ()):
        self.path = path
        self.filters = filters


def _compile_filter(f):
    """One pushed Filter → a predicate over the parsed record dict, or
    None when this source cannot evaluate it (Spark then re-applies it
    above the scan — returning it from pushFilters is the contract).
    SQL semantics: a comparison with NULL is NOT a match (only IsNull /
    EqualNullSafe see NULLs)."""
    def col_of(flt):
        attr = flt.attribute
        return attr[0] if len(attr) == 1 else None

    if isinstance(f, Not):
        inner = _compile_filter(f.child)
        # NULL semantics survive negation: NOT(NULL-compare) is also no-match,
        # so only negate when the inner value is non-null
        if inner is None or not isinstance(
            f.child,
            (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
             LessThanOrEqual, In, StringStartsWith, StringEndsWith,
             StringContains),
        ):
            return None
        # x NOT IN (v, NULL) is NULL (no match) for every x not in the
        # list — "keep non-matching rows" would be wrong. Unsupported:
        # Spark re-applies it above the scan with full 3-value logic.
        if isinstance(f.child, In) and any(v is None for v in f.child.value):
            return None
        c = col_of(f.child)
        return lambda r: r.get(c) is not None and not inner(r)
    c = col_of(f)
    if c is None:
        return None
    if isinstance(f, IsNull):
        return lambda r: r.get(c) is None
    if isinstance(f, IsNotNull):
        return lambda r: r.get(c) is not None
    if isinstance(f, EqualNullSafe):
        v = f.value
        return lambda r: r.get(c) == v
    simple = {
        EqualTo: lambda x, v: x == v,
        GreaterThan: lambda x, v: x > v,
        GreaterThanOrEqual: lambda x, v: x >= v,
        LessThan: lambda x, v: x < v,
        LessThanOrEqual: lambda x, v: x <= v,
        StringStartsWith: lambda x, v: isinstance(x, str) and x.startswith(v),
        StringEndsWith: lambda x, v: isinstance(x, str) and x.endswith(v),
        StringContains: lambda x, v: isinstance(x, str) and v in x,
    }
    for cls, op in simple.items():
        if isinstance(f, cls):
            v = f.value
            return lambda r, op=op, v=v: (
                r.get(c) is not None and op(r.get(c), v)
            )
    if isinstance(f, In):
        # A NULL in the positive list can never match (x = NULL is NULL),
        # so dropping it is exact; the Not(In)-with-NULL case is rejected
        # above before reaching here.
        vals = {v for v in f.value if v is not None}
        return lambda r: r.get(c) is not None and r.get(c) in vals
    return None


class _JsonlReader(DataSourceReader):
    """READ leg with REAL filter pushdown (Spark 4.1 ``pushFilters``):
    supported predicates are evaluated AT THE SOURCE, per line, before a
    row ever crosses into Spark — the same contract a parquet scan's
    PushedFilters gives — and unsupported ones are handed back for Spark
    to re-apply above the scan, so mixing supported and unsupported
    predicates stays correct. One partition per part file.

    The schema is caller-provided (JSON lines carry no footer); values
    are coerced to it leniently (junk → NULL, read_json parity).
    Timestamps round-trip as strings (the writer serializes with
    ``default=str``) — cast downstream.

    UPSTREAM SHARP EDGE (Spark 4.1, pinned in
    ``test_jsonl_pushdown_scan_reuse_quirk``): Spark caches the most
    recently planned scan of a pushdown-capable Python source inside the
    shared relation JVM-side, and a LATER FILTERLESS query on the SAME
    DataFrame object reuses it — still filtered. Confirmed not fixable
    from this side: instrumenting ``reader()``/``pushFilters``/
    ``partitions()`` shows NONE of them re-run for the filterless
    re-query (they execute in a plan-time Python worker whose output the
    JVM caches with the scan), so no Python hook exists to reset or fail
    loudly at reuse time. Partitions still snapshot their own filter list
    (``_JsonlFilePartition.filters``) so reader-side mutable state can
    never be the cause. Queries that carry their own filters re-plan
    correctly. Until fixed upstream, call ``load()`` per logical query
    (cheap: planning only) when mixing filtered and unfiltered reads of
    one DataFrame object."""

    def __init__(self, options, schema):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("jsonl_files read: the path option is required")
        self.schema = schema
        self.pushed = []

    def pushFilters(self, filters):
        # RESET, not append: the reader object is created once per loaded
        # DataFrame and every new scan build calls pushFilters again —
        # accumulating would leak one query's filters into the next
        # (observed: an unfiltered count() after a filtered collect())
        self.pushed = []
        unsupported = []
        for f in filters:
            if _compile_filter(f) is None:
                unsupported.append(f)
            else:
                self.pushed.append(f)
        return unsupported

    def partitions(self):
        paths = sorted(glob.glob(os.path.join(self.dir, "part-*.jsonl")))
        if not paths:
            raise FileNotFoundError(
                f"jsonl_files read: no part-*.jsonl under {self.dir}"
            )
        # Snapshot the filters of THIS scan build into the partitions and
        # reset: a later scan build that skips pushFilters (filterless
        # query) must not inherit the previous query's predicates.
        parts = [_JsonlFilePartition(p, tuple(self.pushed)) for p in paths]
        self.pushed = []
        return parts

    def read(self, partition):
        preds = [_compile_filter(f) for f in partition.filters]
        fields = [(f.name, f.dataType.simpleString()) for f in self.schema.fields]

        def conv(value, typ):
            if value is None:
                return None
            try:
                if typ in ("bigint", "int", "smallint", "tinyint", "long"):
                    return int(value)
                if typ in ("double", "float"):
                    return float(value)
                if typ == "boolean":
                    # Spark's JSON reader only accepts JSON true/false for
                    # boolean columns; anything else is NULL — bool("x")
                    # would silently turn junk into True
                    return value if isinstance(value, bool) else None
                if typ == "string":
                    return value if isinstance(value, str) else str(value)
            except (TypeError, ValueError):
                return None
            return value

        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                typed = {n: conv(rec.get(n), t) for n, t in fields}
                if all(p(typed) for p in preds):
                    yield tuple(typed[n] for n, _ in fields)


class JsonlFilesDataSource(DataSource):
    """``df.write.format("jsonl_files").option("path", dir).mode("append")``,
    ``df.writeStream.format("jsonl_files")`` for the streaming write leg,
    and ``spark.read.format("jsonl_files").schema(ddl).option("path", dir)``
    for the READ leg (filter-pushdown capable; schema required — JSON
    lines carry no footer)."""

    @classmethod
    def name(cls):
        return "jsonl_files"

    def reader(self, schema):
        return _JsonlReader(self.options, schema)

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    # the 4.1 Python-source pushdown surface ships flag-gated; a reader
    # implementing pushFilters() with the flag off is a hard error, so
    # registration enables it (runtime-settable conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlFilesDataSource)
