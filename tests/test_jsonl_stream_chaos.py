"""Chaos test for the streaming jsonl sink's replay discipline
(VERDICT r5 next-round #8).

The batch sink has in-process failure injection; the streaming leg's
exactly-once claim rests on batch-scoped final names plus the commit-time
replay sweep. This runs the real failure: a separate OS process drives a
file-source → jsonl_files streaming query, the test SIGKILLs the whole
process group mid-run (after at least one micro-batch has committed), a
second process resumes from the SAME checkpoint, and the read-back must
contain every input row exactly once — batches whose sink commit ran but
whose checkpoint offset never advanced are replayed onto the same
batch-scoped names (os.replace, no duplicates), and the killed attempt's
staging litter stays invisible to readers.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STREAM_SCRIPT = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from big_data_project_spark.sources import register_jsonl_sink

in_dir, out_dir, ck = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("jsonl-stream-chaos")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
register_jsonl_sink(spark)

@F.udf("long")
def slow(x):
    time.sleep(0.004)  # widen the mid-batch window the parent kills into
    return x

q = (
    spark.readStream.schema("id long")
    .option("maxFilesPerTrigger", "1")
    .json(in_dir)
    .select(slow("id").alias("id"))
    .writeStream.format("jsonl_files")
    .option("path", out_dir)
    .option("checkpointLocation", ck)
    .start()
)
q.processAllAvailable()
q.stop()
print("DRAINED")
spark.stop()
"""


def _launch(in_dir, out_dir, ck):
    return subprocess.Popen(
        [sys.executable, "-c", _STREAM_SCRIPT.format(repo=REPO), in_dir, out_dir, ck],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=dict(os.environ, PYTHONPATH=REPO),
        start_new_session=True,  # own process group: killpg nukes JVM+workers
        text=True,
    )


def test_driver_kill_mid_stream_replays_exactly_once(tmp_path):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    ck = str(tmp_path / "ck")
    in_dir.mkdir()
    want_ids = set()
    for k in range(6):  # 6 files -> 6 micro-batches (maxFilesPerTrigger=1)
        ids = range(k * 100, k * 100 + 80)
        want_ids.update(ids)
        with open(in_dir / f"f{k}.json", "w") as fh:
            for i in ids:
                fh.write(json.dumps({"id": i}) + "\n")

    # attempt 1: kill the WHOLE process group once >=1 batch committed
    # (finals exist) but the stream is still mid-run
    p1 = _launch(str(in_dir), str(out_dir), ck)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if p1.poll() is not None:  # finished before we could kill: rare
                break
            finals = (
                [f for f in os.listdir(out_dir) if f.endswith(".jsonl")]
                if out_dir.is_dir()
                else []
            )
            if finals:
                break
            time.sleep(0.05)
        assert out_dir.is_dir() and any(
            f.endswith(".jsonl") for f in os.listdir(out_dir)
        ), "stream never committed a first batch"
        killed = p1.poll() is None
        if killed:
            os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
        p1.wait(timeout=60)
    finally:
        if p1.poll() is None:  # belt: never leak the process group
            os.killpg(os.getpgid(p1.pid), signal.SIGKILL)

    # attempt 2: resume from the same checkpoint, drain to completion
    p2 = _launch(str(in_dir), str(out_dir), ck)
    try:
        out, _ = p2.communicate(timeout=300)
    finally:
        if p2.poll() is None:
            os.killpg(os.getpgid(p2.pid), signal.SIGKILL)
    assert p2.returncode == 0 and "DRAINED" in out

    # exactly-once: every input id appears in the visible finals EXACTLY
    # once — no duplicate from a replayed-but-already-committed batch, no
    # hole from a killed one; torn staging files stay invisible
    got = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".jsonl"):
            assert f.endswith(".tmp"), f  # only staging litter may remain
            continue
        with open(out_dir / f) as fh:
            for line in fh:
                got.append(json.loads(line)["id"])  # every line parses
    assert len(got) == len(set(got)), "duplicate rows after replay"
    assert set(got) == want_ids, (
        f"missing={sorted(want_ids - set(got))[:5]} "
        f"extra={sorted(set(got) - want_ids)[:5]}"
    )
