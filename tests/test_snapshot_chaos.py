"""Chaos tests for the versioned snapshot store (VERDICT r4 item 7).

Round 4 added optimistic commit retry + vacuum TTL with single-process
tests; these run the real thing: N OS processes — each its own JVM —
racing commits into ONE store, then assert a linearizable version history
with no lost snapshots. The local-fs rename-nests hazard the round-4
docstring disclosed is now closed by an O_CREAT|O_EXCL claim marker
(``maintenance._claim_version``); the unit test pins that primitive and
the vacuum tests pin that a mid-commit writer's young stage/claim can
never be vacuumed from under it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRITER_SCRIPT = """
import json, sys
sys.path.insert(0, {repo!r})
from big_data_project_spark.session import get_spark
from big_data_project_spark.operators import maintenance as mt

writer, path, n_commits = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"chaos-writer-{{writer}}", cpus="2",
                  shuffle_partitions=2)
got = []
for seq in range(n_commits):
    df = spark.createDataFrame([(writer, seq)], "writer string, seq int")
    got.append(mt.write_snapshot(df, path))
print("RESULT " + json.dumps({{"writer": writer, "versions": got}}))
spark.stop()
"""


def test_concurrent_writers_linearizable_history(spark, tmp_path):
    """3 processes × 3 commits into one store: every commit must land in
    its own version, versions must be the contiguous range 1..9, and each
    (writer, seq) payload must be readable exactly once — no nesting, no
    overwrites, no lost snapshots."""
    from big_data_project_spark.operators import maintenance as mt

    path = str(tmp_path / "store")
    n_writers, n_commits = 3, 3
    script = _WRITER_SCRIPT.format(repo=REPO)
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, f"w{i}", path, str(n_commits)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(n_writers)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"writer failed:\n{err[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    all_versions = [v for r in results for v in r["versions"]]
    total = n_writers * n_commits
    assert sorted(all_versions) == list(range(1, total + 1)), all_versions
    assert mt.snapshot_versions(spark, path) == list(range(1, total + 1))

    seen = {}
    for v in range(1, total + 1):
        rows = mt.read_snapshot(spark, path, v).collect()
        assert len(rows) == 1, f"v={v} holds {len(rows)} rows (nested commit?)"
        key = (rows[0].writer, rows[0].seq)
        assert key not in seen, f"payload {key} appears in v={v} and v={seen[key]}"
        seen[key] = v
    assert len(seen) == total  # every commit's payload survived exactly once


def test_claim_version_is_exclusive_on_local_fs(spark, tmp_path):
    """The O_CREAT|O_EXCL claim: first claimant wins, second loses — the
    primitive that makes the local-fs version race safe."""
    from big_data_project_spark.operators import maintenance as mt

    path = str(tmp_path / "store")
    os.makedirs(path)
    fs, _, jvm = mt._fs(spark, path)
    assert mt._claim_version(fs, jvm, path, 7) is True
    assert mt._claim_version(fs, jvm, path, 7) is False
    assert mt._claim_version(fs, jvm, path, 8) is True


def test_vacuum_never_deletes_young_stage_or_inflight_claim(spark, tmp_path):
    """vacuum racing a slow committer: a YOUNG __stage_* dir and ANY
    young claim must survive. Even a committed version's claim is kept
    until the TTL — an in-flight writer whose exists(v=N) check pre-dated
    that commit would otherwise re-claim the freed marker and nest its
    rename into the existing v=N (round-5 review finding)."""
    from big_data_project_spark.operators import maintenance as mt

    path = str(tmp_path / "store")
    df = spark.createDataFrame([(1,)], "k long")
    for _ in range(4):
        mt.write_snapshot(df, path)

    os.makedirs(path + "/__stage_inflight")
    with open(path + "/__stage_inflight/part-0", "w") as fh:
        fh.write("x")
    with open(path + "/__claim_5", "w"):  # in-flight, v=5 not yet renamed
        pass
    with open(path + "/__claim_3", "w"):  # leftover from committed v=3
        pass

    dropped = mt.vacuum_snapshots(spark, path, keep_last=2, stage_ttl_seconds=3600)
    assert dropped == [1, 2]
    assert os.path.isdir(path + "/__stage_inflight"), "young stage vacuumed!"
    assert os.path.exists(path + "/__claim_5"), "in-flight claim vacuumed!"
    assert os.path.exists(path + "/__claim_3"), (
        "young committed-version claim vacuumed — reopens the re-claim race"
    )

    # past the TTL the dead writer's leftovers go too
    dropped = mt.vacuum_snapshots(spark, path, keep_last=2, stage_ttl_seconds=0)
    assert dropped == []
    assert not os.path.exists(path + "/__stage_inflight")
    assert not os.path.exists(path + "/__claim_5")

    # the store still works after all that
    assert mt.write_snapshot(df, path) >= 5
