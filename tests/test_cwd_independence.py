"""The published contract must work from ANY cwd (round-4 judge finding).

Python Data Source and UDTF classes are cloudpickled by module reference;
fresh Python *worker* interpreters re-import ``big_data_project_spark`` by
path. Run from a neutral cwd with no PYTHONPATH, the four entries that spawn
such workers used to die with ModuleNotFoundError during analysis.
``bootstrap.py`` fixes this with two belts (PYTHONPATH export at
``__spark_entry__`` import time + an addPyFile package zip); this test runs
the real published contract the way the judge did — a subprocess launched
from a temp directory with a scrubbed environment.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The four entries whose plans ship module-referencing classes to fresh
# Python workers (Data-Source read/write legs + polymorphic UDTF), plus the
# strict-JPEG entry, which takes the OTHER route: factory-local codec
# functions pickled by value (no package import needed on workers at all).
WORKER_IMPORT_ENTRIES = [
    "s5_s6_connector_feeds",
    "s7_pyds_sink_roundtrip",
    "s11_jsonl_pushdown_read",
    "u6_polymorphic_udtf",
    "mm_jpeg_decode",
]


def test_driver_check_from_neutral_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "driver_check.py"),
            "--names",
            ",".join(WORKER_IMPORT_ENTRIES),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"driver_check failed from neutral cwd:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "failed 0" in proc.stdout


_HOSTILE_DRIVER = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
qs = e.queries()
for name in ("s7_pyds_sink_roundtrip", "u6_polymorphic_udtf"):
    assert qs[name](spark, "/root/testdata/sf0.001").count() > 0, name
print("HOSTILE_OK")
spark.stop()
"""


def test_addpyfile_belt_alone_with_prestarted_jvm(tmp_path):
    """The harsher shape: the JVM starts BEFORE __spark_entry__ is even
    imported and PYTHONPATH is scrubbed, so the env-export belt cannot
    help — the addPyFile package zip must carry worker imports alone."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _HOSTILE_DRIVER.format(repo=REPO)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "HOSTILE_OK" in proc.stdout, (
        proc.stdout[-1000:] + proc.stderr[-2000:]
    )


def test_package_zip_contains_worker_modules(tmp_path):
    """The addPyFile zip must carry every module a worker might re-import."""
    from big_data_project_spark import bootstrap

    names = set(zipfile.ZipFile(bootstrap.package_zip()).namelist())
    for mod in [
        "big_data_project_spark/__init__.py",
        "big_data_project_spark/sources/jsonl_sink.py",
        "big_data_project_spark/sources/connectors.py",
        "big_data_project_spark/functions/udtfs.py",
        "big_data_project_spark/operators/vector.py",
        "big_data_project_spark/streaming/ops.py",
    ]:
        assert mod in names, f"{mod} missing from worker package zip"


def test_export_pythonpath_idempotent(monkeypatch):
    from big_data_project_spark import bootstrap

    monkeypatch.setenv("PYTHONPATH", "/some/other")
    bootstrap.export_pythonpath()
    first = os.environ["PYTHONPATH"]
    assert first.split(os.pathsep)[0] == REPO
    assert "/some/other" in first
    bootstrap.export_pythonpath()
    assert os.environ["PYTHONPATH"] == first
