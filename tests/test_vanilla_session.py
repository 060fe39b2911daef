"""Regression: the grading driver builds its OWN vanilla SparkSession
(no csvb_spark.session builder confs) and calls ``__spark_entry__``.

Round 1 failure mode: events.parquet stores ts as parquet
TIMESTAMP(NANOS); a session without
``spark.sql.legacy.parquet.nanosAsLong=true`` crashes with
PARQUET_TYPE_ILLEGAL inside ``register_views`` before any query runs —
43/50 driver correctness entries went red. The fix sets the conf at
runtime inside ``sources/catalog.py::_read`` (and ``register_all``).

A vanilla session cannot be simulated in-process (the test fixture's
builder bakes the conf into the SparkContext's SparkConf, so even
``newSession()``/``conf.unset`` inherit it), so this test spawns a
fresh interpreter + JVM. It is the slowest test in the suite and the
single most load-bearing one.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("CSVB_TEST_SF_DIR", "/root/testdata/sf0.001")

# Runs in a fresh interpreter: vanilla local[2] session, zero repo confs
# at build time — exactly the driver's harness shape. q33 (events SQL
# path) and p15 (events DataFrame path) both read the NANOS column.
_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true", \
    "test precondition broken: session is not vanilla"

import __spark_entry__ as e

qs = e.queries()
for name in ("q33_time_bucket", "p15_sessionization"):
    rows = qs[name](spark, {sf_dir!r}).collect()
    assert rows, f"{{name}} returned no rows on a vanilla session"
    print(f"OK {{name}} rows={{len(rows)}}")
spark.stop()
"""


@pytest.mark.slow
def test_vanilla_driver_session_reads_events_parquet():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/tmp",  # cwd != repo: also catches sys.path-dependent worker bugs
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "OK q33_time_bucket" in proc.stdout
    assert "OK p15_sessionization" in proc.stdout
