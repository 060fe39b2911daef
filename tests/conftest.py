from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CSVB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from csvb_spark.session import get_session

    # FAIR matches the production SERVE path (cli._session) — the
    # pgwire concurrency tests exercise per-connection pool fairness,
    # which needs it, and scheduler mode is fixed at JVM start so one
    # shared test session must pick a side. Batch sessions default to
    # FIFO (round-12 A/B: FAIR costs 4-22%/query — session.py); that
    # default is pinned by test_session_scheduler_defaults.
    s = get_session(
        app_name="csvb_spark_tests", shuffle_partitions=8, scheduler_mode="FAIR"
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
