from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("UMT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from uni_mannheim_masters_thesis_spark.session import get_session

    s = get_session("umt_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from oracle_harness import duckdb_connection

    return duckdb_connection(SF_DIR)
