from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("UMT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The suite invokes kernel_svm_sweep from several tests; keep the
# session-shared prep bundle across them (the bench's retime convention)
# instead of paying the release-by-default rebuild per invocation. The
# release-path test monkeypatches this off for its own scope.
os.environ.setdefault("SPARK_GRAFT_SWEEP_PREP_KEEP", "1")


@pytest.fixture(scope="session")
def spark():
    from uni_mannheim_masters_thesis_spark.session import get_session

    s = get_session("umt_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from oracle_harness import duckdb_connection

    return duckdb_connection(SF_DIR)
