from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[8] unless the caller pins SPARK_GRAFT_CPUS (r13, VERDICT r12
    # #2b): the suite runs sf0.001-scale data through 8 shuffle
    # partitions, so a local[*]=32 session pays 32-thread task dispatch
    # and scheduling for nothing - measured 0.6-0.9x wall time per test
    # file at local[8] - and the full-suite runtime had outgrown the
    # external verify window, leaving the suite's green signal dark.
    # Purely test-session sizing: every engine default (get_spark) is
    # unchanged, and an explicit SPARK_GRAFT_CPUS still wins.
    master = None if os.environ.get("SPARK_GRAFT_CPUS") else "local[8]"
    s = get_spark("tests", master=master, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
