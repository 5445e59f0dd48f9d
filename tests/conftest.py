"""Shared fixtures: one SparkSession per test session, fixture dirs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from datapipelines_python_spark.session import get_spark

    return get_spark(app_name="tests", shuffle_partitions=8)


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)
