from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from prometheus_remote_kinesis_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark
