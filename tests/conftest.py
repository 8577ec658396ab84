from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from distributedqueryengine_spark.session import get_spark, register_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return register_tables(spark, SF_DIR)
