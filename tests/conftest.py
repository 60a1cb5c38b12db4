from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powersql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("POWERSQL_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="powersql_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
