from __future__ import annotations

import os

import pytest

from forgottenlandapp_etl_spark.session import build_session

# Small SF for unit tests; the driver's gate runs sf0.01 and bench sf0.1.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="forgottenlandapp-etl-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
