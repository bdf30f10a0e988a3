from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from bloom_spark.session import get_session

    s = get_session(
        app_name="bloom-spark-tests", master="local[8]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    return "/root/testdata/sf0.01"
