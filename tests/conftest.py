from __future__ import annotations

import pytest

from cdp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdp_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
