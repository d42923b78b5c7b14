from __future__ import annotations

import pytest

from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    s.sparkContext.setLogLevel("WARN")
    yield s
