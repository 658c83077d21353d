from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dic_a1_spark.session import get_spark

    s = get_spark(app_name="dic_a1_spark-tests")
    yield s
    s.stop()
