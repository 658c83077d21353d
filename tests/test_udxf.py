from __future__ import annotations

import pytest

from dic_a1_spark.operators import udxf
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(udxf.ORACLES))
def test_udxf_oracle(spark, name):
    compare(spark, udxf.ORACLES[name], udxf.QUERIES[name], SF_CORRECT, name)
