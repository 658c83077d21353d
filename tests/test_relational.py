from __future__ import annotations

import pytest

from dic_a1_spark.operators import relational
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, name):
    compare(spark, relational.ORACLES[name], relational.QUERIES[name], SF_CORRECT, name)
