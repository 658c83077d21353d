from __future__ import annotations

import pytest

from dic_a1_spark.operators import textstats
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(textstats.QUERIES))
def test_textstats_oracle(spark, name):
    compare(spark, textstats.ORACLES[name], textstats.QUERIES[name], SF_CORRECT, name)
