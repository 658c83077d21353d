from __future__ import annotations

import pytest

from dic_a1_spark.operators import events
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_oracle(spark, name):
    compare(spark, events.ORACLES[name], events.QUERIES[name], SF_CORRECT, name)
