from __future__ import annotations

import pytest

from dic_a1_spark.operators import relational
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, name):
    compare(spark, relational.ORACLES[name], relational.QUERIES[name], SF_CORRECT, name)


def test_set_except_distinct_semantics(spark):
    """EXCEPT must remove a key present on both sides regardless of
    multiplicities. exceptAll().distinct() would keep 'a' here (left
    multiplicity 3 > right 1); subtract() must not."""
    left = spark.createDataFrame([("a",), ("a",), ("a",), ("b",)], ["custkey"])
    right = spark.createDataFrame([("a",), ("c",)], ["custkey"])
    got = sorted(r.custkey for r in left.subtract(right).collect())
    assert got == ["b"]
    # and the bag-difference form really is different on this fixture,
    # so the fixture actually discriminates the two semantics
    bag = sorted(r.custkey for r in left.exceptAll(right).distinct().collect())
    assert bag == ["a", "b"]


def test_set_except_oracle_sf01(spark):
    """The sf0.01 driver row was vacuous (both sides 0 rows); sf0.1 is where
    the exceptAll().distinct() bug diverged (2 vs 0 rows). Pin it at sf0.1."""
    import os

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 testdata not present")
    compare(
        spark,
        relational.ORACLES["set_except"],
        relational.QUERIES["set_except"],
        sf_dir,
        "set_except@sf0.1",
    )
