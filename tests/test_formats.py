"""Source/sink format breadth: parquet, orc, csv, json round-trips must be
value-identical for a representative typed frame (strings incl. quoting
hazards, longs, doubles)."""

from __future__ import annotations

import pytest

from dic_a1_spark.sources.readers import load_table, write_read_format
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_roundtrip(spark, fmt, tmp_path):
    src = (
        load_table(spark, SF_SMOKE, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .limit(200)
    )
    out = str(tmp_path / fmt)
    back = write_read_format(src, out, fmt, schema=src.schema)
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b, f"{fmt} round-trip altered values"
