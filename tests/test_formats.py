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


def test_python_datasource_matches_native_reviews_reader(spark, tmp_path):
    """The Spark-4 Python DataSource twin must produce exactly the rows
    of readers.read_reviews_json (category/reviewText with defaults,
    malformed lines skipped) — including across byte-range split
    boundaries (split_bytes is forced tiny so several splits cover the
    fixture and the straddling-line discipline is exercised)."""
    import json
    import random

    from dic_a1_spark.sources import pyds
    from dic_a1_spark.sources.readers import read_reviews_json

    rng = random.Random(99)
    lines = []
    for i in range(300):
        rec = {"reviewText": f"text {i} " + "x" * rng.randint(0, 120)}
        if i % 5:
            rec["category"] = f"cat{i % 7}"
        if i % 31 == 0:
            rec.pop("reviewText")
        lines.append(json.dumps(rec))
        if i % 13 == 0:
            lines.append('{"category": "oops", broken')
        if i % 41 == 0:
            lines.append('[1, 2, 3]')  # valid JSON, not a record
    # the probed edge shapes (see pyds module docstring): null-only
    # defaults, explicit empty strings, non-string values kept as their
    # canonical JSON text
    lines += [
        '{"category": "", "reviewText": "empty cat stays empty"}',
        '{"category": null, "reviewText": "null cat defaults"}',
        '{"category": 123, "reviewText": 456}',
        '{"category": ["a","b"], "reviewText": true}',
        '{"category": "ok", "reviewText": ""}',
    ]
    path = tmp_path / "reviews.json"
    path.write_text("\n".join(lines) + "\n")

    pyds.register(spark)
    got_df = (
        spark.read.format("reviews_jsonl")
        .option("path", str(path))
        .option("split_bytes", 512)
        .load()
    )
    # several splits actually in play
    assert got_df.rdd.getNumPartitions() > 3
    got = sorted(
        (r["category"], r["reviewText"]) for r in got_df.collect()
    )
    want = sorted(
        (r["category"], r["reviewText"])
        for r in read_reviews_json(spark, str(path))
        .select("category", "reviewText")
        .collect()
    )
    assert got == want and len(got) > 250
