"""Sink/reader symmetry: the stage-1-style JSON-KV sink must be readable
by the goldens reader (the same format the reference's stage 2 re-parses),
and the counters line must round-trip through its formatter/parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from dic_a1_spark.operators.goldens import read_wordcount_kv
from dic_a1_spark.sources.sinks import (
    format_counters_line,
    parse_counters_line,
    write_json_kv,
    write_raw_text,
)


def test_json_kv_sink_roundtrips_through_goldens_reader(spark, tmp_path):
    rows = [
        ("alpha", {"Book": 3, "Baby": 1}),
        (">", {"Electronic": 2}),           # the reference's '>' survivor
        ('quo"te', {"Book": 1}),            # embedded quote -> JSON escaping
        ("naïve", {"CDs_and_Vinyl": 5}),    # non-ASCII -> \\uXXXX escapes
    ]
    df = spark.createDataFrame(
        [(w, *[d.get(c, 0) for c in ("Book", "Baby", "Electronic", "CDs_and_Vinyl")])
         for w, d in rows],
        ["word", "Book", "Baby", "Electronic", "CDs_and_Vinyl"],
    )
    out = str(tmp_path / "kv")
    write_json_kv(df, "word", ["Book", "Baby", "Electronic", "CDs_and_Vinyl"], out)

    back = read_wordcount_kv(spark, out + "/part-*")
    got = {
        (r["word"], r["category"]): r["n"]
        for r in back.where(F.col("n") > 0).collect()
    }
    want = {(w, c): n for w, d in rows for c, n in d.items()}
    assert got == want


def test_raw_text_sink_single_file(spark, tmp_path):
    df = spark.createDataFrame([("line1",), ("line2",)], ["value"])
    out = str(tmp_path / "raw")
    write_raw_text(df, out)
    import glob

    parts = glob.glob(out + "/part-*")
    assert len(parts) == 1
    assert sorted(open(parts[0]).read().splitlines()) == ["line1", "line2"]


def test_counters_line_roundtrip():
    line = format_counters_line(78828876, {"Book": 22507155, "Baby": 915446})
    total, cats = parse_counters_line(line)
    assert total == 78828876
    assert cats == {"Book": 22507155, "Baby": 915446}
    # and it parses the reference's real artifact format (single-quoted repr)
    ref_line = "10 {'A': 4, 'B': 6}"
    assert parse_counters_line(ref_line) == (10, {"A": 4, "B": 6})
