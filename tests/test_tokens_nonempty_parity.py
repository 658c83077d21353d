"""Pin the round-6 review fix: `functions.text.tokens_nonempty` must
produce the IDENTICAL token array as `config.duckdb_tokens_sql` on texts
with edge separators — exactly the inputs where raw `tokenize()` forks
the engines (trailing '' tokens in Spark, absent in DuckDB)."""

from __future__ import annotations

import duckdb

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokenize, tokens_nonempty

ADVERSARIAL = [
    "hello world.",          # trailing separator -> trailing '' in raw split
    ".leading dot",
    "..both ends..",
    "",                      # empty text
    "   ",                   # whitespace only
    "...",                   # separators only
    "a..b...c",              # internal runs
    "tab\tand\nnewline ",
    "mixed. CASE, Words!",
    "unicode space　ideographic.",
    "price $5.99 (50%) #1",
    "one",
]


def test_tokens_nonempty_matches_duckdb_tokenizer(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(ADVERSARIAL)], "i int, text string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_nonempty(F.col("text")).alias("toks")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(ADVERSARIAL)))
    want = {
        i: toks
        for i, toks in con.execute(
            f"SELECT i, {duckdb_tokens_sql('text')} FROM t"
        ).fetchall()
    }
    con.close()

    assert got == want


def test_raw_tokenize_really_does_fork(spark):
    """Document WHY tokens_nonempty exists: raw tokenize keeps ''-tokens
    on edge-separator text. If this ever stops failing, the split regex
    changed and tokens_nonempty may be droppable."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("hello world.",)], "text string")
    raw = df.select(tokenize(F.col("text")).alias("t")).collect()[0]["t"]
    filtered = df.select(tokens_nonempty(F.col("text")).alias("t")).collect()[0]["t"]
    assert raw == ["hello", "world", ""]
    assert filtered == ["hello", "world"]
