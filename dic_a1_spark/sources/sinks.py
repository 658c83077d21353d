"""Sinks and side-channel formats.

Reference mapping (SURVEY.md §2.1):
  S5 JSON text sink   -> write_json_kv (stage-1 ``"word"\\t{...}`` part files)
  S6 raw text sink    -> write_raw_text (stage-2 ``category\\tstr(dict)``)
  S7 counters sink    -> format_counters_line / parse_counters_line — the
                         reference persists ``"<total> <python-dict-repr>"``
                         (src/wordCountWrapper.py:49-50, format example
                         src/data/counters.txt:1); in-engine this is a tiny
                         driver-side collect of an exact DataFrame aggregate
                         (never an accumulator: task retries double-count).
"""

from __future__ import annotations

import ast

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_raw_text(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Write a one-string-column DataFrame as raw text lines.

    ``single_file=True`` mirrors the reference's single-reducer funnel
    (src/chiSquaredJob.py:108 keys everything to None) — only sane because
    the funneled data is tiny (23 lines in the reference); for large sinks
    pass False and keep parallel part files.
    """
    cols = df.columns
    if len(cols) != 1:
        raise ValueError(f"raw text sink expects exactly one column, got {cols}")
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def write_json_kv(df: DataFrame, key: str, value_cols: list[str], path: str) -> None:
    """Stage-1-style sink: ``json(key)\\tjson({values})`` lines, parallel
    part files (reference stage 1 wrote 32 parts; format re-parsed by
    operators.goldens.read_wordcount_kv — round-trip tested).

    to_json can't encode a bare STRING, so the key is encoded via a
    one-element array with the brackets stripped — this preserves JSON
    escaping (quotes, non-ASCII) exactly as json.dumps does."""
    arr_json = F.to_json(F.array(F.col(key)))
    key_json = arr_json.substr(F.lit(2), F.length(arr_json) - F.lit(2))
    line = F.concat_ws(
        "\t",
        key_json,
        F.to_json(F.struct(*[F.col(c) for c in value_cols])),
    ).alias("value")
    df.select(line).write.mode("overwrite").text(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (``col=value/`` directories).

    The 100 TB ingest pattern: partition on the dominant pruning dimension
    (date, category, language) so downstream filters skip whole directories
    — the scan's PartitionFilters, verified in tests/test_scale.py. Don't
    over-partition: each partition should hold >= one full parquet
    row-group (~128 MB), or small-file overhead dominates."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table.

    Pre-shuffles ONCE at write time: rows are hash-distributed into
    ``n_buckets`` files on ``bucket_cols``. Two tables bucketed the same
    way join with ZERO exchanges (verified in tests/test_scale.py) — the
    scale answer for repeated fact-fact joins on the same key, where
    re-shuffling 100 TB per query would dominate. ``sort_cols`` adds
    within-bucket ordering so the join can also skip its sort."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def format_counters_line(total: int, per_category: dict[str, int]) -> str:
    """Render the reference's counters.txt line: ``<int> <dict-repr>`` with
    single-quoted keys (src/data/counters.txt:1)."""
    return f"{total} {per_category!r}"


def parse_counters_line(line: str) -> tuple[int, dict[str, int]]:
    """Parse a counters.txt line. The reference repairs quotes with a
    ``.replace(\"'\", '\"')`` hack before json.loads
    (src/chiSquaredJob.py:57); ``ast.literal_eval`` handles the Python dict
    repr directly and safely."""
    total_str, dict_str = line.strip().split(" ", 1)
    parsed = ast.literal_eval(dict_str)
    if not isinstance(parsed, dict):
        raise ValueError(f"expected dict repr in counters line, got {type(parsed)}")
    return int(total_str), {str(k): int(v) for k, v in parsed.items()}
