"""Python DataSource (Spark 4 `pyspark.sql.datasource`) twin of the
reviews JSON-lines reader.

`readers.read_reviews_json` expresses the reference's tolerant scan
(reference src/wordCountJob.py:54-72 — ``json.loads`` with a bare
``except: return``) through `spark.read.text` + `from_json`. This module
expresses the SAME source through Spark 4's Python DataSource API — the
public extension point a team would use for a format Spark lacks
entirely (proprietary corpus shards, record-packed blobs). Registering
it here keeps the engine's §2.1 source surface current with the API
generation, and the test pins value-parity between the two readers.

Scale shape — the part worth copying: `partitions()` carves the file
into BYTE-RANGE input splits (one per ~SPLIT_BYTES), and each split
processes exactly the lines that START inside its range (a split that
begins mid-line skips forward to the next newline; the straddling line
belongs to the split where it started, which reads past its end to
finish it). That is precisely the HDFS/TextInputFormat split discipline,
so the source parallelizes like a native scan instead of funneling the
file through one task — the #1 failure mode of naive custom readers.

Semantics mirrored from read_reviews_json (probed against the native
reader, tests/test_formats.py):
  - malformed JSON lines are skipped, not failed;
  - non-object JSON (arrays/scalars parse fine but aren't records) is
    skipped the same way Spark's PERMISSIVE mode nulls them out;
  - defaults apply to MISSING/null fields only — ``category -> 
    'Unknown'``, ``reviewText -> ''`` — while an explicit empty string
    stays empty (the native reader's coalesce is null-only);
  - non-string field values keep their JSON text (Spark's StringType
    parse keeps the raw token: 123 -> "123", ["a"] -> '["a"]'),
    re-serialized compactly here. CONTRACT BOUNDARY: for non-canonical
    source formatting (1.50, spaced arrays) the native reader preserves
    the original bytes while this one normalizes through json.dumps —
    byte parity is guaranteed for canonically-formatted JSON, which the
    parity test pins. Line termination: LF and CRLF (binary readline);
    lone-CR files are out of scope (the Hadoop LineRecordReader under
    spark.read.text also treats them differently per codec).
Only the two columns the pipeline consumes are emitted — a custom
source should project at the source, not ship dead fields.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Target bytes per input split. Small so the driver's KB-scale fixtures
# still exercise the multi-split path; production would use 128 MB.
SPLIT_BYTES = 64 * 1024


def _string_field(rec: dict, key: str, default: str) -> str:
    """Null-only default + raw-JSON-text coercion, matching from_json's
    StringType semantics (see module docstring's contract boundary)."""
    v = rec.get(key)
    if v is None:
        return default
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


class _Split(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ReviewsJsonlReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("reviews_jsonl requires a path")
        self.split_bytes = int(options.get("split_bytes", SPLIT_BYTES))

    def partitions(self):
        size = os.path.getsize(self.path)
        n = max(1, (size + self.split_bytes - 1) // self.split_bytes)
        step = (size // n) + 1
        # step = size//n + 1 can overshoot (size=8, n=4 -> step=3 puts
        # split 3 at start=9 > end=8); clamping start and dropping empty
        # ranges avoids scheduling dead tasks for those splits.
        splits = [
            _Split(self.path, min(i * step, size), min((i + 1) * step, size))
            for i in range(n)
        ]
        return [s for s in splits if s.start < s.end] or splits[:1]

    def read(self, split: _Split):
        with open(split.path, "rb") as f:
            if split.start > 0:
                # A split that begins mid-line owns nothing until the
                # next newline: seek one byte back so a split boundary
                # exactly ON a newline still yields the following line.
                f.seek(split.start - 1)
                f.readline()
            while f.tell() < split.end:
                line = f.readline()
                if not line:
                    break
                try:
                    rec = json.loads(line)
                except Exception:
                    continue  # the reference's bare-except skip
                if not isinstance(rec, dict):
                    continue
                yield (
                    _string_field(rec, "category", "Unknown"),
                    _string_field(rec, "reviewText", ""),
                )


class ReviewsJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "reviews_jsonl"

    def schema(self) -> str:
        return "category string, reviewText string"

    def reader(self, schema) -> DataSourceReader:
        return ReviewsJsonlReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ReviewsJsonlDataSource)
