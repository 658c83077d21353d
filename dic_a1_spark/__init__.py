"""dic_a1_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``felixkapfer/194048_dic_sose2025_a1`` (a two-stage mrjob/Hadoop-Streaming
chi-square text-analytics pipeline over Amazon reviews), re-expressed as
idiomatic Spark DataFrame / SQL plans, plus the natural superset a
large-scale training-data pipeline needs (relational surface, streaming
windows, dedup, similarity search, text analysis, multimodal plumbing).

Package layout:
    session    - SparkSession factory tuned for scale (AQE, partitions, tz)
    config     - shared constants (stopword list, tokenizer charset)
    sources/   - readers (parquet tables, reviews JSON) and sinks
    functions/ - reusable column-level building blocks (text, stats, vectors)
    operators/ - the query surface: chisq, relational, events, dedup,
                 similarity, textstats, multimodal
    streaming/ - Structured Streaming jobs over the events stream
    plans/     - plan-inspection helpers (explain/shuffle audits)
    registry   - merged QUERIES / ORACLES dicts consumed by __spark_entry__

The reference's package name (``194048_dic_sose2025_a1``) is not a valid
Python identifier, hence ``dic_a1_spark``.
"""

__version__ = "0.1.0"
