"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``dic_a1_spark`` package; this module only
adapts its registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-75 discriminative words per category (chi-square
    pipeline, the reference's end-to-end result) on sf0.001."""
    from dic_a1_spark.registry import all_queries

    return all_queries()["chisq_top75"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dic_a1_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from dic_a1_spark.registry import all_oracles

    return all_oracles()
