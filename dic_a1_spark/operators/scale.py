"""Skew- and shuffle-management utilities for the 100 TB path.

The reference never needed these: its worst skew was 22 reduce keys over a
~330 MB intermediate (SURVEY.md §4). At real scale, skewed keys and
repeated shuffles are the dominant failure modes; these helpers are the
engine's explicit answers, complementing AQE's runtime skew-join splitting
(enabled in session.py):

- ``salted_groupby``: two-phase aggregation for heavy-hitter group keys.
  Deterministic salt (hash-mod of a high-cardinality column) splits each
  hot group across ``n_salts`` partial groups, then a second tiny
  aggregate merges the partials. Exact for any algebraic aggregate
  (sum/count/min/max); results are verified equal to the unsalted plan in
  tests/test_scale.py.
- ``salted_broadcast_left``: replicate-and-salt pattern for joins where
  ONE side has a skewed key distribution and the other is broadcastable —
  included for completeness; when the small side fits in memory a plain
  broadcast join already avoids the skew entirely, and that's what the
  engine does by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    salt_src: str | Column,
    aggs: dict[str, str],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps column -> one of sum/count/min/max (algebraic, so
    partial-then-final is exact). ``salt_src`` is any high-cardinality
    column (or Column expression); the salt is ``pmod(xxhash64(src), n)``
    — deterministic, so retries and the DuckDB oracle agree.

    Phase 1 groups on (keys..., salt): a key with 10^9 rows becomes
    ``n_salts`` tasks instead of one straggler. Phase 2 groups the
    ``|groups| * n_salts`` partials on keys alone — negligible data.
    """
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).alias("_salt")

    partial_aggs = []
    final_aggs = []
    for col, how in aggs.items():
        p = f"_p_{col}"
        if how == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"sum_{col}"))
        elif how == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"count_{col}"))
        elif how == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(f"min_{col}"))
        elif how == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot be salted")

    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
        .groupBy(*keys)
        .agg(*final_aggs)
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str | Column | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join of a skewed fact against a small dim.

    The dim side is exploded ``n_salts``-fold with an explicit salt column;
    the fact side gets a deterministic salt in [0, n_salts) derived from
    ``salt_src`` — a stable fact column/expression (defaults to hashing ALL
    fact columns), never ``monotonically_increasing_id()``, which changes
    across task retries and repartitioning and would make salt placement
    irreproducible. Joining on (key, salt) splits each hot key's probe work
    across ``n_salts`` tasks. With a broadcastable dim this matches plain
    ``broadcast(dim)`` — exposed mainly for the shuffled-join case where
    dim exceeds the broadcast threshold but skew still needs splitting
    (AQE's skew-join handles most of this automatically; this is the
    manual override).
    """
    if salt_src is None:
        src_cols = [F.col(c) for c in fact.columns]
        salt = F.pmod(F.xxhash64(*src_cols), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts))
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_salted = fact.withColumn("_salt", salt)
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")
